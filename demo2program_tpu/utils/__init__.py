from demo2program_tpu.utils.logger import log  # noqa: F401
