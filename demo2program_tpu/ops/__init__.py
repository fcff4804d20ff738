from demo2program_tpu.ops import grids  # noqa: F401
from demo2program_tpu.ops import vm  # noqa: F401
