from demo2program_tpu.models.registry import get_model_class  # noqa: F401
