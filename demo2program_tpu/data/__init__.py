from demo2program_tpu.data.dataset import (  # noqa: F401
    KarelDataset, create_default_splits)
from demo2program_tpu.data.pipeline import BatchPipeline  # noqa: F401
