from demo2program_tpu.dsl.karel_vocab import KarelVocab  # noqa: F401
from demo2program_tpu.dsl import karel_parser  # noqa: F401
from demo2program_tpu.dsl import karel_interp  # noqa: F401
from demo2program_tpu.dsl import karel_canonical  # noqa: F401
from demo2program_tpu.dsl.karel_sampler import KarelProgramSampler  # noqa: F401
