from demo2program_tpu.envs.karel import (  # noqa: F401
    KarelWorld,
    KarelStateGenerator,
    MAX_NUM_MARKER,
    NUM_STATE_CHANNELS,
    ACTION_NAMES,
    PERCEPTION_NAMES,
)
