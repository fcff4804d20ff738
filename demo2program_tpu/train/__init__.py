from demo2program_tpu.train.step import (  # noqa: F401
    TrainState, create_train_state, make_train_step, make_eval_step,
    make_optimizer)
