from demo2program_tpu.eval.scorer import KarelScorer  # noqa: F401
