"""Model registry — name parity with the reference's trainer
(`trainer.py:18-30`: synthesis_baseline / induction_baseline / summarizer /
full)."""


def get_model_class(model_name):
    if model_name == "synthesis_baseline":
        from demo2program_tpu.models.synthesis import SynthesisModel
        return SynthesisModel
    if model_name == "summarizer":
        from demo2program_tpu.models.summarizer import SummarizerModel
        return SummarizerModel
    if model_name == "full":
        from demo2program_tpu.models.full import FullModel
        return FullModel
    if model_name == "induction_baseline":
        from demo2program_tpu.models.induction import InductionModel
        return InductionModel
    raise ValueError(model_name)
