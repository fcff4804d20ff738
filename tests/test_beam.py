"""Beam-search decoder tests."""

import jax
import numpy as np
import pytest

from demo2program_tpu.dsl import karel_parser
from demo2program_tpu.dsl.karel_vocab import KarelVocab
from demo2program_tpu.models.synthesis import SynthesisModel
from tests.test_data import tiny_dataset_dir  # noqa: F401
from tests.test_models import tiny_cfg, random_batch, BS, L


pytestmark = pytest.mark.slow  # heavy model-stack compiles; fast gate skips


def test_beam_width_1_equals_greedy():
    cfg1 = tiny_cfg(model="synthesis_baseline", beam_width=1)
    batch = random_batch(20)
    model = SynthesisModel(cfg1, train=False)
    variables = model.init(jax.random.key(1), batch)
    out_g = model.apply(variables, batch, decode_mode="greedy")
    out_b = model.apply(variables, batch, decode_mode="beam")
    np.testing.assert_array_equal(
        np.asarray(out_g["greedy_program_tokens"]),
        np.asarray(out_b["greedy_program_tokens"]))
    np.testing.assert_array_equal(
        np.asarray(out_g["greedy_program_len"]),
        np.asarray(out_b["greedy_program_len"]))


def test_beam_improves_or_matches_greedy_score():
    """The best beam's log-prob must be >= the greedy path's log-prob under
    the same model."""
    cfg = tiny_cfg(model="synthesis_baseline", beam_width=4)
    batch = random_batch(21)
    model = SynthesisModel(cfg, train=False)
    variables = model.init(jax.random.key(2), batch)
    out_g = model.apply(variables, batch, decode_mode="greedy")
    out_b = model.apply(variables, batch, decode_mode="beam")

    def seq_logprob(logits, tokens, length):
        logp = jax.nn.log_softmax(logits, axis=-1)
        picked = np.take_along_axis(np.asarray(logp),
                                    np.asarray(tokens)[..., None],
                                    axis=-1)[..., 0]
        mask = np.arange(logits.shape[1])[None, :] < np.asarray(length)[:, None]
        return (picked * mask).sum(axis=1)

    g_score = seq_logprob(out_g["greedy_program_logits"],
                          out_g["greedy_program_tokens"],
                          out_g["greedy_program_len"])
    # recompute beam sequence log-prob by teacher-forcing the beam tokens
    from demo2program_tpu.models.decoder import TokenDecoder  # noqa: F401
    b_tokens = np.asarray(out_b["greedy_program_tokens"])
    b_len = np.asarray(out_b["greedy_program_len"])
    # feed beam tokens as "gt" through the shared decoder to get step logits
    batch_b = dict(batch)
    batch_b["program_tokens"] = b_tokens.astype(np.int32)
    out_tf = model.apply(variables, batch_b, include_greedy=False)
    b_score = seq_logprob(out_tf["pred_program_logits"], b_tokens, b_len)
    assert (b_score >= g_score - 1e-3).all(), (b_score, g_score)


def test_beam_lengths_and_tokens_consistent():
    cfg = tiny_cfg(model="synthesis_baseline", beam_width=3)
    batch = random_batch(22)
    model = SynthesisModel(cfg, train=False)
    variables = model.init(jax.random.key(3), batch)
    out = model.apply(variables, batch, decode_mode="beam")
    toks = np.asarray(out["greedy_program_tokens"])
    lens = np.asarray(out["greedy_program_len"])
    end = cfg.program_end_token
    for b in range(BS):
        assert 1 <= lens[b] <= L
        if lens[b] < L:
            assert toks[b, lens[b] - 1] == end


def test_execution_rerank_picks_correct_beam(tiny_dataset_dir):  # noqa: F811
    """KarelScorer.rerank_pick: given a beam set where the ground-truth
    program is NOT the best-scoring beam, execution-guided selection must
    end up with a program that reproduces every seen demo."""
    from demo2program_tpu.data.dataset import create_default_splits
    from demo2program_tpu.data import BatchPipeline
    from demo2program_tpu.eval.scorer import KarelScorer
    from demo2program_tpu.train.trainer import config_from_dataset
    import types

    dataset_dir = tiny_dataset_dir
    _, ds_test, _ = create_default_splits(dataset_dir, num_k=3)
    args = types.SimpleNamespace(
        model="synthesis_baseline", dataset_type="karel",
        dataset_path=dataset_dir, num_k=3, batch_size=4, seed=0,
        encoder_rnn_type="lstm", num_lstm_cell_units=32,
        demo_aggregation="avgpool", scheduled_sampling=False,
        scheduled_sampling_decay_steps=20000)
    cfg = config_from_dataset(args, ds_test)
    vocab = KarelVocab()
    scorer = KarelScorer(cfg, vocab)

    pipe = BatchPipeline(ds_test, 4, shuffle=False, compact=True)
    batch = next(pipe)
    gt_tokens = np.asarray(batch["program_tokens"])
    gt_len = np.asarray(batch["program_len"])[:, 0].astype(np.int32)
    bs, Lp = gt_tokens.shape

    wrong = np.array(vocab.str2intseq("DEF run m( turnLeft m)"),
                     dtype=gt_tokens.dtype)
    K = 3
    beam_tokens = np.zeros((bs, K, Lp), gt_tokens.dtype)
    beam_lens = np.zeros((bs, K), np.int32)
    # beam 0 (best score): a wrong-but-valid program; beam 1: the gt
    # program; beam 2: garbage that does not parse
    beam_tokens[:, 0, :len(wrong)] = wrong
    beam_lens[:, 0] = len(wrong)
    beam_tokens[:, 1] = gt_tokens
    beam_lens[:, 1] = gt_len
    beam_lens[:, 2] = 2
    pick = scorer.rerank_pick(beam_tokens, beam_lens, batch)

    rows = np.arange(bs)
    picked_tok = beam_tokens[rows, pick]
    picked_len = beam_lens[rows, pick]
    nc, _ = scorer.execution_compact(
        picked_tok, picked_len, np.zeros(bs, np.float32), batch)
    assert (nc == cfg.k).all(), (pick, nc)
    # the gt beam must win wherever the wrong program fails
    nc0, _ = scorer.execution_compact(
        beam_tokens[:, 0], beam_lens[:, 0], np.zeros(bs, np.float32), batch)
    assert (pick[nc0 != cfg.k] == 1).all()
