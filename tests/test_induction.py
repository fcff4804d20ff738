"""Induction baseline tests."""

import jax
import numpy as np
import pytest

from demo2program_tpu.models.induction import InductionModel
from demo2program_tpu.models import objective
from tests.test_models import tiny_cfg, random_batch, BS, K, TK, T, A


pytestmark = pytest.mark.slow  # heavy model-stack compiles; fast gate skips


def test_induction_forward_and_loss():
    cfg = tiny_cfg(model="induction_baseline")
    batch = random_batch(5)
    batch["test_a_h"] = np.eye(A, dtype=np.float32)[
        np.random.RandomState(5).randint(0, A, size=(BS, TK, T))]
    batch["test_a_h_tokens"] = batch["test_a_h"].argmax(-1).astype(np.int32)
    model = InductionModel(cfg, train=True)
    variables = model.init(jax.random.key(0), batch)
    out, _ = model.apply(variables, batch, mutable=["batch_stats"])
    assert out["pred_action_logits"].shape == (BS, TK, T, A)
    assert out["greedy_action_tokens"].shape == (BS, TK, T)
    assert out["greedy_action_len"].shape == (BS, TK)

    loss, report = objective.compute_loss(
        cfg, out, batch, "induction_baseline")
    assert np.isfinite(float(loss))
    for key in ["avg_action_loss", "avg_action_token_acc",
                "avg_action_seq_acc", "avg_action_seq_all_acc"]:
        assert key in report, key
    g = objective.greedy_action_report(cfg, out, batch, "induction_baseline")
    assert "greedy_avg_action_seq_all_acc" in g
    # program eval tensors are empty (dummy fetches in the reference)
    assert objective.program_eval_tensors(cfg, out, batch) == {}


def test_induction_monotonic_attention():
    cfg = tiny_cfg(model="induction_baseline", attn_type="luong_monotonic")
    batch = random_batch(6)
    batch["test_a_h"] = np.eye(A, dtype=np.float32)[
        np.random.RandomState(6).randint(0, A, size=(BS, TK, T))]
    batch["test_a_h_tokens"] = batch["test_a_h"].argmax(-1).astype(np.int32)
    model = InductionModel(cfg, train=True)
    variables = model.init(jax.random.key(0), batch)
    out, _ = model.apply(variables, batch, mutable=["batch_stats"])
    assert out["pred_action_logits"].shape == (BS, TK, T, A)
    assert np.isfinite(np.asarray(out["pred_action_logits"])).all()
    loss, _ = objective.compute_loss(cfg, out, batch, "induction_baseline")
    assert np.isfinite(float(loss))
    # gradients flow through the monotonic recursion
    def loss_fn(p):
        o, _ = model.apply({"params": p,
                            "batch_stats": variables["batch_stats"]},
                           batch, include_greedy=False,
                           mutable=["batch_stats"])
        l, _ = objective.compute_loss(cfg, o, batch, "induction_baseline")
        return l
    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float((g ** 2).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_induction_stack_subsequent_state_and_flags():
    cfg = tiny_cfg(model="induction_baseline", stack_subsequent_state=True,
                   state_encoder_fc=True,
                   concat_state_feature_direct_prediction=True)
    batch = random_batch(9)
    batch["test_a_h"] = np.eye(A, dtype=np.float32)[
        np.random.RandomState(9).randint(0, A, size=(BS, TK, T))]
    batch["test_a_h_tokens"] = batch["test_a_h"].argmax(-1).astype(np.int32)
    model = InductionModel(cfg, train=True)
    variables = model.init(jax.random.key(0), batch)
    enc = variables["params"]["encoder"]["state_encoder"]
    assert "fc1" in enc and "fc2" in enc    # state_encoder_fc path
    out, _ = model.apply(variables, batch, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out["pred_action_logits"])).all()


def test_induction_rejects_unknown_attn():
    cfg = tiny_cfg(model="induction_baseline", attn_type="bogus")
    batch = random_batch(6)
    model = InductionModel(cfg, train=True)
    with pytest.raises(ValueError):
        model.init(jax.random.key(0), batch)


def test_induction_bilstm_encoder():
    cfg = tiny_cfg(model="induction_baseline", encoder_rnn_type="bilstm")
    batch = random_batch(8)
    batch["test_a_h"] = np.eye(A, dtype=np.float32)[
        np.random.RandomState(8).randint(0, A, size=(BS, TK, T))]
    batch["test_a_h_tokens"] = batch["test_a_h"].argmax(-1).astype(np.int32)
    model = InductionModel(cfg, train=True)
    variables = model.init(jax.random.key(0), batch)
    # two directions share nothing: fwd and bwd sub-params exist
    lstm = variables["params"]["encoder"]["lstm"]
    assert "fwd" in lstm and "bwd" in lstm
    out, _ = model.apply(variables, batch, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out["pred_action_logits"])).all()
    # bilstm is induction-only, like the reference
    with pytest.raises(ValueError):
        tiny_cfg(model="full", encoder_rnn_type="bilstm")


def test_induction_attention_masks_padding():
    """Alignments must ignore memory positions past each demo's length:
    shortening demo_len changes nothing if trailing frames were zeros."""
    cfg = tiny_cfg(model="induction_baseline")
    b1 = random_batch(7)
    b1["test_a_h"] = np.eye(A, dtype=np.float32)[
        np.random.RandomState(7).randint(0, A, size=(BS, TK, T))]
    b1["test_a_h_tokens"] = b1["test_a_h"].argmax(-1).astype(np.int32)
    b1["demo_len"] = np.full((BS, K), 3, np.float32)
    # zero out frames past the length
    b1["s_h"][:, :, 3:] = 0
    b1["per"][:, :, 3:] = 0
    b2 = {k: v.copy() for k, v in b1.items()}
    b2["s_h"][:, :, 3:] = 7.7  # garbage beyond length must not matter
    model = InductionModel(cfg, train=False)
    variables = model.init(jax.random.key(0), b1)
    o1 = model.apply(variables, b1)
    o2 = model.apply(variables, b2)
    np.testing.assert_allclose(np.asarray(o1["pred_action_logits"]),
                               np.asarray(o2["pred_action_logits"]),
                               rtol=1e-5, atol=1e-5)
