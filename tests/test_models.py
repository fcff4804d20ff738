"""Model forward/backward smoke + shape + semantics tests (tiny dims)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from demo2program_tpu.models.common import ModelConfig
from demo2program_tpu.models.full import FullModel
from demo2program_tpu.models.summarizer import SummarizerModel
from demo2program_tpu.models.synthesis import SynthesisModel
from demo2program_tpu.models import objective

pytestmark = pytest.mark.slow  # heavy model-stack compiles; fast gate skips


BS, K, TK, T, L, V, A, P = 2, 3, 2, 6, 10, 50, 6, 5


def tiny_cfg(**kw):
    kw.setdefault("batch_size", BS)
    kw.setdefault("num_lstm_cell_units", 32)
    kw.setdefault("k", K)
    kw.setdefault("test_k", TK)
    kw.setdefault("max_demo_len", T)
    kw.setdefault("max_program_len", L)
    return ModelConfig(**kw)


def random_batch(rng):
    r = np.random.RandomState(rng)
    prog_tokens = r.randint(0, V, size=(BS, L))
    program = np.zeros((BS, V, L), np.float32)
    for b in range(BS):
        program[b, prog_tokens[b], np.arange(L)] = 1
    a_tok = r.randint(0, A, size=(BS, K, T))
    a_h = np.eye(A, dtype=np.float32)[a_tok]
    return {
        "program": program,
        "program_tokens": prog_tokens.astype(np.int32),
        "program_len": np.full((BS, 1), L - 2, np.float32),
        "s_h": r.rand(BS, K, T, 8, 8, 16).astype(np.float32),
        "test_s_h": r.rand(BS, TK, T, 8, 8, 16).astype(np.float32),
        "a_h": a_h,
        "a_h_tokens": a_tok.astype(np.int32),
        "demo_len": np.full((BS, K), T - 1, np.float32),
        "test_demo_len": np.full((BS, TK), T - 1, np.float32),
        "per": (r.rand(BS, K, T, P) > 0.5).astype(np.float32),
        "test_per": (r.rand(BS, TK, T, P) > 0.5).astype(np.float32),
    }


def init_model(model_cls, cfg, batch, train=True):
    model = model_cls(cfg, train)
    variables = model.init(jax.random.key(0), batch)
    return model, variables


@pytest.mark.parametrize("model_cls,name", [
    (SynthesisModel, "synthesis_baseline"),
    (SummarizerModel, "summarizer"),
    (FullModel, "full"),
])
def test_forward_shapes_and_loss(model_cls, name):
    cfg = tiny_cfg(model=name)
    batch = random_batch(0)
    model, variables = init_model(model_cls, cfg, batch)
    out, _ = model.apply(variables, batch, mutable=["batch_stats"])
    assert out["pred_program_logits"].shape == (BS, L, V)
    assert out["greedy_program_logits"].shape == (BS, L, V)
    assert out["greedy_program_tokens"].shape == (BS, L)
    assert out["greedy_program_len"].shape == (BS,)
    assert (np.asarray(out["greedy_program_len"]) <= L).all()
    if name == "full":
        assert out["pred_action_logits"].shape == (BS, K, T, A)
        assert out["pred_per_logits"].shape == (BS, K, T, P)
        assert out["greedy_action_tokens"].shape == (BS, K, T)

    loss, report = objective.compute_loss(cfg, out, batch, name)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(report["program_token_acc"]) <= 1.0
    if name == "full":
        assert np.isfinite(float(report["avg_action_loss"]))
        assert np.isfinite(float(report["avg_per_loss"]))

    evals = objective.program_eval_tensors(cfg, out, batch)
    assert evals["pred_tokens"].shape == (BS, L)
    assert evals["greedy_tokens"].shape == (BS, L)


def test_greedy_length_semantics():
    """Length = first end-token index + 1 (or max_len)."""
    cfg = tiny_cfg(model="synthesis_baseline")
    batch = random_batch(1)
    model, variables = init_model(SynthesisModel, cfg, batch)
    out, _ = model.apply(variables, batch, mutable=["batch_stats"])
    toks = np.asarray(out["greedy_program_tokens"])
    lens = np.asarray(out["greedy_program_len"])
    end = cfg.program_end_token
    for b in range(BS):
        hits = np.where(toks[b] == end)[0]
        expected = hits[0] + 1 if len(hits) else L
        assert lens[b] == expected


def test_overfit_single_batch():
    """A few Adam steps on one batch must reduce the loss (wiring check)."""
    cfg = tiny_cfg(model="synthesis_baseline")
    batch = random_batch(2)
    model, variables = init_model(SynthesisModel, cfg, batch)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": bstats}, batch,
                include_greedy=False, mutable=["batch_stats"])
            loss, _ = objective.compute_loss(
                cfg, out, batch, "synthesis_baseline")
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, upd), \
            updates["batch_stats"], opt_state2, loss

    losses = []
    for _ in range(40):
        params, bstats, opt_state, loss = step(params, bstats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.6, losses


def test_decoder_params_shared_between_tf_and_greedy():
    cfg = tiny_cfg(model="synthesis_baseline")
    batch = random_batch(3)
    model = SynthesisModel(cfg, True)
    v_full = model.init(jax.random.key(0), batch, include_greedy=True)
    v_tf = model.init(jax.random.key(0), batch, include_greedy=False)
    # same param tree: greedy adds no parameters
    flat_full = jax.tree_util.tree_structure(v_full["params"])
    flat_tf = jax.tree_util.tree_structure(v_tf["params"])
    assert flat_full == flat_tf


def test_scheduled_sampling_path():
    cfg = tiny_cfg(model="synthesis_baseline", scheduled_sampling=True)
    batch = random_batch(4)
    model = SynthesisModel(cfg, True)
    variables = model.init(jax.random.key(0), batch, include_greedy=False,
                           sampling_prob=0.5, rng=jax.random.key(1))
    out, _ = model.apply(variables, batch, include_greedy=False,
                         sampling_prob=0.5, rng=jax.random.key(2),
                         mutable=["batch_stats"])
    assert out["pred_program_logits"].shape == (BS, L, V)
    # sampling_prob=0 must equal plain teacher forcing
    out0, _ = model.apply(variables, batch, include_greedy=False,
                          sampling_prob=0.0, rng=jax.random.key(2),
                          mutable=["batch_stats"])
    out_tf, _ = model.apply(variables, batch, include_greedy=False,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out0["pred_program_logits"]),
                               np.asarray(out_tf["pred_program_logits"]),
                               rtol=1e-5, atol=1e-5)
