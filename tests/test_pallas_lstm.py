"""Pallas fused-LSTM cell: numerical equivalence + gradient correctness
(interpret mode on CPU; compiled kernel on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demo2program_tpu.ops.pallas_lstm import (
    PallasLSTMCell, _lstm_step_ref, fused_lstm_step)


pytestmark = pytest.mark.slow  # heavy model-stack compiles; fast gate skips


def test_fused_step_matches_reference():
    rng = np.random.RandomState(0)
    B, D, H = 8, 128, 128
    x = jnp.asarray(rng.randn(B, D), jnp.float32)
    h = jnp.asarray(rng.randn(B, H), jnp.float32)
    c = jnp.asarray(rng.randn(B, H), jnp.float32)
    w = jnp.asarray(rng.randn(D + H, 4 * H) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(4 * H) * 0.1, jnp.float32)
    interpret = jax.devices()[0].platform != "tpu"
    h_new, c_new = fused_lstm_step(x, h, c, w, b, interpret)
    h_ref, c_ref = _lstm_step_ref(x, h, c, w, b)
    np.testing.assert_allclose(np.asarray(h_new), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_new), np.asarray(c_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_step_gradients():
    rng = np.random.RandomState(1)
    B, D, H = 4, 128, 128
    args = [jnp.asarray(rng.randn(B, D), jnp.float32),
            jnp.asarray(rng.randn(B, H), jnp.float32),
            jnp.asarray(rng.randn(B, H), jnp.float32),
            jnp.asarray(rng.randn(D + H, 4 * H) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(4 * H) * 0.1, jnp.float32)]
    interpret = jax.devices()[0].platform != "tpu"

    def loss_fused(*a):
        h, c = fused_lstm_step(*a, interpret)
        return (h ** 2).sum() + (c ** 2).sum()

    def loss_ref(*a):
        h, c = _lstm_step_ref(*a)
        return (h ** 2).sum() + (c ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_cell_padding_path_matches_jnp():
    """Non-128-aligned dims (e.g. the 48-dim CNN features) go through the
    padding path; outputs must match the jnp cell with the same params."""
    cell_p = PallasLSTMCell(96)
    cell_j = PallasLSTMCell(96, force_jnp=True)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 48), jnp.float32)
    carry = (jnp.asarray(rng.randn(4, 96), jnp.float32),
             jnp.asarray(rng.randn(4, 96), jnp.float32))
    v = cell_p.init(jax.random.key(0), carry, x)
    (c_p, h_p), out_p = cell_p.apply(v, carry, x)
    (c_j, h_j), out_j = cell_j.apply(v, carry, x)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_j),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_j),
                               rtol=2e-5, atol=2e-5)


def test_model_with_pallas_cells():
    """Synthesis model end to end with cell_impl='pallas' (interpret mode on
    CPU): forward + loss finite; param tree has the fused cell layout."""
    from tests.test_models import tiny_cfg, random_batch
    from demo2program_tpu.models.synthesis import SynthesisModel
    from demo2program_tpu.models import objective

    cfg = tiny_cfg(model="synthesis_baseline", cell_impl="pallas")
    batch = random_batch(4)
    model = SynthesisModel(cfg, train=True)
    variables = model.init(jax.random.key(0), batch)
    core = variables["params"]["program_decoder"]["core"]
    # the fused cell stores one (D+H, 4H) kernel + (4H,) bias
    assert set(core["cell"].keys()) == {"kernel", "bias"}
    assert core["cell"]["kernel"].shape == (64, 128)  # units=32 -> 4H=128
    out, _ = model.apply(variables, batch, mutable=["batch_stats"])
    loss, _ = objective.compute_loss(cfg, out, batch, "synthesis_baseline")
    assert np.isfinite(float(loss))
