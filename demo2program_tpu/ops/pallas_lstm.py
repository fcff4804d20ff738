"""Fused LSTM step as a Pallas TPU kernel.

The recurrent scans (demo encoders + program/action decoders) are the
compute core of every model here; each step is a (B, D+H) @ (D+H, 4H) matmul
followed by a chain of elementwise gate ops. XLA runs these as separate
HLOs inside the scan; this kernel fuses the matmul and all gate math into a
single VMEM-resident Pallas program (one HBM round trip per step instead of
several).

Semantics: standard LSTM with gate order (i, f, g, o):

    z = [x, h] @ W + b
    c' = sigmoid(f) * c + sigmoid(i) * tanh(g)
    h' = sigmoid(o) * tanh(c')

Backward: jax.custom_vjp whose backward pass differentiates the numerically
identical jnp reference (`_lstm_step_ref`) — exact gradients, no hand-rolled
backward kernel to keep in sync.

Shape notes: lane dims must be 128-aligned on TPU; callers' feature dims are
padded to multiples of 128 inside `PallasLSTMCell`. Weights must fit VMEM
(~16MB): (D+H, 4H) fp32 — fine up to H=768 with D<=H; the cell falls back to
the jnp path beyond that.

Set ModelConfig.use_pallas_lstm=True (or cell_impl='pallas') to enable; the
parameter layout is identical between the pallas and jnp paths, so
checkpoints are interchangeable.
"""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

_VMEM_LIMIT_BYTES = 14 * 1024 * 1024


def _lstm_step_ref(x, h, c, w, b):
    z = jnp.concatenate([x, h], axis=-1) @ w + b
    H = h.shape[-1]
    i, f, g, o = (z[:, :H], z[:, H:2 * H], z[:, 2 * H:3 * H], z[:, 3 * H:])
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _kernel(x_ref, h_ref, c_ref, w_ref, b_ref, h_out_ref, c_out_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    x = x_ref[:]
    h = h_ref[:]
    z = jnp.concatenate([x, h], axis=-1)
    zw = jnp.dot(z, w_ref[:], preferred_element_type=jnp.float32)
    zw = zw + b_ref[:]
    H = h.shape[-1]
    i = zw[:, :H]
    f = zw[:, H:2 * H]
    g = zw[:, 2 * H:3 * H]
    o = zw[:, 3 * H:]
    # gate math in f32 (zw accumulates f32 regardless of input dtype),
    # cast on store so bf16 runs keep bf16 carries
    c_new = (jax.nn.sigmoid(f) * c_ref[:].astype(jnp.float32)
             + jax.nn.sigmoid(i) * jnp.tanh(g))
    h_out_ref[:] = (jax.nn.sigmoid(o)
                    * jnp.tanh(c_new)).astype(h_out_ref.dtype)
    c_out_ref[:] = c_new.astype(c_out_ref.dtype)


def _pallas_forward(x, h, c, w, b, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H = h.shape
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES)
    h_new, c_new = pl.pallas_call(
        _kernel,
        out_shape=(jax.ShapeDtypeStruct((B, H), x.dtype),
                   jax.ShapeDtypeStruct((B, H), x.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
        **kwargs,
    )(x, h, c, w, b)
    return h_new, c_new


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_lstm_step(x, h, c, w, b, interpret=False):
    return _pallas_forward(x, h, c, w, b, interpret)


def _fwd(x, h, c, w, b, interpret):
    out = _pallas_forward(x, h, c, w, b, interpret)
    return out, (x, h, c, w, b)


def _bwd(interpret, res, grads):
    _, vjp = jax.vjp(_lstm_step_ref, *res)
    return vjp(grads)


fused_lstm_step.defvjp(_fwd, _bwd)


def _round_up(v, m=128):
    return ((v + m - 1) // m) * m


class PallasLSTMCell(nn.Module):
    """LSTM cell with the fused Pallas step (jnp fallback off-TPU / for
    oversized widths). Parameter layout: one (D+H, 4H) kernel + (4H,) bias,
    identical for both execution paths."""
    features: int
    force_jnp: bool = False

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        H = self.features
        D = x.shape[-1]
        w = self.param("kernel", nn.initializers.glorot_uniform(),
                       (D + H, 4 * H))
        b = self.param("bias", nn.initializers.zeros, (4 * H,))
        # compute dtype follows the (possibly bf16-cast) params; the carry
        # dtype must stay EXACTLY what came in (nn.scan requires carry-type
        # invariance), so cast in for compute and back out on return
        c_dt, h_dt = c.dtype, h.dtype
        x = x.astype(w.dtype)
        h = h.astype(w.dtype)
        c = c.astype(w.dtype)

        use_pallas = not self.force_jnp
        # VMEM budget check for the single-block kernel
        if (D + H) * 4 * H * 4 > _VMEM_LIMIT_BYTES:
            use_pallas = False
        platform = jax.devices()[0].platform if jax.devices() else "cpu"
        interpret = platform not in ("tpu",)

        if not use_pallas:
            h_new, c_new = _lstm_step_ref(x, h, c, w, b)
            return (c_new.astype(c_dt), h_new.astype(h_dt)), h_new

        # pad lane dims to 128 multiples (zero rows of W contribute nothing)
        Dp = _round_up(D)
        Hp = _round_up(H)
        if Dp != D or Hp != H:
            x_p = jnp.pad(x, ((0, 0), (0, Dp - D)))
            h_p = jnp.pad(h, ((0, 0), (0, Hp - H)))
            c_p = jnp.pad(c, ((0, 0), (0, Hp - H)))
            w_p = jnp.zeros((Dp + Hp, 4 * Hp), w.dtype)
            w_p = w_p.at[:D, :].set(
                jnp.pad(w[:D].reshape(D, 4, H),
                        ((0, 0), (0, 0), (0, Hp - H))).reshape(D, 4 * Hp))
            w_p = w_p.at[Dp:Dp + H, :].set(
                jnp.pad(w[D:].reshape(H, 4, H),
                        ((0, 0), (0, 0), (0, Hp - H))).reshape(H, 4 * Hp))
            b_p = jnp.pad(b.reshape(4, H),
                          ((0, 0), (0, Hp - H))).reshape(4 * Hp)
            h_new, c_new = fused_lstm_step(x_p, h_p, c_p, w_p, b_p,
                                           interpret)
            h_new = h_new[:, :H]
            c_new = c_new[:, :H]
        else:
            h_new, c_new = fused_lstm_step(x, h, c, w, b, interpret)
        return (c_new.astype(c_dt), h_new.astype(h_dt)), h_new
