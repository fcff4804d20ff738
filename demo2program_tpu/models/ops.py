"""Basic NN blocks with reference-op parity (`models/ops.py` in the
reference).

Quirks replicated deliberately:
  * `bn_act` applies the ACTIVATION FIRST, then batch norm
    (reference `models/ops.py:14-24`) — the opposite of the usual order.
  * batch-norm behaviour is driven by the Python-level `train` flag, not a
    runtime placeholder (reference `models/ops.py:27-33` receives the
    construction-time `is_train`), so use separate train/eval applications.
  * lrelu has leak 0.2 via the f1/f2 formulation (`models/ops.py:7-11`).

Conv stride defaults to 2 with 'SAME' padding (slim defaults at
`models/ops.py:27-33` as called by the model: k=3, s=2).
"""

import flax.linen as nn
import jax.numpy as jnp


def make_lstm_cell(units, impl="xla"):
    """LSTM cell factory: 'xla' = flax OptimizedLSTMCell (XLA-fused scans),
    'pallas' = fused single-kernel step (ops/pallas_lstm.py)."""
    if impl == "pallas":
        from demo2program_tpu.ops.pallas_lstm import PallasLSTMCell
        return PallasLSTMCell(units)
    if impl == "pallas_jnp":
        # same parameter layout as 'pallas' (one fused (D+H,4H) kernel) but
        # pure-jnp math: evaluates pallas-trained checkpoints off-TPU
        # without the interpret-mode slowdown
        from demo2program_tpu.ops.pallas_lstm import PallasLSTMCell
        return PallasLSTMCell(units, force_jnp=True)
    if impl == "xla":
        return nn.OptimizedLSTMCell(units)
    raise ValueError(f"unknown cell impl {impl!r}")


def lrelu(x, leak=0.2):
    f1 = 0.5 * (1 + leak)
    f2 = 0.5 * (1 - leak)
    return f1 * x + f2 * jnp.abs(x)


class BNAct(nn.Module):
    """activation -> batch norm (the reference order)."""
    train: bool
    batch_norm: bool = True
    activation: str = "lrelu"  # 'lrelu' | 'none'

    @nn.compact
    def __call__(self, x):
        if self.activation == "lrelu":
            x = lrelu(x)
        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not self.train,
                momentum=0.9, epsilon=1e-3,  # tf.contrib BN defaults
            )(x)
        return x


class Conv2D(nn.Module):
    """conv + (activation -> BN); reference conv2d (`models/ops.py:27-33`)."""
    features: int
    train: bool
    kernel: int = 3
    stride: int = 2
    batch_norm: bool = True
    activation: str = "lrelu"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME")(x)
        return BNAct(self.train, self.batch_norm, self.activation)(x)


class FC(nn.Module):
    """dense + (activation -> BN); reference fc (`models/ops.py:149-155`)."""
    features: int
    train: bool
    batch_norm: bool = True
    activation: str = "lrelu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features)(x)
        return BNAct(self.train, self.batch_norm, self.activation)(x)
