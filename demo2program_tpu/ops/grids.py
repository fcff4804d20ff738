"""Codecs between the 16-channel Karel grid encoding and the VM's compact
representation.

16-channel encoding (reference `karel_env/karel.py:6-23`):
  ch 0-3 agent facing N/E/S/W;  ch 4 wall;  ch 5+c exactly c markers (c<=10).

Compact encoding used on-device: agent (y, x, d) int32 scalars, marker-count
grid (h, w) int32, wall grid (h, w) bool. The mapping is bijective for valid
states, so comparing compact states is equivalent to comparing the full
16-channel tensors (`model_full.py:892-916` compares raw tensors).
"""

import jax.numpy as jnp


def decode_states(s):
    """(..., h, w, 16) bool/float -> dict of compact arrays (...-shaped).

    All-zero (padding) states decode to y=x=d=0, markers=0 — callers must
    mask by demo length before comparing.
    """
    s = s.astype(jnp.bool_)
    h, w = s.shape[-3], s.shape[-2]
    agent = s[..., :4].reshape(*s.shape[:-3], h * w * 4)
    idx = jnp.argmax(agent, axis=-1).astype(jnp.int32)
    y = idx // (w * 4)
    x = (idx // 4) % w
    d = idx % 4
    markers = jnp.argmax(s[..., 5:], axis=-1).astype(jnp.int32)
    wall = s[..., 4]
    return {"y": y, "x": x, "d": d, "markers": markers, "wall": wall}
