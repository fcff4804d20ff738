"""On-device demo reconstruction from the compact wire format.

The reference ships full float32 one-hot tensors host->device every step —
per item: the (k, T, h, w, 16) state history, action one-hots, perception
vectors, the (V, L) program one-hot (`karel_env/dataset_karel.py:38-115`,
re-fed through placeholders at `trainer.py:189-199`). On this host the
~20 MB/s host<->TPU tunnel makes that the end-to-end bottleneck (the compiled
step itself is ~1 ms).

TPU-native fix: the state history is a deterministic function of (initial
state, recorded actions), so the wire carries only

    c_wall     (k, h, w) uint8   static wall grid
    c_marker   (k, h, w) uint8   initial marker counts
    c_agent    (k, 3)    uint8   initial (y, x, facing)
    c_a_raw    (k, T)    int8    raw recorded action ids (zero-padded)
    c_a_row_len (1,)     int32   the per-item padded action-row width
                                 (the HDF5 group's a_h.shape[1])

(~150 bytes per demo instead of ~20 KB, ~90x fewer wire bytes per item) and
`expand_batch` rebuilds the full batch — state frames, perception vectors,
action/program one-hots — INSIDE the jitted train/eval step, where XLA fuses
the rebuild into the encoder convolutions.

Replay semantics: stored demos contain only successfully-recorded actions
(error-mode rollouts that fail are rejected at generation,
`karel_env/generator.py:91-109`), and in no-error mode blocked moves turn
180 degrees and marker over/underflow is a no-op (`karel_env/karel.py:
150-182`). Replaying with the no-error semantics therefore reconstructs BOTH
dataset flavours exactly: for make_error datasets the error branches are
unreachable by construction. Property-tested against stored HDF5 histories
in tests/test_reconstruct.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

# facing: 0 N, 1 E, 2 S, 3 W (reference karel.py:66-91)
_FRONT = np.array([[-1, 0], [0, 1], [1, 0], [0, -1]], dtype=np.int32)
_LEFT = np.array([[0, -1], [-1, 0], [0, 1], [1, 0]], dtype=np.int32)
_RIGHT = np.array([[0, 1], [1, 0], [0, -1], [-1, 0]], dtype=np.int32)

MAX_MARKER_CAP = 9  # reference karel.py:174 quirk: put is a no-op at >9

COMPACT_KEY = "c_wall"

# compact seen-demo keys carrying a (bs, k, ...) demo axis (mesh sharding)
COMPACT_DEMO_AXIS_KEYS = ("c_wall", "c_marker", "c_agent", "c_a_raw")


def _clear_at(wall_f, y, x, d, dy_tab, dx_tab, h, w):
    ny = y + dy_tab[d]
    nx = x + dx_tab[d]
    inb = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
    nyc = jnp.clip(ny, 0, h - 1)
    nxc = jnp.clip(nx, 0, w - 1)
    idx = nyc * w + nxc
    blocked = jnp.take_along_axis(wall_f, idx[:, None], axis=1)[:, 0]
    return inb & ~blocked, nyc, nxc


@jax.jit
def replay_actions(wall, marker0, agent0, actions, demo_len):
    """Replay recorded actions from compact initial states.

    Args:
      wall:     (B, h, w) bool/uint8 — static
      marker0:  (B, h, w) int — initial marker counts
      agent0:   (B, 3) int — initial (y, x, facing)
      actions:  (B, T) int — recorded action ids, zero-padded; only the
                first demo_len-1 entries are applied
      demo_len: (B,) int — state-history lengths (actions + 1)

    Returns dict of per-step compact states, each (B, T, ...):
      y, x, d (B, T) int32; markers (B, T, h, w) int32.
      Entries at t >= demo_len repeat the final state (callers mask).
    """
    B, h, w = wall.shape
    T = actions.shape[1]
    wall_f = wall.reshape(B, h * w).astype(jnp.bool_)
    bidx = jnp.arange(B)

    front_dy = jnp.asarray(_FRONT[:, 0])
    front_dx = jnp.asarray(_FRONT[:, 1])

    def step(carry, xs):
        y, x, d, markers = carry
        a, t = xs
        a = a.astype(jnp.int32)
        active = t < (demo_len - 1)

        front_ok, fy, fx = _clear_at(wall_f, y, x, d, front_dy, front_dx,
                                     h, w)
        here = jnp.take_along_axis(
            markers.reshape(B, h * w), (y * w + x)[:, None], axis=1)[:, 0]

        a_move = a == 0
        a_turn = (a == 1) | (a == 2)
        a_pick = a == 3
        a_put = a == 4

        do_move = a_move & front_ok
        y_new = jnp.where(do_move, fy, y)
        x_new = jnp.where(do_move, fx, x)
        d_new = jnp.where(a_turn, (d + jnp.where(a == 1, -1, 1)) % 4, d)
        # no-error mode: blocked move turns 180 (karel.py:150-154);
        # unreachable for make_error datasets (failed demos are rejected)
        d_new = jnp.where(a_move & ~front_ok, (d + 2) % 4, d_new)

        delta = jnp.where(a_pick & (here > 0), -1,
                          jnp.where(a_put & (here < MAX_MARKER_CAP), 1, 0))
        markers_new = markers.reshape(B, h * w).at[bidx, y * w + x].add(
            jnp.where(active, delta, 0)).reshape(B, h, w)

        y_new = jnp.where(active, y_new, y)
        x_new = jnp.where(active, x_new, x)
        d_new = jnp.where(active, d_new, d)
        new = (y_new, x_new, d_new, markers_new)
        return new, new

    init = (agent0[:, 0].astype(jnp.int32), agent0[:, 1].astype(jnp.int32),
            agent0[:, 2].astype(jnp.int32), marker0.astype(jnp.int32))
    a_seq = jnp.moveaxis(jnp.asarray(actions)[:, :T - 1], 1, 0)  # (T-1, B)
    _, (ys, xs, ds, ms) = jax.lax.scan(
        step, init, (a_seq, jnp.arange(T - 1)))

    def with_init(first, rest):  # (B,) + (T-1, B, ...) -> (B, T, ...)
        return jnp.concatenate(
            [first[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)

    return {
        "y": with_init(init[0], ys),
        "x": with_init(init[1], xs),
        "d": with_init(init[2], ds),
        "markers": with_init(init[3], ms),
        "wall": wall.astype(jnp.bool_),
    }


def assemble_states(rep, demo_len):
    """Compact per-step states -> (B, T, h, w, 16) float32, zeroed at
    t >= demo_len (matching the stored zero padding)."""
    y, x, d, markers, wall = (rep["y"], rep["x"], rep["d"], rep["markers"],
                              rep["wall"])
    B, T = y.shape
    h, w = wall.shape[1], wall.shape[2]
    pos = jax.nn.one_hot(y * w + x, h * w, dtype=jnp.float32).reshape(
        B, T, h, w)
    agent = pos[..., None] * jax.nn.one_hot(d, 4, dtype=jnp.float32)[
        :, :, None, None, :]
    wall_ch = jnp.broadcast_to(
        wall.astype(jnp.float32)[:, None, :, :, None], (B, T, h, w, 1))
    marker_ch = jax.nn.one_hot(markers, 11, dtype=jnp.float32)
    s = jnp.concatenate([agent, wall_ch, marker_ch], axis=-1)
    mask = (jnp.arange(T)[None, :] < demo_len[:, None]).astype(jnp.float32)
    return s * mask[:, :, None, None, None]


def compute_percepts(rep, demo_len):
    """Per-step 5-dim perception vectors (front/left/right clear,
    markersPresent, noMarkersPresent — reference `karel_env/karel.py:97-132`,
    `add_per.py:15-57`), zeroed at t >= demo_len."""
    y, x, d, markers, wall = (rep["y"], rep["x"], rep["d"], rep["markers"],
                              rep["wall"])
    B, T = y.shape
    h, w = wall.shape[1], wall.shape[2]
    wall_f = jnp.broadcast_to(wall.reshape(B, 1, h * w), (B, T, h * w))
    wall_f2 = wall_f.reshape(B * T, h * w)

    def clear(dy_tab, dx_tab):
        ok, _, _ = _clear_at(wall_f2, y.reshape(-1), x.reshape(-1),
                             d.reshape(-1), dy_tab, dx_tab, h, w)
        return ok.reshape(B, T)

    front = clear(jnp.asarray(_FRONT[:, 0]), jnp.asarray(_FRONT[:, 1]))
    left = clear(jnp.asarray(_LEFT[:, 0]), jnp.asarray(_LEFT[:, 1]))
    right = clear(jnp.asarray(_RIGHT[:, 0]), jnp.asarray(_RIGHT[:, 1]))
    here = jnp.take_along_axis(
        markers.reshape(B, T, h * w), (y * w + x)[:, :, None],
        axis=2)[:, :, 0]
    present = here > 0
    per = jnp.stack([front, left, right, present, ~present],
                    axis=-1).astype(jnp.float32)
    mask = (jnp.arange(T)[None, :] < demo_len[:, None]).astype(jnp.float32)
    return per * mask[:, :, None]


def _action_supervision(raw, row_len, action_space, num_action_tokens):
    """Rebuild the reference loader's quirky action one-hots on device
    (`dataset_karel.py:66-94`): real tokens AND the zero padding of the
    group's a_h matrix (argmax-decodes to 'move') are marked up to the
    per-ITEM padded row width, then <e> at exactly that width; rows beyond
    are all-zero (whose argmax is token 0).

    raw: (bs, k, T) int; row_len: (bs,) int.
    Returns (onehot (bs, k, T, A) float32, tokens (bs, k, T) int32).
    """
    bs, k, T = raw.shape
    t = jnp.arange(T)[None, None, :]
    rl = row_len[:, None, None]
    tok = jnp.where(t < rl, raw.astype(jnp.int32),
                    jnp.where(t == rl, num_action_tokens, 0))
    onehot = jax.nn.one_hot(tok, action_space, dtype=jnp.float32)
    onehot = onehot * (t <= rl)[..., None]
    tokens = jnp.argmax(onehot, axis=-1).astype(jnp.int32)
    return onehot, tokens


def is_compact(batch):
    return COMPACT_KEY in batch


def replay_seen(batch, cfg):
    """Replay the SEEN demos of a compact batch -> folded compact state dict
    (each leaf (bs*k, T, ...)) for the VM scorer."""
    bs, k = batch["c_wall"].shape[:2]

    def fold(a):
        return a.reshape((bs * k,) + a.shape[2:])

    return replay_actions(
        fold(batch["c_wall"]), fold(batch["c_marker"]),
        fold(batch["c_agent"]), fold(batch["c_a_raw"]),
        fold(batch["demo_len"]).astype(jnp.int32)), bs, k


def replay_test(batch, cfg):
    bs, tk = batch["test_c_wall"].shape[:2]

    def fold(a):
        return a.reshape((bs * tk,) + a.shape[2:])

    return replay_actions(
        fold(batch["test_c_wall"]), fold(batch["test_c_marker"]),
        fold(batch["test_c_agent"]), fold(batch["test_c_a_raw"]),
        fold(batch["test_demo_len"]).astype(jnp.int32)), bs, tk


def _program_onehot(out, batch, cfg):
    """program one-hot (bs, V, L), zero columns beyond program_len."""
    out["program_tokens"] = batch["program_tokens"].astype(jnp.int32)
    tok = out["program_tokens"]
    plen = batch["program_len"][:, 0].astype(jnp.int32)
    L = tok.shape[1]
    tmask = (jnp.arange(L)[None, :] < plen[:, None]).astype(jnp.float32)
    prog = jax.nn.one_hot(tok, cfg.dim_program_token,
                          dtype=jnp.float32) * tmask[..., None]
    out["program"] = jnp.transpose(prog, (0, 2, 1))


def expand_doom_batch(batch, cfg):
    """Device-cached ViZDoom batch -> full batch dict. Frames/percepts are
    already device-resident (train/device_cache.py gathers them from the
    HBM-cached dataset); only the program one-hot and the quirky action
    supervision are rebuilt here."""
    out = {key: batch[key] for key in
           ("program_len", "demo_len", "test_demo_len") if key in batch}
    _program_onehot(out, batch, cfg)
    out["s_h"] = batch["dc_s_h"]
    out["per"] = batch["dc_per"]
    out["a_h"], out["a_h_tokens"] = _action_supervision(
        batch["c_a_raw"].astype(jnp.int32),
        batch["c_a_row_len"][:, 0].astype(jnp.int32),
        cfg.action_space, cfg.action_space - 1)
    if "test_c_a_raw" in batch:
        out["test_a_h"], out["test_a_h_tokens"] = _action_supervision(
            batch["test_c_a_raw"].astype(jnp.int32),
            batch["test_c_a_row_len"][:, 0].astype(jnp.int32),
            cfg.action_space, cfg.action_space - 1)
    return out


def expand_batch(batch, cfg):
    """Compact wire batch -> the full batch dict the models/objective expect.
    No-op passthrough for full-wire batches. Runs inside jit: XLA fuses the
    one-hot/scatter rebuild into the consuming ops."""
    if "dc_s_h" in batch:
        return expand_doom_batch(batch, cfg)
    if not is_compact(batch):
        return batch
    out = {key: batch[key] for key in
           ("program_len", "demo_len", "test_demo_len")
           if key in batch}
    _program_onehot(out, batch, cfg)

    # seen demos: states + percepts by replay
    rep, bs, k = replay_seen(batch, cfg)
    dlen = batch["demo_len"].reshape(bs * k).astype(jnp.int32)
    s = assemble_states(rep, dlen)
    per = compute_percepts(rep, dlen)
    T = s.shape[1]
    out["s_h"] = s.reshape(bs, k, T, *s.shape[2:])
    out["per"] = per.reshape(bs, k, T, cfg.per_dim)

    out["a_h"], out["a_h_tokens"] = _action_supervision(
        batch["c_a_raw"].astype(jnp.int32),
        batch["c_a_row_len"][:, 0].astype(jnp.int32),
        cfg.action_space, cfg.action_space - 1)

    if "test_c_a_raw" in batch:
        out["test_a_h"], out["test_a_h_tokens"] = _action_supervision(
            batch["test_c_a_raw"].astype(jnp.int32),
            batch["test_c_a_row_len"][:, 0].astype(jnp.int32),
            cfg.action_space, cfg.action_space - 1)
    return out
