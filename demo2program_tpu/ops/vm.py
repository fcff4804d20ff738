"""Vectorized on-device Karel VM.

Executes a batch of compiled programs (dsl/karel_bytecode.py) against a batch
of initial grid states entirely on-device, comparing the produced state
sequence online against target demonstrations. This replaces the reference's
per-element Python rollouts inside tf.py_func (`model_full.py:747-787`) —
the single largest host/device boundary crossing in the reference's eval
path — with one `lax.while_loop` over (batch x k) parallel machines whose
per-step work is pure VPU-friendly vector arithmetic on (B,) scalars and
(B, h*w) grids.

Semantics (action effects, error modes, call budget) bit-match the host
interpreter dsl/karel_interp.py — property-tested in tests/test_vm.py.

Execution-accuracy contract (reference `model_full.py:892-916`): a rollout is
correct iff the program halts within budget without environment errors AND
its state-history length equals the demo length AND every state matches.
The caller ORs with exact-sequence-match and gates on syntax correctness,
as the reference does.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from demo2program_tpu.dsl.karel_bytecode import (
    OP_HALT, OP_BUDGET, OP_INC, OP_ACT, OP_EVAL, OP_NEGC, OP_JMP, OP_JMPF,
    OP_PUSHCTR, OP_JZDEC, MAX_LOOP_DEPTH)
from demo2program_tpu.dsl.karel_interp import MAX_FUNC_CALL

# facing: 0 N, 1 E, 2 S, 3 W (reference karel.py:66-91)
_FRONT = np.array([[-1, 0], [0, 1], [1, 0], [0, -1]], dtype=np.int32)
_LEFT = np.array([[0, -1], [-1, 0], [0, 1], [1, 0]], dtype=np.int32)
_RIGHT = np.array([[0, 1], [1, 0], [0, -1], [-1, 0]], dtype=np.int32)

MAX_MARKER_CAP = 9  # reference karel.py:174 quirk: put fails at >9


def _gather_cell(flat, y, x, w):
    """flat: (B, h*w); y/x: (B,) -> (B,) values at clamped (y, x)."""
    idx = y * w + x
    return jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]


@functools.partial(
    jax.jit, static_argnames=("make_error", "h", "w", "max_steps"))
def run_and_compare(code, wall, y0, x0, d0, markers0,
                    demo_y, demo_x, demo_d, demo_markers, demo_len,
                    *, make_error=True, h=8, w=8, max_steps=None):
    """Run B programs and compare their rollouts to B target demos.

    Args:
      code:         (B, L, 2) int32 bytecode
      wall:         (B, h, w) bool
      y0/x0/d0:     (B,) int32 initial agent pose
      markers0:     (B, h, w) int32 initial marker counts
      demo_y/x/d:   (B, T) int32 per-step target agent pose
      demo_markers: (B, T, h, w) int32 per-step target marker grids
      demo_len:     (B,) int32 target state-history lengths (incl. initial)
      make_error:   env error mode (env_type != 'no_error')

    Returns dict:
      correct:  (B,) bool — halted ok, length matches, all states match
      success:  (B,) bool — halted within budget without env errors
      exe_len:  (B,) int32 — produced state-history length
    """
    B, L, _ = code.shape
    T = demo_y.shape[1]
    if max_steps is None:
        max_steps = (MAX_FUNC_CALL + 2) * L

    wall_f = wall.reshape(B, h * w)
    markers_f = markers0.reshape(B, h * w).astype(jnp.int32)
    demo_markers_f = demo_markers.reshape(B, T, h * w).astype(jnp.int32)

    bidx = jnp.arange(B)
    front_dy = jnp.asarray(_FRONT[:, 0])
    front_dx = jnp.asarray(_FRONT[:, 1])
    left_dy = jnp.asarray(_LEFT[:, 0])
    left_dx = jnp.asarray(_LEFT[:, 1])
    right_dy = jnp.asarray(_RIGHT[:, 0])
    right_dx = jnp.asarray(_RIGHT[:, 1])

    state = dict(
        pc=jnp.zeros(B, jnp.int32),
        n=jnp.zeros(B, jnp.int32),
        cflag=jnp.zeros(B, jnp.bool_),
        fail=jnp.zeros(B, jnp.bool_),
        halt=jnp.zeros(B, jnp.bool_),
        y=y0.astype(jnp.int32), x=x0.astype(jnp.int32),
        d=d0.astype(jnp.int32),
        markers=markers_f,
        t=jnp.ones(B, jnp.int32),          # history length incl. initial
        match=jnp.ones(B, jnp.bool_),
        ctr=jnp.zeros((B, MAX_LOOP_DEPTH), jnp.int32),
        sp=jnp.zeros(B, jnp.int32),
        steps=jnp.zeros((), jnp.int32),
    )

    def _clear_at(s, dy_tab, dx_tab):
        ny = s["y"] + dy_tab[s["d"]]
        nx = s["x"] + dx_tab[s["d"]]
        inb = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
        nyc = jnp.clip(ny, 0, h - 1)
        nxc = jnp.clip(nx, 0, w - 1)
        blocked = _gather_cell(wall_f, nyc, nxc, w)
        return inb & ~blocked, nyc, nxc

    def cond_fn(s):
        running = ~(s["fail"] | s["halt"])
        return jnp.any(running) & (s["steps"] < max_steps)

    def body_fn(s):
        active = ~(s["fail"] | s["halt"])
        instr = jnp.take_along_axis(
            code, s["pc"][:, None, None], axis=1)[:, 0, :]
        op, arg = instr[:, 0], instr[:, 1]

        # ---- budget ----
        is_budget = op == OP_BUDGET
        is_inc = op == OP_INC
        n_new = s["n"] + jnp.where(is_budget | is_inc, arg, 0)
        fail_budget = is_budget & (n_new > MAX_FUNC_CALL)

        # ---- percepts ----
        front_ok, fy, fx = _clear_at(s, front_dy, front_dx)
        left_ok, _, _ = _clear_at(s, left_dy, left_dx)
        right_ok, _, _ = _clear_at(s, right_dy, right_dx)
        here = _gather_cell(s["markers"], s["y"], s["x"], w)
        markers_present = here > 0

        is_eval = op == OP_EVAL
        pv = jnp.select(
            [arg == 0, arg == 1, arg == 2, arg == 3],
            [front_ok, left_ok, right_ok, markers_present],
            ~markers_present)
        cflag = jnp.where(is_eval, pv,
                          jnp.where(op == OP_NEGC, ~s["cflag"], s["cflag"]))

        # ---- actions ----
        is_act = op == OP_ACT
        a_move = is_act & (arg == 0)
        a_turn = is_act & ((arg == 1) | (arg == 2))
        a_pick = is_act & (arg == 3)
        a_put = is_act & (arg == 4)

        move_err = a_move & ~front_ok
        pick_err = a_pick & (here <= 0)
        put_err = a_put & (here >= MAX_MARKER_CAP)
        act_err = move_err | pick_err | put_err

        if make_error:
            fail_act = act_err
            recorded = is_act & ~act_err
        else:
            fail_act = jnp.zeros_like(act_err)
            recorded = is_act  # failed moves turn 180 and are recorded

        do_move = a_move & front_ok
        y_new = jnp.where(do_move, fy, s["y"])
        x_new = jnp.where(do_move, fx, s["x"])
        # turns: left d-1, right d+1 (karel.py:156-161); blocked move in
        # no-error mode turns 180 (karel.py:150-154)
        d_new = jnp.where(
            a_turn, (s["d"] + jnp.where(arg == 1, -1, 1)) % 4, s["d"])
        if not make_error:
            d_new = jnp.where(move_err, (s["d"] + 2) % 4, d_new)

        delta = jnp.where(a_pick & (here > 0), -1,
                          jnp.where(a_put & (here < MAX_MARKER_CAP), 1, 0))
        cell = s["y"] * w + s["x"]
        markers_new = s["markers"].at[bidx, cell].add(
            jnp.where(recorded, delta, 0))

        # ---- record + online compare ----
        tc = jnp.clip(s["t"], 0, T - 1)
        same_pose = ((y_new == jnp.take_along_axis(
                          demo_y, tc[:, None], 1)[:, 0])
                     & (x_new == jnp.take_along_axis(
                          demo_x, tc[:, None], 1)[:, 0])
                     & (d_new == jnp.take_along_axis(
                          demo_d, tc[:, None], 1)[:, 0]))
        target_markers = jnp.take_along_axis(
            demo_markers_f, tc[:, None, None], axis=1)[:, 0, :]
        same_markers = jnp.all(markers_new == target_markers, axis=1)
        in_range = s["t"] < demo_len
        step_match = jnp.where(recorded,
                               in_range & same_pose & same_markers, True)
        t_new = s["t"] + jnp.where(recorded, 1, 0)

        # ---- control flow ----
        sp_top = jnp.clip(s["sp"] - 1, 0, MAX_LOOP_DEPTH - 1)
        top = s["ctr"][bidx, sp_top]
        is_push = op == OP_PUSHCTR
        is_jz = op == OP_JZDEC
        jz_exit = is_jz & (top == 0)

        pc_new = s["pc"] + 1
        pc_new = jnp.where(op == OP_JMP, arg, pc_new)
        pc_new = jnp.where((op == OP_JMPF) & ~cflag, arg, pc_new)
        pc_new = jnp.where(jz_exit, arg, pc_new)

        sp_push = jnp.clip(s["sp"], 0, MAX_LOOP_DEPTH - 1)
        ctr_new = s["ctr"].at[bidx, sp_push].set(
            jnp.where(is_push, arg, s["ctr"][bidx, sp_push]))
        ctr_new = ctr_new.at[bidx, sp_top].add(
            jnp.where(is_jz & ~jz_exit, -1, 0))
        sp_new = s["sp"] + jnp.where(is_push, 1, jnp.where(jz_exit, -1, 0))

        fail_now = active & (fail_budget | fail_act)
        halt_now = active & (op == OP_HALT)

        def upd(old, new):
            return jnp.where(active & ~fail_now, new, old)

        return dict(
            pc=upd(s["pc"], pc_new),
            n=jnp.where(active, n_new, s["n"]),
            cflag=upd(s["cflag"], cflag),
            fail=s["fail"] | fail_now,
            halt=s["halt"] | (halt_now & ~fail_now),
            y=upd(s["y"], y_new), x=upd(s["x"], x_new),
            d=upd(s["d"], d_new),
            markers=jnp.where((active & ~fail_now)[:, None],
                              markers_new, s["markers"]),
            t=upd(s["t"], t_new),
            match=s["match"] & jnp.where(active & ~fail_now,
                                         step_match, True),
            ctr=jnp.where((active & ~fail_now)[:, None], ctr_new, s["ctr"]),
            sp=upd(s["sp"], sp_new),
            steps=s["steps"] + 1,
        )

    s = jax.lax.while_loop(cond_fn, body_fn, state)

    success = s["halt"] & ~s["fail"]
    correct = success & s["match"] & (s["t"] == demo_len)
    return {"correct": correct, "success": success, "exe_len": s["t"],
            "n": s["n"]}
