"""Equivalence tests: on-device Karel VM vs the exact-semantics host
interpreter (the correctness keystone of execution-accuracy scoring)."""

import numpy as np
import jax.numpy as jnp
import pytest

from demo2program_tpu.dsl import karel_interp, karel_parser
from demo2program_tpu.dsl.karel_bytecode import (
    compile_ast, compile_tokens, DEFAULT_MAX_CODE_LEN)
from demo2program_tpu.dsl.karel_sampler import KarelProgramSampler
from demo2program_tpu.dsl.karel_vocab import KarelVocab
from demo2program_tpu.envs import KarelWorld, KarelStateGenerator
from demo2program_tpu.ops import vm
from demo2program_tpu.ops.grids import decode_states

from tests.test_karel_env import empty_room

H = W = 8


def _decode_np(s):
    """numpy version of grids.decode_states for a single (h, w, 16) state."""
    ys, xs, ds = np.where(s[:, :, :4])
    if len(ys):
        y, x, d = int(ys[0]), int(xs[0]), int(ds[0])
    else:
        y = x = d = 0
    markers = np.argmax(s[:, :, 5:], axis=-1).astype(np.int32)
    return y, x, d, markers


def _build_vm_inputs(cases, make_error=True):
    """cases: list of (code_str, s0). Runs the host interpreter to produce
    target demos, then assembles batched VM inputs."""
    B = len(cases)
    host = []
    T = 1
    for code_str, s0 in cases:
        world = KarelWorld(s0.copy(), make_error=make_error)
        ast, ok = karel_parser.parse(code_str)
        assert ok
        n, success = karel_interp.execute(ast, world)
        host.append((n, success, world.s_h))
        if success:
            T = max(T, len(world.s_h))

    codes = np.zeros([B, DEFAULT_MAX_CODE_LEN, 2], np.int32)
    wall = np.zeros([B, H, W], bool)
    y0 = np.zeros(B, np.int32)
    x0 = np.zeros(B, np.int32)
    d0 = np.zeros(B, np.int32)
    m0 = np.zeros([B, H, W], np.int32)
    dy = np.zeros([B, T], np.int32)
    dx = np.zeros([B, T], np.int32)
    dd = np.zeros([B, T], np.int32)
    dm = np.zeros([B, T, H, W], np.int32)
    dlen = np.zeros(B, np.int32)

    for i, (code_str, s0) in enumerate(cases):
        ast, _ = karel_parser.parse(code_str)
        codes[i] = compile_ast(ast, DEFAULT_MAX_CODE_LEN)
        wall[i] = s0[:, :, 4]
        y0[i], x0[i], d0[i], m0[i] = _decode_np(s0)
        n, success, s_h = host[i]
        if success:
            dlen[i] = len(s_h)
            for t, st in enumerate(s_h[:T]):
                dy[i, t], dx[i, t], dd[i, t], dm[i, t] = _decode_np(st)
        else:
            dlen[i] = 1
    out = vm.run_and_compare(
        jnp.asarray(codes), jnp.asarray(wall), jnp.asarray(y0),
        jnp.asarray(x0), jnp.asarray(d0), jnp.asarray(m0), jnp.asarray(dy),
        jnp.asarray(dx), jnp.asarray(dd), jnp.asarray(dm), jnp.asarray(dlen),
        make_error=make_error, h=H, w=W)
    return host, {k: np.asarray(v) for k, v in out.items()}


def test_vm_simple_program_matches():
    s0 = empty_room(y=4, x=1, d=1)
    host, out = _build_vm_inputs(
        [("DEF run m( WHILE c( frontIsClear c) w( move w) m)", s0)])
    n, success, s_h = host[0]
    assert out["success"][0] == success
    assert out["n"][0] == n
    assert out["correct"][0]
    assert out["exe_len"][0] == len(s_h)


def test_vm_budget_exhaustion_matches_host():
    s0 = empty_room(y=4, x=4, d=1)
    host, out = _build_vm_inputs(
        [("DEF run m( WHILE c( frontIsClear c) w( turnLeft w) m)", s0)])
    n, success, _ = host[0]
    assert not success and not out["success"][0]
    assert out["n"][0] == n == 101


def test_vm_env_error_matches_host():
    s0 = empty_room(y=1, x=4, d=0)  # facing the north wall
    host, out = _build_vm_inputs([("DEF run m( move m)", s0)])
    assert not host[0][1] and not out["success"][0]
    # pickMarker with no markers
    host, out = _build_vm_inputs([("DEF run m( pickMarker m)",
                                   empty_room())])
    assert not host[0][1] and not out["success"][0]
    # putMarker on a 9-marker cell (cap quirk)
    host, out = _build_vm_inputs(
        [("DEF run m( putMarker m)", empty_room(markers=[(4, 4, 9)]))])
    assert not host[0][1] and not out["success"][0]


def test_vm_no_error_mode():
    # blocked move turns 180 and is recorded
    s0 = empty_room(y=1, x=4, d=0)
    host, out = _build_vm_inputs(
        [("DEF run m( move move m)", s0)], make_error=False)
    n, success, s_h = host[0]
    assert success and out["success"][0]
    assert out["correct"][0]
    assert out["exe_len"][0] == len(s_h) == 3


def test_vm_wrong_program_is_incorrect():
    """VM initialized with demo from program A but executing program B must
    report correct=False."""
    s0 = empty_room(y=4, x=4, d=1)
    world = KarelWorld(s0.copy())
    ast_a, _ = karel_parser.parse("DEF run m( move move m)")
    karel_interp.execute(ast_a, world)
    T = len(world.s_h)
    dy = np.zeros([1, T], np.int32)
    dx = np.zeros([1, T], np.int32)
    dd = np.zeros([1, T], np.int32)
    dm = np.zeros([1, T, H, W], np.int32)
    for t, st in enumerate(world.s_h):
        dy[0, t], dx[0, t], dd[0, t], dm[0, t] = _decode_np(st)

    ast_b, _ = karel_parser.parse("DEF run m( move turnLeft m)")
    codes = compile_ast(ast_b)[None]
    y0, x0, d0, m0 = _decode_np(s0)
    out = vm.run_and_compare(
        jnp.asarray(codes), jnp.asarray(s0[:, :, 4][None]),
        jnp.asarray([y0]), jnp.asarray([x0]), jnp.asarray([d0]),
        jnp.asarray(m0[None]), jnp.asarray(dy), jnp.asarray(dx),
        jnp.asarray(dd), jnp.asarray(dm), jnp.asarray([T]),
        make_error=True, h=H, w=W)
    assert bool(out["success"][0])          # program B itself runs fine
    assert not bool(out["correct"][0])      # but doesn't reproduce demo A
    # same-length rollouts with different final state must be caught
    assert int(out["exe_len"][0]) == T


def test_vm_property_random_programs_match_host():
    """The big one: across random programs x random states, VM (success, n,
    exe_len, correct) must bit-match the host interpreter."""
    sampler = KarelProgramSampler(seed=3)
    sgen = KarelStateGenerator(seed=3)
    vocab = KarelVocab()
    cases = []
    while len(cases) < 64:
        code = sampler.random_code()
        ids = vocab.str2intseq(code)
        _, ok = compile_tokens(ids, vocab)
        if not ok:
            continue
        s0, *_ = sgen.generate_single_state()
        cases.append((code, s0))

    host, out = _build_vm_inputs(cases)
    n_success = 0
    for i, (n, success, s_h) in enumerate(host):
        assert out["success"][i] == success, cases[i][0]
        assert out["n"][i] == n, (cases[i][0], out["n"][i], n)
        if success:
            n_success += 1
            assert out["exe_len"][i] == len(s_h), cases[i][0]
            assert out["correct"][i], cases[i][0]
    assert n_success >= 10  # sanity: the property actually exercised demos


def test_compile_rejects_garbage():
    vocab = KarelVocab()
    _, ok = compile_tokens([4, 4, 4], vocab)  # "move move move" w/o wrapper
    assert not ok
    _, ok = compile_tokens([], vocab)
    assert not ok


def test_decode_states_roundtrip():
    s0 = empty_room(y=2, x=5, d=3, markers=[(3, 3, 7)])
    dec = decode_states(jnp.asarray(s0[None]))
    assert (int(dec["y"][0]), int(dec["x"][0]), int(dec["d"][0])) == (2, 5, 3)
    assert int(dec["markers"][0][3, 3]) == 7
    assert bool(dec["wall"][0][0, 0])
