"""Unit tests for the host-side Karel world (reference karel_env/karel.py)."""

import numpy as np
import pytest

from demo2program_tpu.envs import (
    KarelWorld, KarelStateGenerator, NUM_STATE_CHANNELS)
from demo2program_tpu.envs.karel import KarelRuntimeError


def empty_room(h=8, w=8, y=4, x=4, d=1, markers=()):
    """Bordered empty room with the agent at (y, x) facing d."""
    s = np.zeros([h, w, NUM_STATE_CHANNELS], dtype=bool)
    s[0, :, 4] = s[h - 1, :, 4] = s[:, 0, 4] = s[:, w - 1, 4] = True
    s[y, x, d] = True
    s[:, :, 5] = True
    for (my, mx, count) in markers:
        s[my, mx, 5:] = False
        s[my, mx, 5 + count] = True
    return s


def test_move_east():
    w = KarelWorld(empty_room(y=4, x=4, d=1))
    w.state_transition(0)
    assert w.s[4, 5, 1] and not w.s[4, 4, :4].any()
    assert len(w.s_h) == 2 and w.a_h == [0]


def test_move_into_wall_raises_and_no_error_turns_180():
    w = KarelWorld(empty_room(y=1, x=4, d=0))  # facing north into border
    with pytest.raises(KarelRuntimeError):
        w.state_transition(0)

    w2 = KarelWorld(empty_room(y=1, x=4, d=0), make_error=False)
    w2.state_transition(0)
    # agent stays, now faces south; action still recorded
    assert w2.s[1, 4, 2] and w2.a_h == [0]


def test_turns():
    w = KarelWorld(empty_room(d=0))
    w.state_transition(1)  # left: north -> west
    assert w.d == 3
    w.state_transition(2)  # right: west -> north
    assert w.d == 0
    w.state_transition(2)  # right: north -> east
    assert w.d == 1


def test_markers_pick_put():
    w = KarelWorld(empty_room(y=4, x=4, markers=[(4, 4, 2)]))
    assert w.marker_present()
    w.state_transition(3)  # pick -> 1
    w.state_transition(3)  # pick -> 0
    assert w.no_marker_present()
    with pytest.raises(KarelRuntimeError):
        w.state_transition(3)  # underflow
    w.state_transition(4)  # put -> 1
    assert w.marker_count() == 1


def test_marker_overflow_at_nine():
    # parity quirk: cap is MAX_NUM_MARKER-1 == 9 (karel.py:174)
    w = KarelWorld(empty_room(y=4, x=4, markers=[(4, 4, 9)]))
    with pytest.raises(KarelRuntimeError):
        w.state_transition(4)
    w2 = KarelWorld(empty_room(y=4, x=4, markers=[(4, 4, 9)]),
                    make_error=False)
    w2.state_transition(4)
    assert w2.marker_count() == 9 and w2.a_h == [4]


def test_perception_vector():
    w = KarelWorld(empty_room(y=1, x=1, d=0))  # NW corner, facing north
    v = w.get_perception_vector()
    # front (north) wall, left (west) wall, right (east) clear, no markers
    assert list(v) == [False, False, True, False, True]


def test_state_generator_valid_states():
    gen = KarelStateGenerator(seed=123)
    for _ in range(20):
        s, y, x, num_wall, num_marker = gen.generate_single_state()
        assert s.shape == (8, 8, NUM_STATE_CHANNELS)
        # exactly one agent, not on a wall
        assert s[:, :, :4].sum() == 1 and not s[y, x, 4]
        # marker channels are one-hot per cell
        assert (s[:, :, 5:].sum(axis=-1) == 1).all()
        # border is wall
        assert s[0, :, 4].all() and s[:, 0, 4].all()
        w = KarelWorld(s)  # constructible
        assert (w.y, w.x) == (y, x)
