"""Unit + property tests for the Karel DSL layer (vocab/parser/interp/
canonicalizer/sampler) against the reference semantics in
karel_env/dsl/*."""

import numpy as np
import pytest

from demo2program_tpu.dsl import karel_ast as A
from demo2program_tpu.dsl import karel_canonical, karel_interp, karel_parser
from demo2program_tpu.dsl.karel_vocab import KarelVocab
from demo2program_tpu.dsl.karel_sampler import KarelProgramSampler
from demo2program_tpu.envs import KarelWorld, KarelStateGenerator

from tests.test_karel_env import empty_room


def test_vocab_exact_ordering():
    v = KarelVocab()
    assert len(v.int2token) == 50
    # spot-check the reference ordering (dsl_base.py:49-60 over
    # dsl_prob.py:13-28)
    assert v.int2token[0] == "DEF"
    assert v.int2token[1] == "run"
    assert v.int2token[2] == "m("
    assert v.int2token[3] == "m)"
    assert v.int2token[4] == "move"
    assert v.int2token[5] == "turnRight"
    assert v.int2token[6] == "turnLeft"
    assert v.int2token[7] == "pickMarker"
    assert v.int2token[8] == "putMarker"
    assert v.int2token[9] == "r("
    assert v.int2token[11] == "R=0"
    assert v.int2token[30] == "R=19"
    assert v.int2token[31] == "REPEAT"
    assert v.int2token[38] == "IF"
    assert v.int2token[39] == "IFELSE"
    assert v.int2token[40] == "ELSE"
    assert v.int2token[41] == "frontIsClear"
    assert v.int2token[45] == "noMarkersPresent"
    assert v.int2token[46] == "not"
    assert v.int2token[49] == "WHILE"
    code = "DEF run m( move m)"
    assert v.intseq2str(v.str2intseq(code)) == code


SIMPLE = "DEF run m( move move turnLeft m)"
NESTED = ("DEF run m( WHILE c( frontIsClear c) w( move w) "
          "IF c( markersPresent c) i( pickMarker i) m)")


def test_parse_roundtrip():
    for code in [SIMPLE, NESTED,
                 "DEF run m( REPEAT R=3 r( putMarker r) m)",
                 "DEF run m( IFELSE c( not c( leftIsClear c) c) "
                 "i( turnLeft i) ELSE e( turnRight e) m)"]:
        ast, ok = karel_parser.parse(code)
        assert ok, code
        assert " ".join(A.to_tokens(ast)) == code


def test_parse_accepts_nested_not():
    # the runtime parser rule `not c( cond c)` nests (dsl_parse.py:139)
    code = ("DEF run m( IF c( not c( not c( frontIsClear c) c) c) "
            "i( move i) m)")
    _, ok = karel_parser.parse(code)
    assert ok


@pytest.mark.parametrize("bad", [
    "DEF run m( m)",                      # empty body
    "DEF run m( move",                    # unterminated
    "run m( move m)",                     # missing DEF
    "DEF run m( R=3 m)",                  # int where stmt expected
    "DEF run m( IF c( move c) i( move i) m)",   # action as condition
    "DEF run m( REPEAT R=25 r( move r) m)",     # int out of range
    "DEF run m( move m) move",            # trailing tokens
])
def test_parse_rejects(bad):
    _, ok = karel_parser.parse(bad)
    assert not ok


def test_seq_left_associativity():
    ast, ok = karel_parser.parse("DEF run m( move turnLeft putMarker m)")
    assert ok
    body = ast.body
    assert isinstance(body, A.Seq)
    assert isinstance(body.first, A.Seq)          # ((a b) c)
    assert isinstance(body.second, A.Action)
    assert body.second.token == "putMarker"


def test_interp_simple_actions():
    w = KarelWorld(empty_room(y=4, x=4, d=1))
    ok, n, success = karel_interp.run_string(w, SIMPLE)
    assert ok and success
    assert w.a_h == [0, 0, 1]
    assert (w.y, w.x, w.d) == (4, 6, 0)
    assert len(w.s_h) == 4  # initial + 3 actions


def test_interp_while_until_wall():
    w = KarelWorld(empty_room(y=4, x=1, d=1))  # facing east from col 1
    code = "DEF run m( WHILE c( frontIsClear c) w( move w) m)"
    ok, n, success = karel_interp.run_string(w, code)
    assert ok and success
    assert w.x == 6 and w.a_h == [0] * 5  # walked to the east wall


def test_interp_budget_exhaustion_semantics():
    """Infinite while loop fails with exactly 98 recorded actions — locks in
    the reference call-budget accounting (dsl_parse.py, MAX_FUNC_CALL=100)."""
    w = KarelWorld(empty_room(y=4, x=4, d=1))
    code = "DEF run m( WHILE c( frontIsClear c) w( turnLeft w) m)"
    ok, n, success = karel_interp.run_string(w, code)
    assert ok and not success
    assert len(w.a_h) == 98


def test_interp_error_propagates_as_failure():
    w = KarelWorld(empty_room(y=1, x=4, d=0))  # facing north wall
    ok, n, success = karel_interp.run_string(w, "DEF run m( move m)")
    assert ok and not success
    assert w.a_h == []  # failed action not recorded


def test_interp_repeat_and_ifelse():
    w = KarelWorld(empty_room(y=4, x=4))
    code = "DEF run m( REPEAT R=4 r( putMarker pickMarker r) m)"
    ok, n, success = karel_interp.run_string(w, code)
    assert ok and success and w.a_h == [4, 3] * 4

    w2 = KarelWorld(empty_room(y=4, x=4))
    code2 = ("DEF run m( IFELSE c( markersPresent c) i( pickMarker i) "
             "ELSE e( putMarker e) m)")
    ok, _, success = karel_interp.run_string(w2, code2)
    assert ok and success and w2.a_h == [4]


def test_interp_repeat_zero():
    w = KarelWorld(empty_room())
    ok, n, success = karel_interp.run_string(
        w, "DEF run m( REPEAT R=0 r( move r) turnLeft m)")
    assert ok and success and w.a_h == [1]


def test_canonical_noMarkers_and_double_negation():
    c1, ok1 = karel_canonical.parse(
        "DEF run m( IF c( noMarkersPresent c) i( move i) m)")
    c2, ok2 = karel_canonical.parse(
        "DEF run m( IF c( not c( markersPresent c) c) i( move i) m)")
    assert ok1 and ok2 and c1 == c2 == ["if", "not", "markersPresent", "move"]


def test_canonical_ifelse_rewrite():
    # same condition spelled via noMarkersPresent vs not-markersPresent
    a = ("DEF run m( IFELSE c( noMarkersPresent c) i( move i) "
         "ELSE e( turnLeft e) m)")
    b = ("DEF run m( IFELSE c( not c( markersPresent c) c) i( move i) "
         "ELSE e( turnLeft e) m)")
    assert karel_canonical.programs_equal(a, b)
    c, ok = karel_canonical.parse(a)
    assert ok and c == ["if", "not", "markersPresent", "move",
                        "if", "markersPresent", "turnLeft"]

    # reference quirk: flipping the condition AND swapping branches changes
    # the emission ORDER of the two if-blocks (dsl_enum_program.py:64-79), so
    # the reference judges semantically-identical programs unequal. Locked in.
    d = ("DEF run m( IFELSE c( frontIsClear c) i( move i) "
         "ELSE e( turnLeft e) m)")
    e = ("DEF run m( IFELSE c( not c( frontIsClear c) c) i( turnLeft i) "
         "ELSE e( move e) m)")
    assert not karel_canonical.programs_equal(d, e)


def test_canonical_ifelse_same_branches_collapse():
    a = "DEF run m( IFELSE c( frontIsClear c) i( move i) ELSE e( move e) m)"
    b = "DEF run m( move m)"
    assert karel_canonical.programs_equal(a, b)


def test_canonical_while_unrolls_100x():
    c, ok = karel_canonical.parse(
        "DEF run m( WHILE c( frontIsClear c) w( move w) m)")
    assert ok
    assert c == ["if", "frontIsClear", "move"] * 100


def test_canonical_repeat_expansion():
    c, ok = karel_canonical.parse(
        "DEF run m( REPEAT R=3 r( putMarker r) m)")
    assert ok and c == ["putMarker"] * 3


def test_canonical_too_large_is_graceful():
    # 4 nested whiles -> 100^4 * tokens: must not OOM, must still compare
    code = ("DEF run m( WHILE c( frontIsClear c) w( WHILE c( frontIsClear c)"
            " w( WHILE c( frontIsClear c) w( WHILE c( frontIsClear c)"
            " w( move w) w) w) w) m)")
    out, ok = karel_canonical.parse(code)
    assert not ok and out is None
    assert karel_canonical.programs_equal(code, code)  # token-identical


def test_sampler_programs_parse_and_respect_limits():
    sampler = KarelProgramSampler(seed=123)
    vocab = KarelVocab()
    for _ in range(200):
        code = sampler.random_code(max_depth=6, max_nesting_depth=4)
        ast, ok = karel_parser.parse(code)
        assert ok, code
        # every token is in vocab
        assert all(t in vocab.token2int for t in code.split())


def test_property_random_program_self_consistency():
    """Random program -> demo; re-executing the program from the same initial
    state reproduces the exact state/action history (the execution-accuracy
    oracle, SURVEY.md §4.1)."""
    sampler = KarelProgramSampler(seed=7)
    sgen = KarelStateGenerator(seed=7)
    checked = 0
    attempts = 0
    while checked < 30 and attempts < 500:
        attempts += 1
        code = sampler.random_code()
        s0, *_ = sgen.generate_single_state()
        w1 = KarelWorld(s0.copy())
        ok, _, success = karel_interp.run_string(w1, code)
        assert ok
        if not success or not (2 <= len(w1.s_h) <= 20):
            continue
        w2 = KarelWorld(s0.copy())
        ok2, _, success2 = karel_interp.run_string(w2, code)
        assert ok2 and success2
        assert w1.a_h == w2.a_h
        assert len(w1.s_h) == len(w2.s_h)
        for a, b in zip(w1.s_h, w2.s_h):
            assert (a == b).all()
        checked += 1
    assert checked >= 10
