"""ViZDoom DSL layer tests with a fake (engine-free) world."""

import numpy as np
import pytest

from demo2program_tpu.dsl import (vizdoom_canonical, vizdoom_interp,
                                  vizdoom_parser)
from demo2program_tpu.dsl.vizdoom_sampler import (
    DoomProgramGenerator, DoomProgramGeneratorIfElse)
from demo2program_tpu.dsl.vizdoom_vocab import VizDoomDSLVocab
from demo2program_tpu.envs.vizdoom import (
    in_target, perception_vector_cond, VizdoomEngineUnavailable)


class FakeDoomWorld:
    """Engine-free world: monsters exist until attacked; scripted percepts."""

    def __init__(self, demons=2, target="Demon"):
        self.counts = {"Demon": demons, "HellKnight": 1, "Revenant": 0,
                       "MyAmmo": 3}
        self.target = target
        self.a_h = []
        self.s_h = [0]

    def state_transition(self, action):
        self.a_h.append(action)
        self.s_h.append(len(self.s_h))
        if action == "ATTACK" and self.counts[self.target] > 0:
            self.counts[self.target] -= 1

    def is_there(self, actor):
        return self.counts.get(actor, 0) > 0

    def in_target(self, actor):
        return actor == self.target and self.counts[actor] > 0

    def exist_actor_in_distance_horizontal(self, actor, dist, horz):
        return self.counts.get(actor, 0) > 0

    def get_perception_vector(self):
        return np.array([self.is_there(a)
                         for a in ["Demon", "HellKnight", "Revenant"]])


def test_vocab_variants():
    v_simple = VizDoomDSLVocab(perception_type="simple")
    assert "ISTHERE" in v_simple.token2int
    assert "EXIST" not in v_simple.token2int
    assert len(v_simple.action_int2token) == 11
    v_clear = VizDoomDSLVocab(perception_type="clear")
    assert "EXIST" in v_clear.token2int
    assert "mid_far" in v_clear.token2int       # clear-distance vocab
    assert "doncare_dist" not in v_clear.token2int
    v_level = VizDoomDSLVocab(level="simple")
    assert "REPEAT" not in v_level.token2int
    assert len(v_level.action_int2token) == 7
    v_basic = VizDoomDSLVocab(perception_type="basic")
    assert "doncare_dist" in v_basic.token2int
    code = "DEF run m( IF c( ISTHERE Demon c) i( ATTACK i) m)"
    assert v_simple.intseq2str(v_simple.str2intseq(code)) == code
    # end token 'm)' is id 3 in every variant
    for v in (v_simple, v_clear, v_level, v_basic):
        assert v.token2int["m)"] == 3


def test_parse_roundtrip_and_rejects():
    from demo2program_tpu.dsl import vizdoom_ast as D
    good = [
        "DEF run m( MOVE_FORWARD ATTACK m)",
        "DEF run m( WHILE c( ISTHERE Demon c) w( ATTACK w) m)",
        "DEF run m( IF c( EXIST Demon IN far left c) i( TURN_LEFT i) m)",
        "DEF run m( IFELSE c( not c( INTARGET HellKnight c) c) "
        "i( TURN_RIGHT i) ELSE e( ATTACK e) m)",
        "DEF run m( REPEAT R=3 r( MOVE_LEFT r) m)",
    ]
    for code in good:
        ast, ok = vizdoom_parser.parse(code)
        assert ok, code
        assert " ".join(D.to_tokens(ast)) == code
    bad = [
        "DEF run m( m)",
        "DEF run m( ATTACK",
        "DEF run m( EXIST Demon IN far left m)",     # percept as stmt
        "DEF run m( IF c( ATTACK c) i( ATTACK i) m)",
        "DEF run m( IF c( EXIST Demon IN far c) i( ATTACK i) m)",
    ]
    for code in bad:
        _, ok = vizdoom_parser.parse(code)
        assert not ok, code


def test_interp_kills_all_demons():
    w = FakeDoomWorld(demons=2)
    ok, n, success = vizdoom_interp.run_string(
        w, "DEF run m( WHILE c( ISTHERE Demon c) w( ATTACK w) m)")
    assert ok and success
    assert w.a_h == ["ATTACK", "ATTACK"]
    assert w.counts["Demon"] == 0


def test_interp_budget_matches_karel_semantics():
    # infinite loop: Revenant never exists -> ISTHERE HellKnight stays true
    w = FakeDoomWorld()
    ok, n, success = vizdoom_interp.run_string(
        w, "DEF run m( WHILE c( ISTHERE HellKnight c) w( TURN_LEFT w) m)")
    assert ok and not success
    assert len(w.a_h) == 98  # identical budget accounting to Karel
    assert n == 101


def test_canonical_vizdoom():
    c, ok = vizdoom_canonical.parse(
        "DEF run m( WHILE c( ISTHERE Demon c) w( ATTACK w) m)")
    assert ok
    assert c == ["if", "is_there", "Demon", "ATTACK"] * 1000  # MAX_WHILE
    a = ("DEF run m( IFELSE c( not c( ISTHERE Demon c) c) i( ATTACK i) "
         "ELSE e( ATTACK e) m)")
    assert vizdoom_canonical.programs_equal(a, "DEF run m( ATTACK m)")


def test_sampler_percept_balance_and_validity():
    percepts = ["ISTHERE Demon", "ISTHERE HellKnight", "ISTHERE Revenant"]
    gen = DoomProgramGenerator(seed=0)
    # Demon present in half the worlds (balanced), HellKnight always present,
    # Revenant never: the balance-squared rule must put all mass on Demon
    worlds = [FakeDoomWorld(demons=i % 2) for i in range(4)]
    prob = gen.compute_percepts_prob(worlds)
    assert prob[0] > 0.99 and prob[1] < 1e-6 and prob[2] < 1e-6
    accepted = 0
    for trial in range(40):
        ws = [FakeDoomWorld(demons=(i % 2) + 1) for i in range(4)]
        code, ok = gen.random_code(percepts, ws)
        if not ok:
            continue
        accepted += 1
        _, pok = vizdoom_parser.parse(code)
        assert pok, code
    assert accepted > 0

    gen2 = DoomProgramGeneratorIfElse(seed=1)
    ws = [FakeDoomWorld(demons=2)]
    code, ok = gen2.random_code(percepts, ws)
    if ok:
        assert code.split()[3] == "IFELSE"


def test_engine_free_perception_math():
    class Box:
        def __init__(self, x, y, w, h):
            self.x, self.y, self.width, self.height = x, y, w, h

    assert in_target([Box(30, 30, 20, 20)], 80, 80)       # crosshair inside
    assert not in_target([Box(0, 0, 10, 10)], 80, 80)
    vec = perception_vector_cond("more_simple")
    assert vec == ["ISTHERE Demon", "ISTHERE HellKnight",
                   "ISTHERE Revenant"]
    vec2 = perception_vector_cond("simple")
    assert len(vec2) == 6 and vec2[3] == "INTARGET Demon"


def test_engine_selection():
    """engine='vizdoom' requires the real package (absent here and raises a
    clear message); the default 'auto' falls back to the built-in DoomLite
    software engine."""
    from demo2program_tpu.envs.doomlite import DoomGame
    from demo2program_tpu.envs.vizdoom import Vizdoom_env
    with pytest.raises(VizdoomEngineUnavailable):
        Vizdoom_env(engine="vizdoom")
    w = Vizdoom_env()
    assert isinstance(w.game, DoomGame)
