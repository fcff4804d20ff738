"""Syntax oracle + constrained decoding tests."""

import jax
import numpy as np
import pytest

from demo2program_tpu.dsl import karel_parser
from demo2program_tpu.dsl.karel_sampler import KarelProgramSampler
from demo2program_tpu.dsl.karel_syntax import (
    KarelSyntaxOracle, PrefixSyntaxError)
from demo2program_tpu.dsl.karel_vocab import KarelVocab


def test_reference_golden_after_def():
    oracle = KarelSyntaxOracle()
    # dsl_prob_syntax.py:131-134: after 'DEF' -> [('run', 4)]
    assert oracle.get_next_candidates("DEF") == [("run", 4)]
    cands = dict(oracle.get_next_candidates("DEF run m("))
    # statement starters, each with its minimal completion incl. 'm)'
    assert cands["move"] == 2          # move m)
    assert cands["WHILE"] == 8         # WHILE c( p c) w( a w) m)
    assert cands["IFELSE"] == 12
    assert cands["REPEAT"] == 6
    assert "m)" not in cands           # at least one stmt required
    cands2 = dict(oracle.get_next_candidates("DEF run m( move"))
    assert cands2["m)"] == 1


def test_every_prefix_of_valid_programs_is_legal():
    oracle = KarelSyntaxOracle()
    vocab = KarelVocab()
    sampler = KarelProgramSampler(seed=21)
    for _ in range(50):
        ids = vocab.str2intseq(sampler.random_code())
        for i, tok in enumerate(ids):
            cands = dict(oracle.next_candidates_ids(ids[:i]))
            assert tok in cands, (vocab.intseq2str(ids), i)
        # after the full program the stack is empty: no candidates
        assert oracle.next_candidates_ids(ids) == []


def test_illegal_prefixes_raise():
    oracle = KarelSyntaxOracle()
    vocab = KarelVocab()
    for bad in ["run", "DEF DEF", "DEF run m( c)",
                "DEF run m( IF c( move"]:
        with pytest.raises(PrefixSyntaxError):
            oracle.run_prefix(vocab.str2intseq(bad))


def test_min_counts_allow_exact_completion():
    """From any prefix, following minimal-count candidates must complete the
    program in exactly the promised number of tokens and parse."""
    oracle = KarelSyntaxOracle()
    vocab = KarelVocab()
    sampler = KarelProgramSampler(seed=5)
    for _ in range(20):
        ids = vocab.str2intseq(sampler.random_code())
        cut = len(ids) // 2
        prefix = ids[:cut]
        steps = 0
        while True:
            cands = oracle.next_candidates_ids(prefix)
            if not cands:
                break
            tok, cnt = min(cands, key=lambda c: c[1])
            if steps == 0:
                promised = cnt
            prefix = prefix + [tok]
            steps += 1
            assert steps < 200
        assert steps == promised, vocab.intseq2str(ids)
        _, ok = karel_parser.parse(vocab.intseq2str(prefix))
        assert ok


def test_budget_mask():
    oracle = KarelSyntaxOracle()
    vocab = KarelVocab()
    prefix = vocab.str2intseq("DEF run m(")
    # with only 2 tokens of budget left, only 1-token stmts are allowed
    mask = oracle.legal_mask(prefix, max_program_len=len(prefix) + 2)
    allowed = {vocab.int2token[i] for i in np.nonzero(mask)[0]}
    assert allowed == {"move", "turnRight", "turnLeft", "pickMarker",
                       "putMarker"}
    mask0 = oracle.legal_mask(prefix, max_program_len=len(prefix) + 1)
    assert not mask0.any()  # nothing fits: stmt + m) needs 2 tokens


@pytest.mark.parametrize("mode", ["syntax_greedy", "syntax_sample"])
def test_constrained_decode_always_parses(mode):
    """A randomly initialized model decoding under the on-device pushdown
    must emit only syntactically valid, budget-respecting programs."""
    from tests.test_models import tiny_cfg, random_batch
    from demo2program_tpu.models.synthesis import SynthesisModel

    cfg = tiny_cfg(model="synthesis_baseline")
    batch = random_batch(11)
    model = SynthesisModel(cfg, train=False)
    variables = model.init(jax.random.key(3), batch)
    out = model.apply(variables, batch, decode_mode=mode,
                      rng=jax.random.key(7))
    vocab = KarelVocab()
    toks = np.asarray(out["greedy_program_tokens"])
    lens = np.asarray(out["greedy_program_len"])
    for b in range(toks.shape[0]):
        assert lens[b] <= cfg.max_program_len
        code = vocab.intseq2str(toks[b, :lens[b]])
        _, ok = karel_parser.parse(code)
        assert ok, code
