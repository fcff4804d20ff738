"""ViZDoom program scoring.

Syntax + canonical checks are pure host string work (no engine). Execution
accuracy replays predicted programs in the deterministic ViZDoom engine from
the stored initial actor positions (`model_full.py:789-846`): episodes are
re-initialized via puke teleports, the program is executed, frames are
downsized to the dataset resolution and compared against the stored demo —
correct iff every frame and the length match, OR the token sequences matched
exactly.

This is inherently host-side C++ engine work (SURVEY.md §2.5); a persistent
engine instance is reused across rollouts like the reference does.
"""

import numpy as np

from demo2program_tpu.dsl import vizdoom_canonical, vizdoom_interp, \
    vizdoom_parser
from demo2program_tpu.dsl.vizdoom_vocab import VizDoomDSLVocab
from demo2program_tpu.utils import log


class VizdoomScorer:
    def __init__(self, cfg, vocab=None, engine_config=None):
        # engine_config=None -> the packaged assets/doomlite.cfg (or a real
        # vizdoom install's config when that engine is selected)
        self.cfg = cfg
        self.vocab = vocab or VizDoomDSLVocab(
            perception_type=cfg.perception_type, level=cfg.level or
            "not_simple")
        self.engine_config = engine_config
        self._world = None

    # -- host-side string metrics (engine-free) -------------------------------
    def syntax_and_exact(self, pred_tokens, pred_len, is_same_seq,
                         gt_tokens, gt_len):
        bs = pred_tokens.shape[0]
        syntax = np.zeros(bs, np.float32)
        exact = np.zeros(bs, np.float32)
        for i in range(bs):
            if is_same_seq[i] == 1:
                syntax[i] = 1.0
            else:
                p_str = self.vocab.intseq2str(
                    pred_tokens[i, :int(pred_len[i])])
                _, ok = vizdoom_parser.parse(p_str)
                syntax[i] = float(ok)
            if syntax[i] == 1.0:
                p_str = self.vocab.intseq2str(
                    pred_tokens[i, :int(pred_len[i])])
                g_str = self.vocab.intseq2str(
                    gt_tokens[i, :int(gt_len[i])])
                exact[i] = float(
                    vizdoom_canonical.programs_equal(p_str, g_str))
        return syntax, exact

    # -- engine-backed execution accuracy --------------------------------------
    def _get_world(self):
        if self._world is None:
            from demo2program_tpu.envs.vizdoom import Vizdoom_env
            self._world = Vizdoom_env(
                config=self.engine_config,
                perception_type=self.cfg.perception_type,
                sprite_style=getattr(self.cfg, "sprite_style", "v2"))
            self._world.init_game()
        return self._world

    def execution(self, pred_tokens, pred_len, is_same_seq,
                  s_h, demo_len, init_pos, init_pos_len):
        """Returns (num_correct (bs,), is_correct (bs, k))."""
        from cv2 import INTER_AREA, resize
        cfg = self.cfg
        bs, k = s_h.shape[0], s_h.shape[1]
        world = self._get_world()
        pos_keys = list(cfg.vizdoom_pos_keys)
        is_correct = np.zeros([bs, k], bool)
        for i in range(bs):
            if is_same_seq[i] == 1:
                is_correct[i, :] = True
                continue
            p_str = self.vocab.intseq2str(pred_tokens[i, :int(pred_len[i])])
            ast, ok = vizdoom_parser.parse(p_str)
            if not ok:
                continue
            for d in range(k):
                init_dict = {}
                for p, key in enumerate(pos_keys):
                    n_pos = int(init_pos_len[i, d, p])
                    arr = init_pos[i, d, p, :n_pos]
                    init_dict[key] = np.squeeze(arr)
                world.new_episode(init_dict)
                _, success = vizdoom_interp.execute(ast, world)
                if not success:
                    continue
                h, w = cfg.h, cfg.w
                frames = [resize(s, (h, w), interpolation=INTER_AREA)
                          if s.shape[:2] != (h, w) else s
                          for s in world.s_h]
                exe_len = len(frames)
                if exe_len != int(demo_len[i, d]):
                    continue
                target = s_h[i, d, :exe_len]
                exe = np.stack(frames, 0).astype(target.dtype)
                if (exe == target).all():
                    is_correct[i, d] = True
        return is_correct.sum(axis=1).astype(np.float32), is_correct

    def execution_histogram(self, num_correct, k):
        hist = np.zeros(k + 1, np.float32)
        for i in range(k + 1):
            hist[i] = float((num_correct == i).sum()) / len(num_correct)
        return hist

    def rerank_pick(self, beam_tokens, beam_lens, batch):
        """Execution-guided beam selection against the SEEN demos (the
        model's inputs — no test information): per example, the first
        (= highest-scoring; beams arrive score-sorted) beam that reproduces
        every seen demo wins; fall back to the best-scoring beam. Early
        exits on the first mismatching demo/beam keep the engine cost close
        to one verification pass. Returns pick (bs,) int."""
        from cv2 import INTER_AREA, resize
        cfg = self.cfg
        s_h = np.asarray(batch["s_h"])
        demo_len = np.asarray(batch["demo_len"])
        init_pos = np.asarray(batch["init_pos"])
        init_pos_len = np.asarray(batch["init_pos_len"])
        bs, K, _ = beam_tokens.shape
        k = s_h.shape[1]
        world = self._get_world()
        pos_keys = list(cfg.vizdoom_pos_keys)
        h, w = cfg.h, cfg.w
        pick = np.zeros(bs, np.int64)
        for i in range(bs):
            for j in range(K):
                p_str = self.vocab.intseq2str(
                    beam_tokens[i, j, :int(beam_lens[i, j])])
                ast, ok = vizdoom_parser.parse(p_str)
                if not ok:
                    continue
                good = True
                for d in range(k):
                    init_dict = {}
                    for p, key in enumerate(pos_keys):
                        n_pos = int(init_pos_len[i, d, p])
                        init_dict[key] = np.squeeze(
                            init_pos[i, d, p, :n_pos])
                    world.new_episode(init_dict)
                    _, success = vizdoom_interp.execute(ast, world)
                    if not success:
                        good = False
                        break
                    frames = [resize(s, (h, w), interpolation=INTER_AREA)
                              if s.shape[:2] != (h, w) else s
                              for s in world.s_h]
                    if len(frames) != int(demo_len[i, d]):
                        good = False
                        break
                    target = s_h[i, d, :len(frames)]
                    if not (np.stack(frames, 0).astype(target.dtype)
                            == target).all():
                        good = False
                        break
                if good:
                    pick[i] = j
                    break
        return pick

    def score_batch(self, batch, evals, skip_execution=False):
        """Same contract as KarelScorer.score_batch. `skip_execution=True`
        scores syntax/canonical only (no engine needed)."""
        gt_tokens = np.asarray(batch["program_tokens"])
        gt_len = np.asarray(batch["program_len"])[:, 0].astype(np.int64)
        res = {}
        for name, tok_key, len_key, same_key in [
                ("", "pred_tokens", "pred_len", "pred_is_same_seq"),
                ("greedy_", "greedy_tokens", "greedy_len",
                 "greedy_is_same_seq")]:
            if tok_key not in evals:
                continue
            tokens = np.asarray(evals[tok_key])
            lens = np.asarray(evals[len_key])
            same = np.asarray(evals[same_key])
            syntax, exact = self.syntax_and_exact(
                tokens, lens, same, gt_tokens, gt_len)
            res[f"{name}is_correct_syntax"] = syntax
            res[f"{name}exact_program_correct"] = exact
            res[f"{name}program_syntax_acc"] = float(syntax.mean())
            res[f"{name}exact_program_acc"] = float(exact.mean())
            if skip_execution:
                continue
            nc, per_demo = self.execution(
                tokens, lens, same, np.asarray(batch["s_h"]),
                np.asarray(batch["demo_len"]),
                np.asarray(batch["init_pos"]),
                np.asarray(batch["init_pos_len"]))
            res[f"{name}program_is_correct_execution"] = per_demo
            res[f"{name}program_num_execution_correct"] = nc
            res[f"{name}program_execution_acc_hist"] = \
                self.execution_histogram(nc, self.cfg.k)
            res[f"{name}program_execution_all_correct"] = float(
                (nc == self.cfg.k).mean())
            tnc, _ = self.execution(
                tokens, lens, same, np.asarray(batch["test_s_h"]),
                np.asarray(batch["test_demo_len"]),
                np.asarray(batch["test_init_pos"]),
                np.asarray(batch["test_init_pos_len"]))
            res[f"test_{name}program_num_execution_correct"] = tnc
            res[f"test_{name}program_execution_acc_hist"] = \
                self.execution_histogram(tnc, self.cfg.test_k)
            res[f"test_{name}program_execution_all_correct"] = float(
                (tnc == self.cfg.test_k).mean())
        return res
