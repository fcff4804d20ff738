"""Loss + on-device metric assembly.

Reproduces the reference's loss composition (`model_full.py:918-1095`):

  loss = program_CE + mean_k(action_CE_k) + mean_k(per_CE_k)

where each per-demo term is normalized by ITS OWN mask sum before averaging
over k (the reference sums k independently-normalized Sequence_Losses and
divides by k, `model_full.py:1014-1038`). Baselines use the program term
only.

Host-dependent metrics (syntax accuracy, canonical program accuracy,
execution accuracy) are computed outside the jitted step — see eval/scorer.py
— unlike the reference, which runs them via tf.py_func inside the graph at
every fetch (`model_full.py:692-695,848-916`).
"""

import jax
import jax.numpy as jnp

from demo2program_tpu.models.metrics import sequence_metrics


def _program_stat(cfg, logits, batch, pred_tokens=None):
    gt_onehot = jnp.transpose(batch["program"], (0, 2, 1)).astype(
        jnp.float32)  # -> (bs, L, V); shipped as uint8
    plen = batch["program_len"][:, 0].astype(jnp.int32)
    return sequence_metrics(logits, gt_onehot, plen, plen, "program",
                            pred_tokens=pred_tokens)


def _per_k_stats(logits, gt_onehot, lengths, seq_type):
    """vmapped per-demo sequence metrics, averaged like the reference's
    Python loop over k. logits/gt: (bs, k, T, V); lengths: (bs, k)."""
    def one_k(lg, gt, ln):
        return sequence_metrics(lg, gt.astype(jnp.float32), ln, ln, seq_type)
    stats = jax.vmap(one_k, in_axes=(1, 1, 1))(
        logits, gt_onehot, lengths)
    return stats  # each leaf has leading k axis


def compute_loss(cfg, outputs, batch, model_name):
    """Training objective + on-device scalar reports.

    Returns (loss, report) where report mirrors the reference's
    report_loss/report_accuracy scalar names (`model_full.py:1099-1132`).
    """
    report = {}
    if model_name == "induction_baseline":
        # no program decoding: the objective is the TEST-demo action CE,
        # averaged over test_k; `seq_all_acc` = all test sequences match
        # (`model_induction.py:788-819`)
        test_len = batch["test_demo_len"].astype(jnp.int32)
        act = _per_k_stats(outputs["pred_action_logits"],
                           batch["test_a_h"], test_len, "action")
        loss = act["loss"].mean()
        report["avg_action_loss"] = loss
        report["avg_action_token_acc"] = act["token_acc"].mean()
        report["avg_action_seq_acc"] = act["seq_acc"].mean()
        report["avg_action_seq_all_acc"] = jnp.all(
            act["is_same_seq"] > 0.5, axis=0).astype(jnp.float32).mean()
        report["loss"] = loss
        return loss, report

    # scheduled sampling: the decoder's SAMPLED ids are the prediction the
    # reference reports, not the logit argmax (sample_id semantics)
    prog = _program_stat(cfg, outputs["pred_program_logits"], batch,
                         pred_tokens=outputs.get("pred_program_tokens"))
    loss = prog["loss"]
    report["program_loss"] = prog["loss"]
    report["program_token_acc"] = prog["token_acc"]
    report["program_seq_acc"] = prog["seq_acc"]

    if model_name == "full":
        demo_len = batch["demo_len"].astype(jnp.int32)  # action_len alias
        act = _per_k_stats(outputs["pred_action_logits"],
                           batch["a_h"], demo_len, "action")
        avg_action_loss = act["loss"].mean()
        loss = loss + avg_action_loss
        report["avg_action_loss"] = avg_action_loss
        report["avg_action_token_acc"] = act["token_acc"].mean()
        report["avg_action_seq_acc"] = act["seq_acc"].mean()

        per = _per_k_stats(outputs["pred_per_logits"],
                           batch["per"], demo_len, "per")
        avg_per_loss = per["loss"].mean()
        loss = loss + avg_per_loss
        report["avg_per_loss"] = avg_per_loss

    report["loss"] = loss
    return loss, report


def program_eval_tensors(cfg, outputs, batch):
    """Per-example tensors needed by the host/VM scorers, for both the
    teacher-forced and greedy programs. Mirrors the fetch set of
    `evaler.py:258-280`."""
    if "pred_program_logits" not in outputs:  # induction baseline
        return {}
    prog = _program_stat(cfg, outputs["pred_program_logits"], batch)
    plen = batch["program_len"][:, 0].astype(jnp.int32)
    res = {
        "pred_tokens": prog["pred_tokens"],
        "pred_len": plen,
        "pred_is_same_seq": prog["is_same_seq"],
        "program_loss": prog["loss"],
        "program_token_acc": prog["token_acc"],
        "program_seq_acc": prog["seq_acc"],
    }
    if "greedy_program_logits" in outputs:
        gt_onehot = jnp.transpose(batch["program"], (0, 2, 1))
        g = sequence_metrics(outputs["greedy_program_logits"], gt_onehot,
                             plen, outputs["greedy_program_len"], "program")
        res.update({
            # token ids from the greedy sampler itself, not logit argmax
            # (identical values; sampler ids are authoritative in the
            # reference's synthesis baseline)
            "greedy_tokens": outputs["greedy_program_tokens"],
            "greedy_len": outputs["greedy_program_len"],
            "greedy_is_same_seq": g["is_same_seq"],
            "greedy_program_loss": g["loss"],
            "greedy_program_token_acc": g["token_acc"],
            "greedy_program_seq_acc": g["seq_acc"],
        })
    for k in ("beam_tokens", "beam_lengths", "beam_scores"):
        if k in outputs:  # full beam set for evaler execution-reranking
            res[k] = outputs[k]
    if "pred_per_logits" in outputs:
        # per-step perception-head probabilities (bs, k, T, P) — feeds the
        # perception-map image summaries (reference
        # `model_full.py:1223-1297` observability parity)
        res["pred_per"] = jax.nn.sigmoid(outputs["pred_per_logits"])
    if "pred_action_logits" in outputs:
        # first-demo action-decoder probabilities (bs, T, A) for the
        # visualized_action summary (`model_full.py:1266-1275`)
        res["pred_action_probs"] = jax.nn.softmax(
            outputs["pred_action_logits"][:, 0], axis=-1)
    return res


def greedy_action_report(cfg, outputs, batch, model_name="full"):
    """greedy_avg_action_* scalars (`model_full.py:1040-1059`;
    induction scores against the TEST demos and adds seq_all_acc,
    `model_induction.py:822-846`)."""
    if "greedy_action_logits" not in outputs:
        return {}
    if model_name == "induction_baseline":
        gt, lens = batch["test_a_h"], batch["test_demo_len"]
    else:
        gt, lens = batch["a_h"], batch["demo_len"]
    lens = lens.astype(jnp.int32)

    def one_k(lg, g, gl, pl):
        return sequence_metrics(lg, g.astype(jnp.float32), gl, pl, "action")
    stats = jax.vmap(one_k, in_axes=(1, 1, 1, 1))(
        outputs["greedy_action_logits"], gt, lens,
        outputs["greedy_action_len"])
    rep = {
        "greedy_avg_action_loss": stats["loss"].mean(),
        "greedy_avg_action_token_acc": stats["token_acc"].mean(),
        "greedy_avg_action_seq_acc": stats["seq_acc"].mean(),
    }
    if model_name == "induction_baseline":
        rep["greedy_avg_action_seq_all_acc"] = jnp.all(
            stats["is_same_seq"] > 0.5, axis=0).astype(jnp.float32).mean()
    return rep
