"""Sequence loss / accuracy with exact reference mask semantics.

Parity target: `Sequence_Loss` (`models/model_full.py:620-711`):

  * loss = sum(CE * gt_mask) / sum(gt_mask); CE is softmax for token
    sequences, per-dim-mean sigmoid for perception vectors
  * token_acc = sum(equal(argmax_gt, argmax_pred) * MIN_mask) / sum(MAX_mask)
    — length mismatches are penalized through the denominator
  * seq_acc: gt-masked argmax equality over the whole padded length AND
    exact length equality
  * all masks derive from (pred_len, gt_len) pairs; the teacher-forced path
    passes gt_len for both (`model_full.py:921-929`)

Layout note: logits/onehots here are (bs, L, V) — the reference's (bs, V, L)
is transposed at the model boundary.
"""

import jax.numpy as jnp
import optax


def _length_mask(lengths, max_len):
    return (jnp.arange(max_len)[None, :] < lengths[:, None]).astype(
        jnp.float32)


def sequence_metrics(logits, gt_onehot, gt_len, pred_len,
                     seq_type="program", pred_tokens=None):
    """Returns dict(loss, token_acc, seq_acc, is_same_seq, pred_tokens).

    logits/gt_onehot: (bs, L, V); gt_len/pred_len: (bs,) int32.
    For seq_type='per', only loss is meaningful (reference returns None for
    the accuracies, `model_full.py:684-687`).

    pred_tokens overrides the argmax-of-logits prediction ids — used by the
    scheduled-sampling path, where the reference reports the helper's
    SAMPLED ids, not the logit argmax (`seq2seq_helper` sample_id flowing
    into `model_synthesis.py:441-447`).
    """
    bs, L, V = logits.shape
    gt_onehot = gt_onehot.astype(jnp.float32)  # labels may arrive as uint8
    gt_mask = _length_mask(gt_len, L)
    max_mask = _length_mask(jnp.maximum(gt_len, pred_len), L)
    min_mask = _length_mask(jnp.minimum(gt_len, pred_len), L)

    if seq_type in ("program", "action"):
        ce = optax.softmax_cross_entropy(logits, gt_onehot)  # (bs, L)
    else:
        ce = optax.sigmoid_binary_cross_entropy(logits, gt_onehot).mean(-1)
    loss = (ce * gt_mask).sum() / jnp.maximum(gt_mask.sum(), 1.0)

    out = {"loss": loss}
    if seq_type in ("program", "action"):
        gt_am = jnp.argmax(gt_onehot, axis=-1)
        pred_am = (pred_tokens if pred_tokens is not None
                   else jnp.argmax(logits, axis=-1))
        correct = (gt_am == pred_am).astype(jnp.float32)
        out["token_acc"] = (correct * min_mask).sum() / jnp.maximum(
            max_mask.sum(), 1.0)
        seq_eq = jnp.all((gt_am == pred_am) | (gt_mask < 0.5), axis=-1)
        is_same_seq = (seq_eq & (gt_len == pred_len)).astype(jnp.float32)
        out["is_same_seq"] = is_same_seq
        out["seq_acc"] = is_same_seq.mean()
        out["pred_tokens"] = pred_am.astype(jnp.int32)
    return out


def execution_histogram(num_correct, k, batch_size):
    """#correct-of-k -> normalized histogram over 0..k
    (`model_full.py:908-916`)."""
    hist = []
    for i in range(k + 1):
        hist.append((num_correct == i).astype(jnp.float32).sum() / batch_size)
    return jnp.stack(hist, axis=0)
