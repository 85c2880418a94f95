"""Ranking metrics with the reference's exact (non-standard) definitions.

Ported *formulas* (not code) from `/root/reference/cymf/metrics.pyx`:

* ``dcg_at_k`` (`metrics.pyx:24-43`): the slot-0 label is counted
  **undiscounted and unconditionally** (even for k<=1); slots ``1 <= i < k``
  contribute ``y[i]/log2(i+1)``; the total is normalized by the number of
  positives **in the whole candidate list** (not an ideal-DCG).
* ``recall_at_k`` (`metrics.pyx:71-85`): hits in top-k / positives in list.
* ``average_precision_at_k`` (`metrics.pyx:109-125`): at each hit position
  ``i < k`` adds ``(#positives at ranks <= i) / (i+1)``; normalized by
  positives in list.
* ``*_with_ips`` variants (`metrics.pyx:47-67,89-103,129-147`): every label is
  inverse-propensity weighted and the score is self-normalized by
  ``sum_i y[i]/p[i]`` over the full list.

All functions return 0 when the list has no positives.

Two implementations are provided:

* scalar numpy functions matching the reference's public signatures
  (``dcg_at_k(y_true_sorted_by_score, k)`` etc.) — the API-parity surface;
* ``*_batch`` jnp functions over ``[..., L]`` label matrices — the vectorized
  forms used by the sharded evaluator (one fused pass on the VPU instead of a
  per-user Python loop, cf. the serial loop at
  `/root/reference/cymf/evaluator.pyx:91-133`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "dcg_at_k", "recall_at_k", "average_precision_at_k",
    "dcg_at_k_with_ips", "recall_at_k_with_ips",
    "average_precision_at_k_with_ips",
    "dcg_at_k_batch", "recall_at_k_batch", "average_precision_at_k_batch",
    "dcg_at_k_with_ips_batch", "recall_at_k_with_ips_batch",
    "average_precision_at_k_with_ips_batch",
    "dcg_topk_batch", "recall_topk_batch", "average_precision_topk_batch",
    "dcg_with_ips_topk_batch", "recall_with_ips_topk_batch",
    "average_precision_with_ips_topk_batch",
]


# ---------------------------------------------------------------------------
# Batched jnp implementations (evaluator hot path).
# ``labels``: float[..., L] of 0/1 relevance, already sorted by predicted
# score (descending).  ``props``: float[..., L] propensity of the item in each
# slot.  ``k`` is static.
# ---------------------------------------------------------------------------

def _dcg_weights(length: int, k: int, dtype=jnp.float32):
    pos = np.arange(length)
    disc = np.ones(length)
    disc[1:] = 1.0 / np.log2(pos[1:] + 1.0)
    in_window = (pos == 0) | (pos < k)
    return jnp.asarray(disc * in_window, dtype=dtype)


def _safe_div(num, den):
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


def dcg_at_k_batch(labels, k: int):
    w = _dcg_weights(labels.shape[-1], k, labels.dtype)
    score = jnp.sum(labels * w, axis=-1)
    counter = jnp.sum(labels, axis=-1)
    return _safe_div(score, counter)


def dcg_at_k_with_ips_batch(labels, props, k: int):
    w = _dcg_weights(labels.shape[-1], k, labels.dtype)
    wl = labels / props
    score = jnp.sum(wl * w, axis=-1)
    sn = jnp.sum(wl, axis=-1)
    return _safe_div(score, sn)


def _topk_mask(length: int, k: int, dtype=jnp.float32):
    return jnp.asarray(np.arange(length) < k, dtype=dtype)


def recall_at_k_batch(labels, k: int):
    m = _topk_mask(labels.shape[-1], k, labels.dtype)
    score = jnp.sum(labels * m, axis=-1)
    counter = jnp.sum(labels, axis=-1)
    return _safe_div(score, counter)


def recall_at_k_with_ips_batch(labels, props, k: int):
    m = _topk_mask(labels.shape[-1], k, labels.dtype)
    wl = labels / props
    score = jnp.sum(wl * m, axis=-1)
    sn = jnp.sum(wl, axis=-1)
    return _safe_div(score, sn)


def average_precision_at_k_batch(labels, k: int):
    m = _topk_mask(labels.shape[-1], k, labels.dtype)
    ranks = jnp.asarray(np.arange(labels.shape[-1]) + 1.0, dtype=labels.dtype)
    cum = jnp.cumsum(labels, axis=-1)  # includes the current slot
    score = jnp.sum(labels * m * cum / ranks, axis=-1)
    counter = jnp.sum(labels, axis=-1)
    return _safe_div(score, counter)


def average_precision_at_k_with_ips_batch(labels, props, k: int):
    m = _topk_mask(labels.shape[-1], k, labels.dtype)
    ranks = jnp.asarray(np.arange(labels.shape[-1]) + 1.0, dtype=labels.dtype)
    wl = labels / props
    sncum = jnp.cumsum(wl, axis=-1)
    score = jnp.sum(labels * m * sncum / ranks, axis=-1)
    sn = jnp.sum(wl, axis=-1)
    return _safe_div(score, sn)


# ---------------------------------------------------------------------------
# Top-k-truncated variants (evaluator hot path).
#
# Every numerator above only touches ranks < max(k, 1); the denominators
# (#positives in the candidate list, or the IPS self-normalizer
# ``sum_i y[i]/p[i]``) are order-invariant sums the caller can compute
# WITHOUT sorting.  So the evaluator only needs ``lax.top_k(scores, kmax)``
# — O(L·kmax) — instead of a full O(L log L) argsort.  ``labels_topk`` /
# ``props_topk`` are the top-``kmax`` slots (kmax >= max(k, 1));
# ``total_pos`` / ``sn_total`` are the full-list denominators.
# ---------------------------------------------------------------------------

def dcg_topk_batch(labels_topk, total_pos, k: int):
    w = _dcg_weights(labels_topk.shape[-1], k, labels_topk.dtype)
    return _safe_div(jnp.sum(labels_topk * w, axis=-1), total_pos)


def recall_topk_batch(labels_topk, total_pos, k: int):
    m = _topk_mask(labels_topk.shape[-1], k, labels_topk.dtype)
    return _safe_div(jnp.sum(labels_topk * m, axis=-1), total_pos)


def average_precision_topk_batch(labels_topk, total_pos, k: int):
    m = _topk_mask(labels_topk.shape[-1], k, labels_topk.dtype)
    ranks = jnp.asarray(np.arange(labels_topk.shape[-1]) + 1.0,
                        dtype=labels_topk.dtype)
    cum = jnp.cumsum(labels_topk, axis=-1)
    return _safe_div(jnp.sum(labels_topk * m * cum / ranks, axis=-1),
                     total_pos)


def dcg_with_ips_topk_batch(labels_topk, props_topk, sn_total, k: int):
    w = _dcg_weights(labels_topk.shape[-1], k, labels_topk.dtype)
    return _safe_div(jnp.sum(labels_topk / props_topk * w, axis=-1),
                     sn_total)


def recall_with_ips_topk_batch(labels_topk, props_topk, sn_total, k: int):
    m = _topk_mask(labels_topk.shape[-1], k, labels_topk.dtype)
    return _safe_div(jnp.sum(labels_topk / props_topk * m, axis=-1),
                     sn_total)


def average_precision_with_ips_topk_batch(labels_topk, props_topk, sn_total,
                                          k: int):
    m = _topk_mask(labels_topk.shape[-1], k, labels_topk.dtype)
    ranks = jnp.asarray(np.arange(labels_topk.shape[-1]) + 1.0,
                        dtype=labels_topk.dtype)
    sncum = jnp.cumsum(labels_topk / props_topk, axis=-1)
    return _safe_div(jnp.sum(labels_topk * m * sncum / ranks, axis=-1),
                     sn_total)


# ---------------------------------------------------------------------------
# Scalar numpy implementations (public API parity with metrics.pyx).
# ---------------------------------------------------------------------------

def dcg_at_k(y_true_sorted_by_score, k: int) -> float:
    y = np.asarray(y_true_sorted_by_score, dtype=np.float64)
    counter = y.sum()
    if counter == 0.0:
        return 0.0
    score = y[0]
    i = np.arange(1, len(y))
    window = i < k
    score += float(np.sum(y[1:][window] / np.log2(i[window] + 1.0)))
    return float(score / counter)


def dcg_at_k_with_ips(y_true_sorted_by_score, p_scores_sorted_by_score,
                      k: int) -> float:
    y = np.asarray(y_true_sorted_by_score, dtype=np.float64)
    p = np.asarray(p_scores_sorted_by_score, dtype=np.float64)
    sn = float(np.sum(y / p))
    if sn == 0.0:
        return 0.0
    score = y[0] / p[0]
    i = np.arange(1, len(y))
    window = i < k
    score += float(np.sum(y[1:][window] / np.log2(i[window] + 1.0)
                          / p[1:][window]))
    return float(score / sn)


def recall_at_k(y_true_sorted_by_score, k: int) -> float:
    y = np.asarray(y_true_sorted_by_score, dtype=np.float64)
    counter = y.sum()
    if counter == 0.0:
        return 0.0
    return float(y[:k].sum() / counter)


def recall_at_k_with_ips(y_true_sorted_by_score, p_scores_sorted_by_score,
                         k: int) -> float:
    y = np.asarray(y_true_sorted_by_score, dtype=np.float64)
    p = np.asarray(p_scores_sorted_by_score, dtype=np.float64)
    sn = float(np.sum(y / p))
    if sn == 0.0:
        return 0.0
    return float(np.sum(y[:k] / p[:k]) / sn)


def average_precision_at_k(y_true_sorted_by_score, k: int) -> float:
    y = np.asarray(y_true_sorted_by_score, dtype=np.float64)
    counter = y.sum()
    if counter == 0.0:
        return 0.0
    cum = np.cumsum(y)
    ranks = np.arange(len(y)) + 1.0
    hits = (y == 1) & (np.arange(len(y)) < k)
    return float(np.sum(cum[hits] / ranks[hits]) / counter)


def average_precision_at_k_with_ips(y_true_sorted_by_score,
                                    p_scores_sorted_by_score,
                                    k: int) -> float:
    y = np.asarray(y_true_sorted_by_score, dtype=np.float64)
    p = np.asarray(p_scores_sorted_by_score, dtype=np.float64)
    sn_total = float(np.sum(y / p))
    if sn_total == 0.0:
        return 0.0
    sncum = np.cumsum(y / p)
    ranks = np.arange(len(y)) + 1.0
    hits = (y == 1) & (np.arange(len(y)) < k)
    return float(np.sum(sncum[hits] / ranks[hits]) / sn_total)
