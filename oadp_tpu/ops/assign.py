"""MaxIoU assignment + random sampling, static-shape under jit.

Reimplements mmdet's ``MaxIoUAssigner`` and ``RandomSampler``
(configured at reference ``configs/dp/models/faster_rcnn_r50_fpn.py:
74-119``) without data-dependent shapes: ground truths and boxes are
padded with validity masks, selection is rank-based over random keys,
and the sampled set is compacted to a fixed length with a top-k.
"""

__all__ = ['max_iou_assign', 'random_sample']

import jax
import jax.numpy as jnp

from .coder import pairwise_iou


def max_iou_assign(
    boxes: jnp.ndarray,  # (P, 4)
    box_valid: jnp.ndarray,  # (P,) bool
    gts: jnp.ndarray,  # (G, 4) padded
    gt_valid: jnp.ndarray,  # (G,) bool
    pos_iou_thr: float,
    neg_iou_thr: float,
    min_pos_iou: float,
    match_low_quality: bool,
) -> jnp.ndarray:
    """Returns ``assigned (P,) int32``: -1 ignore, 0 negative,
    ``g + 1`` = matched to gt ``g`` (mmdet convention).

    Invalid boxes are -1; invalid gts never match.
    """
    overlaps = pairwise_iou(gts, boxes)  # (G, P)
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)

    g = gts.shape[0]
    has_gt = jnp.any(gt_valid)
    max_overlaps = jnp.where(has_gt, overlaps.max(axis=0), 0.0)  # (P,)
    argmax_overlaps = overlaps.argmax(axis=0)  # (P,)

    assigned = jnp.full(boxes.shape[0], -1, jnp.int32)
    assigned = jnp.where(
        (max_overlaps >= 0) & (max_overlaps < neg_iou_thr), 0, assigned
    )
    assigned = jnp.where(
        max_overlaps >= pos_iou_thr,
        argmax_overlaps.astype(jnp.int32) + 1,
        assigned,
    )

    if match_low_quality:
        # For each gt with max overlap >= min_pos_iou, (re)assign every
        # box tied at that max. mmdet loops gts in order so later gts
        # overwrite — take the largest qualifying gt index per box.
        gt_max = overlaps.max(axis=1, keepdims=True)  # (G, 1)
        qualifies = (
            (overlaps == gt_max) & (gt_max >= min_pos_iou)
            & gt_valid[:, None]
        )  # (G, P)
        gt_ids = jnp.arange(g, dtype=jnp.int32)[:, None]
        best = jnp.max(
            jnp.where(qualifies, gt_ids, -1), axis=0
        )  # (P,) largest qualifying gt or -1
        assigned = jnp.where(best >= 0, best + 1, assigned)

    return jnp.where(box_valid, assigned, -1)


def random_sample(
    key: jax.Array,
    assigned: jnp.ndarray,  # (P,) from max_iou_assign
    num: int,
    pos_fraction: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """mmdet ``RandomSampler`` (neg_pos_ub=-1): up to
    ``num * pos_fraction`` random positives, negatives fill the rest.

    Returns ``(inds (num,), valid (num,), is_pos (num,))`` — positives
    first (mmdet ordering), padded with invalid slots when fewer than
    ``num`` candidates exist.

    Selection is rank-based over ONE uniform key array (the pos/neg
    candidate sets are disjoint, so sharing the draw keeps both subsets
    exactly uniform) and uses k-sized ``top_k``s plus a tiny merge
    instead of full-length argsorts — at RPN scale (~280k anchors) each
    full-array sort/pass costs ~1 ms on TPU, and this path sits inside
    every train step.
    """
    p = assigned.shape[0]
    is_pos = assigned > 0
    is_neg = assigned == 0
    u = jax.random.uniform(key, (p,))

    num_pos_exp = int(num * pos_fraction)
    k_pos = min(num_pos_exp, p)
    k_neg = min(num, p)
    # top_k over (-key) == the k smallest keys == a uniform random
    # subset of the candidates (invalid candidates carry key 2.0 and
    # sort last; they are masked out after selection)
    _, pos_idx = jax.lax.top_k(-jnp.where(is_pos, u, 2.0), k_pos)
    _, neg_idx = jax.lax.top_k(-jnp.where(is_neg, u, 2.0), k_neg)
    pos_ok = is_pos[pos_idx]  # (k_pos,)
    neg_ok = is_neg[neg_idx]  # (k_neg,)
    n_pos = pos_ok.sum()

    # Merge: positives first, then enough negatives to fill `num`.
    neg_ok = neg_ok & (jnp.arange(k_neg) < num - n_pos)
    cand = jnp.concatenate([pos_idx, neg_idx])
    cand_pos = jnp.concatenate(
        [pos_ok, jnp.zeros(k_neg, bool)]
    )
    cand_ok = jnp.concatenate([pos_ok, neg_ok])
    priority = (
        cand_pos * 2.0 + cand_ok * 1.0
        - jnp.arange(cand.shape[0]) * 1e-6  # keep selection order stable
    )
    k = min(num, p)
    _, slot = jax.lax.top_k(priority, k)
    inds = cand[slot]
    if k < num:  # fewer candidates than slots: pad with invalid
        inds = jnp.concatenate([inds, jnp.zeros(num - k, inds.dtype)])
        slot = jnp.concatenate([slot, jnp.zeros(num - k, slot.dtype)])
    valid = cand_ok[slot] & (jnp.arange(num) < k)
    return inds.astype(jnp.int32), valid, cand_pos[slot] & valid
