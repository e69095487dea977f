"""Fixed-shape NMS under jit (greedy, mask-based).

Replaces the mmcv CUDA ``nms`` / ``batched_nms`` / ``multiclass_nms``
ops (reference RPN/RCNN test cfgs ``configs/dp/models/
faster_rcnn_r50_fpn.py:95-133``, ``oadp/dp/test_nni.py:90``). All
outputs have static shapes: selections are (index, valid) pairs padded
to ``max_out``; callers mask instead of slicing.
"""

__all__ = ['nms', 'batched_nms', 'multiclass_nms']

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def nms(
    boxes: jnp.ndarray,  # (N, 4)
    scores: jnp.ndarray,  # (N,) — invalid entries must carry -inf
    iou_threshold: float,
    max_out: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS. Returns ``(indices, valid)`` of shape ``(max_out,)``;
    indices are ordered by descending score.

    O(max_out * N): each iteration selects the argmax survivor and
    suppresses its neighbours — vectorized over N on the VPU, bounded
    iteration count for XLA.
    """
    n = boxes.shape[0]

    def body(k, carry):
        live_scores, idx, valid = carry
        j = jnp.argmax(live_scores)
        ok = live_scores[j] > NEG_INF / 2
        idx = idx.at[k].set(jnp.where(ok, j.astype(jnp.int32), 0))
        valid = valid.at[k].set(ok)
        iou = _iou_one_to_many(boxes[j], boxes)
        suppress = (iou > iou_threshold) & ok
        live_scores = jnp.where(
            suppress | (jnp.arange(n) == j), NEG_INF, live_scores
        )
        return live_scores, idx, valid

    idx0 = jnp.zeros(max_out, jnp.int32)
    valid0 = jnp.zeros(max_out, bool)
    _, idx, valid = jax.lax.fori_loop(
        0, max_out, body, (scores.astype(jnp.float32), idx0, valid0)
    )
    return idx, valid


def _iou_one_to_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:4], boxes[:, 2:4])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    area = jnp.clip(box[2] - box[0], 0, None) * jnp.clip(
        box[3] - box[1], 0, None
    )
    areas = jnp.clip(boxes[:, 2] - boxes[:, 0], 0, None) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )
    return inter / jnp.maximum(area + areas - inter, 1e-6)


def batched_nms(
    boxes: jnp.ndarray,  # (N, 4)
    scores: jnp.ndarray,  # (N,)
    ids: jnp.ndarray,  # (N,) int — class / level ids
    iou_threshold: float,
    max_out: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Category-aware NMS via the coordinate-offset trick (mmcv
    ``batched_nms``): boxes of different ids never overlap."""
    offset = (jnp.max(boxes) + 1.0) * ids.astype(boxes.dtype)
    shifted = boxes + offset[:, None]
    return nms(shifted, scores, iou_threshold, max_out)


@functools.partial(
    jax.jit, static_argnames=('max_per_img', 'num_classes')
)
def multiclass_nms(
    boxes: jnp.ndarray,  # (N, 4) or (N, C*4)
    scores: jnp.ndarray,  # (N, C+1) incl. background last
    score_thr: float,
    iou_threshold: float,
    max_per_img: int,
    num_classes: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """mmdet ``multiclass_nms``: per-class NMS over the N x C candidate
    grid, then global top-``max_per_img``.

    Returns ``(dets (M, 5), labels (M,), indices (M,), valid (M,))``
    where ``indices`` point into the original N rows.
    """
    n, c1 = scores.shape
    c = num_classes
    assert c1 == c + 1
    cls_scores = scores[:, :c]
    if boxes.shape[-1] == 4:
        cand_boxes = jnp.broadcast_to(boxes[:, None, :], (n, c, 4))
    else:
        cand_boxes = boxes.reshape(n, c, 4)
    cand_boxes = cand_boxes.reshape(n * c, 4)
    cand_scores = cls_scores.reshape(n * c)
    cand_labels = jnp.tile(jnp.arange(c, dtype=jnp.int32), (n,))
    cand_rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), c)

    cand_scores = jnp.where(cand_scores > score_thr, cand_scores, NEG_INF)
    idx, valid = batched_nms(
        cand_boxes, cand_scores, cand_labels, iou_threshold, max_per_img
    )
    dets = jnp.concatenate(
        [cand_boxes[idx], cand_scores[idx][:, None]], axis=-1
    )
    dets = jnp.where(valid[:, None], dets, 0.0)
    labels = jnp.where(valid, cand_labels[idx], -1)
    rows = jnp.where(valid, cand_rows[idx], 0)
    return dets, labels, rows, valid
