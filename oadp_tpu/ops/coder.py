"""Device-side box algebra: delta coder, IoU, clipping (jnp).

Replaces mmdet's ``DeltaXYWHBBoxCoder`` (configured at reference
``configs/dp/models/faster_rcnn_r50_fpn.py:33-38,60-64``) and the IoU
computation inside ``MaxIoUAssigner``. Everything is static-shape and
jit/vmap friendly; invalid rows are handled by masks, never by dynamic
filtering.
"""

__all__ = [
    'encode_deltas',
    'decode_deltas',
    'pairwise_iou',
    'clip_boxes',
]

import math

import jax.numpy as jnp


def encode_deltas(
    boxes: jnp.ndarray,  # (..., 4) source (anchors / proposals)
    gts: jnp.ndarray,  # (..., 4) targets
    means: tuple = (0.0, 0.0, 0.0, 0.0),
    stds: tuple = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """mmdet ``bbox2delta``: (dx, dy, dw, dh) normalized by means/stds."""
    pw = boxes[..., 2] - boxes[..., 0]
    ph = boxes[..., 3] - boxes[..., 1]
    px = (boxes[..., 0] + boxes[..., 2]) * 0.5
    py = (boxes[..., 1] + boxes[..., 3]) * 0.5
    gw = gts[..., 2] - gts[..., 0]
    gh = gts[..., 3] - gts[..., 1]
    gx = (gts[..., 0] + gts[..., 2]) * 0.5
    gy = (gts[..., 1] + gts[..., 3]) * 0.5
    eps = 1e-6
    deltas = jnp.stack(
        [
            (gx - px) / jnp.maximum(pw, eps),
            (gy - py) / jnp.maximum(ph, eps),
            jnp.log(jnp.maximum(gw, eps) / jnp.maximum(pw, eps)),
            jnp.log(jnp.maximum(gh, eps) / jnp.maximum(ph, eps)),
        ],
        axis=-1,
    )
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def decode_deltas(
    boxes: jnp.ndarray,  # (..., 4) anchors / proposals
    deltas: jnp.ndarray,  # (..., 4)
    means: tuple = (0.0, 0.0, 0.0, 0.0),
    stds: tuple = (1.0, 1.0, 1.0, 1.0),
    wh_ratio_clip: float = 16 / 1000,
) -> jnp.ndarray:
    """mmdet ``delta2bbox`` (without the max_shape clamp — see
    :func:`clip_boxes`)."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
    pw = boxes[..., 2] - boxes[..., 0]
    ph = boxes[..., 3] - boxes[..., 1]
    px = (boxes[..., 0] + boxes[..., 2]) * 0.5
    py = (boxes[..., 1] + boxes[..., 3]) * 0.5
    gx = px + pw * d[..., 0]
    gy = py + ph * d[..., 1]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    return jnp.stack(
        [gx - gw * 0.5, gy - gh * 0.5, gx + gw * 0.5, gy + gh * 0.5],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, img_hw: jnp.ndarray) -> jnp.ndarray:
    """Clamp x to [0, W], y to [0, H]. ``img_hw`` is a (2,) = (h, w)
    array (use ``vmap`` for per-image batches)."""
    h, w = img_hw[0], img_hw[1]
    lo = jnp.zeros(4, boxes.dtype)
    hi = jnp.stack([w, h, w, h]).astype(boxes.dtype)
    return jnp.clip(boxes, lo, hi)


def pairwise_iou(
    a: jnp.ndarray,  # (N, 4)
    b: jnp.ndarray,  # (M, 4)
    eps: float = 1e-6,
) -> jnp.ndarray:
    """(N, M) IoU (mmdet ``bbox_overlaps`` semantics: zero-area boxes
    give IoU 0)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    whs = jnp.clip(rb - lt, 0.0, None)
    inter = whs[..., 0] * whs[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0, None) * jnp.clip(
        a[:, 3] - a[:, 1], 0, None
    )
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0, None) * jnp.clip(
        b[:, 3] - b[:, 1], 0, None
    )
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, eps)
