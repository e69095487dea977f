"""RPN head: conv tower, losses, and static-shape proposal generation.

Replaces mmdet's ``RPNHead`` (reference ``configs/dp/models/
faster_rcnn_r50_fpn.py:24-45`` with train/test cfg ``:74-133``):
3x3 conv + ReLU, 1x1 sigmoid objectness, 1x1 deltas; anchor target
assignment (pos .7 / neg .3 / min_pos .3, low-quality matches), 256
random samples at pos_fraction .5; proposals via per-level top-k,
decode, clip, level-aware NMS (.7), top ``max_per_img``.

TPU shape discipline: anchors are a fixed per-canvas constant; every
per-image quantity is padded + masked; the per-level candidate count
``nms_pre`` and the output count are static.
"""

__all__ = [
    'init_rpn_params',
    'rpn_forward',
    'rpn_loss',
    'rpn_proposals',
    'convert_torch_rpn',
]

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..base.losses import binary_cross_entropy
from ..ops.assign import max_iou_assign, random_sample
from ..ops.coder import clip_boxes, decode_deltas, encode_deltas
from ..ops.nms import NEG_INF, batched_nms
from .layers import conv

Params = dict[str, Any]


def init_rpn_params(
    key: jax.Array,
    in_channels: int = 256,
    feat_channels: int = 256,
    num_anchors: int = 3,
) -> Params:
    """Normal(std=0.01) init per mmdet RPNHead."""
    ks = jax.random.split(key, 3)

    def normal(k, shape):
        return jax.random.normal(k, shape) * 0.01

    return {
        'conv': {
            'w': normal(ks[0], (3, 3, in_channels, feat_channels)),
            'b': jnp.zeros(feat_channels),
        },
        'cls': {
            'w': normal(ks[1], (1, 1, feat_channels, num_anchors)),
            'b': jnp.zeros(num_anchors),
        },
        'reg': {
            'w': normal(ks[2], (1, 1, feat_channels, num_anchors * 4)),
            'b': jnp.zeros(num_anchors * 4),
        },
    }


def rpn_forward(
    params: Params, feats: list[jax.Array]
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Per level: ``(B, H*W*A)`` logits and ``(B, H*W*A, 4)`` deltas,
    flattened in (y, x, a) order — matching
    ``AnchorGenerator.grid_anchors``."""
    scores, deltas = [], []
    for f in feats:
        x = jax.nn.relu(conv(f, params['conv'], padding=1))
        s = conv(x, params['cls'], padding=0)
        d = conv(x, params['reg'], padding=0)
        b, h, w, a = s.shape
        scores.append(s.reshape(b, h * w * a))
        deltas.append(d.reshape(b, h * w * a, 4))
    return scores, deltas


def _anchor_valid(anchors: jnp.ndarray, img_hw: jnp.ndarray) -> jnp.ndarray:
    """``allowed_border=-1`` keeps every anchor, but anchors centered in
    the padded region (beyond the per-image resized shape) must not
    train — mmdet achieves this by generating anchors for the unpadded
    shape. Mask anchors whose centers fall outside the image."""
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    return (cx < img_hw[1]) & (cy < img_hw[0])


def rpn_loss(
    key: jax.Array,
    scores: list[jax.Array],  # per level (B, N_l)
    deltas: list[jax.Array],  # per level (B, N_l, 4)
    anchors: jnp.ndarray,  # (N, 4) all levels concatenated
    gt_boxes: jnp.ndarray,  # (B, G, 4)
    gt_valid: jnp.ndarray,  # (B, G)
    img_hw: jnp.ndarray,  # (B, 2)
    num_samples: int = 256,
    pos_fraction: float = 0.5,
) -> dict[str, jnp.ndarray]:
    score = jnp.concatenate(scores, axis=1)  # (B, N)
    delta = jnp.concatenate(deltas, axis=1)  # (B, N, 4)
    b = score.shape[0]
    keys = jax.random.split(key, b)

    def per_image(k, sc, dl, gts, gvalid, hw):
        valid = _anchor_valid(anchors, hw)
        assigned = max_iou_assign(
            anchors, valid, gts, gvalid,
            pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
            match_low_quality=True,
        )
        inds, sel_valid, is_pos = random_sample(
            k, assigned, num_samples, pos_fraction
        )
        sel_anchor = anchors[inds]
        sel_gt = gts[jnp.clip(assigned[inds] - 1, 0, None)]
        targets = encode_deltas(sel_anchor, sel_gt)
        cls_w = sel_valid.astype(jnp.float32)
        reg_w = is_pos.astype(jnp.float32)
        n_total = sel_valid.sum().astype(jnp.float32)
        cls = binary_cross_entropy(
            sc[inds], is_pos.astype(jnp.float32), cls_w, n_total
        )
        reg = (
            jnp.abs(dl[inds] - targets).sum(-1) * reg_w
        ).sum() / jnp.maximum(n_total, 1.0)
        return cls, reg

    cls, reg = jax.vmap(per_image)(
        keys, score, delta, gt_boxes, gt_valid, img_hw
    )
    return {'loss_rpn_cls': cls.mean(), 'loss_rpn_bbox': reg.mean()}


def rpn_proposals(
    scores: list[jax.Array],  # per level (B, N_l)
    deltas: list[jax.Array],
    level_anchors: list[jnp.ndarray],
    img_hw: jnp.ndarray,  # (B, 2)
    nms_pre: int = 1000,
    max_per_img: int = 1000,
    iou_threshold: float = 0.7,
    min_bbox_size: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns ``(boxes (B, max_per_img, 4), scores, valid)``."""

    def per_image(scs, dls, hw):
        cand_boxes, cand_scores, cand_ids = [], [], []
        for lvl, (sc, dl, anc) in enumerate(zip(scs, dls, level_anchors)):
            k = min(nms_pre, sc.shape[0])
            top_sc, top_i = jax.lax.top_k(jax.nn.sigmoid(sc), k)
            boxes = decode_deltas(anc[top_i], dl[top_i])
            boxes = clip_boxes(boxes, hw)
            cand_boxes.append(boxes)
            cand_scores.append(top_sc)
            cand_ids.append(jnp.full(k, lvl, jnp.int32))
        boxes = jnp.concatenate(cand_boxes)
        sc = jnp.concatenate(cand_scores)
        ids = jnp.concatenate(cand_ids)
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        ok = (w > min_bbox_size) & (h > min_bbox_size)
        sc = jnp.where(ok, sc, NEG_INF)
        idx, valid = batched_nms(boxes, sc, ids, iou_threshold, max_per_img)
        return boxes[idx], jnp.where(valid, sc[idx], 0.0), valid

    # vmap maps axis 0 of every leaf: the per-level lists are pytrees,
    # so per_image receives lists of single-image arrays.
    return jax.vmap(per_image)(scores, deltas, img_hw)


def convert_torch_rpn(state: dict[str, np.ndarray],
                      prefix: str = 'rpn_head.') -> Params:
    """mmdet RPNHead state dict → params (``rpn_conv``, ``rpn_cls``,
    ``rpn_reg``)."""

    def a(name):
        return np.asarray(state[prefix + name], np.float32)

    def cv(name):
        return {
            'w': a(f'{name}.weight').transpose(2, 3, 1, 0),
            'b': a(f'{name}.bias'),
        }

    return jax.tree.map(jnp.asarray, {
        'conv': cv('rpn_conv'),
        'cls': cv('rpn_cls'),
        'reg': cv('rpn_reg'),
    })
