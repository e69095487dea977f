"""ViLD / OADP detectors: training losses + calibrated inference.

Functional JAX redesign of the reference detector assembly
(``oadp/dp/detectors.py``, ``oadp/dp/roi_heads.py``):

* the ``SelfDistiller`` forward-hook machinery is replaced by explicit
  data flow — heads return their normalized projections and the
  distillation losses are computed right here (SURVEY.md §7.5);
* every per-image list (gts, proposals, OAKE boxes) is padded + masked;
  the whole train step is one jittable function of
  ``(params, stats, batch, step, rng)``;
* inference applies the ViLD ensemble calibration
  (``oadp/dp/roi_heads.py:64-112``): softmax(bbox)^λ * softmax(obj)^(1-λ)
  with λ = 2/3 for bases, 1/3 for novels/background, background
  renormalized to 1 - Σ.

Batch layout (all static shapes; *_valid are bool masks):
    images (B,H,W,3) normalized; img_hw (B,2) resized shapes;
    gt_boxes (B,G,4), gt_labels (B,G), gt_valid (B,G);
    clip_global (B,D);
    block_boxes (B,K,4), block_labels (B,K,num_all), clip_blocks (B,K,D),
    block_valid (B,K);
    object_boxes (B,O,4), clip_objects (B,O,D), object_valid (B,O).
"""

__all__ = ['DetectorConfig', 'init_detector', 'forward_train', 'simple_test']

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..base import losses as L
from ..ops.anchors import AnchorGenerator
from ..ops.assign import max_iou_assign, random_sample
from ..ops.coder import clip_boxes, decode_deltas, encode_deltas
from ..ops.nms import multiclass_nms
from ..ops.roi_align import roi_align_fpn
from . import fpn as FP
from . import resnet as RN
from . import rpn as RPN
from .heads import (
    ClassifierConfig,
    HeadConfig,
    convfc_forward,
    global_head_forward,
    init_convfc_head,
    init_global_head,
)
from .mask_head import (
    MaskHeadConfig,
    init_mask_head,
    mask_head_forward,
    mask_loss,
)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    num_bases: int = 48
    num_all: int = 65
    backbone: RN.ResNetConfig = RN.ResNetConfig(style='caffe')
    fpn_channels: int = 256
    anchor_generator: AnchorGenerator = AnchorGenerator()
    with_global: bool = True
    with_block: bool = True
    with_mask: bool = False
    mask_head: MaskHeadConfig = MaskHeadConfig()
    # heads (classifier sub-configs are derived in __post_init__ callers)
    bbox_head: HeadConfig = None  # type: ignore[assignment]
    object_head: HeadConfig = None  # type: ignore[assignment]
    block_head: HeadConfig = None  # type: ignore[assignment]
    global_cls: ClassifierConfig = None  # type: ignore[assignment]
    # train cfg (reference configs/dp/models/faster_rcnn_r50_fpn.py:74-119)
    rpn_samples: int = 256
    rpn_pos_fraction: float = 0.5
    rpn_train_nms_pre: int = 2000
    rpn_train_max: int = 1000
    rcnn_samples: int = 512
    rcnn_pos_fraction: float = 0.25
    rcnn_pos_iou: float = 0.5
    # test cfg (vild_ensemble overlay :41-44)
    rpn_test_nms_pre: int = 1000
    rpn_test_max: int = 1000
    rcnn_score_thr: float = 0.0
    rcnn_nms_iou: float = 0.5
    rcnn_max_per_img: int = 300
    # distillation gains (configs/dp/models/{vild_ensemble,global_,block}.py)
    objects_gain: float = 256.0
    objects_warmup: int = 200
    blocks_gain: float = 128.0
    blocks_rkd_gain: float = 8.0
    blocks_warmup: int = 200
    block_loss_gain: float = 16.0
    block_loss_warmup: int = 1000
    block_topk: int = 5
    global_loss_gain: float = 4.0
    global_loss_warmup: int = 2000
    global_topk: int = 20
    global_distill_gain: float = 0.5
    global_distill_warmup: int = 200
    bbox_reg_stds: tuple = (0.1, 0.1, 0.2, 0.2)

    @staticmethod
    def build(
        num_bases: int,
        num_all: int,
        with_global: bool = True,
        with_block: bool = True,
        with_mask: bool = False,
        backbone_style: str = 'caffe',
        vild_scaler_train: float = 0.007,
        vild_scaler_val: float = 0.01,
        cls_scaler: float = 1.0,
        cls_bias: float = 0.0,
        head_cls_mode: str = 'affine',
        global_vild_scaler: tuple | None = None,
        **overrides,
    ) -> 'DetectorConfig':
        """Assemble the OADP/ViLD head configuration.

        ``head_cls_mode`` selects the object/block/global classifier:
        'affine' = Classifier with scaler/bias from ml_coco.pth
        (OV-COCO, reference ``configs/dp/oadp_ov_coco.py``); 'vild' =
        ViLDClassifier with the same temperature as the bbox head
        (OV-LVIS, reference ``configs/dp/oadp_ov_lvis.py``)."""
        vild = ClassifierConfig(
            in_features=1024, num_bases=num_bases, num_all=num_all,
            with_bg=True, mode='vild',
            scaler_train=vild_scaler_train, scaler_val=vild_scaler_val,
        )
        if head_cls_mode == 'vild':
            affine = vild
        else:
            affine = ClassifierConfig(
                in_features=1024, num_bases=num_bases, num_all=num_all,
                with_bg=True, mode='affine',
                scaler=cls_scaler, bias=cls_bias,
            )
        return DetectorConfig(
            num_bases=num_bases,
            num_all=num_all,
            backbone=RN.ResNetConfig(style=backbone_style),
            with_global=with_global,
            with_block=with_block,
            with_mask=with_mask,
            bbox_head=HeadConfig(
                num_convs=4, num_fcs=1, with_reg=True,
                reg_class_agnostic=True, classifier=vild,
            ),
            object_head=HeadConfig(
                num_convs=4, num_fcs=1, with_reg=False,
                suppress_bg_logit=True,
                classifier=dataclasses.replace(affine, freeze_bg=True),
            ),
            block_head=HeadConfig(
                num_convs=0, num_fcs=2, with_reg=False, classifier=affine,
            ),
            global_cls=dataclasses.replace(
                affine,
                in_features=256,
                with_bg=False,
                # OV-LVIS: the global head keeps the DEFAULT ViLD
                # temperature while the other heads override it
                # (reference configs/dp/oadp_ov_lvis.py:20-26 vs :13-17)
                **(
                    dict(
                        scaler_train=global_vild_scaler[0],
                        scaler_val=global_vild_scaler[1],
                    )
                    if global_vild_scaler else {}
                ),
            ),
            **overrides,
        )


def init_detector(
    key: jax.Array,
    config: DetectorConfig,
    text_embeddings: jnp.ndarray,  # (num_all, D) bbox-head prompts (vild)
    ml_embeddings: jnp.ndarray | None = None,  # object/block/global prompts
) -> tuple[Params, Params]:
    """Random init. Returns ``(params, bn_stats)``; pretrained weights
    (SoCo / torchvision) are grafted on top via the converters in
    ``resnet.py`` / ``fpn.py``."""
    if ml_embeddings is None:
        ml_embeddings = text_embeddings
    ks = jax.random.split(key, 7)
    backbone, bb_stats = RN.init_resnet_params(ks[0], config.backbone)
    fpn, fpn_stats = FP.init_fpn_params(
        ks[1], config.backbone.out_channels, config.fpn_channels
    )
    rpn = RPN.init_rpn_params(
        ks[2], config.fpn_channels, config.fpn_channels,
        config.anchor_generator.num_base_anchors,
    )
    bbox_head, bbox_stats = init_convfc_head(
        ks[3], text_embeddings, config.bbox_head
    )
    object_head, object_stats = init_convfc_head(
        ks[4], ml_embeddings, config.object_head
    )
    params: Params = {
        'backbone': backbone,
        'fpn': fpn,
        'rpn': rpn,
        'bbox_head': bbox_head,
        'object_head': object_head,
    }
    stats: Params = {
        'backbone': bb_stats,
        'fpn': fpn_stats,
        'bbox_head': bbox_stats,
        'object_head': object_stats,
    }
    if config.with_block:
        params['block_head'], stats['block_head'] = init_convfc_head(
            ks[5], ml_embeddings, config.block_head
        )
    if config.with_global:
        params['global_head'] = init_global_head(
            ks[6], ml_embeddings, config.global_cls
        )
    if config.with_mask:
        params['mask_head'] = init_mask_head(
            jax.random.fold_in(key, 7), config.mask_head
        )
    return params, stats


def _extract(params, stats, images, config, train):
    feats, bb_stats = RN.resnet_forward(
        params['backbone'], stats['backbone'], images, config.backbone,
        train,
    )
    pyramid, fpn_stats = FP.fpn_forward(
        params['fpn'], stats['fpn'], feats, num_outs=5, train=train
    )
    return pyramid, {'backbone': bb_stats, 'fpn': fpn_stats}


# mmdet img_norm_cfg shared by all DP configs (reference
# configs/dp/datasets/ov_coco.py:9-13)
IMG_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
IMG_STD = np.asarray([58.395, 57.12, 57.375], np.float32)


def ingest_images(images: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Turn loader canvases into activation tensors ON DEVICE.

    The production loaders ship uint8 canvases (the reference instead
    normalizes per image on the dataloader CPU workers — mmdet
    ``Normalize``, reference ``configs/dp/datasets/ov_coco.py:9-13``):
    mean/std normalization here is one fused elementwise pass on
    device, saves ~35 ms/image of host fp32 math and ships 4x fewer
    bytes (uint8 vs fp32). Pre-normalized float inputs (tests,
    benchmarks) pass through with just the dtype cast."""
    if images.dtype == jnp.uint8:
        x = (images.astype(jnp.float32) - IMG_MEAN) / IMG_STD
        return x.astype(dtype)
    return images.astype(dtype)


def _lambda(config: DetectorConfig) -> np.ndarray:
    lam = np.full(config.num_all + 1, 1 / 3, np.float32)
    lam[:config.num_bases] = 2 / 3
    return lam


def _roi_feats(pyramid, rois_batched):
    """Batched FPN RoIAlign: (levels (B,H,W,C), rois (B,R,4)) →
    (B, R, 7, 7, C)."""
    return jax.vmap(
        lambda feats, rois: roi_align_fpn(feats, rois)
    )(pyramid, rois_batched)


def forward_train(
    params: Params,
    stats: Params,
    batch: dict[str, jax.Array],
    config: DetectorConfig,
    level_anchors: list[jnp.ndarray],  # per-level anchors (static canvas)
    step: jax.Array,
    rng: jax.Array,
) -> tuple[dict[str, jax.Array], Params]:
    """All training losses (RPN + RCNN + OV heads + distillation)."""
    images = batch['images']
    b = images.shape[0]
    k_rpn, k_rcnn = jax.random.split(rng)

    pyramid, new_stats = _extract(params, stats, images, config, True)

    # --- RPN ---------------------------------------------------------
    anchors = jnp.concatenate(level_anchors)
    scores, deltas = RPN.rpn_forward(params['rpn'], pyramid)
    losses = RPN.rpn_loss(
        k_rpn, scores, deltas, anchors,
        batch['gt_boxes'], batch['gt_valid'], batch['img_hw'],
        config.rpn_samples, config.rpn_pos_fraction,
    )
    proposals, _, prop_valid = RPN.rpn_proposals(
        [jax.lax.stop_gradient(s) for s in scores],
        [jax.lax.stop_gradient(d) for d in deltas],
        level_anchors, batch['img_hw'],
        nms_pre=config.rpn_train_nms_pre,
        max_per_img=config.rpn_train_max,
    )

    # --- RCNN sampling (add_gt_as_proposals=True) ---------------------
    gt_boxes, gt_valid = batch['gt_boxes'], batch['gt_valid']
    cand = jnp.concatenate([gt_boxes, proposals], axis=1)
    cand_valid = jnp.concatenate([gt_valid, prop_valid], axis=1)

    def sample_one(key, boxes, valid, gts, gvalid, glabels):
        assigned = max_iou_assign(
            boxes, valid, gts, gvalid,
            pos_iou_thr=config.rcnn_pos_iou,
            neg_iou_thr=config.rcnn_pos_iou,
            min_pos_iou=config.rcnn_pos_iou,
            match_low_quality=False,
        )
        inds, sel_valid, is_pos = random_sample(
            key, assigned, config.rcnn_samples, config.rcnn_pos_fraction
        )
        rois = boxes[inds]
        gt_idx = jnp.clip(assigned[inds] - 1, 0, None)
        labels = jnp.where(
            is_pos, glabels[gt_idx], config.num_all
        )  # bg = num_all
        reg_targets = encode_deltas(
            rois, gts[gt_idx], stds=config.bbox_reg_stds
        )
        return rois, labels, reg_targets, sel_valid, is_pos, gt_idx

    (
        rois, labels, reg_targets, sel_valid, is_pos, roi_gt_idx
    ) = jax.vmap(sample_one)(
        jax.random.split(k_rcnn, b), cand, cand_valid,
        gt_boxes, gt_valid, batch['gt_labels'],
    )

    # ONE RoIAlign over rcnn + object + block rois: the gather is the
    # expensive part and batches better than three separate calls (its
    # backward is also a single scatter-add instead of three).
    r = config.rcnn_samples
    o = batch['object_boxes'].shape[1]
    all_rois = [rois, batch['object_boxes']]
    if config.with_block:
        all_rois.append(batch['block_boxes'])
    packed_feats = _roi_feats(pyramid, jnp.concatenate(all_rois, axis=1))
    roi_feats = packed_feats[:, :r]
    obj_feats = packed_feats[:, r:r + o]
    flat_feats = roi_feats.reshape(b * r, *roi_feats.shape[2:])
    labels_f = labels.reshape(-1)
    sel_f = sel_valid.reshape(-1)
    cls_logits, reg, _, bbox_stats = convfc_forward(
        params['bbox_head'], stats['bbox_head'], flat_feats,
        config.bbox_head, True, valid=sel_f,
    )
    new_stats['bbox_head'] = bbox_stats
    pos_f = is_pos.reshape(-1)
    n_samples = jnp.maximum(sel_f.sum().astype(jnp.float32), 1.0)
    losses['loss_cls'] = L.softmax_cross_entropy(
        cls_logits, labels_f, sel_f.astype(jnp.float32), n_samples
    )
    losses['acc'] = (
        (cls_logits.argmax(-1) == labels_f) & sel_f
    ).sum() / n_samples * 100.0
    reg_t = reg_targets.reshape(-1, 4)
    losses['loss_bbox'] = (
        jnp.abs(reg - reg_t).sum(-1) * pos_f.astype(jnp.float32)
    ).sum() / n_samples

    # --- mask head (LVIS instance segmentation) ------------------------
    if config.with_mask:
        mc = config.mask_head
        from ..ops.masks import rasterize_in_boxes

        def mask_one(feats, im_rois, im_polys, im_assigned):
            feats14 = roi_align_fpn(feats, im_rois, out_size=mc.roi_size)
            targets = rasterize_in_boxes(
                im_polys, im_assigned, im_rois, mc.mask_size
            )
            return feats14, targets

        mask_feats, mask_targets = jax.vmap(mask_one)(
            pyramid, rois, batch['gt_polygons'], roi_gt_idx
        )
        mask_logits = mask_head_forward(
            params['mask_head'],
            mask_feats.reshape(b * r, *mask_feats.shape[2:]),
        )
        losses['loss_mask'] = mask_loss(
            mask_logits,
            mask_targets.reshape(b * r, mc.mask_size, mc.mask_size),
            pos_f,
        )

    # --- object head distillation -------------------------------------
    obj_mask = batch['object_valid'].reshape(-1)
    _, _, obj_proj, object_stats = convfc_forward(
        params['object_head'], stats['object_head'],
        obj_feats.reshape(b * o, *obj_feats.shape[2:]),
        config.object_head, True, valid=obj_mask,
    )
    new_stats['object_head'] = object_stats
    losses['loss_clip_objects'] = L.l1_loss(
        obj_proj, batch['clip_objects'].reshape(b * o, -1), obj_mask
    ) * L.warmup_weight(step, config.objects_gain, config.objects_warmup)

    # --- block head ----------------------------------------------------
    if config.with_block:
        blk_feats = packed_feats[:, r + o:]
        kk = batch['block_boxes'].shape[1]
        blk_mask = batch['block_valid'].reshape(-1)
        blk_logits, _, blk_proj, block_stats = convfc_forward(
            params['block_head'], stats['block_head'],
            blk_feats.reshape(b * kk, *blk_feats.shape[2:]),
            config.block_head, True, valid=blk_mask,
        )
        new_stats['block_head'] = block_stats
        blk_targets = batch['block_labels'].reshape(b * kk, -1)
        losses['loss_block'] = L.asymmetric_loss(
            jax.nn.sigmoid(blk_logits[:, :-1]), blk_targets, blk_mask,
            gamma_neg=4, gamma_pos=0,
        ) * L.warmup_weight(
            step, config.block_loss_gain, config.block_loss_warmup
        )
        losses['recall_block'] = L.multilabel_topk_recall(
            blk_logits[:, :-1], blk_targets, config.block_topk, blk_mask
        )
        losses['loss_clip_blocks'] = L.l1_loss(
            blk_proj, batch['clip_blocks'].reshape(b * kk, -1), blk_mask
        ) * L.warmup_weight(step, config.blocks_gain, config.blocks_warmup)
        losses['loss_clip_block_relations'] = L.rkd_loss(
            blk_proj, batch['clip_blocks'].reshape(b * kk, -1), blk_mask
        ) * L.warmup_weight(
            step, config.blocks_rkd_gain, config.blocks_warmup
        )

    # --- global head ----------------------------------------------------
    if config.with_global:
        g_logits, g_proj = global_head_forward(
            params['global_head'], pyramid, config.global_cls, True
        )
        g_targets = jax.vmap(
            lambda lbl, ok: jnp.zeros(config.num_all, bool).at[
                jnp.clip(lbl, 0, config.num_all - 1)
            ].max(ok)
        )(batch['gt_labels'], batch['gt_valid'])
        losses['loss_global'] = L.asymmetric_loss(
            jax.nn.sigmoid(g_logits), g_targets, None,
            gamma_neg=4, gamma_pos=0,
        ) * L.warmup_weight(
            step, config.global_loss_gain, config.global_loss_warmup
        )
        losses['recall_global'] = L.multilabel_topk_recall(
            g_logits, g_targets, config.global_topk
        )
        losses['loss_clip_global'] = L.mse_loss(
            g_proj, batch['clip_global'], reduction='sum'
        ) * L.warmup_weight(
            step, config.global_distill_gain, config.global_distill_warmup
        )

    return losses, new_stats


def simple_test(
    params: Params,
    stats: Params,
    batch: dict[str, jax.Array],
    config: DetectorConfig,
    level_anchors: list[jnp.ndarray],
) -> dict[str, jax.Array]:
    """Calibrated inference. Returns per image ``dets (B, M, 5)`` in
    resized-image coordinates (caller rescales), ``labels (B, M)``,
    ``det_valid (B, M)`` — plus the raw per-roi logits for DUMP mode
    (reference ``oadp/dp/roi_heads.py:131-166``)."""
    images = batch['images']
    pyramid, _ = _extract(params, stats, images, config, False)
    scores, deltas = RPN.rpn_forward(params['rpn'], pyramid)
    proposals, prop_scores, prop_valid = RPN.rpn_proposals(
        scores, deltas, level_anchors, batch['img_hw'],
        nms_pre=config.rpn_test_nms_pre,
        max_per_img=config.rpn_test_max,
    )
    b, n = proposals.shape[:2]
    roi_feats = _roi_feats(pyramid, proposals)
    flat = roi_feats.reshape(b * n, *roi_feats.shape[2:])
    bbox_logits, reg, _, _ = convfc_forward(
        params['bbox_head'], stats['bbox_head'], flat,
        config.bbox_head, False,
    )
    object_logits, _, _, _ = convfc_forward(
        params['object_head'], stats['object_head'], flat,
        config.object_head, False,
    )

    lam = jnp.asarray(_lambda(config))
    bbox_scores = jax.nn.softmax(bbox_logits.astype(jnp.float32), -1) ** lam
    object_scores = jax.nn.softmax(
        object_logits.astype(jnp.float32), -1
    ) ** (1 - lam)
    cls_score = bbox_scores * object_scores
    cls_score = cls_score.at[:, -1].set(
        1 - cls_score[:, :-1].sum(-1)
    )
    # mmdet applies softmax(log p) downstream = p renormalized
    probs = cls_score / jnp.clip(cls_score.sum(-1, keepdims=True), 1e-12)
    probs = probs.reshape(b, n, -1)
    bbox_logits = bbox_logits.reshape(b, n, -1)
    object_logits = object_logits.reshape(b, n, -1)

    boxes = decode_deltas(
        proposals.reshape(-1, 4), reg, stds=config.bbox_reg_stds
    ).reshape(b, n, 4)
    boxes = jax.vmap(clip_boxes)(boxes, batch['img_hw'])

    def nms_one(bx, pr, pv):
        pr = jnp.where(pv[:, None], pr, 0.0)
        return multiclass_nms(
            bx, pr,
            score_thr=config.rcnn_score_thr,
            iou_threshold=config.rcnn_nms_iou,
            max_per_img=config.rcnn_max_per_img,
            num_classes=config.num_all,
        )

    dets, det_labels, det_rows, det_valid = jax.vmap(nms_one)(
        boxes, probs, prop_valid
    )
    out_masks = None
    if config.with_mask:
        mc = config.mask_head
        m = dets.shape[1]
        mask_feats = jax.vmap(
            lambda feats, bx: roi_align_fpn(
                feats, bx, out_size=mc.roi_size
            )
        )(pyramid, dets[..., :4])
        mask_logits = mask_head_forward(
            params['mask_head'],
            mask_feats.reshape(b * m, *mask_feats.shape[2:]),
        )
        out_masks = jax.nn.sigmoid(
            mask_logits.astype(jnp.float32)
        ).reshape(b, m, mc.mask_size, mc.mask_size)
    return {
        'dets': dets,
        'labels': det_labels,
        'valid': det_valid,
        'masks': out_masks,
        # DUMP-mode record (reference roi_heads.py:131-166)
        'boxes': boxes,
        'bbox_logits': bbox_logits,
        'object_logits': object_logits,
        'objectness': prop_scores,
        'proposal_valid': prop_valid,
        'det_rows': det_rows,
    }
