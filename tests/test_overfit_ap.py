"""Overfit-to-AP: the full detection loop must learn to detect.

VERDICT r4 item 3 — the strongest accuracy-parity proxy available
without real data (the reference's published evidence is its 31.3
mAPN50, ``/root/reference/README.md:316-320``): train the tiny detector
for a few hundred SGD steps on 4 fixed synthetic images with painted
rectangle objects, then run the eval path (``simple_test`` ->
``CocoEvaluator``) on the SAME images. The full chain — RPN
assign/sample -> RoI losses -> SGD -> calibrated inference ->
multiclass NMS -> COCO matching — must drive bbox mAP50 from ~0
(untrained control) to >= 0.5. A transcription slip anywhere in that
loop (assigner targets, box coding, NMS, eval matching) keeps AP near
zero while per-component tests stay green.

All 5 classes are BASE here: with random synthetic text embeddings a
base/novel split is untestable-by-construction — novel logits are
-inf during training (reference ``oadp/dp/classifiers.py:62-67``), so
novel-class accuracy exists only through CLIP semantics the synthetic
embeddings don't have, and the untrainable novel columns act as noise
attractors in the calibrated ensemble (measured: every detection
collapses onto a novel label). Novel masking/calibration semantics are
pinned by ``test_detector.py::test_novel_masked_during_training`` and
``test_calibration_discrimination.py``; this test pins "the loop can
learn to detect at all".
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import oadp_tpu.models.resnet as RN
from oadp_tpu.dp.coco_eval import CocoEvaluator
from oadp_tpu.models import detector as DET

NUM_BASES, NUM_ALL = 3, 3  # all-base: see module docstring
EMB_DIM = 16
CANVAS = 128
N_IMAGES = 4
G = 2  # GT boxes per image


@pytest.fixture(autouse=True)
def _mini_resnet(monkeypatch):
    monkeypatch.setitem(RN.STAGE_BLOCKS, 50, (1, 1, 1, 1))


def _mini_config():
    """Same tiny geometry as tests/test_detector.py (mini ResNet,
    32-channel FPN, 64-dim towers)."""
    config = DET.DetectorConfig.build(
        NUM_BASES, NUM_ALL, backbone_style='caffe',
        rcnn_samples=32, rpn_samples=16,
        rpn_train_nms_pre=64, rpn_train_max=32,
        rpn_test_nms_pre=64, rpn_test_max=32,
        rcnn_max_per_img=8,
    )
    return dataclasses.replace(
        config,
        backbone=RN.ResNetConfig(style='caffe', base_channels=8),
        fpn_channels=32,
        bbox_head=dataclasses.replace(
            config.bbox_head, in_channels=32, conv_channels=32,
            fc_channels=64,
            classifier=dataclasses.replace(
                config.bbox_head.classifier, in_features=64,
                embedding_dim=EMB_DIM,
            ),
        ),
        object_head=dataclasses.replace(
            config.object_head, in_channels=32, conv_channels=32,
            fc_channels=64,
            classifier=dataclasses.replace(
                config.object_head.classifier, in_features=64,
                embedding_dim=EMB_DIM,
            ),
        ),
        block_head=dataclasses.replace(
            config.block_head, in_channels=32, fc_channels=64,
            classifier=dataclasses.replace(
                config.block_head.classifier, in_features=64,
                embedding_dim=EMB_DIM,
            ),
        ),
        global_cls=dataclasses.replace(
            config.global_cls, in_features=32, embedding_dim=EMB_DIM,
        ),
    )


def _make_scene(rng):
    """4 images with 2 painted rectangles each: distinct positions/
    sizes, class-specific colors on a noisy background."""
    colors = np.asarray(
        [[230, 30, 30], [30, 230, 30], [30, 30, 230]], np.float32
    )
    images = np.asarray(
        rng.uniform(0, 60, (N_IMAGES, CANVAS, CANVAS, 3)), np.float32
    )
    gt_boxes = np.zeros((N_IMAGES, G, 4), np.float32)
    gt_labels = np.zeros((N_IMAGES, G), np.int32)
    half = CANVAS // 2
    for i in range(N_IMAGES):
        for j in range(G):
            w, h = rng.uniform(28, 56, 2)
            # separate halves (never overlap), fully inside the canvas
            x0 = rng.uniform(2, half - w - 2) + (0 if j == 0 else half)
            y0 = rng.uniform(2, CANVAS - 2 - h)
            x1, y1 = x0 + w, y0 + h
            cls = int(rng.integers(0, NUM_BASES))
            gt_boxes[i, j] = (x0, y0, x1, y1)
            gt_labels[i, j] = cls
            sl = (i, slice(int(y0), int(y1)), slice(int(x0), int(x1)))
            images[sl] = colors[cls] + rng.uniform(
                -10, 10, images[sl].shape
            )
    return images / 127.5 - 1.0, gt_boxes, gt_labels


def _train_batch(images, gt_boxes, gt_labels, rng, emb=None):
    """Full forward_train batch. The OBJECT distillation targets are the
    GT classes' text embeddings on the GT boxes — exactly what OAKE
    object features are in production (CLIP image features aligned with
    the text classifier) — so the object head, whose scores enter the
    calibrated ensemble at eval (``simple_test``), is trainable here.
    Block/global distill fields stay random (excluded from the
    objective)."""
    b, o, k = N_IMAGES, 4, 4
    if emb is not None:
        obj_boxes = np.tile(gt_boxes, (1, o // G, 1))[:, :o]
        clip_objects = emb[
            np.tile(gt_labels, (1, o // G))[:, :o]
        ].astype(np.float32)
    else:
        obj_boxes = gt_boxes[:, :1, :].repeat(o, 1)
        clip_objects = rng.standard_normal(
            (b, o, EMB_DIM)
        ).astype(np.float32)
    return {
        'images': jnp.asarray(images, jnp.float32),
        'img_hw': jnp.asarray([[CANVAS, CANVAS]] * b, jnp.float32),
        'gt_boxes': jnp.asarray(gt_boxes),
        'gt_labels': jnp.asarray(gt_labels),
        'gt_valid': jnp.ones((b, G), bool),
        'clip_global': jnp.asarray(
            rng.standard_normal((b, EMB_DIM)), jnp.float32
        ),
        'block_boxes': jnp.asarray(
            np.tile([[10.0, 10.0, 70.0, 70.0]], (b, k, 1)), jnp.float32
        ),
        'block_labels': jnp.zeros((b, k, NUM_ALL), bool),
        'clip_blocks': jnp.asarray(
            rng.standard_normal((b, k, EMB_DIM)), jnp.float32
        ),
        'block_valid': jnp.ones((b, k), bool),
        'object_boxes': jnp.asarray(obj_boxes, jnp.float32),
        'clip_objects': jnp.asarray(clip_objects),
        'object_valid': jnp.ones((b, o), bool),
    }


def _coco_gt(gt_boxes, gt_labels):
    images = [
        dict(id=i + 1, width=CANVAS, height=CANVAS)
        for i in range(N_IMAGES)
    ]
    annotations = []
    for i in range(N_IMAGES):
        for j in range(G):
            x0, y0, x1, y1 = (float(v) for v in gt_boxes[i, j])
            annotations.append(dict(
                id=len(annotations) + 1, image_id=i + 1,
                category_id=int(gt_labels[i, j]) + 1,
                bbox=[x0, y0, x1 - x0, y1 - y0],
                area=(x1 - x0) * (y1 - y0), iscrowd=0,
            ))
    categories = [dict(id=c + 1, name=f'c{c}') for c in range(NUM_ALL)]
    return dict(
        images=images, annotations=annotations, categories=categories
    )


def _ap50(params, stats, batch, config, anchors, dataset):
    out = DET.simple_test(
        params, stats,
        {'images': batch['images'], 'img_hw': batch['img_hw']},
        config, anchors,
    )
    dets = np.asarray(out['dets'])
    labels = np.asarray(out['labels'])
    valid = np.asarray(out['valid'])
    detections = []
    for i in range(N_IMAGES):
        for j in np.nonzero(valid[i])[0]:
            x0, y0, x1, y1 = dets[i, j, :4]
            detections.append(dict(
                image_id=i + 1, category_id=int(labels[i, j]) + 1,
                bbox=[float(x0), float(y0),
                      float(x1 - x0), float(y1 - y0)],
                score=float(dets[i, j, 4]),
            ))
    ev = CocoEvaluator(
        dataset, cat_ids=list(range(1, NUM_ALL + 1)),
        max_dets=(100, 300, 1000),
    )
    ev.evaluate(detections)
    # overall mAP50 (the OV triple-summary slicing is pinned by the
    # e2e tests; with an all-base split it degenerates to this anyway)
    return ev.summarize()['50']


def test_overfit_reaches_ap50():
    from oadp_tpu.dp.trainer import _lr_mult_tree, sgd_init, sgd_update

    rng = np.random.default_rng(7)
    images, gt_boxes, gt_labels = _make_scene(rng)
    config = _mini_config()
    emb = rng.standard_normal((NUM_ALL, EMB_DIM)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    params, stats = DET.init_detector(
        jax.random.key(0), config, jnp.asarray(emb)
    )
    gen = config.anchor_generator
    anchors = [
        jnp.asarray(a) for a in gen.grid_anchors(
            [(CANVAS // s, CANVAS // s) for s in gen.strides]
        )
    ]
    batch = _train_batch(images, gt_boxes, gt_labels, rng, emb=emb)
    dataset = _coco_gt(gt_boxes, gt_labels)

    # control: the untrained detector must be near zero
    ap_untrained = _ap50(params, stats, batch, config, anchors, dataset)
    assert ap_untrained < 0.1, ap_untrained

    lr_mults = _lr_mult_tree(params, {})

    @jax.jit
    def step(params, stats, bufs, key):
        def loss_fn(p):
            # step 10000: past every distillation warmup, so
            # loss_clip_objects carries its full gain
            losses, new_stats = DET.forward_train(
                p, stats, batch, config, anchors, jnp.asarray(10000),
                key,
            )
            sup = (
                losses['loss_rpn_cls'] + losses['loss_rpn_bbox']
                + losses['loss_cls'] + losses['loss_bbox']
                # object-head distillation toward the GT classes' text
                # embeddings: the calibrated ensemble multiplies in the
                # object head's scores at eval, so an untrained object
                # head scrambles the ranking (production gain is 256 —
                # scale it to the same order as the other terms)
                + 0.02 * losses['loss_clip_objects']
            )
            return sup, new_stats

        (sup, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        params, bufs = sgd_update(
            params, grads, bufs, jnp.asarray(0.005), lr_mults,
            momentum=0.9, weight_decay=0.0,
        )
        return params, new_stats, bufs, sup

    bufs = sgd_init(params)
    key = jax.random.key(0)  # fixed key: identical sampling every step
    best = 0.0
    p, s, bf = params, stats, bufs
    for i in range(300):
        p, s, bf, sup = step(p, s, bf, key)
        if (i + 1) % 50 == 0:
            best = max(
                best, _ap50(p, s, batch, config, anchors, dataset)
            )
            print(f'step {i + 1}: sup={float(sup):.4f} ap50={best:.3f}')
            if best >= 0.65:
                break
    assert np.isfinite(float(sup))
    assert best >= 0.5, best


def _triangle_polys(gt_boxes):
    """(B, G, 1, 4, 2) GT polygons: the right triangle on the box's
    left/top/bottom corners (half the box area) — a non-trivial shape
    the mask head must actually learn (a full-box mask would be
    satisfied by predicting all-ones)."""
    b, g = gt_boxes.shape[:2]
    polys = np.zeros((b, g, 1, 4, 2), np.float32)
    for i in range(b):
        for j in range(g):
            x0, y0, x1, y1 = gt_boxes[i, j]
            tri = [(x0, y0), (x1, y0), (x0, y1), (x0, y0)]  # V=4 pad
            polys[i, j, 0] = tri
    return polys


def _mask_separation(masks, dets, labels, valid, gt_boxes, gt_labels):
    """Mean predicted mask prob inside minus outside the GT triangle,
    averaged over detections that match a GT box (IoU >= 0.5), in each
    detection's own box frame. Returns nan if nothing matches."""
    out = []
    ms = masks.shape[-1]
    for i in range(gt_boxes.shape[0]):
        for j in np.nonzero(valid[i])[0]:
            db = dets[i, j, :4]
            best, bj = 0.0, -1
            for k in range(gt_boxes.shape[1]):
                gb = gt_boxes[i, k]
                ix0, iy0 = np.maximum(db[:2], gb[:2])
                ix1, iy1 = np.minimum(db[2:4], gb[2:4])
                inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
                a = ((db[2] - db[0]) * (db[3] - db[1])
                     + (gb[2] - gb[0]) * (gb[3] - gb[1]) - inter)
                iou = inter / max(a, 1e-6)
                if iou > best:
                    best, bj = iou, k
            if best < 0.5 or labels[i, j] != gt_labels[i, bj]:
                continue
            gb = gt_boxes[i, bj]
            # grid centers of the det box frame
            xs = db[0] + (np.arange(ms) + 0.5) / ms * (db[2] - db[0])
            ys = db[1] + (np.arange(ms) + 0.5) / ms * (db[3] - db[1])
            px, py = np.meshgrid(xs, ys)
            # inside the right triangle (x0,y0)-(x1,y0)-(x0,y1):
            # x >= x0, y >= y0, (x-x0)/(x1-x0) + (y-y0)/(y1-y0) <= 1
            u = (px - gb[0]) / max(gb[2] - gb[0], 1e-6)
            v = (py - gb[1]) / max(gb[3] - gb[1], 1e-6)
            inside = (u >= 0) & (v >= 0) & (u + v <= 1.0)
            m = masks[i, j]
            if inside.sum() == 0 or (~inside).sum() == 0:
                continue
            out.append(float(m[inside].mean() - m[~inside].mean()))
    return float(np.mean(out)) if out else float('nan')


def test_overfit_mask_head_learns_shape():
    """LVIS-path analog of the AP overfit: with ``with_mask=True`` the
    full mask chain — polygon rasterized targets (ops/masks.py:
    rasterize_in_boxes) -> RoIAlign 14x14 -> FCN mask head -> BCE ->
    SGD -> simple_test mask branch — must learn that objects are the
    TRIANGULAR half of their boxes: predicted in-box probability mass
    separates inside vs outside the triangle by >= 0.35, while the
    untrained control sits near 0 (sigmoid(~0) everywhere)."""
    import dataclasses as dc

    from oadp_tpu.dp.trainer import _lr_mult_tree, sgd_init, sgd_update
    from oadp_tpu.models.mask_head import MaskHeadConfig

    rng = np.random.default_rng(11)
    images, gt_boxes, gt_labels = _make_scene(rng)
    config = dc.replace(
        _mini_config(), with_mask=True,
        mask_head=MaskHeadConfig(
            num_convs=2, in_channels=32, conv_channels=32,
        ),
    )
    emb = rng.standard_normal((NUM_ALL, EMB_DIM)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    params, stats = DET.init_detector(
        jax.random.key(1), config, jnp.asarray(emb)
    )
    gen = config.anchor_generator
    anchors = [
        jnp.asarray(a) for a in gen.grid_anchors(
            [(CANVAS // s, CANVAS // s) for s in gen.strides]
        )
    ]
    batch = _train_batch(images, gt_boxes, gt_labels, rng, emb=emb)
    batch['gt_polygons'] = jnp.asarray(_triangle_polys(gt_boxes))

    def eval_sep(p, s):
        out = DET.simple_test(
            p, s, {'images': batch['images'], 'img_hw': batch['img_hw']},
            config, anchors,
        )
        return _mask_separation(
            np.asarray(out['masks']), np.asarray(out['dets']),
            np.asarray(out['labels']), np.asarray(out['valid']),
            gt_boxes, gt_labels,
        )

    lr_mults = _lr_mult_tree(params, {})

    @jax.jit
    def step(params, stats, bufs, key):
        def loss_fn(p):
            losses, new_stats = DET.forward_train(
                p, stats, batch, config, anchors, jnp.asarray(10000),
                key,
            )
            sup = (
                losses['loss_rpn_cls'] + losses['loss_rpn_bbox']
                + losses['loss_cls'] + losses['loss_bbox']
                + losses['loss_mask']
                + 0.02 * losses['loss_clip_objects']
            )
            return sup, new_stats

        (sup, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        params, bufs = sgd_update(
            params, grads, bufs, jnp.asarray(0.005), lr_mults,
            momentum=0.9, weight_decay=0.0,
        )
        return params, new_stats, bufs, sup

    bufs = sgd_init(params)
    key = jax.random.key(0)
    p, s, bf = params, stats, bufs
    best = -1.0
    for i in range(300):
        p, s, bf, sup = step(p, s, bf, key)
        if (i + 1) % 50 == 0 and i >= 99:
            sep = eval_sep(p, s)
            print(f'step {i + 1}: sup={float(sup):.4f} sep={sep:.3f}')
            if np.isfinite(sep):
                best = max(best, sep)
                if best >= 0.5:
                    break
    assert np.isfinite(float(sup))
    # untrained control: near-zero separation (measure AFTER training
    # so a detection exists to compare against is not required — the
    # control uses the fresh params and may legitimately have no
    # matching detection, in which case it is nan and trivially passes)
    sep0 = eval_sep(params, stats)
    assert best >= 0.35, (best, sep0)
    if np.isfinite(sep0):
        assert sep0 < 0.15, sep0
