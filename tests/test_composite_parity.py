"""Composite full-detector parity against ONE composed oracle.

Every stage of the inference chain has its own oracle test (resnet/fpn
in ``test_backbone``, rpn proposals in ``test_rpn``, RoIAlign/NMS in
``test_det_ops``, heads in ``test_head_interop``) — this test composes
the torch/numpy oracles into a single reference forward

    backbone → FPN → RPN (top-k/NMS) → RoIAlign → bbox+object heads →
    ViLD λ-calibration → multiclass NMS

and asserts end-to-end detection parity against
``models/detector.simple_test``, bounding the ACCUMULATED deviation of
the whole chain (reference ``oadp/dp/detectors.py:78-140``,
``oadp/dp/roi_heads.py:64-112``). With no real weights/data in this
environment this is the closest available proxy for the OV-COCO AP
parity target (BASELINE.md).
"""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')
nn = torch.nn

import oadp_tpu.models.fpn as FP  # noqa: E402
import oadp_tpu.models.resnet as RN  # noqa: E402
from oadp_tpu.models import detector as DET  # noqa: E402
from oadp_tpu.models.heads import convert_torch_convfc_head  # noqa: E402
from oadp_tpu.models.rpn import convert_torch_rpn  # noqa: E402
from tests.oracles import resnet_torch as bb_oracle  # noqa: E402
from tests.test_det_ops import (  # noqa: E402
    _oracle_nms,
    _oracle_roi_align_single,
)
from tests.test_head_interop import _OracleHead  # noqa: E402

NUM_BASES, NUM_ALL, EMB = 3, 5, 16
CANVAS = 64
BLOCKS = (1, 1, 1, 1)
BASE = 8
REG_STDS = (0.1, 0.1, 0.2, 0.2)


@pytest.fixture(autouse=True)
def _mini_resnet(monkeypatch):
    monkeypatch.setitem(RN.STAGE_BLOCKS, 50, BLOCKS)


# -- numpy pieces of the composed oracle ------------------------------------


def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _np_decode(boxes, deltas, stds):
    d = deltas * np.asarray(stds, np.float64)
    max_ratio = abs(math.log(16 / 1000))
    dw = np.clip(d[:, 2], -max_ratio, max_ratio)
    dh = np.clip(d[:, 3], -max_ratio, max_ratio)
    pw = boxes[:, 2] - boxes[:, 0]
    ph = boxes[:, 3] - boxes[:, 1]
    px = (boxes[:, 0] + boxes[:, 2]) * 0.5
    py = (boxes[:, 1] + boxes[:, 3]) * 0.5
    gx = px + pw * d[:, 0]
    gy = py + ph * d[:, 1]
    gw = pw * np.exp(dw)
    gh = ph * np.exp(dh)
    return np.stack(
        [gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2], -1
    )


def _np_proposals(scores, deltas, level_anchors, hw, nms_pre, max_out,
                  iou_thr=0.7):
    """Per-level top-k → decode → clip → level-aware NMS → top max_out
    (the mmdet RPN test path; same oracle as test_rpn, refactored)."""
    cand = []
    for lvl, (sc, dl, anc) in enumerate(zip(scores, deltas, level_anchors)):
        s = 1 / (1 + np.exp(-sc))
        order = np.argsort(-s)[:nms_pre]
        b = _np_decode(anc[order], dl[order], (1, 1, 1, 1))
        b[:, 0::2] = b[:, 0::2].clip(0, hw[1])
        b[:, 1::2] = b[:, 1::2].clip(0, hw[0])
        keep = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
        for i in np.flatnonzero(keep):
            cand.append((s[order[i]], b[i], lvl))
    cand.sort(key=lambda t: -t[0])
    kept = []
    for s, b, lvl in cand:
        ok = True
        for _, b2, lvl2 in kept:
            if lvl2 != lvl:
                continue
            x1, y1 = max(b[0], b2[0]), max(b[1], b2[1])
            x2, y2 = min(b[2], b2[2]), min(b[3], b2[3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            a1 = (b[2] - b[0]) * (b[3] - b[1])
            a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
            if inter / (a1 + a2 - inter) > iou_thr:
                ok = False
                break
        if ok:
            kept.append((s, b, lvl))
        if len(kept) == max_out:
            break
    return (
        np.asarray([k[1] for k in kept]),
        np.asarray([k[0] for k in kept]),
    )


def _np_roi_feats(fpn_np, rois, strides=(4, 8, 16, 32), finest=56.0):
    lvls = np.clip(
        np.floor(np.log2(
            np.sqrt(np.clip(
                (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]),
                0, None,
            )) / finest + 1e-6
        )), 0, len(strides) - 1,
    ).astype(int)
    return np.stack([
        _oracle_roi_align_single(
            fpn_np[lvl], roi, strides[lvl], 7, 2
        )
        for roi, lvl in zip(rois, lvls)
    ])


def _np_multiclass_nms(boxes, probs, iou_thr, max_per_img):
    """mmdet multiclass_nms: per-class greedy NMS (score_thr=0 strict),
    merged and sorted by score, top max_per_img. Returns
    (dets (M, 5), labels, rows)."""
    out = []
    for c in range(probs.shape[1] - 1):  # bg column excluded
        sc = probs[:, c]
        sel = np.flatnonzero(sc > 0.0)
        keep = _oracle_nms(
            boxes[sel].astype(np.float32), sc[sel].astype(np.float32),
            iou_thr,
        )
        for i in keep:
            out.append((sc[sel[i]], boxes[sel[i]], c, sel[i]))
    out.sort(key=lambda t: -t[0])
    out = out[:max_per_img]
    return (
        np.asarray([np.concatenate([b, [s]]) for s, b, _, _ in out]),
        np.asarray([c for _, _, c, _ in out]),
        np.asarray([r for _, _, _, r in out]),
    )


# -- torch RPN head (mmdet RPNHead layout) ----------------------------------


class _TorchRPN(nn.Module):
    def __init__(self, c, a):
        super().__init__()
        torch.manual_seed(3)
        self.rpn_conv = nn.Conv2d(c, c, 3, padding=1)
        self.rpn_cls = nn.Conv2d(c, a, 1)
        self.rpn_reg = nn.Conv2d(c, a * 4, 1)

    def forward(self, feats):
        scores, deltas = [], []
        for f in feats:
            x = torch.relu(self.rpn_conv(f))
            s = self.rpn_cls(x).permute(0, 2, 3, 1)
            d = self.rpn_reg(x).permute(0, 2, 3, 1)
            b, h, w, a = s.shape
            scores.append(s.reshape(b, h * w * a))
            deltas.append(d.reshape(b, h * w * a, 4))
        return scores, deltas


def _mini_detector_config():
    config = DET.DetectorConfig.build(
        NUM_BASES, NUM_ALL, backbone_style='caffe',
        rpn_test_nms_pre=64, rpn_test_max=32, rcnn_max_per_img=8,
    )

    def head(h):
        return dataclasses.replace(
            h, in_channels=32, conv_channels=32, fc_channels=64,
            classifier=dataclasses.replace(
                h.classifier, in_features=64, embedding_dim=EMB,
            ),
        )

    return dataclasses.replace(
        config,
        backbone=RN.ResNetConfig(style='caffe', base_channels=BASE),
        fpn_channels=32,
        bbox_head=head(config.bbox_head),
        object_head=head(config.object_head),
        block_head=head(config.block_head),
        global_cls=dataclasses.replace(
            config.global_cls, in_features=32, embedding_dim=EMB
        ),
    )


def test_composite_detector_parity():
    config = _mini_detector_config()

    # --- torch reference modules ------------------------------------
    torch.manual_seed(0)
    backbone = bb_oracle.ResNet(
        blocks=BLOCKS, base=BASE, style='caffe'
    ).eval()
    bb_oracle.randomize_bn_stats(backbone, 0)
    in_ch = tuple(BASE * 4 * (2 ** i) for i in range(4))
    fpn = bb_oracle.FPN(in_channels=in_ch, out=32).eval()
    bb_oracle.randomize_bn_stats(fpn, 1)
    rpn = _TorchRPN(32, config.anchor_generator.num_base_anchors).eval()
    bbox_head = _OracleHead(32, 32, 64, with_reg=True).eval()
    object_head = _OracleHead(32, 32, 64, with_reg=False).eval()
    # decorrelate the two heads (each __init__ reseeds torch)
    g = torch.Generator().manual_seed(42)
    with torch.no_grad():
        for p in object_head.parameters():
            p.add_(0.1 * torch.randn(p.shape, generator=g))
    emb = bbox_head.embeddings.numpy()

    # --- graft torch weights onto the jax detector -------------------
    params, stats = DET.init_detector(
        jax.random.key(0), config, jnp.asarray(emb)
    )
    bb_state = {k: v.numpy() for k, v in backbone.state_dict().items()}
    params['backbone'], stats['backbone'] = RN.convert_torch_resnet(
        bb_state, depth=50
    )
    fpn_state = {k: v.numpy() for k, v in fpn.state_dict().items()}
    params['fpn'], stats['fpn'] = FP.convert_torch_fpn(
        fpn_state, prefix=''
    )
    rpn_state = {k: v.numpy() for k, v in rpn.state_dict().items()}
    params['rpn'] = convert_torch_rpn(rpn_state, prefix='')
    params['bbox_head'], stats['bbox_head'] = convert_torch_convfc_head(
        bbox_head.state_dict_mmdet('bb.'), 'bb.', config.bbox_head,
        params['bbox_head'],
    )
    params['object_head'], stats['object_head'] = (
        convert_torch_convfc_head(
            object_head.state_dict_mmdet('obj.'), 'obj.',
            config.object_head, params['object_head'],
        )
    )

    gen = config.anchor_generator
    sizes = [
        (math.ceil(CANVAS / s), math.ceil(CANVAS / s)) for s in gen.strides
    ]
    level_anchors_np = gen.grid_anchors(sizes)
    level_anchors = [jnp.asarray(a) for a in level_anchors_np]

    rng = np.random.default_rng(11)
    image = rng.standard_normal((CANVAS, CANVAS, 3)).astype(np.float32)
    batch = {
        'images': jnp.asarray(image[None]),
        'img_hw': jnp.asarray([[CANVAS, CANVAS]], jnp.float32),
    }

    # --- jax chain ---------------------------------------------------
    out = DET.simple_test(params, stats, batch, config, level_anchors)
    valid_p = np.asarray(out['proposal_valid'][0])
    got_props = np.asarray(out['boxes'][0])  # decoded rcnn boxes
    got_bbox_logits = np.asarray(out['bbox_logits'][0])
    got_obj_logits = np.asarray(out['object_logits'][0])
    got_objness = np.asarray(out['objectness'][0])
    det_valid = np.asarray(out['valid'][0])
    got_dets = np.asarray(out['dets'][0])[det_valid]
    got_labels = np.asarray(out['labels'][0])[det_valid]

    # --- composed oracle chain ---------------------------------------
    with torch.no_grad():
        feats = backbone(
            torch.from_numpy(image.transpose(2, 0, 1)[None])
        )
        pyramid = fpn(feats)
        scores_t, deltas_t = rpn(pyramid)
    pyramid_np = [
        p.numpy()[0].transpose(1, 2, 0) for p in pyramid
    ]
    scores_np = [s.numpy()[0].astype(np.float64) for s in scores_t]
    deltas_np = [d.numpy()[0].astype(np.float64) for d in deltas_t]

    props, prop_scores = _np_proposals(
        scores_np, deltas_np, level_anchors_np, (CANVAS, CANVAS),
        config.rpn_test_nms_pre, config.rpn_test_max,
    )
    n_props = len(props)

    # proposal parity (count, order, boxes, scores)
    assert int(valid_p.sum()) == n_props
    np.testing.assert_allclose(got_objness[:n_props], prop_scores,
                               atol=1e-4)

    roi_feats = _np_roi_feats(pyramid_np, props)
    with torch.no_grad():
        t_feats = torch.from_numpy(
            roi_feats.transpose(0, 3, 1, 2).astype(np.float32)
        )
        _, reg, proj_b = bbox_head(t_feats)
        _, _, proj_o = object_head(t_feats)
        bg_b = torch.nn.functional.normalize(bbox_head.bg)
        bg_o = torch.nn.functional.normalize(object_head.bg)
        cos_b = (proj_b @ torch.cat(
            [bbox_head.embeddings, bg_b]
        ).T).numpy().astype(np.float64)
        cos_o = (proj_o @ torch.cat(
            [object_head.embeddings, bg_o]
        ).T).numpy().astype(np.float64)
        reg = reg.numpy().astype(np.float64)

    # eval-mode classifier transforms (models/heads.classifier_forward)
    c = config.bbox_head.classifier
    bbox_logits = cos_b / c.scaler_val  # vild temperature
    co = config.object_head.classifier
    obj_logits = cos_o * co.scaler - co.bias  # affine
    obj_logits[:, -1] = -1e10  # suppress_bg_logit

    np.testing.assert_allclose(
        got_bbox_logits[:n_props] * c.scaler_val, cos_b, atol=5e-3
    )
    np.testing.assert_allclose(
        got_obj_logits[:n_props, :-1], obj_logits[:, :-1], atol=5e-3
    )

    # λ-calibration (oadp/dp/roi_heads.py:93-112)
    lam = np.full(NUM_ALL + 1, 1 / 3)
    lam[:NUM_BASES] = 2 / 3
    cls = _np_softmax(bbox_logits) ** lam * (
        _np_softmax(obj_logits) ** (1 - lam)
    )
    cls[:, -1] = 1 - cls[:, :-1].sum(-1)
    probs = cls / np.clip(cls.sum(-1, keepdims=True), 1e-12, None)

    boxes = _np_decode(props, reg, REG_STDS)
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, CANVAS)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, CANVAS)
    np.testing.assert_allclose(got_props[:n_props], boxes, atol=5e-3)

    want_dets, want_labels, _ = _np_multiclass_nms(
        boxes, probs, config.rcnn_nms_iou, config.rcnn_max_per_img
    )

    # --- end-to-end detection parity ---------------------------------
    assert len(got_dets) == len(want_dets)
    assert list(got_labels) == list(want_labels)
    np.testing.assert_allclose(
        got_dets[:, :4], want_dets[:, :4], atol=5e-3
    )
    np.testing.assert_allclose(
        got_dets[:, 4], want_dets[:, 4], atol=1e-3
    )
