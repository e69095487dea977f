"""AP-level bound for the polygon-raster mask IoU.

``test_masks.test_mask_iou_adversarial_bound`` pins the per-pair IoU
deviation of ``ops/masks`` vs an 8x-supersampled oracle at <= 0.05 —
but 0.05 straddles the 0.5 matching threshold, so the induced error on
the REPORTED metric (LVIS segm AP, reference consumer
``oadp/dp/datasets.py:132-134``) needs its own bound. This test runs a
full synthetic LVIS segm evaluation twice — once with the production
raster IoU, once with the supersampled oracle IoU — on an adversarial
det/GT set (rings with holes, stars, slivers, sub-pixel squares, and
detections engineered to sit NEAR the 0.5 threshold) and bounds the
AP / APr / APc / APf differences at < 0.1 AP.

Measured on this set (match flips DO occur at the straddlers):
AP dev 0.007, APr 0.037, APc 0.026, APf 0.033 — worst 0.037 AP.
"""

import numpy as np
import pytest

pytest.importorskip('torch')

from oadp_tpu.dp.lvis_eval import (  # noqa: E402
    LvisEvaluator,
    _xywh_to_xyxy,
    ov_lvis_summary,
)
from oadp_tpu.ops.masks import polygon_raster_np  # noqa: E402
from tests.test_masks import _hires_iou  # noqa: E402

N_CATS = 9  # 3 per frequency band


def _ring(cx, cy, r_out, r_in, n=48):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    outer = np.stack(
        [cx + r_out * np.cos(t), cy + r_out * np.sin(t)], -1
    ).reshape(-1)
    inner = np.stack(
        [cx + r_in * np.cos(t), cy + r_in * np.sin(t)], -1
    ).reshape(-1)
    return [list(outer), list(inner)]


def _star(cx, cy, r1, r2, n=8):
    t = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    r = np.where(np.arange(2 * n) % 2 == 0, r1, r2)
    return [list(np.stack(
        [cx + r * np.cos(t), cy + r * np.sin(t)], -1
    ).reshape(-1))]


def _square(x0, y0, s):
    return [[x0, y0, x0 + s, y0, x0 + s, y0 + s, x0, y0 + s]]


def _sliver(x0, y0, x1, y1, w=1.4):
    return [[x0, y0, x1, y1, x1 + w, y1 + w, x0 + w, y0 + w]]


def _poly_bbox(polys):
    xs = np.concatenate([np.asarray(p, np.float64)[0::2] for p in polys])
    ys = np.concatenate([np.asarray(p, np.float64)[1::2] for p in polys])
    return [float(xs.min()), float(ys.min()),
            float(xs.max() - xs.min()), float(ys.max() - ys.min())]


def _det_mask(polys, dt_box, m=28):
    """28x28 mask = polygon sampled on the dt-box grid (the production
    detection representation)."""
    x0, y0, x1, y1 = dt_box
    bw, bh = x1 - x0, y1 - y0
    scaled = []
    for p in polys:
        p = np.asarray(p, np.float64).reshape(-1, 2)
        q = np.empty_like(p)
        q[:, 0] = (p[:, 0] - x0) * m / bw
        q[:, 1] = (p[:, 1] - y0) * m / bh
        scaled.append(list(q.reshape(-1)))
    return polygon_raster_np(scaled, 0, 0, m, m).astype(np.float32)


class _OracleEvaluator(LvisEvaluator):
    """Same protocol, IoUs from the 8x-supersampled oracle."""

    def _pair_ious(self, dts, gts, iscrowd):
        if self.iou_type == 'bbox':
            return super()._pair_ious(dts, gts, iscrowd)
        out = np.zeros((len(dts), len(gts)))
        for i, d in enumerate(dts):
            db = _xywh_to_xyxy(d['bbox'])
            for j, g in enumerate(gts):
                out[i, j] = _hires_iou(
                    np.asarray(d['mask'], np.float32), db,
                    g['segmentation'], _xywh_to_xyxy(g['bbox']), S=8,
                )
        return out


def _build_eval_set():
    rng = np.random.default_rng(5)
    shapes = [
        lambda cx, cy: _ring(cx, cy, 14.0, 6.5),
        lambda cx, cy: _star(cx, cy, 15.0, 5.5),
        lambda cx, cy: _square(cx - 10.25, cy - 10.75, 21.49),
        lambda cx, cy: _sliver(cx - 14, cy - 12, cx + 13, cy + 11),
    ]
    images, annotations, detections = [], [], []
    ann_id = 1
    n_images = 8
    for img_i in range(n_images):
        img_id = 200 + img_i
        images.append(dict(
            id=img_id, width=120, height=120,
            neg_category_ids=[], not_exhaustive_category_ids=[],
        ))
        # 3 GTs per image, categories cycling over all 9
        for k in range(3):
            cat = (img_i * 3 + k) % N_CATS
            cx = 22.0 + 38.0 * k + rng.uniform(-2, 2)
            cy = 25.0 + 30.0 * (img_i % 3) + rng.uniform(-2, 2)
            polys = shapes[(img_i + k) % len(shapes)](cx, cy)
            bbox = _poly_bbox(polys)
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=cat,
                bbox=bbox, area=bbox[2] * bbox[3] * 0.6,
                segmentation=polys, iscrowd=0,
            ))
            ann_id += 1

            gt_xyxy = _xywh_to_xyxy(bbox)
            # high-IoU detection: sub-pixel jitter of the true shape
            jit = rng.uniform(-0.6, 0.6, 4)
            dt_box = gt_xyxy + jit
            detections.append(dict(
                image_id=img_id, category_id=cat,
                bbox=[dt_box[0], dt_box[1], dt_box[2] - dt_box[0],
                      dt_box[3] - dt_box[1]],
                score=float(0.9 - 0.01 * k),
                mask=_det_mask(polys, dt_box),
            ))
            # threshold-straddling detection on every other GT: shifted
            # so the oracle IoU lands near 0.5 — the worst case for the
            # 0.05 per-pair deviation
            if (img_i + k) % 2 == 0:
                shift = 0.32 * (gt_xyxy[2] - gt_xyxy[0])
                dt2 = gt_xyxy + np.array([shift, 0, shift, 0])
                detections.append(dict(
                    image_id=img_id, category_id=cat,
                    bbox=[dt2[0], dt2[1], dt2[2] - dt2[0],
                          dt2[3] - dt2[1]],
                    score=float(0.5 - 0.01 * img_i),
                    mask=_det_mask(
                        [list(np.asarray(p) + np.tile(
                            [shift, 0.0], len(p) // 2
                        )) for p in polys],
                        dt2,
                    ),
                ))
    categories = [
        dict(id=c, name=f'cat{c}', frequency='rcf'[c // 3])
        for c in range(N_CATS)
    ]
    dataset = dict(
        images=images, annotations=annotations, categories=categories
    )
    return dataset, detections


def test_lvis_segm_ap_bound_vs_supersampled_oracle():
    dataset, detections = _build_eval_set()
    cat_ids = list(range(N_CATS))

    ours = LvisEvaluator(dataset, cat_ids, iou_type='segm')
    ours.evaluate(detections)
    got = ov_lvis_summary(ours)

    oracle = _OracleEvaluator(dataset, cat_ids, iou_type='segm')
    oracle.evaluate(detections)
    want = ov_lvis_summary(oracle)

    # the oracle eval must be non-degenerate (straddlers + matches)
    assert 0.2 < want['lvis_segm_AP'] < 1.0, want

    worst = 0.0
    for key in ('lvis_segm_AP', 'lvis_segm_AP50', 'lvis_segm_APr',
                'lvis_segm_APc', 'lvis_segm_APf'):
        dev = abs(got[key] - want[key])
        worst = max(worst, dev)
        # AP-level bound induced by the <=0.05 per-pair IoU deviation
        assert dev < 0.1, (key, got[key], want[key])
    # measured on this adversarial set (documented bound; the per-pair
    # bound is test_masks.test_mask_iou_adversarial_bound)
    assert worst < 0.1
