"""Detection ops: anchors, delta coder, NMS, RoIAlign, assigner/sampler.

Oracles are independent numpy implementations of the mmdet/mmcv
semantics (reference configs ``configs/dp/models/faster_rcnn_r50_fpn.py``);
anchor values are the published mmdet base anchors for this config.
"""

import numpy as np
import jax
import jax.numpy as jnp

from oadp_tpu.ops import anchors as A
from oadp_tpu.ops import assign as S
from oadp_tpu.ops import coder as C
from oadp_tpu.ops import nms as N
from oadp_tpu.ops import roi_align as R


# -- anchors ----------------------------------------------------------------


def test_base_anchors_match_mmdet():
    gen = A.AnchorGenerator()
    base = gen.base_anchors(4)
    expected = np.array([
        [-22.6274, -11.3137, 22.6274, 11.3137],
        [-16.0, -16.0, 16.0, 16.0],
        [-11.3137, -22.6274, 11.3137, 22.6274],
    ])
    np.testing.assert_allclose(base, expected, atol=1e-3)


def test_grid_anchors_layout():
    gen = A.AnchorGenerator()
    (lvl0,) = gen.grid_anchors([(2, 3)])[:1]
    assert lvl0.shape == (2 * 3 * 3, 4)
    # second cell (x=1, y=0) shifts the square anchor by stride=4 in x
    np.testing.assert_allclose(lvl0[4], [-16 + 4, -16, 16 + 4, 16])
    # second row (x=0, y=1) shifts by stride in y
    np.testing.assert_allclose(lvl0[3 * 3 + 1], [-16, -16 + 4, 16, 16 + 4])


# -- delta coder ------------------------------------------------------------


def _oracle_encode(p, g, means, stds):
    pw, ph = p[:, 2] - p[:, 0], p[:, 3] - p[:, 1]
    px, py = (p[:, 0] + p[:, 2]) / 2, (p[:, 1] + p[:, 3]) / 2
    gw, gh = g[:, 2] - g[:, 0], g[:, 3] - g[:, 1]
    gx, gy = (g[:, 0] + g[:, 2]) / 2, (g[:, 1] + g[:, 3]) / 2
    d = np.stack(
        [(gx - px) / pw, (gy - py) / ph, np.log(gw / pw), np.log(gh / ph)],
        axis=-1,
    )
    return (d - means) / stds


def test_delta_coder_roundtrip():
    rng = np.random.default_rng(0)
    p = rng.uniform(0, 100, (20, 4)).astype(np.float32)
    p[:, 2:] = p[:, :2] + rng.uniform(5, 50, (20, 2))
    g = p + rng.uniform(-3, 3, (20, 4)).astype(np.float32)
    means, stds = (0.0, 0.0, 0.0, 0.0), (0.1, 0.1, 0.2, 0.2)
    enc = np.asarray(C.encode_deltas(p, g, means, stds))
    np.testing.assert_allclose(
        enc, _oracle_encode(p, g, np.zeros(4), np.array(stds)), rtol=2e-4,
        atol=1e-5,
    )
    dec = np.asarray(C.decode_deltas(p, enc, means, stds))
    np.testing.assert_allclose(dec, g, atol=1e-3)


def test_clip_boxes():
    boxes = jnp.asarray([[-5.0, -2.0, 900.0, 700.0]])
    out = np.asarray(C.clip_boxes(boxes, jnp.asarray([600.0, 800.0])))
    np.testing.assert_allclose(out, [[0, 0, 800, 600]])


def test_pairwise_iou():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[5.0, 5, 15, 15], [20.0, 20, 30, 30]])
    iou = np.asarray(C.pairwise_iou(a, b))
    np.testing.assert_allclose(iou, [[25 / 175, 0.0]], atol=1e-6)


# -- NMS ----------------------------------------------------------------


def _oracle_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if scores[i] <= N.NEG_INF / 2 or not alive[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area = lambda b: (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
        iou = inter / (area(boxes[i]) + area(boxes) - inter)
        alive &= iou <= thr
    return keep


def test_nms_matches_oracle():
    rng = np.random.default_rng(1)
    n = 64
    xy = rng.uniform(0, 80, (n, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(5, 40, (n, 2))], -1)
    boxes = boxes.astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    idx, valid = N.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 32)
    got = list(np.asarray(idx)[np.asarray(valid)])
    expected = _oracle_nms(boxes, scores, 0.5)[:32]
    assert got == expected


def test_nms_invalid_entries_skipped():
    boxes = jnp.asarray([[0.0, 0, 10, 10], [100.0, 100, 110, 110]])
    scores = jnp.asarray([0.9, N.NEG_INF])
    idx, valid = N.nms(boxes, scores, 0.5, 4)
    assert list(np.asarray(valid)) == [True, False, False, False]


def test_multiclass_nms():
    boxes = jnp.asarray([
        [0.0, 0, 10, 10],
        [0.5, 0, 10, 10],  # overlaps box 0
        [50.0, 50, 60, 60],
    ])
    scores = jnp.asarray([
        [0.9, 0.1, 0.0],  # class 0 strong
        [0.8, 0.7, 0.0],  # suppressed in class 0, survives class 1
        [0.2, 0.6, 0.0],
    ])
    dets, labels, rows, valid = N.multiclass_nms(
        boxes, scores, score_thr=0.05, iou_threshold=0.5,
        max_per_img=4, num_classes=2,
    )
    dets, labels, rows = (
        np.asarray(dets)[np.asarray(valid)],
        np.asarray(labels)[np.asarray(valid)],
        np.asarray(rows)[np.asarray(valid)],
    )
    # descending score; box1's class-0 entry is suppressed by box0
    np.testing.assert_allclose(dets[:, 4], [0.9, 0.7, 0.6, 0.2], atol=1e-6)
    assert list(labels) == [0, 1, 1, 0]
    assert list(rows) == [0, 1, 2, 2]


def _oracle_multiclass_nms(boxes, scores, score_thr, thr, max_per_img, c):
    """mmdet multiclass_nms: per-class greedy over rows with
    score > score_thr, merged, sorted by score, top max_per_img."""
    out = []
    for cls in range(c):
        if boxes.shape[-1] == 4:
            cb = boxes
        else:
            cb = boxes.reshape(len(boxes), c, 4)[:, cls]
        sc = np.where(scores[:, cls] > score_thr, scores[:, cls],
                      N.NEG_INF).astype(np.float32)
        for i in _oracle_nms(cb.astype(np.float32), sc, thr):
            out.append((sc[i], cb[i], cls, i))
    out.sort(key=lambda t: -t[0])
    out = out[:max_per_img]
    return out


def _check_multiclass_vs_oracle(boxes, scores, c, tile, max_per_img=40,
                                class_chunk=128):
    dets, labels, rows, valid = N.multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.0,
        iou_threshold=0.5, max_per_img=max_per_img, num_classes=c,
        tile=tile, class_chunk=class_chunk,
    )
    nv = int(np.asarray(valid).sum())
    want = _oracle_multiclass_nms(boxes, scores, 0.0, 0.5, max_per_img, c)
    assert nv == len(want)
    got = np.asarray(dets)[:nv]
    np.testing.assert_allclose(
        got[:, 4], [w[0] for w in want], rtol=1e-6
    )
    np.testing.assert_allclose(
        got[:, :4], np.asarray([w[1] for w in want]), rtol=1e-5
    )
    assert list(np.asarray(labels)[:nv]) == [w[2] for w in want]
    assert list(np.asarray(rows)[:nv]) == [w[3] for w in want]


def test_multiclass_nms_random_oracle_multitile():
    """Random boxes/scores, tile smaller than N (exercises the static
    multi-tile path incl. cross-tile suppression), shared boxes."""
    rng = np.random.default_rng(7)
    n, c = 70, 5
    xy = rng.uniform(0, 60, (n, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(8, 50, (n, 2))], -1)
    boxes = boxes.astype(np.float32)
    scores = rng.uniform(0, 1, (n, c + 1)).astype(np.float32)
    scores[rng.uniform(size=(n, c + 1)) < 0.1] = 0.0  # score_thr=0 drops
    _check_multiclass_vs_oracle(boxes, scores, c, tile=16)


def test_multiclass_nms_class_chunks():
    """LVIS-style many classes: the static class-chunk loop (chunk
    smaller than C, uneven tail chunk) matches the oracle."""
    rng = np.random.default_rng(9)
    n, c = 30, 45
    xy = rng.uniform(0, 60, (n, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(8, 50, (n, 2))], -1)
    boxes = boxes.astype(np.float32)
    scores = rng.uniform(0, 1, (n, c + 1)).astype(np.float32)
    _check_multiclass_vs_oracle(
        boxes, scores, c, tile=16, max_per_img=60, class_chunk=20,
    )


def test_multiclass_nms_no_survivors():
    """Every score at/below score_thr (strict >): zero valid rows,
    zeroed dets, -1 labels — the static output shape intact."""
    boxes = np.asarray(
        [[0.0, 0, 10, 10], [20.0, 20, 40, 40]], np.float32
    )
    scores = np.full((2, 4), 0.05, np.float32)
    dets, labels, rows, valid = N.multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.05,
        iou_threshold=0.5, max_per_img=5, num_classes=3,
    )
    assert not np.asarray(valid).any()
    assert np.asarray(dets).shape == (5, 5)
    np.testing.assert_array_equal(np.asarray(dets), 0.0)
    assert list(np.asarray(labels)) == [-1] * 5


def test_multiclass_nms_per_class_boxes():
    """The (N, C*4) per-class-box branch against the same oracle."""
    rng = np.random.default_rng(8)
    n, c = 40, 3
    xy = rng.uniform(0, 60, (n, c, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(8, 50, (n, c, 2))], -1)
    boxes = boxes.reshape(n, c * 4).astype(np.float32)
    scores = rng.uniform(0, 1, (n, c + 1)).astype(np.float32)
    _check_multiclass_vs_oracle(boxes, scores, c, tile=16)


def test_multiclass_nms_per_class_boxes_chunked():
    """Per-class boxes through the many-class lax.scan path (chunk <
    C, padded tail chunk with clamped gather rows)."""
    rng = np.random.default_rng(10)
    n, c = 25, 9
    xy = rng.uniform(0, 60, (n, c, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(8, 50, (n, c, 2))], -1)
    boxes = boxes.reshape(n, c * 4).astype(np.float32)
    scores = rng.uniform(0, 1, (n, c + 1)).astype(np.float32)
    _check_multiclass_vs_oracle(
        boxes, scores, c, tile=8, max_per_img=50, class_chunk=4,
    )


# -- RoIAlign ---------------------------------------------------------------


def _oracle_roi_align_single(feat, roi, stride, out, s):
    """mmcv aligned RoIAlign, fixed sampling_ratio, numpy."""
    h, w, c = feat.shape
    x0, y0, x1, y1 = [v / stride - 0.5 for v in roi]
    bw, bh = (x1 - x0) / out, (y1 - y0) / out
    res = np.zeros((out, out, c), np.float64)
    for by in range(out):
        for bx in range(out):
            acc = np.zeros(c)
            for iy in range(s):
                for ix in range(s):
                    y = y0 + (by + (iy + 0.5) / s) * bh
                    x = x0 + (bx + (ix + 0.5) / s) * bw
                    if y < -1 or y > h or x < -1 or x > w:
                        continue
                    y_, x_ = max(y, 0), max(x, 0)
                    yl, xl = int(y_), int(x_)
                    if yl >= h - 1:
                        yl = yh = h - 1
                        y_ = yl
                    else:
                        yh = yl + 1
                    if xl >= w - 1:
                        xl = xh = w - 1
                        x_ = xl
                    else:
                        xh = xl + 1
                    fy, fx = y_ - yl, x_ - xl
                    acc += (
                        feat[yl, xl] * (1 - fy) * (1 - fx)
                        + feat[yl, xh] * (1 - fy) * fx
                        + feat[yh, xl] * fy * (1 - fx)
                        + feat[yh, xh] * fy * fx
                    )
            res[by, bx] = acc / (s * s)
    return res


def test_roi_align_matches_oracle():
    rng = np.random.default_rng(2)
    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(rng.standard_normal((64 // (2 ** i), 80 // (2 ** i), 8))
                    .astype(np.float32))
        for i in range(4)
    ]
    rois = np.array([
        [10.0, 12.0, 90.0, 100.0],  # scale ~85 -> level 0
        [0.0, 0.0, 250.0, 250.0],  # scale 250 -> level 2
        [-5.0, -5.0, 30.0, 17.0],  # partially outside
        [3.0, 3.0, 3.0, 3.0],  # degenerate
    ], np.float32)
    out = np.asarray(R.roi_align_fpn(feats, jnp.asarray(rois)))
    levels = np.asarray(R.assign_fpn_levels(jnp.asarray(rois), 4))
    assert list(levels) == [0, 2, 0, 0]
    for i, roi in enumerate(rois):
        lvl = levels[i]
        expected = _oracle_roi_align_single(
            np.asarray(feats[lvl]), roi, strides[lvl], 7, 2
        )
        np.testing.assert_allclose(out[i], expected, atol=1e-4)


def test_roi_align_preserves_activation_dtype():
    """RoIAlign must return the feature dtype: fp32 interpolation
    weights once silently promoted the RoI features — and with them the
    whole downstream RCNN tower path — to fp32 (fixed by folding the
    weights into the feature dtype). Guard both policies."""
    rng = np.random.default_rng(0)
    rois = jnp.asarray([[4.0, 4.0, 40.0, 40.0], [0.0, 0.0, 60.0, 30.0]])
    for dtype in (jnp.bfloat16, jnp.float32):
        feats = [
            jnp.asarray(
                rng.standard_normal((64 // (2 ** i), 80 // (2 ** i), 8))
                .astype(np.float32), dtype=dtype,
            )
            for i in range(4)
        ]
        out = R.roi_align_fpn(feats, rois)
        assert out.dtype == dtype


def test_roi_align_bf16_matches_fp32():
    """The bf16 path folds all weights into one bf16 tensor and reduces
    the 16 corner terms in bf16 — a fold/ordering bug there would be
    invisible to the fp32 oracle test. Bound it against the fp32 path
    (measured healthy error today is ~0.3% of the feature scale)."""
    rng = np.random.default_rng(3)
    rois = jnp.asarray([
        [4.0, 4.0, 40.0, 40.0],
        [0.0, 0.0, 60.0, 30.0],
        [-5.0, -5.0, 200.0, 150.0],
        [17.5, 3.25, 33.0, 61.0],
    ])
    feats32 = [
        jnp.asarray(
            rng.standard_normal((64 // (2 ** i), 80 // (2 ** i), 8))
            .astype(np.float32)
        )
        for i in range(4)
    ]
    ref = np.asarray(R.roi_align_fpn(feats32, rois))
    out = np.asarray(
        R.roi_align_fpn(
            [f.astype(jnp.bfloat16) for f in feats32], rois
        ).astype(jnp.float32)
    )
    scale = float(np.abs(ref).max())
    np.testing.assert_allclose(out, ref, atol=2e-2 * scale)


# -- assigner / sampler ------------------------------------------------------


def test_max_iou_assign():
    gts = jnp.asarray([
        [0.0, 0, 10, 10],
        [20.0, 20, 40, 40],
        [0.0, 0, 0, 0],  # padding
    ])
    gt_valid = jnp.asarray([True, True, False])
    boxes = jnp.asarray([
        [0.0, 0, 10, 10],  # iou 1 with gt0 -> pos
        [0.0, 0, 5, 10],  # iou .5 with gt0 -> pos (thr .5)
        [100.0, 100, 110, 110],  # iou 0 -> neg
        [22.0, 22, 38, 38],  # high iou gt1 -> pos
        [8.0, 8, 18, 18],  # low iou -> between? iou with gt0 small -> neg
    ])
    box_valid = jnp.ones(5, bool)
    out = np.asarray(S.max_iou_assign(
        boxes, box_valid, gts, gt_valid,
        pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
        match_low_quality=False,
    ))
    assert list(out) == [1, 1, 0, 2, 0]


def test_match_low_quality_recovers_best_anchor():
    gts = jnp.asarray([[0.0, 0, 10, 10]])
    gt_valid = jnp.asarray([True])
    # no box reaches pos_iou_thr 0.7, but the best one (iou ~.47) is
    # recovered by match_low_quality with min_pos_iou 0.3
    boxes = jnp.asarray([
        [0.0, 0, 9, 5.2],
        [50.0, 50, 60, 60],
    ])
    out = np.asarray(S.max_iou_assign(
        boxes, jnp.ones(2, bool), gts, gt_valid,
        pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
        match_low_quality=True,
    ))
    assert list(out) == [1, 0]


def test_random_sample_counts():
    key = jax.random.key(0)
    # 10 positives, 100 negatives, sample 32 with pos_fraction .25
    assigned = jnp.asarray([1] * 10 + [0] * 100 + [-1] * 5)
    inds, valid, is_pos = S.random_sample(key, assigned, 32, 0.25)
    inds, valid, is_pos = map(np.asarray, (inds, valid, is_pos))
    assert valid.all()
    assert is_pos.sum() == 8  # min(10, 32*0.25)
    assert is_pos[:8].all()  # positives first
    assert (np.asarray(assigned)[inds[:8]] > 0).all()
    assert (np.asarray(assigned)[inds[8:]] == 0).all()


def test_random_sample_few_positives():
    key = jax.random.key(1)
    assigned = jnp.asarray([1] * 3 + [0] * 100)
    inds, valid, is_pos = S.random_sample(key, assigned, 32, 0.25)
    assert np.asarray(is_pos).sum() == 3
    assert np.asarray(valid).all()  # backfilled with negatives


def test_random_sample_not_enough_candidates():
    key = jax.random.key(2)
    assigned = jnp.asarray([1] * 2 + [0] * 4 + [-1] * 20)
    inds, valid, is_pos = S.random_sample(key, assigned, 32, 0.5)
    assert np.asarray(valid).sum() == 6


def test_nms_multi_tile_matches_oracle():
    """Stress the blocked formulation: >1 tile (n > 256), dense
    overlaps, early-exit, and suppression CHAINS (A kills B, so C —
    overlapped by B but not A — must be kept)."""
    rng = np.random.default_rng(7)
    n = 700
    xy = rng.uniform(0, 300, (n, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(10, 120, (n, 2))], -1)
    boxes = boxes.astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    for thr in (0.3, 0.5, 0.7):
        expected = _oracle_nms(boxes, scores, thr)
        for max_out in (16, 128, n):
            idx, valid = N.nms(
                jnp.asarray(boxes), jnp.asarray(scores), thr, max_out
            )
            got = list(np.asarray(idx)[np.asarray(valid)])
            assert got == expected[:max_out], (thr, max_out)


def test_nms_max_out_exceeds_candidates():
    """Static output shape must be (max_out,) even when max_out exceeds
    the (tile-padded) candidate count."""
    rng = np.random.default_rng(9)
    n = 100
    xy = rng.uniform(0, 300, (n, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(10, 80, (n, 2))], -1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    idx, valid = N.nms(
        jnp.asarray(boxes.astype(np.float32)), jnp.asarray(scores),
        0.5, 300,
    )
    assert idx.shape == (300,) and valid.shape == (300,)
    got = list(np.asarray(idx)[np.asarray(valid)])
    assert got == _oracle_nms(boxes.astype(np.float32), scores, 0.5)


def test_nms_suppression_chain_exact():
    """B (2nd best) is suppressed by A; C overlaps B but not A, so the
    greedy scan must KEEP C. A naive one-pass 'suppressed by any
    higher-scoring overlap' formulation would wrongly drop C."""
    boxes = jnp.asarray([
        [0.0, 0, 10, 10],     # A score .9
        [4.0, 0, 14, 10],     # B overlaps A (iou ~0.43) score .8
        [9.0, 0, 19, 10],     # C overlaps B (iou ~0.33), not A (~.05)
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idx, valid = N.nms(boxes, scores, 0.3, 3)
    got = list(np.asarray(idx)[np.asarray(valid)])
    assert got == [0, 2]


def test_nms_oscillating_suppression_terminates():
    """Regression: this exact input drove the inner suppression
    iteration into a 2-cycle (the map is antitone, not monotone) and an
    uncapped while_loop span forever under jit. The capped iteration
    must terminate AND still equal the serial greedy oracle."""
    rng = np.random.default_rng(0)
    boxes = rng.uniform(0, 50000, (3250, 4)).astype(np.float32)
    scores = rng.random(3250).astype(np.float32)
    idx, valid = jax.jit(
        lambda b, s: N.nms(b, s, 0.5, 300)
    )(jnp.asarray(boxes), jnp.asarray(scores))
    got = list(np.asarray(idx)[np.asarray(valid)])
    assert got == _oracle_nms(boxes, scores, 0.5)[:300]
