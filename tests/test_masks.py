"""Mask ops: polygon resampling, device rasterization, paste/IoU; the
FCN mask head; LVIS evaluation rules."""

import numpy as np
import jax
import jax.numpy as jnp

from oadp_tpu.ops import masks as M


def test_resample_polygons_preserves_square():
    square = [0.0, 0, 10, 0, 10, 10, 0, 10]
    out = M.resample_polygons([square], n_parts=2, n_verts=16)
    assert out.shape == (2, 16, 2)
    # all resampled points on the square's perimeter
    pts = out[0]
    on_edge = (
        (np.isclose(pts[:, 0], 0) | np.isclose(pts[:, 0], 10)
         | np.isclose(pts[:, 1], 0) | np.isclose(pts[:, 1], 10))
        & (pts >= -1e-6).all(-1) & (pts <= 10 + 1e-6).all(-1)
    )
    assert on_edge.all()
    # padding slot far away
    assert (out[1] < -1e5).all()


def test_rasterize_in_boxes_square():
    # square polygon [2,2]-[8,8]; roi covers [0,10]^2 at 10x10 grid
    poly = M.resample_polygons([[2.0, 2, 8, 2, 8, 8, 2, 8]], 2, 32)
    polys = jnp.asarray(poly[None])  # (G=1, P, V, 2)
    boxes = jnp.asarray([[0.0, 0, 10, 10]])
    out = np.asarray(M.rasterize_in_boxes(
        polys, jnp.asarray([0]), boxes, out_size=10
    ))[0]
    # grid centers at .5, 1.5, ...: inside for centers in (2, 8)
    expected = np.zeros((10, 10))
    expected[3:8, 3:8] = 1  # centers 2.5..7.5... wait 2.5 > 2 -> idx 2
    expected = np.zeros((10, 10))
    for i in range(10):
        for j in range(10):
            cy, cx = i + 0.5, j + 0.5
            expected[i, j] = (2 < cx < 8) and (2 < cy < 8)
    np.testing.assert_array_equal(out, expected)


def test_polygon_raster_np_matches_device():
    rng = np.random.default_rng(0)
    # random star-shaped polygon
    angles = np.sort(rng.uniform(0, 2 * np.pi, 12))
    radii = rng.uniform(3, 10, 12)
    pts = np.stack(
        [15 + radii * np.cos(angles), 15 + radii * np.sin(angles)], -1
    )
    poly_flat = pts.reshape(-1).tolist()
    host = M.polygon_raster_np([poly_flat], 0, 0, 30, 30)

    dev_poly = M.resample_polygons([poly_flat], 1, 128)
    dev = np.asarray(M.rasterize_in_boxes(
        jnp.asarray(dev_poly[None]), jnp.asarray([0]),
        jnp.asarray([[0.0, 0, 30, 30]]), out_size=30,
    ))[0]
    # resampling may wiggle the boundary by a pixel; interiors agree
    agree = (host == dev.astype(bool)).mean()
    assert agree > 0.97, agree


def test_paste_mask_np_identity():
    mask = np.zeros((4, 4), np.float32)
    mask[1:3, 1:3] = 1.0
    out = M.paste_mask_np(mask, np.asarray([0.0, 0, 8, 8]), 0, 0, 8, 8)
    # center 4x4 block (mask upsampled 2x)
    assert out[3:5, 3:5].all()
    assert not out[0].any() and not out[:, 0].any()


def test_mask_iou_pairs_exact():
    # det mask = full box [0,10]^2; gt = same square polygon -> IoU ~1
    full = np.ones((28, 28), np.float32)
    dt = [(full, np.asarray([0.0, 0, 10, 10]))]
    gt_polys = [[[0.0, 0, 10, 0, 10, 10, 0, 10]]]
    gt_boxes = np.asarray([[0.0, 0, 10, 10]])
    iou = M.mask_iou_pairs(dt, gt_polys, gt_boxes, np.zeros(1, bool))
    assert iou[0, 0] > 0.8
    # disjoint gt
    gt_polys2 = [[[100.0, 100, 110, 100, 110, 110, 100, 110]]]
    gt_boxes2 = np.asarray([[100.0, 100, 110, 110]])
    iou2 = M.mask_iou_pairs(dt, gt_polys2, gt_boxes2, np.zeros(1, bool))
    assert iou2[0, 0] == 0.0


def test_mask_head_shapes_and_loss():
    from oadp_tpu.models.mask_head import (
        MaskHeadConfig, init_mask_head, mask_head_forward, mask_loss,
    )
    cfg = MaskHeadConfig(num_convs=2, in_channels=8, conv_channels=8)
    params = init_mask_head(jax.random.key(0), cfg)
    x = jnp.ones((3, 14, 14, 8))
    logits = mask_head_forward(params, x)
    assert logits.shape == (3, 28, 28)
    targets = jnp.zeros((3, 28, 28))
    loss = mask_loss(logits, targets, jnp.asarray([True, True, False]))
    assert np.isfinite(float(loss)) and float(loss) > 0
    # no positives -> zero-ish loss denominator guard
    loss0 = mask_loss(logits, targets, jnp.zeros(3, bool))
    assert float(loss0) == 0


def test_lvis_federated_rule():
    from oadp_tpu.dp.lvis_eval import LvisEvaluator, ov_lvis_summary
    ds = {
        'images': [
            # img 0: cat 1 annotated (pos), cat 2 verified absent (neg)
            {'id': 0, 'neg_category_ids': [2]},
            # img 1: nothing known about cat 2
            {'id': 1, 'neg_category_ids': []},
        ],
        'annotations': [
            dict(id=1, image_id=0, category_id=1, bbox=[10, 10, 20, 20],
                 area=400, iscrowd=0),
            dict(id=2, image_id=1, category_id=1, bbox=[10, 10, 20, 20],
                 area=400, iscrowd=0),
        ],
        'categories': [
            {'id': 1, 'frequency': 'f'},
            {'id': 2, 'frequency': 'r'},
        ],
    }
    ev = LvisEvaluator(ds, [1, 2])
    dets = [
        dict(image_id=0, category_id=1, bbox=[10, 10, 20, 20], score=0.9),
        dict(image_id=1, category_id=1, bbox=[10, 10, 20, 20], score=0.9),
        # cat-2 FP on img 0 (neg-verified): must count as FP
        dict(image_id=0, category_id=2, bbox=[50, 50, 10, 10], score=0.8),
        # cat-2 det on img 1 (unverified): must be DROPPED
        dict(image_id=1, category_id=2, bbox=[50, 50, 10, 10], score=0.8),
    ]
    ev.evaluate(dets)
    out = ov_lvis_summary(ev)
    assert out['lvis_bbox_AP50'] == 1.0  # cat 1 perfect; cat 2 no gt
    assert out['lvis_bbox_APf'] == 1.0
    assert out['lvis_bbox_APr'] == -1.0  # no rare gt anywhere


def test_mask_head_torch_parity():
    """FCN mask head vs a torch oracle (incl. the ConvTranspose2d
    upsample conversion)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from oadp_tpu.models.mask_head import (
        MaskHeadConfig, convert_torch_mask_head, mask_head_forward,
    )

    torch.manual_seed(0)
    c = 8

    class Oracle(nn.Module):
        def __init__(self):
            super().__init__()
            self.convs = nn.ModuleList([
                nn.Sequential(nn.Conv2d(c, c, 3, padding=1))
                for _ in range(2)
            ])
            # mmdet naming: convs.{i}.conv.*
            for m in self.convs:
                m.conv = m[0]
            self.upsample = nn.ConvTranspose2d(c, c, 2, stride=2)
            self.conv_logits = nn.Conv2d(c, 1, 1)

        def forward(self, x):
            for m in self.convs:
                x = F.relu(m[0](x))
            x = F.relu(self.upsample(x))
            return self.conv_logits(x)[:, 0]

    net = Oracle().eval()
    state = {
        f'convs.{i}.conv.{k}': v
        for i, m in enumerate(net.convs)
        for k, v in m[0].state_dict().items()
    }
    state.update({f'upsample.{k}': v
                  for k, v in net.upsample.state_dict().items()})
    state.update({f'conv_logits.{k}': v
                  for k, v in net.conv_logits.state_dict().items()})
    state = {k: v.numpy() for k, v in state.items()}
    params = convert_torch_mask_head(state, prefix='')

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 14, 14, c)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(mask_head_forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def _hires_gt_area(polys, box, S=8):
    """Supersampled polygon area oracle (S^2 samples per pixel)."""
    from oadp_tpu.ops.masks import polygon_raster_np
    x0, y0 = int(np.floor(box[0])), int(np.floor(box[1]))
    w = int(np.ceil(box[2])) - x0 + 1
    h = int(np.ceil(box[3])) - y0 + 1
    scaled = [list(np.asarray(p, np.float64) * S) for p in polys]
    r = polygon_raster_np(scaled, x0 * S, y0 * S, w * S, h * S)
    return r, (x0, y0, w, h)


def _hires_iou(dt_mask, dt_box, polys, gt_box, S=8, thr=0.5):
    """Supersampled IoU oracle over the union rectangle of both boxes."""
    from oadp_tpu.ops.masks import paste_mask_np, polygon_raster_np
    x0 = int(np.floor(min(dt_box[0], gt_box[0])))
    y0 = int(np.floor(min(dt_box[1], gt_box[1])))
    x1 = int(np.ceil(max(dt_box[2], gt_box[2]))) + 1
    y1 = int(np.ceil(max(dt_box[3], gt_box[3]))) + 1
    w, h = x1 - x0, y1 - y0
    dr = paste_mask_np(
        dt_mask, np.asarray(dt_box, np.float64) * S,
        x0 * S, y0 * S, w * S, h * S, thr,
    )
    scaled = [list(np.asarray(p, np.float64) * S) for p in polys]
    gr = polygon_raster_np(scaled, x0 * S, y0 * S, w * S, h * S)
    inter = int((dr & gr).sum())
    union = int(dr.sum()) + int(gr.sum()) - inter
    return inter / union if union else 0.0


def test_mask_iou_adversarial_bound():
    """Quantify the polygon-raster IoU deviation vs a supersampled
    oracle on adversarial shapes (the reference uses pycocotools RLE;
    this pins the per-pixel approximation to a documented bound).
    Shapes: ring with hole, multi-part, thin diagonal sliver, star,
    sub-pixel offsets."""
    from oadp_tpu.ops.masks import mask_iou_pairs, polygon_raster_np

    def ring(cx, cy, r_out, r_in, n=64):
        t = np.linspace(0, 2 * np.pi, n, endpoint=False)
        outer = np.stack([cx + r_out * np.cos(t),
                          cy + r_out * np.sin(t)], -1).reshape(-1)
        inner = np.stack([cx + r_in * np.cos(t),
                          cy + r_in * np.sin(t)], -1).reshape(-1)
        return [list(outer), list(inner)]  # even-odd: hole

    def star(cx, cy, r1, r2, n=10):
        t = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
        r = np.where(np.arange(2 * n) % 2 == 0, r1, r2)
        return [list(np.stack([cx + r * np.cos(t),
                               cy + r * np.sin(t)], -1).reshape(-1))]

    cases = [
        ('ring', ring(30.3, 28.7, 20.0, 9.5), (9.3, 7.7, 51.3, 49.7)),
        ('two-part', [
            [5.2, 5.8, 25.1, 5.8, 25.1, 24.9, 5.2, 24.9],
            [40.6, 40.1, 58.9, 40.1, 58.9, 58.4, 40.6, 58.4],
        ], (5.2, 5.8, 58.9, 58.4)),
        ('sliver', [[2.2, 3.1, 60.7, 55.4, 61.5, 56.9, 3.0, 4.6]],
         (2.2, 3.1, 61.5, 56.9)),
        ('star', star(32.1, 31.4, 28.0, 9.0), (4.1, 3.4, 60.1, 59.4)),
        ('subpixel', [[10.49, 10.51, 40.51, 10.49, 40.49, 40.51,
                       10.51, 40.49]], (10.49, 10.49, 40.51, 40.51)),
    ]

    worst = 0.0
    for name, polys, gt_box in cases:
        gt_box = np.asarray(gt_box, np.float64)
        # dt = the same shape, downsampled to the 28x28 paste mask (the
        # production detection representation), box jittered half a pixel
        dt_box = gt_box + np.array([0.4, -0.3, 0.2, 0.5])
        x0, y0 = dt_box[0], dt_box[1]
        bw, bh = dt_box[2] - x0, dt_box[3] - y0
        m = 28
        xs = x0 + (np.arange(m) + 0.5) / m * bw
        ys = y0 + (np.arange(m) + 0.5) / m * bh
        # sample the polygon at the 28-grid centers -> soft-ish mask
        grid = polygon_raster_np(
            [list(np.asarray(p, np.float64) * m / max(bw, bh))
             for p in polys],
            x0 * m / max(bw, bh), y0 * m / max(bw, bh), m, m,
        ).astype(np.float32)
        ours = mask_iou_pairs(
            [(grid, dt_box)], [polys], gt_box[None], np.array([False]),
        )[0, 0]
        ref = _hires_iou(grid, dt_box, polys, gt_box, S=8)
        dev = abs(ours - ref)
        worst = max(worst, dev)
        # per-case bound: 0.05 absolute IoU even for slivers/holes
        assert dev <= 0.05, (name, ours, ref, dev)
        if ref > 0.3:  # sanity when the pair genuinely overlaps
            assert ours > 0.2, (name, ours, ref)
    # documented global bound (ops/masks.py module docstring)
    assert worst <= 0.05, worst


def test_polygon_raster_area_converges():
    """Per-pixel polygon areas converge to the supersampled truth within
    half a pixel of boundary length (even-odd raster error bound)."""
    rng = np.random.default_rng(7)
    for _ in range(5):
        n = int(rng.integers(5, 12))
        t = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(5, 25, n)
        cx, cy = rng.uniform(30, 40, 2)
        poly = list(np.stack([cx + r * np.cos(t),
                              cy + r * np.sin(t)], -1).reshape(-1))
        xs = poly[0::2]
        ys = poly[1::2]
        box = (min(xs), min(ys), max(xs), max(ys))
        from oadp_tpu.ops.masks import polygon_raster_np
        coarse, (x0, y0, w, h) = _hires_gt_area([poly], box, S=1)
        fine, _ = _hires_gt_area([poly], box, S=8)
        a1 = coarse.sum()
        a8 = fine.sum() / 64.0
        # boundary length bound: perimeter/2 pixels of slack
        pts = np.stack([xs, ys], -1)
        per = np.linalg.norm(
            np.diff(np.concatenate([pts, pts[:1]]), axis=0), axis=1
        ).sum()
        assert abs(a1 - a8) <= 0.5 * per + 2.0, (a1, a8, per)
