"""RPN: head flattening order vs anchor layout, proposal generation vs
a numpy oracle, loss sampling semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from oadp_tpu.models import rpn as R
from oadp_tpu.ops.anchors import AnchorGenerator
from oadp_tpu.ops.coder import decode_deltas


def test_forward_flatten_order_matches_anchors():
    """Scores must flatten in (y, x, anchor) order — the order
    ``AnchorGenerator.grid_anchors`` emits. A mismatch here would pair
    every prediction with the wrong anchor."""
    fh, fw, a, c = 2, 3, 3, 4
    params = {
        # identity tower: 1x1-like passthrough via zero conv + relu on
        # positive inputs
        'conv': {'w': np.zeros((3, 3, c, c), np.float32),
                 'b': np.zeros(c, np.float32)},
        'cls': {'w': np.zeros((1, 1, c, a), np.float32),
                'b': np.zeros(a, np.float32)},
        'reg': {'w': np.zeros((1, 1, c, a * 4), np.float32),
                'b': np.zeros(a * 4, np.float32)},
    }
    # conv: passthrough of channel 0 (center tap identity)
    params['conv']['w'][1, 1, 0, 0] = 1.0
    # cls head: anchor k reads channel 0 scaled by (k+1)
    for k in range(a):
        params['cls']['w'][0, 0, 0, k] = k + 1.0
    params = jax.tree.map(jnp.asarray, params)

    # feature channel 0 encodes the cell id y*W + x (positive, survives
    # the relu)
    feat = np.zeros((1, fh, fw, c), np.float32)
    for y in range(fh):
        for x in range(fw):
            feat[0, y, x, 0] = 1 + y * fw + x
    scores, deltas = R.rpn_forward(params, [jnp.asarray(feat)])
    got = np.asarray(scores[0][0])  # (fh*fw*a,)
    expected = np.asarray([
        (1 + y * fw + x) * (k + 1)
        for y in range(fh) for x in range(fw) for k in range(a)
    ], np.float32)
    np.testing.assert_allclose(got, expected, rtol=1e-6)

    # and grid_anchors uses the same (y, x, anchor) order
    gen = AnchorGenerator(strides=(4,))
    anchors = gen.grid_anchors([(fh, fw)])[0]
    centers = (anchors[:, :2] + anchors[:, 2:]) / 2
    expected_centers = np.asarray([
        (x * 4, y * 4)
        for y in range(fh) for x in range(fw) for _ in range(a)
    ], np.float32)
    np.testing.assert_allclose(centers, expected_centers, atol=1e-5)


def test_rpn_proposals_match_numpy_oracle():
    """Top-k → decode → clip → level-aware NMS → top max_per_img."""
    rng = np.random.default_rng(0)
    gen = AnchorGenerator(strides=(4, 8))
    sizes = [(8, 8), (4, 4)]
    level_anchors = [jnp.asarray(x) for x in gen.grid_anchors(sizes)]
    n0, n1 = 8 * 8 * 3, 4 * 4 * 3
    scores = [
        jnp.asarray(rng.standard_normal((1, n0)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, n1)).astype(np.float32)),
    ]
    deltas = [
        jnp.asarray(
            rng.standard_normal((1, n0, 4)).astype(np.float32) * 0.1
        ),
        jnp.asarray(
            rng.standard_normal((1, n1, 4)).astype(np.float32) * 0.1
        ),
    ]
    img_hw = jnp.asarray([[30.0, 32.0]])
    nms_pre, max_out, iou_thr = 20, 10, 0.7
    boxes, out_scores, valid = R.rpn_proposals(
        scores, deltas, level_anchors, img_hw,
        nms_pre=nms_pre, max_per_img=max_out, iou_threshold=iou_thr,
    )
    boxes, out_scores, valid = (
        np.asarray(boxes)[0], np.asarray(out_scores)[0],
        np.asarray(valid)[0],
    )

    # numpy oracle
    cand = []
    for lvl, (sc, dl, anc) in enumerate(
        zip(scores, deltas, level_anchors)
    ):
        s = 1 / (1 + np.exp(-np.asarray(sc)[0]))
        order = np.argsort(-s)[:nms_pre]
        b = np.array(decode_deltas(np.asarray(anc)[order],
                                   np.asarray(dl)[0][order]))
        b[:, 0::2] = b[:, 0::2].clip(0, 32.0)
        b[:, 1::2] = b[:, 1::2].clip(0, 30.0)
        w = b[:, 2] - b[:, 0]
        h = b[:, 3] - b[:, 1]
        for i in range(len(b)):
            if w[i] > 0 and h[i] > 0:
                cand.append((s[order[i]], b[i], lvl))
    cand.sort(key=lambda t: -t[0])
    kept = []
    for s, b, lvl in cand:
        ok = True
        for s2, b2, lvl2 in kept:
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

    got_n = int(valid.sum())
    assert got_n == len(kept)
    for i in range(got_n):
        np.testing.assert_allclose(out_scores[i], kept[i][0], rtol=1e-5)
        np.testing.assert_allclose(boxes[i], kept[i][1], atol=1e-4)


def test_rpn_loss_counts():
    """Sampled 256 anchors at pos_fraction .5; loss finite, grads flow."""
    gen = AnchorGenerator(strides=(4,))
    anchors = jnp.asarray(gen.grid_anchors([(16, 16)])[0])
    n = anchors.shape[0]
    rng = np.random.default_rng(0)
    params = R.init_rpn_params(jax.random.key(0), 8, 8)
    feat = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    scores, deltas = R.rpn_forward(params, [feat])
    gts = jnp.asarray([[[4.0, 4, 28, 28], [30.0, 30, 60, 62]]] * 2)
    gvalid = jnp.ones((2, 2), bool)
    img_hw = jnp.asarray([[64.0, 64.0]] * 2)
    losses = R.rpn_loss(
        jax.random.key(0), scores, deltas, anchors, gts, gvalid, img_hw,
    )
    assert np.isfinite(float(losses['loss_rpn_cls']))
    assert np.isfinite(float(losses['loss_rpn_bbox']))
    assert float(losses['loss_rpn_bbox']) > 0  # positives exist
