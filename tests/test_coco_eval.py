"""Numpy COCOeval: analytic AP cases + OV triple summary."""

from oadp_tpu.dp.coco_eval import CocoEvaluator, ov_coco_summary


def _dataset(anns, n_imgs=2, cats=(1, 2)):
    return {
        'images': [{'id': i} for i in range(n_imgs)],
        'annotations': [
            dict(
                id=j + 1, image_id=a[0], category_id=a[1],
                bbox=list(a[2]), area=a[2][2] * a[2][3],
                iscrowd=a[3] if len(a) > 3 else 0,
            )
            for j, a in enumerate(anns)
        ],
        'categories': [{'id': c} for c in cats],
    }


def _det(img, cat, bbox, score):
    return dict(image_id=img, category_id=cat, bbox=list(bbox), score=score)


def test_perfect_detection_ap1():
    ds = _dataset([(0, 1, (10, 10, 50, 50))])
    ev = CocoEvaluator(ds, [1, 2])
    ev.evaluate([_det(0, 1, (10, 10, 50, 50), 0.9)])
    stats = ev.summarize()
    assert stats[''] == 1.0
    assert stats['50'] == 1.0


def test_miss_gives_ap0():
    ds = _dataset([(0, 1, (10, 10, 50, 50))])
    ev = CocoEvaluator(ds, [1, 2])
    ev.evaluate([_det(0, 1, (200, 200, 20, 20), 0.9)])
    assert ev.summarize()[''] == 0.0


def test_loose_box_scores_only_low_ious():
    # IoU ~ 0.58: counts as TP for thresholds .5 and .55 only
    ds = _dataset([(0, 1, (0, 0, 100, 100))])
    ev = CocoEvaluator(ds, [1])
    ev.evaluate([_det(0, 1, (0, 0, 76, 100), 0.9)])  # iou = 0.76
    stats = ev.summarize()
    # thresholds .5 .55 .6 .65 .7 .75 pass (iou .76): 6/10
    assert abs(stats[''] - 0.6) < 1e-6
    assert stats['50'] == 1.0
    assert stats['75'] == 1.0


def test_fp_before_tp_halves_ap50():
    # one gt; a higher-scored FP then a TP: precision at recall 1 is 1/2
    ds = _dataset([(0, 1, (10, 10, 50, 50))])
    ev = CocoEvaluator(ds, [1])
    ev.evaluate([
        _det(0, 1, (300, 300, 20, 20), 0.95),
        _det(0, 1, (10, 10, 50, 50), 0.9),
    ])
    assert abs(ev.summarize()['50'] - 0.5) < 0.01


def test_crowd_gt_does_not_penalize():
    ds = _dataset([
        (0, 1, (10, 10, 50, 50)),
        (0, 1, (100, 100, 80, 80), 1),  # crowd
    ])
    ev = CocoEvaluator(ds, [1])
    # detection inside the crowd region is ignored, not an FP
    ev.evaluate([
        _det(0, 1, (10, 10, 50, 50), 0.9),
        _det(0, 1, (110, 110, 60, 60), 0.8),
    ])
    assert ev.summarize()['50'] == 1.0


def test_maxdets_caps_detections():
    # 1 gt; the TP is the 3rd-highest scored det -> excluded at maxDet=2
    ds = _dataset([(0, 1, (10, 10, 50, 50))])
    ev = CocoEvaluator(ds, [1], max_dets=(1, 2, 1000))
    dets = [
        _det(0, 1, (200, 200, 20, 20), 0.95),
        _det(0, 1, (300, 300, 20, 20), 0.94),
        _det(0, 1, (10, 10, 50, 50), 0.9),
    ]
    ev.evaluate(dets)
    # at maxDets[-1]=1000 the TP is found (precision 1/3 at recall 1)
    assert ev.summarize()['50'] > 0
    # re-summarize at maxDet=2 via the precision tensor: all -1/0
    p = ev.eval['precision'][:, :, :, :, 1]  # maxDet=2 slice
    assert p[p > -1].max() == 0.0


def test_ov_triple_summary_slices_categories():
    ds = _dataset([
        (0, 1, (10, 10, 50, 50)),
        (0, 2, (100, 100, 50, 50)),
        (0, 3, (200, 200, 50, 50)),
    ], cats=(1, 2, 3))
    ev = CocoEvaluator(ds, [1, 2, 3])
    # both base classes detected, the novel one missed
    ev.evaluate([
        _det(0, 1, (10, 10, 50, 50), 0.9),
        _det(0, 2, (100, 100, 50, 50), 0.8),
    ])
    out = ov_coco_summary(ev, num_bases=2, num_novels=1)
    assert out['COCO_2_bbox_mAP_50'] == 1.0  # base slice
    assert out['COCO_1_bbox_mAP_50'] == 0.0  # novel slice
    assert abs(out['COCO_2_1_bbox_mAP_50'] - 2 / 3) < 1e-4


def test_area_ranges():
    # small gt (16x16=256 < 32^2) only contributes to 's'
    ds = _dataset([(0, 1, (10, 10, 16, 16))])
    ev = CocoEvaluator(ds, [1])
    ev.evaluate([_det(0, 1, (10, 10, 16, 16), 0.9)])
    stats = ev.summarize()
    assert stats['s'] == 1.0
    assert stats['m'] == -1.0  # no medium gts
    assert stats['l'] == -1.0


def test_native_matcher_equals_python():
    """The C++ matching kernel must agree with the Python reference on
    randomized inputs (incl. crowd/ignore edge cases)."""
    import numpy as np
    from oadp_tpu.dp.coco_eval import _match_pairs_py
    from oadp_tpu.native import load_library
    import ctypes
    from oadp_tpu.dp import coco_eval as CE

    lib = load_library('cocoeval_match')
    if lib is None:
        import pytest
        pytest.skip('no C++ toolchain')

    rng = np.random.default_rng(0)
    for _ in range(50):
        nd = int(rng.integers(1, 12))
        ng = int(rng.integers(1, 8))
        ious = rng.random((nd, ng))
        g_ignore = rng.random(ng) < 0.3
        # sort gts ignored-last like _evaluate_img does
        order = np.argsort(g_ignore, kind='stable')
        g_ignore = g_ignore[order]
        iscrowd = (rng.random(ng) < 0.2) & g_ignore
        dtm_py, ig_py = _match_pairs_py(ious, g_ignore, iscrowd)
        dtm_c, ig_c = CE._match_pairs(ious, g_ignore, iscrowd)
        np.testing.assert_array_equal(dtm_c, dtm_py)
        np.testing.assert_array_equal(ig_c, ig_py)


def test_eval_speed_smoke():
    """Mid-size randomized evaluation completes and is self-consistent."""
    import numpy as np
    rng = np.random.default_rng(1)
    n_img, n_cat = 20, 10
    images = [{'id': i} for i in range(n_img)]
    anns, dets = [], []
    for i in range(n_img):
        for _ in range(5):
            c = int(rng.integers(1, n_cat + 1))
            x, y = rng.uniform(0, 400, 2)
            w, h = rng.uniform(10, 100, 2)
            anns.append(dict(
                id=len(anns) + 1, image_id=i, category_id=c,
                bbox=[x, y, w, h], area=w * h, iscrowd=0,
            ))
            # jittered detection + noise detections
            dets.append(dict(
                image_id=i, category_id=c,
                bbox=[x + rng.uniform(-3, 3), y + rng.uniform(-3, 3),
                      w, h],
                score=float(rng.uniform(0.5, 1.0)),
            ))
            dets.append(dict(
                image_id=i, category_id=int(rng.integers(1, n_cat + 1)),
                bbox=list(rng.uniform(0, 300, 2)) + [20.0, 20.0],
                score=float(rng.uniform(0, 0.5)),
            ))
    ds = dict(images=images, annotations=anns,
              categories=[{'id': c} for c in range(1, n_cat + 1)])
    ev = CocoEvaluator(ds, list(range(1, n_cat + 1)))
    ev.evaluate(dets)
    stats = ev.summarize()
    assert 0.3 < stats['50'] <= 1.0
    assert stats[''] <= stats['50']


def test_headline_map_at_maxdets_100():
    """pycocotools' _summarizeDets computes the '' stat at the default
    maxDets=100 even with params.maxDets=[100,300,1000]; only
    AP50/75/s/m/l use maxDets[-1]. A TP ranked past 100 must therefore
    lift AP50 but not the headline mAP."""
    ds = _dataset([(0, 1, (10, 10, 50, 50))])
    ev = CocoEvaluator(ds, [1], max_dets=(100, 300, 1000))
    dets = [
        _det(0, 1, (200 + j, 500, 5, 5), 0.9 - j * 0.001)
        for j in range(110)
    ]
    dets.append(_det(0, 1, (10, 10, 50, 50), 0.1))  # TP ranked 111th
    ev.evaluate(dets)
    stats = ev.summarize()
    assert stats[''] == 0.0  # cut by the maxDets=100 cap
    assert stats['50'] > 0.0  # found at maxDets=1000
