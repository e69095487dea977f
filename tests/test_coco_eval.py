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
