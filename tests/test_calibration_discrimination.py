"""Calibration discrimination: the sweep's end-to-end objective must
RANK ensembles, not just run.

Constructs a synthetic DUMP set engineered so the reference-default
ensemble λ=(2/3, 1/3) (reference ``oadp/dp/test_nni.py:179-189``) is
optimal: every image holds one base-class GT plus three recorded
detections — a correct one and two distractors whose bbox/object
probabilities are arranged so the correct detection outranks both ONLY
when γ_object/γ_bbox lies in a window containing the default ratio.
``run_trial`` must score the default strictly above perturbations in
each direction (bbox-heavy, object-heavy, objectness-boosted), and the
TPE sweep (``tools/calibrate_sweep.py`` space) must recover an optimal
setting within a small trial budget — validating the full
rescore → multiclass NMS → OV-COCO-eval objective, not just the
sampler (which ``test_search.py`` covers on analytic functions).
"""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from oadp_tpu.base import coco  # noqa: E402
from oadp_tpu.dp.test_calibrate import (  # noqa: E402
    DEFAULT_PARAMS,
    CalibrationRunner,
)
from oadp_tpu.utils import Config  # noqa: E402

N_IMAGES = 6
CANVAS = 200


def _prob_row(p_cls: float, cls: int, k1: int = 66) -> np.ndarray:
    """Probability vector: ``p_cls`` on ``cls``, rest uniform."""
    p = np.full(k1, (1.0 - p_cls) / (k1 - 1), np.float64)
    p[cls] = p_cls
    return p


@pytest.fixture(scope='module')
def dump_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp('calib')
    dump = root / 'dump'
    dump.mkdir()

    images, annotations = [], []
    categories = [
        dict(id=i + 1, name=name) for i, name in enumerate(coco.all_)
    ]
    for i in range(N_IMAGES):
        img_id = 100 + i
        cls = i  # distinct base classes (labels 0..5 of 48 bases)
        images.append(dict(
            id=img_id, file_name=f'{img_id:012d}.jpg',
            width=CANVAS, height=CANVAS,
        ))
        annotations.append(dict(
            id=i + 1, image_id=img_id, category_id=cls + 1,
            bbox=[10.0, 10.0, 40.0, 40.0], area=1600.0, iscrowd=0,
        ))

        # det 0 = correct (IoU 1 with GT); dets 1/2 = distractors.
        # Probabilities: correct beats distractor1 iff γ_bb > γ_ob
        # (log-margin (γ_bb-γ_ob)·ln2) and beats distractor2 iff
        # γ_ob > 0.379·γ_bb (margin 0.693·γ_ob - 0.262·γ_bb) — the
        # default (2/3, 1/3) sits inside the window, the tested
        # perturbations outside.
        boxes = np.asarray([
            [10, 10, 50, 50],  # == GT
            [100, 100, 140, 140],
            [10, 100, 50, 140],
        ], np.float32)
        pb = np.stack([
            _prob_row(0.40, cls),  # correct: strong bbox prob
            _prob_row(0.20, cls),  # d1: weak bbox, strong object
            _prob_row(0.52, cls),  # d2: stronger bbox, weak object
        ])
        po = np.stack([
            _prob_row(0.20, cls),
            _prob_row(0.40, cls),
            _prob_row(0.10, cls),
        ])
        # objectness favors the distractors: any objectness_gamma > the
        # default 0 boosts them past the correct det
        objectness = np.asarray([0.4, 0.8, 0.8], np.float32)
        torch.save({
            'bboxes': torch.from_numpy(boxes),
            'bbox_logits': torch.from_numpy(
                np.log(pb).astype(np.float32)
            ),
            'object_logits': torch.from_numpy(
                np.log(po).astype(np.float32)
            ),
            'objectness': torch.from_numpy(objectness),
        }, dump / f'{img_id:012d}.pth')

    ann_file = root / 'instances.json'
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations, categories=categories,
    )))
    config = Config._wrap(dict(
        categories='coco',
        validator=dict(dataloader=dict(dataset=dict(
            ann_file=str(ann_file), img_prefix=str(root),
        ))),
    ))
    runner = CalibrationRunner(
        config, str(dump), batch_size=N_IMAGES, max_proposals=3
    )
    runner._test_config = config  # for the memory-guard test
    runner._test_dump = str(dump)
    return runner


def _value(runner, params):
    return float(runner.run_trial(params)['COCO_48_bbox_mAP_50'])


def test_default_beats_perturbations(dump_setup):
    runner = dump_setup
    default = _value(runner, dict(DEFAULT_PARAMS))
    assert default == pytest.approx(1.0, abs=1e-6)

    perturbations = [
        # object-heavy mix: γ_bb < γ_ob → distractor1 outranks
        dict(DEFAULT_PARAMS, bbox_base_gamma=1 / 3,
             object_base_gamma=2 / 3),
        # bbox-heavy mix: γ_ob/γ_bb < 0.379 → distractor2 outranks
        dict(DEFAULT_PARAMS, bbox_base_gamma=0.8,
             object_base_gamma=0.2),
        # objectness boost flips both distractors past the correct det
        dict(DEFAULT_PARAMS, objectness_gamma=1.0),
    ]
    for p in perturbations:
        assert _value(runner, p) < default - 0.25, p


def test_tpe_sweep_recovers_optimum(dump_setup):
    """The TPE driver (tools/calibrate_sweep.py space) must reach the
    optimal metric within a small budget — WITHOUT the default-params
    warm start the CLI seeds trial 0 with."""
    import importlib
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    sweep = importlib.import_module('tools.calibrate_sweep')
    from oadp_tpu.utils.search import TpeSampler

    runner = dump_setup
    sampler = TpeSampler(sweep.SEARCH_SPACE, seed=3)
    best = -1.0
    for _ in range(40):
        params = sampler.ask()
        value = _value(runner, params)
        sampler.tell(params, value)
        best = max(best, value)
        if best >= 1.0 - 1e-6:
            break
    assert best == pytest.approx(1.0, abs=1e-6), best
    # sanity: the optimum the sweep found equals the default's value
    assert best == pytest.approx(
        _value(runner, dict(DEFAULT_PARAMS)), abs=1e-6
    )


def test_memory_guard_fails_fast(dump_setup):
    """LVIS-scale dense record arrays must be refused up front (VERDICT
    r4 missing #3): the guard trips before any record is loaded."""
    runner = dump_setup
    with pytest.raises(SystemExit, match='GB'):
        CalibrationRunner(
            runner._test_config, runner._test_dump,
            batch_size=N_IMAGES, max_proposals=3,
            memory_budget_gb=1e-9,
        )
    # env-var override path
    import os
    os.environ['OADP_CALIBRATE_MEM_GB'] = '0'
    try:
        with pytest.raises(SystemExit, match='GB'):
            CalibrationRunner(
                runner._test_config, runner._test_dump,
                batch_size=N_IMAGES, max_proposals=3,
            )
    finally:
        del os.environ['OADP_CALIBRATE_MEM_GB']
