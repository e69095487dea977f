"""DP stage end-to-end on synthetic data: train CLI (DRY_RUN), loss
descent plumbing, checkpointing, test CLI with metrics, DUMP mode.
"""

import pathlib

import pytest

torch = pytest.importorskip('torch')


CFG_TEMPLATE = """
categories = 'coco'
model = dict(
    prompts={vild!r},
    ml_prompts={ml!r},
    backbone_style='caffe',
    with_global=True,
    with_block=True,
    sizes=dict(
        base_channels=8,
        fpn_channels=16,
        fc_channels=32,
        embedding_dim=32,
        stage_blocks=(1, 1, 1, 1),
    ),
    overrides=dict(
        rpn_samples=16,
        rcnn_samples=16,
        rpn_train_nms_pre=32,
        rpn_train_max=16,
        rpn_test_nms_pre=32,
        rpn_test_max=16,
        rcnn_max_per_img=8,
    ),
)
trainer = dict(
    dataloader=dict(
        samples_per_gpu=1,
        dataset=dict(
            ann_file={ann!r},
            img_prefix={img!r},
            clip_features=dict(
                globals_={oake!r} + '/globals/val2017',
                blocks={oake!r} + '/blocks/val2017',
                objects={oake!r} + '/objects/val2017',
            ),
        ),
        batch=dict(
            canvas=(192, 256),
            scales=((240, 144), (240, 144)),
            max_gts=8,
            max_blocks=8,
            max_objects=16,
        ),
    ),
    optimizer=dict(
        lr=0.001, momentum=0.9, weight_decay=2.5e-5,
        paramwise=dict(bbox_head=dict(lr_mult=0.5)),
    ),
    lr_config=dict(by_epoch=False, step=[30000]),
    runner=dict(type='IterBasedRunner', max_iters=40000),
    log_config=dict(interval=1),
    checkpoint_config=dict(by_epoch=False, interval=6),
    evaluation=dict(interval=1000000),
    seed=0,
    bf16=False,
    n_devices=1,
)
validator = dict(
    dataloader=dict(
        samples_per_gpu=1,
        dataset=dict(ann_file={ann!r}, img_prefix={img!r}),
        batch=dict(canvas=(192, 256), scale=(240, 144)),
    ),
)
"""


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    from tests.synthetic_data import make_synthetic_dp

    root = tmp_path_factory.mktemp('dp')
    data = make_synthetic_dp(root)
    cfg = root / 'config.py'
    cfg.write_text(CFG_TEMPLATE.format(
        vild=str(pathlib.Path(data['prompts']) / 'vild.pth'),
        ml=str(pathlib.Path(data['prompts']) / 'ml.pth'),
        ann=data['ann_file'],
        img=data['root'],
        oake=data['oake_root'],
    ))
    return root, cfg, data


@pytest.fixture()
def in_workdir(workspace, monkeypatch):
    root, cfg, data = workspace
    monkeypatch.chdir(root)
    monkeypatch.setenv('DRY_RUN', '1')
    # Store reads env at property access; nothing else to reset
    return root, cfg, data


def test_train_cli_dry_run(in_workdir):
    root, cfg, data = in_workdir
    from oadp_tpu.dp import train as train_cli
    # DRY_RUN + max_iters override: run 7 iters so one checkpoint lands
    train_cli.main([
        'e2e', str(cfg),
        '--override', '.trainer.runner.max_iters:7',
    ])
    work = root / 'work_dirs' / 'dry_run' / 'e2e'
    assert (work / 'config.py').exists()
    assert (work / 'latest.txt').exists()
    # checkpoint meta is self-describing: version + class names
    # (reference embeds mmdet_version + CLASSES, oadp/dp/train.py:105-108)
    import json
    ckpt_dir = (work / 'latest.txt').read_text().strip()
    meta = json.loads(
        (work / (ckpt_dir.rsplit('/', 1)[-1] + '.meta.json')).read_text()
    )
    assert meta['classes'] is not None and len(meta['classes']) == 65
    assert meta['oadp_tpu_version']
    log = (work / 'train.log').read_text()
    assert 'iter 7/7' in log
    # every loss present in the log line
    for key in ('loss_rpn_cls', 'loss_cls', 'loss_clip_objects',
                'loss_block', 'loss_global'):
        assert key in log


def test_vild_baseline_train_cli(in_workdir):
    """The ViLD baseline (reference ``configs/dp/vild_ov_coco.py``):
    with_global/with_block OFF and the vild classifier on all heads —
    the detector's conditional branches that the OADP config never
    runs."""
    root, cfg, data = in_workdir
    from oadp_tpu.dp import train as train_cli
    train_cli.main([
        'e2e_vild', str(cfg),
        '--override',
        '.trainer.runner.max_iters:3',
        '.model.with_global:0',
        '.model.with_block:0',
        '.model.head_cls_mode:vild',
    ])
    log = (
        root / 'work_dirs' / 'dry_run' / 'e2e_vild' / 'train.log'
    ).read_text()
    assert 'iter 3/3' in log
    assert 'loss_clip_objects' in log
    assert 'loss_block' not in log and 'loss_global' not in log


def test_test_cli_metrics(in_workdir):
    root, cfg, data = in_workdir
    from oadp_tpu.dp import test as test_cli
    ckpt = root / 'work_dirs' / 'dry_run' / 'e2e' / 'latest.txt'
    assert ckpt.exists(), 'run test_train_cli_dry_run first'
    metrics = test_cli.main([str(cfg), str(ckpt)])
    assert 'COCO_48_17_bbox_mAP_50' in metrics
    assert 'COCO_17_bbox_mAP_50' in metrics
    for v in metrics.values():
        assert -1.0 <= float(v) <= 1.0


def test_dump_mode(in_workdir, monkeypatch):
    root, cfg, data = in_workdir
    from oadp_tpu.dp import test as test_cli
    dump_dir = root / 'dump'
    monkeypatch.setenv('DUMP', str(dump_dir))
    ckpt = root / 'work_dirs' / 'dry_run' / 'e2e' / 'latest.txt'
    metrics = test_cli.main([str(cfg), str(ckpt)])
    assert metrics == {}
    files = sorted(dump_dir.glob('*.pth'))
    assert len(files) == 3  # DRY_RUN: 3 images
    record = torch.load(files[0], weights_only=False)
    assert set(record) == {
        'bboxes', 'bbox_logits', 'object_logits', 'objectness'
    }
    assert record['bbox_logits'].shape[-1] == 66  # 65 + bg
    assert record['bbox_logits'].dtype == torch.float16


def test_calibration_trial(in_workdir):
    """Re-score the DUMP records with the reference-default ensemble
    params (reference oadp/dp/test_nni.py:179-189)."""
    root, cfg, data = in_workdir
    dump_dir = root / 'dump'
    assert dump_dir.exists(), 'run test_dump_mode first'
    from oadp_tpu.dp.test_calibrate import (
        DEFAULT_PARAMS, CalibrationRunner,
    )
    from oadp_tpu.utils import Config
    runner = CalibrationRunner(
        Config.load(cfg), str(dump_dir), batch_size=2, max_proposals=16
    )
    metrics = runner.run_trial(dict(DEFAULT_PARAMS))
    assert 'COCO_48_bbox_mAP_50' in metrics
    # different params change the ensemble (plumbing check)
    params2 = dict(DEFAULT_PARAMS, objectness_gamma=1.0,
                   bbox_base_scaler=0.3)
    metrics2 = runner.run_trial(params2)
    assert set(metrics2) == set(metrics)


def test_resume_from_checkpoint(in_workdir):
    """resume_from restores params/opt state/step (reference
    configs/dp/base.py:11 exposes resume_from)."""
    root, cfg, data = in_workdir
    from oadp_tpu.dp import train as train_cli
    ckpt = root / 'work_dirs' / 'dry_run' / 'e2e' / 'latest.txt'
    assert ckpt.exists(), 'run test_train_cli_dry_run first'
    train_cli.main([
        'e2e_resumed', str(cfg),
        '--override',
        '.trainer.runner.max_iters:9',
        f'.trainer.resume_from:{ckpt}',
    ])
    log = (
        root / 'work_dirs' / 'dry_run' / 'e2e_resumed' / 'train.log'
    ).read_text()
    assert 'resumed from' in log
    assert 'iter 8/9' in log and 'iter 9/9' in log
    assert 'iter 1/9' not in log  # started past the restored step


def test_train_with_val_dataset(in_workdir, monkeypatch):
    root, cfg, data = in_workdir
    monkeypatch.setenv('TRAIN_WITH_VAL_DATASET', '1')
    from oadp_tpu.dp import train as train_cli
    train_cli.main([
        'e2e_twv', str(cfg),
        '--override', '.trainer.runner.max_iters:1',
    ])
    log = (
        root / 'work_dirs' / 'dry_run' / 'e2e_twv' / 'train.log'
    ).read_text()
    assert 'iter 1/1' in log


def test_write_dump_rescales_boxes():
    """The reference dumps RESCALED boxes (simple_test_bboxes with
    rescale=True); test_calibrate evaluates the records directly against
    original-coordinate annotations."""
    import numpy as np
    from oadp_tpu.dp.evaluator import DetEvaluator

    boxes = np.array(
        [[10.0, 20.0, 30.0, 40.0], [1, 2, 3, 4], [5, 5, 5, 5]],
        np.float32,
    )
    # single-fetch layout built by evaluator._fn:
    # boxes(4) | bbox_logits(C+1) | object_logits(C+1) | obj(1) | valid(1)
    packed = np.concatenate([
        boxes,
        np.zeros((3, 4), np.float32),
        np.zeros((3, 4), np.float32),
        np.ones((3, 1), np.float32),
        np.array([[1.0], [1.0], [0.0]], np.float32),
    ], -1)
    store = {}
    stub = type('Stub', (), {'_dump': store})()
    scale = np.array([2.0, 2.0, 2.0, 2.0], np.float32)
    DetEvaluator._write_dump(stub, 7, packed, scale)
    rec = store['000000000007']
    np.testing.assert_allclose(
        np.asarray(rec['bboxes'], np.float32), boxes[:2] / 2.0,
    )
    assert rec['bbox_logits'].shape == (2, 4)
    assert rec['object_logits'].shape == (2, 4)
    np.testing.assert_allclose(np.asarray(rec['objectness']), [1.0, 1.0])
