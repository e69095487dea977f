"""OV-LVIS end-to-end: mask-head training, segm inference + LVIS
metrics (synthetic data)."""

import pytest

torch = pytest.importorskip('torch')


CFG_TEMPLATE = """
categories = 'lvis'
model = dict(
    prompts='missing.pth',
    ml_prompts='missing.pth',
    backbone_style='caffe',
    with_global=True,
    with_block=True,
    with_mask=True,
    head_cls_mode='vild',
    vild_scaler=dict(train=0.01, val=0.007),
    sizes=dict(
        base_channels=8,
        fpn_channels=16,
        fc_channels=32,
        embedding_dim=32,
        stage_blocks=(1, 1, 1, 1),
    ),
    overrides=dict(
        rpn_samples=16,
        rcnn_samples=8,
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
            oversample_thr=1e-3,
            clip_features=dict(
                globals_={oake!r} + '/globals/train2017',
                blocks={oake!r} + '/blocks/train2017',
                objects={oake!r} + '/objects/train2017',
            ),
        ),
        batch=dict(
            canvas=(192, 256),
            scales=((240, 144), (240, 144)),
            max_gts=8,
            max_blocks=8,
            max_objects=8,
            max_polygon_parts=2,
            max_polygon_verts=16,
        ),
    ),
    optimizer=dict(lr=0.001, momentum=0.9, weight_decay=2.5e-5),
    lr_config=dict(by_epoch=True, step=[16, 19]),
    runner=dict(type='EpochBasedRunner', max_epochs=24),
    log_config=dict(interval=1),
    checkpoint_config=dict(by_epoch=True, interval=1),
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
    from tests.synthetic_data import make_synthetic_lvis

    root = tmp_path_factory.mktemp('lvis')
    data = make_synthetic_lvis(root)
    cfg = root / 'config.py'
    cfg.write_text(CFG_TEMPLATE.format(
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
    return root, cfg, data


def test_lvis_train_with_masks(in_workdir):
    root, cfg, data = in_workdir
    from oadp_tpu.dp import train as train_cli
    train_cli.main([
        'lvis_e2e', str(cfg),
        '--override', '.trainer.runner.max_epochs:1',
    ])
    work = root / 'work_dirs' / 'dry_run' / 'lvis_e2e'
    log = (work / 'train.log').read_text()
    assert 'loss_mask' in log
    assert (work / 'latest.txt').exists()


def test_lvis_test_with_segm_metrics(in_workdir):
    root, cfg, data = in_workdir
    from oadp_tpu.dp import test as test_cli
    ckpt = root / 'work_dirs' / 'dry_run' / 'lvis_e2e' / 'latest.txt'
    assert ckpt.exists()
    metrics = test_cli.main([str(cfg), str(ckpt)])
    assert 'lvis_bbox_AP' in metrics
    assert 'lvis_segm_AP' in metrics
    assert 'lvis_bbox_APr' in metrics
    assert 'lvis_segm_APf' in metrics
