"""FULL two-stage chain: OAKE CLIs write feature stores → DP train CLI
consumes them → DP test CLI evaluates. This pins the feature-format
contract between the stages (the system's central integration seam —
reference README pipeline ``oake.* → dp.train → dp.test``).
"""

import pathlib

import pytest

torch = pytest.importorskip('torch')

VIT = dict(width=64, layers=2, heads=2, output_dim=32)
PAD = 320

OAKE_CFG = """
val = dict(
    dataloader=dict(
        dataset=dict(
            type='COCODataset',
            root={img!r},
            annFile={ann!r},
            output_dir={out!r},
            proposal_file={props!r},
            proposal_sorted=True,
        ),
    ),
)
model = dict(checkpoint=None, dtype='float32', max_image_size=320,
             vit={vit!r})
log = dict(interval=10)
batch_size = 4
mini_batch_size = 16
block_size = 224
max_stride = 112
rescale = 1.5
"""

DP_CFG = """
categories = 'coco'
model = dict(
    prompts='missing.pth',
    ml_prompts='missing.pth',
    backbone_style='caffe',
    with_global=True,
    with_block=True,
    sizes=dict(
        base_channels=8, fpn_channels=16, fc_channels=32,
        embedding_dim={emb}, stage_blocks=(1, 1, 1, 1),
    ),
    overrides=dict(
        rpn_samples=16, rcnn_samples=8,
        rpn_train_nms_pre=32, rpn_train_max=16,
        rpn_test_nms_pre=32, rpn_test_max=16,
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
                globals_={oake!r} + '/globals',
                blocks={oake!r} + '/blocks',
                objects={oake!r} + '/objects',
            ),
        ),
        batch=dict(
            canvas=(192, 256), scales=((240, 144), (240, 144)),
            max_gts=8, max_blocks=16, max_objects=16,
        ),
    ),
    optimizer=dict(lr=0.001, momentum=0.9, weight_decay=2.5e-5),
    lr_config=dict(by_epoch=False, step=[30000]),
    runner=dict(type='IterBasedRunner', max_iters=2),
    log_config=dict(interval=1),
    checkpoint_config=dict(by_epoch=False, interval=1000),
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


def test_oake_to_dp_chain(tmp_path, monkeypatch):
    from tests.synthetic_data import make_synthetic_coco

    data = make_synthetic_coco(tmp_path)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv('DRY_RUN', '1')

    import oadp_tpu.oake.blocks as blocks_cli
    import oadp_tpu.oake.globals as globals_cli
    import oadp_tpu.oake.objects as objects_cli

    oake_root = tmp_path / 'oake'
    for name, cli in (
        ('globals', globals_cli),
        ('blocks', blocks_cli),
        ('objects', objects_cli),
    ):
        cfg = tmp_path / f'oake_{name}.py'
        cfg.write_text(OAKE_CFG.format(
            img=data['root'], ann=data['ann_file'],
            out=str(oake_root / name), props=data['proposal_file'],
            vit=VIT,
        ))
        cli.main(['chain', str(cfg)])
        assert list((oake_root / name).glob('*.pth'))

    # DP stage consumes the stores just written (embedding_dim = the
    # tiny CLIP's output_dim)
    dp_cfg = tmp_path / 'dp.py'
    dp_cfg.write_text(DP_CFG.format(
        emb=VIT['output_dim'], ann=data['ann_file'], img=data['root'],
        oake=str(oake_root),
    ))
    from oadp_tpu.dp import test as test_cli
    from oadp_tpu.dp import train as train_cli
    train_cli.main(['chain', str(dp_cfg)])
    work = tmp_path / 'work_dirs' / 'dry_run' / 'chain'
    log = (work / 'train.log').read_text()
    assert 'iter 2/2' in log
    for key in ('loss_clip_objects', 'loss_clip_blocks',
                'loss_clip_global', 'loss_block'):
        assert key in log
    metrics = test_cli.main([str(dp_cfg), str(work / 'latest.txt')])
    assert 'COCO_48_17_bbox_mAP_50' in metrics
