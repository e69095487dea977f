# OADP on OV-COCO (reference configs/dp/oadp_ov_coco.py).
_base_ = [
    'datasets/ov_coco.py',
    'schedules/40k.py',
    'base.py',
]

model = dict(
    prompts='data/prompts/vild.pth',
    ml_prompts='data/prompts/ml_coco.pth',
    backbone_style='caffe',
    with_global=True,
    with_block=True,
    vild_scaler=dict(train=0.007, val=0.01),
)
trainer = dict(
    optimizer=dict(paramwise=dict(bbox_head=dict(lr_mult=0.5))),
)
