# ViLD baseline on OV-COCO (reference configs/dp/vild_ov_coco.py):
# object-head distillation only; ViLDClassifier (train 0.01 / val 0.007)
# with vild prompts on BOTH the bbox and object heads; no lr_mult.
_base_ = [
    'datasets/ov_coco.py',
    'schedules/40k.py',
    'base.py',
]

model = dict(
    prompts='data/prompts/vild.pth',
    ml_prompts='data/prompts/vild.pth',
    backbone_style='caffe',
    with_global=False,
    with_block=False,
    head_cls_mode='vild',
    vild_scaler=dict(train=0.01, val=0.007),
)
