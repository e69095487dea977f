# OADP on OV-LVIS (reference configs/dp/oadp_ov_lvis.py): Mask R-CNN
# with DetPro prompts, ViLD classifiers on every head, 2x schedule.
_base_ = [
    'datasets/ov_lvis.py',
    'schedules/2x.py',
    'base.py',
]

model = dict(
    prompts='data/prompts/detpro_lvis.pth',
    ml_prompts='data/prompts/detpro_lvis.pth',
    backbone_style='caffe',
    with_global=True,
    with_block=True,
    with_mask=True,
    head_cls_mode='vild',
    # reference oadp_ov_lvis.py:13-17: train 0.01 / val 0.007 for the
    # bbox/object/block heads; the global head keeps the ViLD default
    # (reference :20-26 passes no scaler)
    vild_scaler=dict(train=0.01, val=0.007),
    global_vild_scaler=(0.007, 0.01),
)
