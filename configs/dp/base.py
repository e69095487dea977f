# Common trainer settings (reference configs/dp/base.py).
trainer = dict(
    log_config=dict(interval=50),
    load_from='pretrained/soco/soco_star_mask_rcnn_r50_fpn_400e.pth',
    resume_from=None,
    seed=3407,
    optimizer=dict(weight_decay=2.5e-5),
)
validator = dict(bf16=False)
