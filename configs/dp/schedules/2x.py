_base_ = ['base.py']

trainer = dict(
    lr_config=dict(by_epoch=True, step=[16, 19]),
    runner=dict(type='EpochBasedRunner', max_epochs=24),
    checkpoint_config=dict(by_epoch=True, interval=1),
    evaluation=dict(interval=4),
)
