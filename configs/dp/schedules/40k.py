_base_ = ['base.py']

interval = 2000
trainer = dict(
    lr_config=dict(by_epoch=False, step=[30000]),
    runner=dict(type='IterBasedRunner', max_iters=40000),
    checkpoint_config=dict(by_epoch=False, interval=2000),
    evaluation=dict(interval=2000),
)
