trainer = dict(
    optimizer=dict(lr=0.02, momentum=0.9, weight_decay=0.0001),
    lr_config=dict(warmup_iters=500, warmup_ratio=0.001),
)
