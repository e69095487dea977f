# OV-COCO dataset (reference configs/dp/datasets/ov_coco.py).
categories = 'coco'
data_root = 'data/coco/'
oake_root = data_root + 'oake/'
ann_file_prefix = data_root + 'annotations/instances_'

trainer = dict(
    dataloader=dict(
        samples_per_gpu=2,
        dataset=dict(
            ann_file=ann_file_prefix + 'train2017.48.json',
            img_prefix=data_root + 'train2017/',
            clip_features=dict(
                globals_=oake_root + 'globals/train2017',
                blocks=oake_root + 'blocks/train2017',
                objects=oake_root + 'objects/train2017',
            ),
        ),
        batch=dict(
            canvas=(832, 1344),
            scales=((1330, 640), (1333, 800)),
            max_gts=100,
            max_blocks=128,
            max_objects=512,
        ),
    ),
)
validator = dict(
    dataloader=dict(
        samples_per_gpu=1,
        dataset=dict(
            ann_file=ann_file_prefix + 'val2017.65.min.json',
            img_prefix=data_root + 'val2017/',
        ),
        batch=dict(canvas=(832, 1344)),
    ),
)
