# OV-LVIS dataset (reference configs/dp/datasets/ov_lvis.py).
categories = 'lvis'
data_root = 'data/lvis_v1/'
oake_root = data_root + 'oake/'
ann_file_prefix = data_root + 'annotations/'

trainer = dict(
    dataloader=dict(
        samples_per_gpu=2,
        dataset=dict(
            ann_file=ann_file_prefix + 'lvis_v1_train.866.json',
            img_prefix=data_root,
            oversample_thr=1e-3,
            clip_features=dict(
                globals_=oake_root + 'globals/train2017',
                blocks=oake_root + 'blocks/train2017',
                objects=oake_root + 'objects/train2017',
            ),
        ),
        batch=dict(
            canvas=(832, 1344),
            scales=((1330, 640), (1333, 800)),
            max_gts=300,
            max_blocks=128,
            max_objects=512,
            max_polygon_parts=8,
            max_polygon_verts=96,
        ),
    ),
)
validator = dict(
    dataloader=dict(
        samples_per_gpu=1,
        dataset=dict(
            ann_file=ann_file_prefix + 'lvis_v1_val.1203.json',
            img_prefix=data_root,
        ),
        batch=dict(canvas=(832, 1344)),
    ),
)
