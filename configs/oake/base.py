# Shared OAKE dataset roots (COCO train/val 2017), mirroring the
# reference config schema (configs/oake/base.py) so user overrides port.
train = dict(
    dataloader=dict(
        dataset=dict(
            root='data/coco/train2017',
            annFile='data/coco/annotations/instances_train2017.json',
        ),
    ),
)
val = dict(
    dataloader=dict(
        dataset=dict(
            root='data/coco/val2017',
            annFile='data/coco/annotations/instances_val2017.json',
        ),
    ),
)
model = dict(
    checkpoint='pretrained/clip/ViT-B-32.pt',
    max_image_size=640,
)
