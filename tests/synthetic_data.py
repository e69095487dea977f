"""Synthetic COCO-layout data for end-to-end tests and benches."""

import json
import pathlib
import pickle

import numpy as np
import PIL.Image

from oadp_tpu.base import coco as coco_categories

# small images keep CPU e2e tests fast; one exercises w < h
SIZES = [(320, 240), (256, 192), (224, 232), (240, 320), (300, 250)]


def make_synthetic_coco(
    root: str | pathlib.Path,
    split: str = 'val2017',
    n_images: int = 5,
    n_proposals: int = 24,
    seed: int = 0,
) -> dict:
    """Write ``{root}/coco/{split}/*.jpg``, an annotation JSON, and a
    proposal pickle. Returns paths dict."""
    rng = np.random.RandomState(seed)
    root = pathlib.Path(root)
    img_dir = root / 'coco' / split
    ann_dir = root / 'coco' / 'annotations'
    prop_dir = root / 'coco' / 'proposals'
    for d in (img_dir, ann_dir, prop_dir):
        d.mkdir(parents=True, exist_ok=True)

    images, annotations = [], []
    categories = [
        dict(id=i + 1, name=name)
        for i, name in enumerate(coco_categories.all_[:10])
    ]
    # deliberately unsorted ids to exercise id-sorting logic
    ids = [7, 3, 11, 5, 2, 13, 17, 19, 23, 29][:n_images]
    proposals = []
    for id_ in ids:
        w, h = SIZES[id_ % len(SIZES)]
        arr = rng.randint(0, 256, (h, w, 3), np.uint8)
        name = f'{id_:012d}.jpg'
        PIL.Image.fromarray(arr).save(img_dir / name, quality=90)
        images.append(dict(
            id=id_,
            file_name=name,
            width=w,
            height=h,
            coco_url=f'http://images.cocodataset.org/{split}/{name}',
        ))
        for k in range(3):
            x0 = float(rng.uniform(0, w * 0.6))
            y0 = float(rng.uniform(0, h * 0.6))
            bw = float(rng.uniform(10, w * 0.35))
            bh = float(rng.uniform(10, h * 0.35))
            annotations.append(dict(
                id=len(annotations) + 1,
                image_id=id_,
                category_id=int(rng.randint(1, 11)),
                bbox=[x0, y0, bw, bh],
                area=bw * bh,
                iscrowd=0,
                segmentation=[[x0, y0, x0 + bw, y0, x0 + bw, y0 + bh]],
            ))

    # proposal file rows follow SORTED image ids (proposal_sorted=True)
    for id_ in sorted(ids):
        w, h = SIZES[id_ % len(SIZES)]
        x0 = rng.uniform(0, w * 0.7, n_proposals)
        y0 = rng.uniform(0, h * 0.7, n_proposals)
        bw = rng.uniform(2, w * 0.3, n_proposals)  # some < 4px -> filtered
        bh = rng.uniform(2, h * 0.3, n_proposals)
        score = rng.uniform(0, 1, n_proposals)
        proposals.append(
            np.stack([x0, y0, x0 + bw, y0 + bh, score], -1).astype(
                np.float32
            )
        )

    ann_file = ann_dir / f'instances_{split}.json'
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations, categories=categories,
    )))
    prop_file = prop_dir / f'props_{split}.pkl'
    with open(prop_file, 'wb') as f:
        pickle.dump(proposals, f)
    return dict(
        root=str(img_dir),
        ann_file=str(ann_file),
        proposal_file=str(prop_file),
        ids=ids,
    )
