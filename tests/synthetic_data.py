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
    # full OV-COCO taxonomy (65 classes); annotations only use the
    # first 10 (base) classes
    categories = [
        dict(id=i + 1, name=name)
        for i, name in enumerate(coco_categories.all_)
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


def make_synthetic_dp(
    root: str | pathlib.Path,
    split: str = 'val2017',
    embedding_dim: int = 32,
    seed: int = 0,
) -> dict:
    """On top of :func:`make_synthetic_coco`: OAKE feature stores
    (globals/blocks/objects ``.pth`` per image) and prompt files, so the
    DP train/test CLIs run end-to-end."""
    from oadp_tpu.base import coco as coco_categories
    from oadp_tpu.utils import save_pth

    rng = np.random.RandomState(seed + 1)
    root = pathlib.Path(root)
    data = make_synthetic_coco(root, split=split, seed=seed)

    oake = root / 'coco' / 'oake'
    for id_ in data['ids']:
        w, h = SIZES[id_ % len(SIZES)]
        key = f'{id_:012d}.pth'
        gdir = oake / 'globals' / split
        bdir = oake / 'blocks' / split
        odir = oake / 'objects' / split
        for d in (gdir, bdir, odir):
            d.mkdir(parents=True, exist_ok=True)

        def emb(n):
            e = rng.randn(n, embedding_dim).astype(np.float16)
            return e / np.linalg.norm(
                e.astype(np.float32), axis=-1, keepdims=True
            ).astype(np.float16)

        save_pth(emb(1)[0], gdir / key)
        nb = 7
        bx0 = rng.uniform(0, w * 0.5, nb)
        by0 = rng.uniform(0, h * 0.5, nb)
        bboxes = np.stack([
            bx0, by0,
            bx0 + rng.uniform(40, w * 0.5, nb),
            by0 + rng.uniform(40, h * 0.5, nb),
        ], -1).astype(np.float16)
        save_pth(
            dict(embeddings=emb(nb), bboxes=bboxes), bdir / key
        )
        no = 11
        ox0 = rng.uniform(0, w * 0.6, no)
        oy0 = rng.uniform(0, h * 0.6, no)
        oboxes = np.stack([
            ox0, oy0,
            ox0 + rng.uniform(2, w * 0.3, no),  # some < 4px -> filtered
            oy0 + rng.uniform(2, h * 0.3, no),
        ], -1).astype(np.float16)
        save_pth(
            dict(
                embeddings=emb(no),
                bboxes=oboxes,
                objectness=rng.rand(no, 1).astype(np.float16),
            ),
            odir / key,
        )

    prompts_dir = root / 'prompts'
    prompts_dir.mkdir(exist_ok=True)
    shuffled = list(coco_categories.all_)
    rng.shuffle(shuffled)  # exercise name-order remapping
    e = rng.randn(len(shuffled), embedding_dim).astype(np.float32)
    e /= np.linalg.norm(e, axis=-1, keepdims=True)
    save_pth(
        dict(names=shuffled, embeddings=e), prompts_dir / 'vild.pth'
    )
    save_pth(
        dict(
            names=shuffled,
            embeddings=e,
            scaler=np.float32(50.0),
            bias=np.float32(20.0),
        ),
        prompts_dir / 'ml.pth',
    )
    data['oake_root'] = str(oake)
    data['prompts'] = str(prompts_dir)
    return data


def make_synthetic_lvis(
    root: str | pathlib.Path,
    n_images: int = 4,
    embedding_dim: int = 32,
    seed: int = 0,
) -> dict:
    """LVIS-style workspace: images addressed by coco_url, polygon
    segmentations, neg_category_ids, per-category frequency bands, and
    OAKE feature stores."""
    from oadp_tpu.base import lvis as lvis_categories
    from oadp_tpu.utils import save_pth

    rng = np.random.RandomState(seed)
    root = pathlib.Path(root)
    img_dir = root / 'lvis' / 'train2017'
    ann_dir = root / 'lvis' / 'annotations'
    oake = root / 'lvis' / 'oake'
    for d in (img_dir, ann_dir):
        d.mkdir(parents=True, exist_ok=True)

    names = lvis_categories.all_
    categories = [
        dict(id=i, name=n, frequency='rcf'[i % 3])
        for i, n in enumerate(names)
    ]
    images, annotations = [], []
    ids = [11, 4, 9, 6][:n_images]
    for id_ in ids:
        w, h = SIZES[id_ % len(SIZES)]
        arr = rng.randint(0, 256, (h, w, 3), np.uint8)
        name = f'{id_:012d}.jpg'
        PIL.Image.fromarray(arr).save(img_dir / name, quality=90)
        images.append(dict(
            id=id_,
            width=w,
            height=h,
            coco_url=f'http://images.cocodataset.org/train2017/{name}',
            neg_category_ids=[int(c) for c in rng.choice(
                len(names), 5, replace=False
            )],
            not_exhaustive_category_ids=[],
        ))
        for k in range(3):
            x0 = float(rng.uniform(0, w * 0.5))
            y0 = float(rng.uniform(0, h * 0.5))
            bw = float(rng.uniform(20, w * 0.4))
            bh = float(rng.uniform(20, h * 0.4))
            # triangle polygon inside the box
            poly = [x0, y0, x0 + bw, y0, x0 + bw / 2, y0 + bh]
            annotations.append(dict(
                id=len(annotations) + 1,
                image_id=id_,
                category_id=int(rng.randint(0, 20)),  # base classes
                bbox=[x0, y0, bw, bh],
                area=bw * bh / 2,
                segmentation=[poly],
            ))

    ann_file = ann_dir / 'lvis_train.json'
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations, categories=categories,
    )))

    for id_ in ids:
        key = f'{id_:012d}.pth'
        w, h = SIZES[id_ % len(SIZES)]
        for sub in ('globals', 'blocks', 'objects'):
            (oake / sub / 'train2017').mkdir(parents=True, exist_ok=True)

        def emb(n):
            e = rng.randn(n, embedding_dim).astype(np.float16)
            return e

        save_pth(emb(1)[0], oake / 'globals' / 'train2017' / key)
        bx = rng.uniform(0, w * 0.4, 5)
        by = rng.uniform(0, h * 0.4, 5)
        save_pth(
            dict(
                embeddings=emb(5),
                bboxes=np.stack(
                    [bx, by, bx + 50, by + 50], -1
                ).astype(np.float16),
            ),
            oake / 'blocks' / 'train2017' / key,
        )
        ox = np.resize(bx, 6)
        oy = np.resize(by, 6)
        save_pth(
            dict(
                embeddings=emb(6),
                bboxes=np.stack(
                    [ox, oy, ox + 30, oy + 30], -1
                ).astype(np.float16),
                objectness=rng.rand(6, 1).astype(np.float16),
            ),
            oake / 'objects' / 'train2017' / key,
        )
    return dict(
        root=str(root / 'lvis'),
        ann_file=str(ann_file),
        oake_root=str(oake),
        ids=ids,
    )
