"""Measure the REAL OAKE pipelines end-to-end on the chip.

``bench.py`` models the production pipeline (pre-built meta/masks, one
image in flight, globals batched 16); this tool runs the actual
``ObjectsPipeline`` + ``GlobalsPipeline`` loops — host JPEG decode,
proposal expansion, ``grid_mask``, meta building, prefetch thread,
deferred fp16 ``.pth`` saves — on synthetic COCO-like data at the
production workload (1024 proposals/image) and reports the measured
combined img/s next to the modeled bench number (replaces the
reference's per-image iter loop, ``oadp/oake/base.py:96-113``).

Usage: python tools/measure_e2e_oake.py [n_images] [workdir]
"""

import json
import pathlib
import pickle
import shutil
import sys
import time

import numpy as np
import PIL.Image

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

W, H = 640, 480
N_PROPOSALS = 1024


def build_workspace(root: pathlib.Path, n_images: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    img_dir = root / 'val2017'
    img_dir.mkdir(parents=True, exist_ok=True)
    images = []
    proposals = []
    ids = list(range(1, n_images + 1))
    for id_ in ids:
        arr = rng.randint(0, 256, (H, W, 3), np.uint8)
        name = f'{id_:012d}.jpg'
        PIL.Image.fromarray(arr).save(img_dir / name, quality=90)
        images.append(dict(id=id_, file_name=name, width=W, height=H))
    for _ in ids:  # rows follow sorted ids
        x0 = rng.uniform(0, W * 0.7, N_PROPOSALS)
        y0 = rng.uniform(0, H * 0.7, N_PROPOSALS)
        bw = rng.uniform(8, W * 0.3, N_PROPOSALS)
        bh = rng.uniform(8, H * 0.3, N_PROPOSALS)
        score = rng.uniform(0, 1, N_PROPOSALS)
        proposals.append(np.stack(
            [x0, y0, np.minimum(x0 + bw, W), np.minimum(y0 + bh, H),
             score], -1,
        ).astype(np.float32))
    ann = root / 'instances.json'
    ann.write_text(json.dumps(dict(
        images=images, annotations=[], categories=[],
    )))
    prop = root / 'proposals.pkl'
    with open(prop, 'wb') as f:
        pickle.dump(proposals, f)
    return ann, prop


def run_objects(root, ann, prop, out, log_every=4, device_batch=2,
                inflight=2):
    from oadp_tpu.oake.objects import ObjectsPipeline
    from oadp_tpu.utils import Config

    cfg = Config._wrap(dict(
        val=dict(dataloader=dict(dataset=dict(
            type='COCODataset',
            root=str(root / 'val2017'),
            annFile=str(ann),
            output_dir=str(out),
            proposal_file=str(prop),
            proposal_sorted=True,
        ))),
        model=dict(checkpoint=None, max_image_size=640),
        mini_batch_size=1024,
        expand_mode='ADAPTIVE',
        batch_size=device_batch,
        inflight=inflight,
        log=dict(interval=log_every),
    ))
    pipe = ObjectsPipeline('e2e_objects', cfg)
    t0 = time.time()
    pipe.run()
    return time.time() - t0, pipe


def run_globals(root, ann, out):
    from oadp_tpu.oake.globals import GlobalsPipeline
    from oadp_tpu.utils import Config

    cfg = Config._wrap(dict(
        val=dict(dataloader=dict(dataset=dict(
            root=str(root / 'val2017'),
            annFile=str(ann),
            output_dir=str(out),
        ))),
        model=dict(checkpoint=None, max_image_size=640),
        batch_size=16,
        log=dict(interval=16),
    ))
    pipe = GlobalsPipeline('e2e_globals', cfg)
    t0 = time.time()
    pipe.run()
    return time.time() - t0, pipe


def main():
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('n_images', nargs='?', type=int, default=24)
    parser.add_argument('workdir', nargs='?', default='/tmp/oake_e2e')
    parser.add_argument('--device-batch', type=int, default=2,
                        help='objects images per dispatch')
    parser.add_argument('--inflight', type=int, default=2,
                        help='batches in flight in the runner')
    args = parser.parse_args()
    n_images = args.n_images
    workdir = pathlib.Path(args.workdir)
    from oadp_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    # warmup workspace: pays the compile, then the timed run measures
    # the steady-state pipeline (warm size covers >1 device batch)
    for name, n in (('warm', max(3, args.device_batch + 1)),
                    ('timed', n_images)):
        ws = workdir / name
        if ws.exists():
            shutil.rmtree(ws)
        ann, prop = build_workspace(ws, n, seed=7 if name == 'warm' else 0)
        t_obj, _ = run_objects(
            ws, ann, prop, ws / 'out_objects',
            device_batch=args.device_batch, inflight=args.inflight,
        )
        t_glb, _ = run_globals(ws, ann, ws / 'out_globals')
        if name == 'timed':
            per_img = (t_obj + t_glb) / n
            print(json.dumps({
                'metric': 'oake_e2e_measured_images_per_sec_per_chip',
                'value': round(1.0 / per_img, 3),
                'objects_img_per_s': round(n / t_obj, 3),
                'globals_img_per_s': round(n / t_glb, 3),
                'unit': 'images/sec/chip, real ObjectsPipeline + '
                        'GlobalsPipeline loops (decode/grid_mask/meta/'
                        'save included; 1024 proposals/image)',
                'n_images': n,
                'device_batch': args.device_batch,
                'inflight': args.inflight,
            }), flush=True)


if __name__ == '__main__':
    main()
