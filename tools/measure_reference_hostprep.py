"""MEASURE the reference OAKE-objects host-preprocessing ceiling.

The reference (LutingWang/OADP) publishes no throughput numbers, so the
honest baseline for `bench.py`'s ``vs_baseline`` is a *measured* upper
bound on what the reference can possibly sustain per GPU on this class
of host. Its per-proposal pipeline runs on the dataloader CPU workers
(``oadp/oake/objects.py:116-167``): PIL ``crop`` of the ADAPTIVE-expanded
box → CLIP preprocess (``Resize(224, BICUBIC)`` → ``CenterCrop(224)`` →
``ToTensor`` → ``Normalize``) → full-resolution background mask +
``F.interpolate`` to the 14-grid. With ``num_workers=2``
(``configs/oake/base.py:7``) the GPU cannot consume faster than the two
workers produce, so::

    ceiling_img/s/GPU = workers / (ms_per_crop * crops_per_image)

regardless of GPU speed. This script measures ``ms_per_crop`` with the
exact torch/PIL ops — including the per-image JPEG decode and the
``torch.stack(objects)``/``torch.cat(masks)`` collation the worker's
``__getitem__`` pays (``oadp/oake/objects.py:180-186``, ~590 MB/image
at 1024 crops) — and prints the ceiling as one JSON line.

Usage: python tools/measure_reference_hostprep.py [--crops 512]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, '')


def measure_ms_per_crop(
    n_crops: int = 512, pad: int = 640, crops_per_image: int = 1024,
    itemize: bool = False,
):
    """ms per crop of the reference worker's ``__getitem__``.

    With ``itemize=True`` returns ``(ms_per_crop, items)`` where
    ``items`` splits the total into ``decode`` (JPEG, amortized per
    crop), ``prep`` (PIL crop + CLIP preprocess + mask), and ``stack``
    (the per-image ``torch.stack``/``torch.cat`` collation) — so the
    baseline's composition is auditable, not a single opaque number.
    """
    import io

    import PIL.Image
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    image = PIL.Image.fromarray(
        rng.integers(0, 256, (pad, pad, 3), np.uint8)
    )
    # the worker's __getitem__ starts from a JPEG on disk
    # (reference oake/base.py:COCODataset._load_image); amortize one
    # decode per `crops_per_image` crops
    jpeg = io.BytesIO()
    image.save(jpeg, 'JPEG', quality=90)
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)
    try:
        from torchvision import transforms as T
        tf = T.Compose([
            T.Resize(224, interpolation=T.InterpolationMode.BICUBIC),
            T.CenterCrop(224),
            T.ToTensor(),
            T.Normalize(mean, std),
        ])
    except ImportError:
        # torchvision is absent in this image; replicate its ops with
        # PIL + torch (same kernels torchvision calls for PIL inputs)
        def tf(img):
            w, h = img.size
            if w <= h:
                ow, oh = 224, int(224 * h / w)
            else:
                ow, oh = int(224 * w / h), 224
            img = img.resize((ow, oh), PIL.Image.BICUBIC)
            left = int(round((ow - 224) / 2.0))
            top = int(round((oh - 224) / 2.0))
            img = img.crop((left, top, left + 224, top + 224))
            t = torch.from_numpy(
                np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
            )
            m = torch.tensor(mean)[:, None, None]
            s = torch.tensor(std)[:, None, None]
            return (t - m) / s

    # ADAPTIVE-expanded square crops with a realistic size spread
    sides = rng.uniform(32, 600, n_crops)
    x0 = rng.uniform(0, pad - 32, n_crops)
    y0 = rng.uniform(0, pad - 32, n_crops)

    # warmup
    for i in range(8):
        tf(image.crop((x0[i], y0[i], x0[i] + sides[i], y0[i] + sides[i])))

    # best-of-5: the reference comparison must not be flattered by OUR
    # host happening to be busy — take the fastest pass (lowest
    # ms/crop), i.e. the most conservative ceiling (measured host
    # speed drifts ±20% between container phases)
    # one JPEG decode per image, amortized over its crops (reference
    # objects.py:COCODataset._load_image) — timed separately (best-of-5,
    # same conservative rule) and scaled by n_crops/crops_per_image
    decode_s = float('inf')
    for _ in range(5):
        jpeg.seek(0)
        t0 = time.perf_counter()
        PIL.Image.open(jpeg).convert('RGB').load()
        decode_s = min(decode_s, time.perf_counter() - t0)

    best = float('inf')
    best_stack = 0.0
    for _ in range(5):
        t0 = time.perf_counter()
        objects, masks = [], []
        for i in range(n_crops):
            box = (x0[i], y0[i], x0[i] + sides[i], y0[i] + sides[i])
            obj = image.crop(box)
            objects.append(tf(obj))
            # background mask at crop resolution + nearest downsample
            # (reference objects.py:129-155)
            cw = int(np.ceil(box[2] - box[0]))
            ch = int(np.ceil(box[3] - box[1]))
            xm = (torch.arange(cw) < (cw * 0.7))[None, :]
            ym = (torch.arange(ch) < (ch * 0.7))[:, None]
            m = (~(xm & ym))[None, None].float()
            masks.append(F.interpolate(m, size=(14, 14), mode='nearest'))
        # the worker returns ONE stacked Batch per image (reference
        # objects.py:180-186: torch.stack(objects) of 1024x3x224x224
        # fp32 ~ 590 MB/image + torch.cat(masks)) — real memcpy the
        # dataloader workers pay per image
        t_stack = time.perf_counter()
        torch.stack(objects)
        torch.cat(masks)
        t_end = time.perf_counter()
        del objects, masks
        if t_end - t0 < best:
            best = t_end - t0
            best_stack = t_end - t_stack
    decode = decode_s * n_crops / crops_per_image
    total_ms = (best + decode) / n_crops * 1000.0
    if itemize:
        items = {
            'decode': round(decode / n_crops * 1000.0, 4),
            'prep': round((best - best_stack) / n_crops * 1000.0, 4),
            'stack': round(best_stack / n_crops * 1000.0, 4),
        }
        return total_ms, items
    return total_ms


def measure_blocks_ms_per_image(
    w: int = 640, h: int = 480, n_images: int = 8
) -> float:
    """ms/image of the reference BLOCKS host pipeline (its second CPU
    hot loop, ``oadp/oake/blocks.py:54-77``): PIL pyramid downscales by
    1.5x until < 224, a balanced 224-grid of crops per level (stride <=
    112), CLIP preprocess per block, plus the whole-image preprocess."""
    import io

    import PIL.Image
    import torch

    rng = np.random.default_rng(0)
    image = PIL.Image.fromarray(
        rng.integers(0, 256, (h, w, 3), np.uint8)
    )
    jpeg = io.BytesIO()
    image.save(jpeg, 'JPEG', quality=90)
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)

    def normalize(img):
        t = torch.from_numpy(
            np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
        )
        m = torch.tensor(mean)[:, None, None]
        s = torch.tensor(std)[:, None, None]
        return (t - m) / s

    def partition(size):  # balanced grid starts (blocks.py:40-52)
        if size <= 224:
            return [0]
        n = -(-(size - 224) // 112) + 1
        return [round(i * (size - 224) / (n - 1)) for i in range(n)]

    def one_image(img):
        blocks = []
        lvl = img
        while True:
            lw, lh = lvl.size
            for y in partition(lh):
                for x in partition(lw):
                    blocks.append(
                        normalize(lvl.crop((x, y, x + 224, y + 224)))
                    )
            nw, nh = int(lw / 1.5), int(lh / 1.5)
            if nw < 224 or nh < 224:
                break
            lvl = lvl.resize((nw, nh), PIL.Image.BICUBIC)
        # whole-image first block: Resize(224) + CenterCrop + normalize
        sw, sh = img.size
        if sw <= sh:
            ow, oh = 224, int(224 * sh / sw)
        else:
            ow, oh = int(224 * sw / sh), 224
        whole = img.resize((ow, oh), PIL.Image.BICUBIC)
        left = int(round((ow - 224) / 2.0))
        top = int(round((oh - 224) / 2.0))
        blocks.append(
            normalize(whole.crop((left, top, left + 224, top + 224)))
        )
        return torch.stack(blocks)

    one_image(image)  # warmup
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_images):
            # the worker decodes the JPEG before the pyramid
            # (reference oake/base.py:COCODataset._load_image)
            jpeg.seek(0)
            one_image(PIL.Image.open(jpeg).convert('RGB'))
        best = min(best, time.perf_counter() - t0)
    return best / n_images * 1000.0


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--crops', type=int, default=512)
    parser.add_argument('--crops-per-image', type=int, default=1024)
    parser.add_argument('--workers', type=int, default=2,
                        help='reference num_workers (configs/oake/base.py)')
    args = parser.parse_args()
    ms, items = measure_ms_per_crop(
        args.crops, crops_per_image=args.crops_per_image, itemize=True
    )
    ceiling = args.workers / (ms / 1000.0 * args.crops_per_image)
    print(json.dumps({
        'metric': 'reference_hostprep_ceiling_img_per_sec_per_gpu',
        'ms_per_crop': round(ms, 3),
        'ms_per_crop_items': items,
        'workers': args.workers,
        'crops_per_image': args.crops_per_image,
        'value': round(ceiling, 3),
    }))


if __name__ == '__main__':
    main()
