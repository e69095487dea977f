"""Benchmark: OAKE extraction throughput (images/sec/chip).

Measures the end-to-end device pipeline of the hot path — the
OAKE-objects masked attention-pool CLIP encoder with fused on-device
crop/resize/normalize (reference hot loop: ``oadp/oake/objects.py:
316-338`` + per-crop PIL preprocessing) plus the whole-image globals
step, per SURVEY.md §6 / BASELINE.json ("OAKE images/sec/chip
(globals+objects)").

One synthetic "image" = 1024 proposals (two full 512-crop mini-batches,
the reference's ``mini_batch_size``, ``configs/oake/objects_coco.py:26``)
plus one global crop. ``vs_baseline`` compares against 1.0 img/s per
reference GPU — a GENEROUS estimate: the reference publishes no
throughput numbers (SURVEY.md §6), but its per-proposal host
preprocessing (PIL crop → bicubic resize → center crop → normalize,
``oadp/oake/objects.py:116-127``) measures 2.4 ms/crop on this host =
2.5 s/image at 1024 proposals, so with its configured 2 dataloader
workers (``configs/oake/base.py``) the reference is host-bound at
<= 0.8 img/s/GPU regardless of GPU speed. Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax

    from oadp_tpu.models import clip as C
    from oadp_tpu.oake.encoders import ClipModel, OakeSteps

    pad = 640
    mini = 512
    n_batches = 2  # proposals per image = n_batches * mini

    dtype = 'bfloat16' if jax.default_backend() == 'tpu' else 'float32'
    import jax.numpy as jnp
    jdtype = jnp.bfloat16 if dtype == 'bfloat16' else jnp.float32

    # Build params on the CPU backend (init is many tiny ops — slow to
    # dispatch one-by-one to a remote chip), then transfer once.
    config = C.ViTConfig()
    with jax.default_device(jax.devices('cpu')[0]):
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jdtype),
            C.init_vit_params(jax.random.key(0), config),
        )
        surgery_params, surgery_config = C.upsample_vit_params(
            params, config
        )
        surgery_params = jax.tree.map(
            lambda x: jnp.asarray(x, jdtype), surgery_params
        )
    device = jax.devices()[0]
    params, surgery_params = jax.device_put(
        (params, surgery_params), device
    )
    model = ClipModel(params, config, surgery_params, surgery_config)
    steps = OakeSteps(model, pad, pad)

    from oadp_tpu.ops import preprocess as P

    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, (pad, pad, 3), np.uint8)
    g = model.grid
    masks = (rng.random((mini, g, g)) > 0.5).astype(np.float32)

    # Synthetic square proposals with realistic size spread, preprocessed
    # exactly as the objects pipeline does (per-crop scalar meta; tap
    # weights built on device).
    k = 21
    sides = rng.uniform(32, 600, mini)
    x0 = rng.uniform(0, pad - 32, mini)
    y0 = rng.uniform(0, pad - 32, mini)
    boxes = np.stack([x0, y0, x0 + sides, y0 + sides], -1)
    meta = P.clip_transform_meta(pad, pad, boxes)
    gmeta = P.clip_transform_meta(
        pad, pad, np.asarray([[0.0, 0.0, pad, pad]])
    )

    def one_image():
        outs = [
            steps.objects_step(image, meta, masks, k)
            for _ in range(n_batches)
        ]
        outs.append(steps.globals_step(image[None], gmeta, k))
        return outs

    def sync(outs):
        # fetch to host: block_until_ready is unreliable on tunneled
        # backends, and production reads embeddings back anyway
        return [np.asarray(o) for o in outs]

    sync(one_image())  # compile
    sync(one_image())  # warm

    # production runner keeps one image in flight: dispatch image i+1,
    # then fetch image i (oake/base.py deferred-save slot)
    n_images = 8
    t0 = time.perf_counter()
    pending = one_image()
    for _ in range(n_images - 1):
        nxt = one_image()
        sync(pending)
        pending = nxt
    sync(pending)
    dt = time.perf_counter() - t0

    imgs_per_sec = n_images / dt
    baseline = 1.0  # estimated reference img/s per V100 (see docstring)
    print(json.dumps({
        'metric': 'oake_images_per_sec_per_chip',
        'value': round(imgs_per_sec, 3),
        'unit': 'images/sec/chip (1024 proposals + 1 global per image)',
        'vs_baseline': round(imgs_per_sec / baseline, 3),
    }))


if __name__ == '__main__':
    main()
