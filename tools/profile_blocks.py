"""Stage profile of the OAKE blocks device program on the real chip:
pyramid build, block slicing, whole-image resize, ViT encode, and the
full ``blocks_step`` — at the production geometry (device_batch 24,
640x480 COCO images, ~28 blocks each). Sum-reduced outputs; resident
inputs (CLAUDE.md tunnel rules).

Usage: ``python tools/profile_blocks.py [device_batch]``
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def tsum(tree):
    import jax
    import jax.numpy as jnp

    return sum(
        jnp.sum(x.astype(jnp.float32))
        for x in jax.tree.leaves(tree)
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.number)
    )


def timeit(label, fn, *args, n=6):
    import jax

    f = jax.jit(fn)
    np.asarray(f(*args))  # compile
    np.asarray(f(*args))  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f'{label:36s} {dt:8.2f} ms/batch', flush=True)
    return dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from oadp_tpu.models import clip as C
    from oadp_tpu.oake.blocks import BlocksPipeline
    from oadp_tpu.oake.encoders import _compute_dtype, _stacked
    from oadp_tpu.ops import preprocess as P
    from oadp_tpu.utils import Config, enable_compilation_cache

    enable_compilation_cache()

    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    pipe = BlocksPipeline('profile_blocks', Config._wrap(dict(
        model=dict(checkpoint=None, max_image_size=640),
        batch_size=bsz,
    )))
    rng = np.random.default_rng(0)
    items = [
        pipe.prepare(dict(
            id=i, output=None,
            image=rng.integers(0, 256, (480, 640, 3), np.uint8),
            width=640, height=480,
        ))
        for i in range(bsz)
    ]
    device = jax.local_devices()[0]
    for it in items:
        it['image'] = jax.device_put(it['image'], device)

    # replicate execute_batch's flat coord build
    from oadp_tpu.oake.base import bucket
    offsets, flat = [], []
    for item in items:
        offsets.append(sum(len(f) for f in flat))
        c = item['coords']
        img_col = np.full((len(c), 1), len(flat), np.int32)
        flat.append(np.concatenate([img_col, c], axis=1))
    total = offsets[-1] + len(flat[-1])
    t_pad = bucket(total, pipe.block_buckets)
    coords = np.concatenate(
        flat + [np.zeros((t_pad - total, 4), np.int32)], axis=0
    )
    coords = jax.device_put(coords, device)
    print(f'batch {bsz} images, {total} real blocks -> {t_pad} bucketed')

    images = [it['image'] for it in items]
    lwx = [it['level_wx'] for it in items]
    lwy = [it['level_wy'] for it in items]
    wwx = [it['whole_wx'] for it in items]
    wwy = [it['whole_wy'] for it in items]

    model = pipe.model
    cdt = _compute_dtype(jax.tree.leaves(model.params)[0].dtype)
    dtype = jax.tree.leaves(model.params)[0].dtype

    def build_levels(images, lwx, lwy):
        ims, lx, ly = _stacked(images), _stacked(lwx), _stacked(lwy)

        def one(image, x, y):
            image = image.astype(jnp.float32)

            def body(img, ws):
                nxt = P.apply_resize_pair(
                    img, ws[0], ws[1], compute_dtype=cdt
                )
                return nxt, nxt

            _, pyr = jax.lax.scan(body, image, (x, y))
            return jnp.concatenate([image[None], pyr], axis=0)

        return jax.vmap(one)(ims, lx, ly)

    def f_pyramid(images, lwx, lwy):
        return tsum(build_levels(images, lwx, lwy))

    def f_slice(images, lwx, lwy, coords):
        levels = build_levels(images, lwx, lwy)

        def slice_block(c):
            return jax.lax.dynamic_slice(
                levels, (c[0], c[1], c[2], c[3], 0), (1, 1, 224, 224, 3)
            )[0, 0]

        return tsum(jax.vmap(slice_block)(coords))

    def f_whole(images, wwx, wwy):
        ims, wx, wy = _stacked(images), _stacked(wwx), _stacked(wwy)

        def one(image, x, y):
            return P.apply_resize_pair(
                image.astype(jnp.float32), x, y, compute_dtype=cdt
            )

        return tsum(jax.vmap(one)(ims, wx, wy))

    # encoder alone at the same crop count
    crops_u8 = rng.integers(
        0, 256, (bsz + t_pad, 224, 224, 3), np.uint8
    )
    crops_u8 = jax.device_put(crops_u8, device)

    def f_encode(crops):
        x = P.normalize_clip(crops.astype(jnp.float32), dtype)
        return tsum(C.image_encoder(model.params, x, model.config))

    def f_full(images, lwx, lwy, wwx, wwy, coords):
        return tsum(pipe.steps._blocks._fun(  # the underlying fn
            model.params, images, lwx, lwy, wwx, wwy, coords,
        )) if False else tsum(pipe.steps.blocks_step(
            images, lwx, lwy, wwx, wwy, coords,
        ))

    timeit('pyramid (levels build)', f_pyramid, images, lwx, lwy)
    timeit('pyramid + block slicing', f_slice, images, lwx, lwy, coords)
    timeit('whole-image resize', f_whole, images, wwx, wwy)
    timeit(f'encoder alone ({bsz + t_pad} crops)', f_encode, crops_u8)
    timeit('FULL blocks_step', f_full, images, lwx, lwy, wwx, wwy,
           coords)


if __name__ == '__main__':
    main()
