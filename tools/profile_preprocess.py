"""Micro-profile the objects preprocess sub-steps on the real chip.

Where do the ~32 ms/step of `objects` preprocessing go?  Times, at the
production geometry (640x640 image, B=1024 crops, bucketed tap count):

* device_coeffs          — on-device tap-weight derivation (VPU)
* expand_coeffs          — compact -> dense (B, 224, 640) matrices (VPU)
* pass1 (shared-RHS)     — horizontal resample einsum vs the one image
* pass2 (per-crop)       — vertical resample batched einsum
* full preprocess        — coeffs + expand + both passes + normalize

Each timing sum-reduces its output and amortizes over a lax.scan of
ITERS iterations inside ONE jit (per-dispatch ~3.3 ms on the tunnel).

Usage: python tools/profile_preprocess.py [batch]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ITERS = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from oadp_tpu.oake.base import bucket
    from oadp_tpu.ops import preprocess as P

    mini = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    pad = 640
    dev = jax.devices()[0]
    print(f'device: {dev.device_kind} ({dev.platform}), B={mini}')

    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, (pad, pad, 3), np.uint8)
    # realistic proposal boxes: random sub-windows of the image
    x0 = rng.uniform(0, pad * 0.6, mini)
    y0 = rng.uniform(0, pad * 0.6, mini)
    w = rng.uniform(16, pad * 0.4, mini)
    h = rng.uniform(16, pad * 0.4, mini)
    boxes = np.stack([x0, y0, x0 + w, y0 + h], -1)
    meta_np = P.clip_transform_meta(pad, pad, boxes)
    k_pad = bucket(P.coeff_ksize(pad), (8, 16, 32))

    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        meta = jnp.asarray(meta_np)
        img = jnp.asarray(image)
    meta, img = jax.device_put((meta, img), dev)

    def timeit(name, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        np.asarray(out)  # compile+warm; sync by fetch
        t0 = time.perf_counter()
        out = jfn(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) * 1e3
        print(f'{name:40s} {dt / ITERS:8.2f} ms/iter  ({dt:.1f} total)')
        return dt / ITERS

    def scan(body):
        # perturb meta per iteration (denormal-scale, numerically inert)
        # so XLA's loop-invariant code motion cannot hoist the body
        def fn(meta, img):
            def step(carry, x):
                return carry + body(meta + x * 1e-30, img), None
            out, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32),
                jnp.arange(1.0, ITERS + 1.0, dtype=jnp.float32),
            )
            return out
        return fn

    # 1. coeffs only
    def coeffs_body(meta, img):
        wx_w, wx_s, wy_w, wy_s = P.device_coeffs(meta, k_pad)
        return (jnp.sum(wx_w) + jnp.sum(wy_w)
                + jnp.sum(wx_s.astype(jnp.float32))
                + jnp.sum(wy_s.astype(jnp.float32)))
    timeit('device_coeffs', scan(coeffs_body), meta, img)

    # 2. coeffs + expand
    def expand_body(meta, img):
        wx_w, wx_s, wy_w, wy_s = P.device_coeffs(meta, k_pad)
        wx = P.expand_coeffs(wx_w.astype(jnp.bfloat16), wx_s, pad)
        wy = P.expand_coeffs(wy_w.astype(jnp.bfloat16), wy_s, pad)
        return (jnp.sum(wx.astype(jnp.float32))
                + jnp.sum(wy.astype(jnp.float32)))
    timeit('+ expand_coeffs (dense bf16)', scan(expand_body), meta, img)

    # 3. + pass1 only (shared-RHS einsum)
    def pass1_body(meta, img):
        wx_w, wx_s, wy_w, wy_s = P.device_coeffs(meta, k_pad)
        wx = P.expand_coeffs(wx_w.astype(jnp.bfloat16), wx_s, pad)
        t = jnp.einsum(
            'bow,hwc->bhoc', wx, img.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(t)
    timeit('+ pass1 einsum (no round)', scan(pass1_body), meta, img)

    # 4. full resize (prod path)
    def full_body(meta, img):
        wx_w, wx_s, wy_w, wy_s = P.device_coeffs(meta, k_pad)
        crops = P.apply_resize_coeffs(
            img.astype(jnp.float32), wx_w, wx_s, wy_w, wy_s,
            compute_dtype=jnp.bfloat16,
        )
        crops = P.normalize_clip(crops, jnp.bfloat16)
        return jnp.sum(crops.astype(jnp.float32))
    timeit('full resize+normalize (prod)', scan(full_body), meta, img)

    # 5. full resize without the inter-pass round
    def noround_body(meta, img):
        wx_w, wx_s, wy_w, wy_s = P.device_coeffs(meta, k_pad)
        crops = P.apply_resize_coeffs(
            img.astype(jnp.float32), wx_w, wx_s, wy_w, wy_s,
            skip_round=True, compute_dtype=jnp.bfloat16,
        )
        crops = P.normalize_clip(crops, jnp.bfloat16)
        return jnp.sum(crops.astype(jnp.float32))
    timeit('full resize, skip_round', scan(noround_body), meta, img)

    # 6. bf16 intermediate (round then cast) instead of fp32 carry
    def bf16mid_body(meta, img):
        wx_w, wx_s, wy_w, wy_s = P.device_coeffs(meta, k_pad)
        wx = P.expand_coeffs(wx_w.astype(jnp.bfloat16), wx_s, pad)
        wy = P.expand_coeffs(wy_w.astype(jnp.bfloat16), wy_s, pad)
        t = jnp.einsum(
            'bow,hwc->bhoc', wx, img.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        t = P.round_u8(t).astype(jnp.bfloat16)  # ints <=255 exact
        outp = jnp.einsum(
            'beh,bhoc->beoc', wy, t, preferred_element_type=jnp.float32,
        )
        outp = P.round_u8(outp)
        crops = P.normalize_clip(outp, jnp.bfloat16)
        return jnp.sum(crops.astype(jnp.float32))
    timeit('bf16 intermediate variant', scan(bf16mid_body), meta, img)


if __name__ == '__main__':
    main()
