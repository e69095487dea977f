"""Profile the OAKE-objects device step: where does the time go?

Times each stage of the objects pipeline separately on the real chip
(sync = fetch to host; the axon tunnel's block_until_ready is
unreliable) and reports achieved TFLOP/s vs a measured matmul peak.

Usage: python tools/profile_oake.py [mini_batch]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from oadp_tpu.models import clip as C
    from oadp_tpu.oake.encoders import ClipModel, OakeSteps
    from oadp_tpu.ops import preprocess as P

    mini = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    pad = 640
    dev = jax.devices()[0]
    print(f'device: {dev.device_kind} ({dev.platform})')

    dtype = 'float32' if jax.default_backend() == 'cpu' else 'bfloat16'
    jdtype = jnp.bfloat16 if dtype == 'bfloat16' else jnp.float32
    config = C.ViTConfig()
    with jax.default_device(jax.devices('cpu')[0]):
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jdtype),
            C.init_vit_params(jax.random.key(0), config),
        )
        surgery_params, surgery_config = C.upsample_vit_params(params, config)
        surgery_params = jax.tree.map(
            lambda x: jnp.asarray(x, jdtype), surgery_params
        )
    params, surgery_params = jax.device_put((params, surgery_params), dev)
    model = ClipModel(params, config, surgery_params, surgery_config)
    steps = OakeSteps(model, pad, pad)

    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, (pad, pad, 3), np.uint8)
    g = model.grid
    n_tok = surgery_config.tokens
    masks = (rng.random((mini, g, g)) > 0.5).astype(np.float32)
    k = 21
    sides = rng.uniform(32, 600, mini)
    x0 = rng.uniform(0, pad - 32, mini)
    y0 = rng.uniform(0, pad - 32, mini)
    boxes = np.stack([x0, y0, x0 + sides, y0 + sides], -1)
    meta = P.clip_transform_meta(pad, pad, boxes)

    def timeit(label, fn, n=6, flops=None):
        out = fn()
        np.asarray(out)  # compile + sync
        np.asarray(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        np.asarray(out)
        dt = (time.perf_counter() - t0) / n
        extra = ''
        if flops:
            extra = f'  {flops / dt / 1e12:7.1f} TFLOP/s'
        print(f'{label:34s} {dt * 1e3:9.2f} ms{extra}')
        return dt

    # --- matmul peak ---------------------------------------------------
    mm = 8192
    a = jax.device_put(
        jnp.ones((mm, mm), jdtype), dev
    )
    f_mm = jax.jit(lambda a: jnp.sum(a @ a))  # sum: no slice-narrowing
    timeit('matmul 8192^3 (peak probe)', lambda: f_mm(a), flops=2 * mm**3)

    # --- preprocess only ----------------------------------------------
    image_d = jax.device_put(image, dev)
    meta_d = jax.device_put(jnp.asarray(meta), dev)
    masks_d = jax.device_put(jnp.asarray(masks), dev)

    import functools

    @functools.partial(jax.jit, static_argnames=('k_pad',))
    def pre_fn(image, meta, k_pad):
        wx_w, wx_s, wy_w, wy_s = P.device_coeffs(meta, k_pad)
        crops = P.apply_resize_coeffs(
            image.astype(jnp.float32), wx_w, wx_s, wy_w, wy_s
        )
        return P.normalize_clip(crops, jdtype)[:, ::64, ::64]

    timeit('preprocess (resize+norm)', lambda: pre_fn(image_d, meta_d, k))

    # --- encoder only ---------------------------------------------------
    crops = jax.device_put(
        jnp.zeros((mini, 224, 224, 3), jdtype), dev
    )
    d_ = config.width
    n_l = config.layers
    per_tok_layer = (
        2 * d_ * 3 * d_ + 2 * d_ * d_ + 2 * 2 * d_ * 4 * d_
    )
    attn_layer = 2 * 2 * n_tok * n_tok * d_
    enc_flops = mini * n_l * (n_tok * per_tok_layer + attn_layer)

    @jax.jit
    def enc_fn(p, crops, masks):
        return C.image_encoder_surgery(p, crops, masks, surgery_config)

    timeit(
        'surgery encoder (1024x197)',
        lambda: enc_fn(surgery_params, crops, masks_d),
        flops=enc_flops,
    )

    # --- full objects step ----------------------------------------------
    timeit(
        'objects_step (pre+encoder)',
        lambda: steps.objects_step(image_d, meta_d, masks_d, k),
        flops=enc_flops,
    )

    # --- components of the encoder: attention kernel alone ---------------
    from oadp_tpu.ops.attention import fused_mha_qkv

    qkv = jax.device_put(jnp.ones((mini, n_tok, 3 * d_), jdtype), dev)

    @jax.jit
    def mha_fn(qkv):
        return jnp.sum(fused_mha_qkv(qkv, config.heads, 1 / 8.0))

    timeit(
        'fused MHA kernel (one layer)',
        lambda: mha_fn(qkv),
        flops=mini * attn_layer,
    )

    # one layer's matmuls as plain jnp (MXU ceiling for the linear part)
    w1 = jax.device_put(jnp.ones((d_, 3 * d_), jdtype), dev)
    w2 = jax.device_put(jnp.ones((d_, d_), jdtype), dev)
    w3 = jax.device_put(jnp.ones((d_, 4 * d_), jdtype), dev)
    w4 = jax.device_put(jnp.ones((4 * d_, d_), jdtype), dev)
    x_t = jax.device_put(jnp.ones((mini, n_tok, d_), jdtype), dev)

    @jax.jit
    def lin_fn(x, w1, w2, w3, w4):
        qkv = x @ w1
        o = qkv[..., :d_] @ w2
        h = (x + o) @ w3
        return jnp.sum(h @ w4)

    timeit(
        'one layer linear matmuls',
        lambda: lin_fn(x_t, w1, w2, w3, w4),
        flops=mini * n_tok * per_tok_layer,
    )

    # stock encoder at the same geometry (main stream only, no side
    # stream): the side-stream overhead is the difference vs surgery
    @jax.jit
    def stock_fn(p, crops):
        return jnp.sum(C.image_encoder(p, crops, surgery_config))

    timeit(
        'stock encoder (1024x197)',
        lambda: stock_fn(surgery_params, crops),
        flops=enc_flops,
    )

    # 12x MHA kernel + 12x linear layer, summed (encoder compute ceiling)
    @jax.jit
    def twelve_fn(x, w1, w2, w3, w4):
        def body(x, _):
            qkv = x @ w1
            att = fused_mha_qkv(qkv, config.heads, 1 / 8.0)
            x = x + att @ w2
            h = _quick_gelu(x @ w3)
            return x + h @ w4, ()
        x, _ = jax.lax.scan(body, x, None, length=12)
        return jnp.sum(x)

    from oadp_tpu.models.clip import _quick_gelu
    timeit(
        '12x (mha + linear), no LN',
        lambda: twelve_fn(x_t, w1, w2, w3, w4),
        flops=12 * mini * (n_tok * per_tok_layer + attn_layer),
    )


if __name__ == '__main__':
    main()
