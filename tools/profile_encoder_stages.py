"""True amortized per-stage budget of the surgery encoder.

Times LICM-proof scans of isolated stages at the production OAKE
geometry (B=1024, N=197, D=768, bf16) so per-dispatch overhead (~3 ms
on the tunnel) cannot inflate any line:

* embed      — patchify conv (stride 16) + pos embed + ln_pre
* attn x12   — fused surgery kernel (fold_out) alone, 11 layers + last
* mlp x12    — ln_2 + MLP alone
* y-ops x12  — side-stream LN/MLP small ops alone
* pool       — ln_post + projection
* full       — the production encoder

Usage: python tools/profile_encoder_stages.py [batch]
"""

import math
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ITERS = 4


def main() -> None:
    import jax
    import jax.numpy as jnp

    from oadp_tpu.models import clip as C
    from oadp_tpu.ops.attention import fused_surgery_layer

    mini = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dev = jax.devices()[0]
    print(f'device: {dev.device_kind} ({dev.platform}), B={mini}')

    config = C.ViTConfig()
    with jax.default_device(jax.devices('cpu')[0]):
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16),
            C.init_vit_params(jax.random.key(0), config),
        )
        s_params, s_config = C.upsample_vit_params(params, config)
        s_params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16), s_params
        )
    s_params = jax.device_put(s_params, dev)

    rng = np.random.default_rng(0)
    g = s_config.grid
    n = g * g + 1
    d = s_config.width
    with jax.default_device(jax.devices('cpu')[0]):
        crops = jnp.asarray(
            rng.standard_normal((mini, 224, 224, 3)).astype(np.float32),
            jnp.bfloat16,
        )
        masks = jnp.asarray(
            (rng.uniform(size=(mini, g, g)) < 0.5).astype(np.float32)
        )
        xtok = jnp.asarray(
            rng.standard_normal((mini, n, d)).astype(np.float32),
            jnp.bfloat16,
        )
        ytok = jnp.asarray(
            rng.standard_normal((mini, 1, d)).astype(np.float32),
            jnp.bfloat16,
        )
        bias_flat = jnp.asarray(
            (rng.uniform(size=(mini, n)) < 0.5).astype(np.float32) * -100.0
        )
    crops, masks, xtok, ytok, bias_flat = jax.device_put(
        (crops, masks, xtok, ytok, bias_flat), dev
    )

    def timeit(name, body, *data):
        def fn(params, *data):
            def step(carry, t):
                out = body(params, carry, t, *data)
                return jnp.sum(out.astype(jnp.float32)) * 1e-30 + carry, None
            out, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32),
                jnp.arange(1.0, ITERS + 1.0, dtype=jnp.bfloat16),
            )
            return out
        jfn = jax.jit(fn)
        float(jfn(s_params, *data))  # compile + warm
        t0 = time.perf_counter()
        float(jfn(s_params, *data))
        dt = (time.perf_counter() - t0) * 1e3
        print(f'{name:44s} {dt / ITERS:8.2f} ms/iter')
        return dt / ITERS

    heads = s_config.heads
    scale = 1.0 / math.sqrt(d // heads)

    # embed + ln_pre (carry perturbs input)
    def embed_body(p, carry, t, crops):
        pert = (crops + t * 1e-30 + carry).astype(crops.dtype)
        x = C._embed_patches(pert, p, s_config)
        return C._layer_norm(x, p['ln_pre'])
    timeit('embed (conv s16 + pos + ln_pre)', embed_body, crops)

    # 11x fused surgery kernel w/ fold_out + last-layer kv/side
    def attn_body(p, carry, t, xtok, ytok, bias_flat):
        x = (xtok + t * 1e-30 + carry).astype(xtok.dtype)
        y = ytok
        for bi, block in enumerate(p['blocks']):
            attn = block['attn']
            args = (
                x, y[:, 0], bias_flat,
                block['ln_1']['scale'], block['ln_1']['bias'],
                attn['qkv_w'], attn['qkv_b'], heads, scale,
            )
            if bi == len(p['blocks']) - 1:
                side = fused_surgery_layer(*args, with_main=False)
                y = y + (side[:, None] @ attn['out_w'] + attn['out_b'])
            else:
                x, y_row = fused_surgery_layer(
                    *args, out_w=attn['out_w'], out_b=attn['out_b'],
                )
                y = y_row[:, None]
        return y
    timeit('12x attention (fused, fold_out)', attn_body, xtok, ytok,
           bias_flat)

    # 12x ln_2 + MLP on the main stream
    def mlp_body(p, carry, t, xtok):
        x = (xtok + t * 1e-30 + carry).astype(xtok.dtype)
        for block in p['blocks']:
            x = x + C._mlp(C._layer_norm(x, block['ln_2']), block['mlp'])
        return x
    timeit('12x ln_2 + MLP (main stream)', mlp_body, xtok)

    # 12x side-stream small ops (LN + MLP on (B, 1, D))
    def yops_body(p, carry, t, ytok):
        y = (ytok + t * 1e-30 + carry).astype(ytok.dtype)
        for block in p['blocks']:
            y = y + C._mlp(C._layer_norm(y, block['ln_2']), block['mlp'])
        return y
    timeit('12x side-stream LN+MLP', yops_body, ytok)

    # full production encoder
    def full_body(p, carry, t, crops, masks):
        return C.image_encoder_surgery(
            p, (crops + t * 1e-30 + carry).astype(crops.dtype), masks,
            s_config
        )
    timeit('full surgery encoder', full_body, crops, masks)


if __name__ == '__main__':
    main()
