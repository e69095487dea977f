"""Amortized breakdown of the surgery encoder's non-GEMM glue.

The fused kernels + linear GEMMs account for ~19.3 ms/layer; the full
encoder runs ~24 ms/layer.  This times LICM-proof scan loops (input
perturbed per iteration) of encoder variants to attribute the gap:

* production surgery encoder (fused Pallas layers + XLA MLP; the
  LN-folded MLP variant was measured 2 ms/iter SLOWER and removed —
  XLA already fuses the LN into the GEMM epilogue, see CLAUDE.md)
* stock encoder at the same geometry (no side stream)

Usage: python tools/profile_encoder_glue.py [batch]
"""

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
    with jax.default_device(jax.devices('cpu')[0]):
        crops = jnp.asarray(
            rng.standard_normal((mini, 224, 224, 3)).astype(np.float32),
            jnp.bfloat16,
        )
        masks = jnp.asarray(
            (rng.uniform(size=(mini, g, g)) < 0.5).astype(np.float32)
        )
    crops, masks = jax.device_put((crops, masks), dev)

    def timeit(name, body):
        # params passed as jit args: closures over big arrays ship the
        # constants with the HLO over the tunnel (HTTP body limits)
        def fn(params, crops, masks):
            def step(carry, t):
                out = body(params, crops + t * 1e-30, masks)
                return carry + jnp.sum(out.astype(jnp.float32)), None
            out, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float32),
                jnp.arange(1.0, ITERS + 1.0, dtype=jnp.bfloat16),
            )
            return out
        jfn = jax.jit(fn)
        r = jfn(s_params, crops, masks)
        float(r)  # compile + warm (sync via fetch)
        t0 = time.perf_counter()
        float(jfn(s_params, crops, masks))
        dt = (time.perf_counter() - t0) * 1e3
        print(f'{name:44s} {dt / ITERS:8.2f} ms/iter')
        return dt / ITERS

    timeit(
        'surgery encoder (production)',
        lambda p, c, m: C.image_encoder_surgery(p, c, m, s_config),
    )

    timeit(
        'stock encoder (same geometry)',
        lambda p, c, m: C.image_encoder(p, c, s_config),
    )


if __name__ == '__main__':
    main()
