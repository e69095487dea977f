"""Itemize + A/B the Shared4Conv1FC bbox tower at the production batch.

The DP roofline pins every stage except the RoI towers (bbox tower
5.7 ms fwd / 8.8 ms fwd+bwd at 2048 RoIs of 7x7x256 — ~41 TF/s against
the conv FLOP count). Hypotheses:

* the 4 train-mode BNs dominate (each reads/writes ~50 MB bf16 of
  (2048, 7, 7, 256) activations; stats pass + normalize pass x 4
  layers ~ 0.6 GB at 333 GB/s ~ 2 ms);
* XLA's conv lowering at tiny 7x7 spatial with huge batch may leave
  MXU idle (halo handling), in which case a 9-shift GEMM decomposition
  (3x3 conv = 9 accumulated (R*49, 256)@(256, 256) GEMMs over shifted
  views — no im2col blowup) would win.

Variants (amortized >=6 runs in one jit, sum-reduced fetch):
  conv stack only (no BN)            - the pure conv floor
  conv+BN+relu stack (shipped)       - adds the train-BN cost
  9-shift GEMM stack (no BN)         - conv decomposition A/B
  full tower fwd / fwd+bwd (shipped) - context

VERDICT (v5e, 2026-08-20, r=2048 — 2x the production 1024-RoI batch,
so halve for in-step scale): the tower is CONV-bound at XLA's native
conv rate and already at its floor. conv stack (no BN) 6.89 ms =
473 GFLOP at ~69 TF/s (the usual XLA 3x3-conv efficiency);
conv+trainBN+relu 7.28 ms — the 4 mask-aware train BNs add only
0.4 ms (XLA fuses stats+normalize into the conv epilogue, same as the
FPN probe). The 9-shift GEMM decomposition is 2.5x SLOWER (17.25 ms:
the border-mask shifted views defeat operand fusion) — the third
probe confirming native conv beats hand decompositions on this
toolchain (stem, patchify). Full tower fwd 8.94 / fwd+bwd 13.84 ms at
r=2048. No optimization available; the roofline tower line is pinned.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from oadp_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from oadp_tpu.models import heads as H
    from oadp_tpu.models.layers import batch_norm, conv

    r, k, c = 2048, 7, 256  # 1024 RoIs/img x b=2, RoIAlign 7x7x256
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((r, k, k, c), np.float32).astype(
        jnp.bfloat16
    )

    config = H.HeadConfig(
        num_convs=4, num_fcs=1, fc_channels=1024,
        classifier=H.ClassifierConfig(
            num_bases=48, num_all=65, embedding_dim=512,
        ),
    )
    with jax.default_device(jax.devices('cpu')[0]):
        emb = jnp.asarray(
            rng.standard_normal((65, 512), np.float32)
        )
        params, stats = H.init_convfc_head(
            jax.random.key(0), emb, config
        )
    device = jax.devices()[0]
    params = jax.device_put(params, device)
    stats = jax.device_put(stats, device)
    x = jax.device_put(jnp.asarray(x_np), device)
    valid = jax.device_put(
        jnp.ones((r,), bool), device
    )

    def timeit(label, fn, *args, n=6):
        out = fn(*args)
        np.asarray(out)
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / n
        print(f'{label:44s} {dt * 1e3:9.2f} ms')
        return dt

    def tsum(tree):
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree.leaves(tree))

    # --- conv stack only (floor) -----------------------------------------
    @jax.jit
    def f_convs(p, xx):
        for lp in p['convs']:
            xx = jax.nn.relu(conv(xx, lp['conv'], padding=1))
        return jnp.sum(xx.astype(jnp.float32))

    timeit('conv stack x4 (no BN)', f_convs, params, x)

    # --- shipped conv+BN+relu stack --------------------------------------
    @jax.jit
    def f_convbn(p, s, xx):
        acc = jnp.float32(0)
        for lp, ls in zip(p['convs'], s['convs']):
            xx = conv(xx, lp['conv'], padding=1)
            xx, ns = batch_norm(xx, lp['bn'], ls['bn'], True, mask=valid)
            xx = jax.nn.relu(xx)
            acc += tsum(ns)
        return jnp.sum(xx.astype(jnp.float32)) + acc

    timeit('conv+trainBN+relu x4 (shipped)', f_convbn, params, stats, x)

    # --- 9-shift GEMM decomposition (no BN) -------------------------------
    # 3x3 SAME conv = sum over (dy, dx) of shifted input @ w[dy, dx];
    # borders masked. Shapes: (r*49, 256) @ (256, 256) x 9.
    @jax.jit
    def f_shift(p, xx):
        for lp in p['convs']:
            w = lp['conv']['w'].astype(xx.dtype)  # (3, 3, 256, 256)
            out = jnp.zeros_like(xx)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    sh = jnp.roll(xx, (-dy, -dx), axis=(1, 2))
                    if dy == -1:
                        sh = sh.at[:, -1].set(0)
                    elif dy == 1:
                        sh = sh.at[:, 0].set(0)
                    if dx == -1:
                        sh = sh.at[:, :, -1].set(0)
                    elif dx == 1:
                        sh = sh.at[:, :, 0].set(0)
                    out = out + jnp.einsum(
                        'rhwc,cd->rhwd', sh, w[dy + 1, dx + 1]
                    )
            xx = jax.nn.relu(out)
        return jnp.sum(xx.astype(jnp.float32))

    timeit('9-shift GEMM stack x4 (no BN)', f_shift, params, x)

    # --- full tower ------------------------------------------------------
    @jax.jit
    def f_tower(p, s, xx):
        logits, reg, proj, ns = H.convfc_forward(
            p, s, xx, config, True, valid
        )
        return (jnp.sum(logits.astype(jnp.float32))
                + jnp.sum(proj.astype(jnp.float32)) + tsum(ns))

    timeit('full tower fwd (shipped)', f_tower, params, stats, x)

    @jax.jit
    def f_tower_grad(p, s, xx):
        def loss(pp):
            logits, reg, proj, ns = H.convfc_forward(
                pp, s, xx, config, True, valid
            )
            return (jnp.sum(logits.astype(jnp.float32))
                    + jnp.sum(proj.astype(jnp.float32)) + tsum(ns))

        val, g = jax.value_and_grad(loss)(p)
        return val + tsum(g)

    timeit('full tower fwd+bwd (shipped)', f_tower_grad, params, stats, x)


if __name__ == '__main__':
    main()
