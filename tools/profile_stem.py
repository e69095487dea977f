"""A/B the ResNet stem conv (7x7 s2, C_in=3) against decompositions.

The DP profiler pinned the stem conv at ~7 ms standalone (batch 2,
832x1344 bf16) — ~1.5 TF/s, far under the 167 TF/s GEMM rate, because
C_in=3 cannot tile onto the MXU. Candidates:

* native ``conv_general_dilated`` (current);
* space-to-depth factor 2: x -> (B, H/2, W/2, 12), kernel remapped to
  (4, 4, 12, 64) with zero taps where 2m+a-4 leaves [-3, 3], stride 1
  (the s2d grid coincides with the stride-2 output grid);
* ``conv_general_dilated_patches`` im2col + (147, 64) GEMM.

All variants are amortized 8x inside one jit (lax.scan over stacked
inputs, single sum-reduced fetch) per the tunnel timing rules.

VERDICT (v5e, 2026-08-20): native conv wins — 4.5 ms vs 7.6 ms
(space-to-depth) and 7.9 ms (im2col). XLA's own C_in=3 lowering beats
both hand decompositions (same pattern as the OAKE patchify embed, see
CLAUDE.md); the stem is pinned at this toolchain floor. Do not replace
the native conv.
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

    b, h, w = 2, 832, 1344
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((8, b, h, w, 3), np.float32).astype(
        jnp.bfloat16
    )
    w_np = (rng.standard_normal((7, 7, 3, 64), np.float32) * 0.05).astype(
        np.float32
    )
    device = jax.devices()[0]
    xs = jax.device_put(jnp.asarray(x_np), device)
    kern = jax.device_put(jnp.asarray(w_np), device)

    def timeit(label, fn, *args, reps=8, rounds=3):
        out = fn(*args)
        np.asarray(out)
        best = np.inf
        for _ in range(rounds):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f'{label:52s} {best * 1e3:9.3f} ms')
        return best

    def scan_sum(step):
        def fn(xs_, k):
            def body(acc, x):
                return acc + jnp.sum(step(x, k).astype(jnp.float32)), None

            out, _ = jax.lax.scan(body, jnp.float32(0), xs_)
            return out

        return jax.jit(fn)

    # --- native ----------------------------------------------------------
    def native(x, k):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        )

    f_native = scan_sum(native)
    timeit('native conv 7x7 s2 (C_in=3)', f_native, xs, kern)
    ref = np.asarray(jax.jit(native)(xs[0], kern), np.float32)

    # --- space-to-depth factor 2 ------------------------------------------
    # out[i,j] = sum_{u,v in -3..3} x[2i+u, 2j+v] w[u+3, v+3]; write
    # u = 2m + a - 4 (m in 0..3, a in 0..1) so 2i+u = 2(i+m-2) + a:
    # a 4x4 stride-1 conv over the (H/2, W/2, 12) s2d grid, pad (2, 1).
    k2_np = np.zeros((4, 4, 12, 64), np.float32)
    for m in range(4):
        for a in range(2):
            u = 2 * m + a - 4
            if not -3 <= u <= 3:
                continue
            for n in range(4):
                for c2 in range(2):
                    v = 2 * n + c2 - 4
                    if -3 <= v <= 3:
                        k2_np[m, n, (a * 2 + c2) * 3:(a * 2 + c2) * 3 + 3] = (
                            w_np[u + 3, v + 3]
                        )
    k2 = jax.device_put(jnp.asarray(k2_np), device)

    def s2d(x, k):
        bb, hh, ww, cc = x.shape
        y = x.reshape(bb, hh // 2, 2, ww // 2, 2, cc)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            bb, hh // 2, ww // 2, 4 * cc
        )
        return jax.lax.conv_general_dilated(
            y, k.astype(x.dtype), (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        )

    got = np.asarray(jax.jit(s2d)(xs[0], k2), np.float32)
    err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
    f_s2d = scan_sum(s2d)
    timeit(f's2d factor 2 conv 4x4 s1 (C_in=12) [relerr {err:.1e}]',
           f_s2d, xs, k2)

    # --- im2col + GEMM ----------------------------------------------------
    def im2col(x, k):
        patches = jax.lax.conv_general_dilated_patches(
            x, (7, 7), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        )
        # patches feature dim is channel-major: c * 49 + u * 7 + v
        kmat = k.transpose(2, 0, 1, 3).reshape(-1, 64)
        return patches @ kmat.astype(x.dtype)

    got = np.asarray(jax.jit(im2col)(xs[0], kern), np.float32)
    err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
    f_im2col = scan_sum(im2col)
    timeit(f'im2col patches + GEMM [relerr {err:.1e}]', f_im2col, xs, kern)


if __name__ == '__main__':
    main()
