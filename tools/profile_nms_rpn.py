"""Sweep the blocked greedy ``nms()`` tile at the RPN geometry
(n=2000 pre-NMS candidates -> max_out=1000, iou 0.7, batch 2 vmap).

The multiclass tile sweep (tools/profile_nms_lvis.py) found block work
scales as n*tile and moved that default 256 -> 64; this probe checks
whether the single-class RPN form — a serial early-exit outer loop
whose per-tile cost is one (tile, tile) block fixpoint plus one
(tile, n) suppress strip — has the same win or is instead bound by
the serial outer steps (more tiles = more ~10 us dispatch-equivalent
iterations + more (tile, n) strip passes summing to the same n^2).

Clustered boxes (realistic RPN overlap), flat scores (pessimistic: no
early exit), amortized 6 batches in one jit.

VERDICT: filled in from the on-chip run below.
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

    from oadp_tpu.ops.nms import nms

    reps, b, n, max_out = 6, 2, 2000, 1000
    rng = np.random.default_rng(0)

    def make_boxes(m):
        centers = rng.uniform(50, 1200, (150, 2))
        idx = rng.integers(0, 150, m)
        cxy = centers[idx] + rng.normal(0, 20, (m, 2))
        wh = rng.uniform(16, 256, (m, 2))
        x0y0 = cxy - wh / 2
        return np.concatenate([x0y0, x0y0 + wh], -1).astype(np.float32)

    boxes_np = np.stack(
        [np.stack([make_boxes(n) for _ in range(b)]) for _ in range(reps)]
    )
    scores_np = rng.uniform(0, 1, (reps, b, n)).astype(np.float32)

    device = jax.devices()[0]
    boxes = jax.device_put(jnp.asarray(boxes_np), device)
    scores = jax.device_put(jnp.asarray(scores_np), device)

    def build(tile):
        def one(bx, sc):
            idx, valid = nms(bx, sc, 0.7, max_out, tile=tile)
            return jnp.sum(idx) + jnp.sum(valid)

        @jax.jit
        def run(bxs, scs):
            def body(acc, xs):
                bx, sc = xs
                return acc + jnp.sum(jax.vmap(one)(bx, sc)), None

            out, _ = jax.lax.scan(body, jnp.int32(0), (bxs, scs))
            return out

        return run

    ref = None
    for tile in [256, 128, 64, 512]:
        run = build(tile)
        t0 = time.perf_counter()
        out = int(np.asarray(run(boxes, scores)))
        compile_s = time.perf_counter() - t0
        if ref is None:
            ref = out
        ok = 'OK ' if out == ref else 'DIFF'
        np.asarray(run(boxes, scores))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(boxes, scores))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(
            f'tile={tile:4d}  {best * 1e3:8.2f} ms/batch(b=2)'
            f'  (compile {compile_s:6.1f} s, checksum {ok})',
            flush=True,
        )


if __name__ == '__main__':
    main()
