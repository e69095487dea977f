"""A/B the RoIAlign backward scatter strategies on the real chip.

The DP train step spends ~25 ms/step (of 112) in the autodiff
transpose of the RoIAlign gather — a scatter-add of ~1.3M bf16 rows
(x256 ch) into the (93k, 256) flat pyramid table. Within one RoI the
corner rows are unique (14x14 samples x 4 corners = 28x28 distinct
grid positions), so duplicates only come from overlapping RoIs.

Variants measured (amortized inside one jit, sum-reduced output):
  v0  autodiff transpose of the production gather (baseline)
  v1  explicit .at[idx].add(dz) in bf16 (what v0 lowers to, sanity)
  v2  argsort(idx) + permute dz + scatter(indices_are_sorted=True)
  v3  scatter in fp32 (table promoted)
  v4  segment_sum over sorted ids
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

    n_table = 93_000  # ~sum HW of P2..P5 at 832x1344
    c = 256
    n_rois = 832
    n_rows = n_rois * 7 * 2 * 7 * 2 * 4  # 652k rows per image

    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, n_table, (n_rows,), np.int32)
    dz_np = rng.standard_normal((n_rows, c)).astype(np.float32)

    device = jax.devices()[0]
    idx = jax.device_put(idx_np, device)
    dz = jax.device_put(dz_np.astype(jnp.bfloat16), device)

    def timeit(label, fn, *args, n=6):
        out = fn(*args)
        np.asarray(out)
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / n
        print(f'{label:46s} {dt * 1e3:9.2f} ms')
        return dt

    # v1: plain scatter-add, bf16 (the autodiff lowering)
    @jax.jit
    def v1(idx, dz):
        tab = jnp.zeros((n_table, c), jnp.bfloat16)
        tab = tab.at[idx].add(dz)
        return jnp.sum(tab.astype(jnp.float32))

    timeit('v1 scatter-add bf16 (autodiff shape)', v1, idx, dz)

    # v2: sort ids, permute updates, sorted scatter
    @jax.jit
    def v2(idx, dz):
        order = jnp.argsort(idx)
        sid = idx[order]
        sdz = jnp.take(dz, order, axis=0)
        tab = jnp.zeros((n_table, c), jnp.bfloat16)
        tab = tab.at[sid].add(sdz, indices_are_sorted=True)
        return jnp.sum(tab.astype(jnp.float32))

    timeit('v2 argsort + sorted scatter bf16', v2, idx, dz)

    # v3: scatter in fp32
    @jax.jit
    def v3(idx, dz):
        tab = jnp.zeros((n_table, c), jnp.float32)
        tab = tab.at[idx].add(dz.astype(jnp.float32))
        return jnp.sum(tab)

    timeit('v3 scatter-add fp32', v3, idx, dz)

    # v4: segment_sum over sorted ids
    @jax.jit
    def v4(idx, dz):
        order = jnp.argsort(idx)
        sid = idx[order]
        sdz = jnp.take(dz, order, axis=0)
        tab = jax.ops.segment_sum(
            sdz, sid, num_segments=n_table, indices_are_sorted=True
        )
        return jnp.sum(tab.astype(jnp.float32))

    timeit('v4 argsort + segment_sum', v4, idx, dz)

    # v5: the pieces of v2, separately: argsort alone, permute alone
    @jax.jit
    def v5a(idx):
        return jnp.sum(jnp.argsort(idx))

    timeit('v5a argsort(652k int32) alone', v5a, idx)

    @jax.jit
    def v5b(idx, dz):
        return jnp.sum(jnp.take(dz, idx % n_rows, axis=0)
                       .astype(jnp.float32))

    timeit('v5b row-take (652k, 256) bf16 alone', v5b, idx, dz)


if __name__ == '__main__':
    main()
