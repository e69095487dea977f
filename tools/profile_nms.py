"""Micro-profile of multiclass_nms internals on the real chip at the
production geometry (b=2, n=1000, c=65): the REJECTED matrix-permute
formulation staged cumulatively (IoU matrix, per-class permutations,
blocked fixpoint) vs the shipped lazy-IoU form — an A/B record.
Measured (v5e via axon, amortized over 6 batches): matrix form through
the fixpoint 12.4 ms/batch; full lazy multiclass_nms (incl. top-k)
9.5 ms/batch. At the OV-LVIS geometry (C=1203) single-dispatch probes
measured 86.5 vs 61 ms/image. (Numbers above are at the r4 default
tile=256; the r5 tile sweep in ``tools/profile_nms_lvis.py`` moved the
production default to tile=64 — the lazy-vs-matrix verdict here is
tile-independent.)
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _sorted_block_nms_matrix(mat, sc_sorted, tile):
    """The REJECTED matrix form (kept here for A/B only): greedy keep
    set over pre-permuted (..., n, n) suppression matrices. The shipped
    ops/nms.py:_sorted_block_nms_lazy recomputes IoU per tile from
    sorted boxes instead — the permutation row-takes/transposes here
    are what made this form gather-bandwidth-bound."""
    import jax
    import jax.numpy as jnp

    from oadp_tpu.ops.nms import NEG_INF

    n = sc_sorted.shape[-1]
    nt = -(-n // tile)
    pad = nt * tile - n
    if pad:
        mat = jnp.pad(mat, (*[(0, 0)] * (mat.ndim - 2), (0, pad), (0, pad)))
        sc_sorted = jnp.pad(
            sc_sorted, (*[(0, 0)] * (sc_sorted.ndim - 1), (0, pad)),
            constant_values=NEG_INF,
        )
    alive = sc_sorted > NEG_INF / 2
    tri = jnp.triu(jnp.ones((tile, tile), bool), k=1)
    keeps = []
    for t in range(nt):
        a, b = t * tile, (t + 1) * tile
        m = mat[..., a:b, a:b] & tri
        talive = alive[..., a:b]

        def inner_cond(c):
            k, prev, it = c
            return jnp.any(k != prev) & (it < tile)

        def inner_body(c, m=m, talive=talive):
            k, _, it = c
            sup = jnp.any(m & k[..., :, None], axis=-2)
            return talive & ~sup, k, it + 1

        k, _, _ = jax.lax.while_loop(
            inner_cond, inner_body, (talive, ~talive, jnp.int32(0))
        )
        keeps.append(k)
        if t + 1 < nt:
            sup_later = jnp.any(
                mat[..., a:b, b:] & k[..., :, None], axis=-2
            )
            alive = jnp.concatenate(
                [alive[..., :b], alive[..., b:] & ~sup_later], axis=-1
            )
    keep = jnp.concatenate(keeps, axis=-1)
    return keep[..., :n] if pad else keep


def main() -> None:
    import jax
    import jax.numpy as jnp

    from oadp_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from oadp_tpu.ops.nms import (
        NEG_INF,
        _pair_iou,
        multiclass_nms,
    )
    _sorted_block_nms = _sorted_block_nms_matrix

    b, n, c = 2, 1000, 65
    tile = 256
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 700, (b, n, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(8, 300, (b, n, 2))], -1)
    boxes = boxes.astype(np.float32)
    probs = (rng.uniform(0.01, 0.03, (b, n, c + 1))).astype(np.float32)
    device = jax.local_devices()[0]
    boxes, probs = jax.device_put((boxes, probs), device)

    def tsum(tree):
        return sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree)
        )

    def timeit(label, fn, *args, n_=6):
        f = jax.jit(fn)
        np.asarray(f(*args))
        np.asarray(f(*args))
        t0 = time.perf_counter()
        for _ in range(n_):
            out = f(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / n_ * 1000
        print(f'{label:30s} {dt:8.2f} ms', flush=True)

    def stage_mat(bx, pr):
        def one(boxes, scores):
            cls = scores[:, :c]
            sc = jnp.where(cls > 0.0, cls, NEG_INF)
            mat = _pair_iou(boxes, boxes) > 0.5
            return sc, mat
        return tsum(jax.vmap(one)(bx, pr))

    def stage_sort(bx, pr):
        def one(boxes, scores):
            cls = scores[:, :c]
            sc = jnp.where(cls > 0.0, cls, NEG_INF)
            sc_t = sc.T
            order = jnp.argsort(-sc_t, axis=-1, stable=True)
            sc_sorted = jnp.take_along_axis(sc_t, order, axis=-1)
            mat = _pair_iou(boxes, boxes) > 0.5
            return sc_sorted, order, mat
        return tsum(jax.vmap(one)(bx, pr))

    def stage_permute(bx, pr):
        def one(boxes, scores):
            cls = scores[:, :c]
            sc = jnp.where(cls > 0.0, cls, NEG_INF)
            sc_t = sc.T
            order = jnp.argsort(-sc_t, axis=-1, stable=True)
            sc_sorted = jnp.take_along_axis(sc_t, order, axis=-1)
            mat = _pair_iou(boxes, boxes) > 0.5
            mrow = mat[order.reshape(-1)].reshape(c, n, n)
            perm_t = jax.vmap(lambda m, o: m[o])(
                mrow.transpose(0, 2, 1), order
            )
            mat_sorted = perm_t.transpose(0, 2, 1)
            return sc_sorted, mat_sorted
        return tsum(jax.vmap(one)(bx, pr))

    def stage_fixpoint(bx, pr):
        def one(boxes, scores):
            cls = scores[:, :c]
            sc = jnp.where(cls > 0.0, cls, NEG_INF)
            sc_t = sc.T
            order = jnp.argsort(-sc_t, axis=-1, stable=True)
            sc_sorted = jnp.take_along_axis(sc_t, order, axis=-1)
            mat = _pair_iou(boxes, boxes) > 0.5
            mrow = mat[order.reshape(-1)].reshape(c, n, n)
            perm_t = jax.vmap(lambda m, o: m[o])(
                mrow.transpose(0, 2, 1), order
            )
            mat_sorted = perm_t.transpose(0, 2, 1)
            keep = _sorted_block_nms(mat_sorted, sc_sorted, tile)
            return keep
        return tsum(jax.vmap(one)(bx, pr))

    def full(bx, pr):
        def one(boxes, scores):
            return multiclass_nms(
                boxes, scores, score_thr=0.0, iou_threshold=0.5,
                max_per_img=300, num_classes=c,
            )
        return tsum(jax.vmap(one)(bx, pr))

    timeit('iou matrix + thr mask', stage_mat, boxes, probs)
    timeit('+ per-class argsort', stage_sort, boxes, probs)
    timeit('+ row/col permutes', stage_permute, boxes, probs)
    timeit('+ blocked fixpoint', stage_fixpoint, boxes, probs)
    timeit('FULL multiclass_nms', full, boxes, probs)


if __name__ == '__main__':
    main()
