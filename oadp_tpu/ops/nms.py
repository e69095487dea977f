"""Fixed-shape NMS under jit (greedy, mask-based).

Replaces the mmcv CUDA ``nms`` / ``batched_nms`` / ``multiclass_nms``
ops (reference RPN/RCNN test cfgs ``configs/dp/models/
faster_rcnn_r50_fpn.py:95-133``, ``oadp/dp/test_nni.py:90``). All
outputs have static shapes: selections are (index, valid) pairs padded
to ``max_out``; callers mask instead of slicing.
"""

__all__ = ['nms', 'batched_nms', 'multiclass_nms']

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def _pair_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of every box in ``a (..., T, 4)`` against every box in
    ``b (..., M, 4)`` -> ``(..., T, M)`` (leading dims broadcast)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:4], b[..., None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0, None) * jnp.clip(
        a[..., 3] - a[..., 1], 0, None
    )
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0, None) * jnp.clip(
        b[..., 3] - b[..., 1], 0, None
    )
    return inter / jnp.maximum(
        area_a[..., :, None] + area_b[..., None, :] - inter, 1e-6
    )


def nms(
    boxes: jnp.ndarray,  # (N, 4)
    scores: jnp.ndarray,  # (N,) — invalid entries must carry -inf
    iou_threshold: float,
    max_out: int,
    tile: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS. Returns ``(indices, valid)`` of shape ``(max_out,)``;
    indices are ordered by descending score.

    Blocked EXACT greedy (the TPU formulation): candidates are sorted by
    score and processed in ``tile``-sized blocks. Within a block the
    keep set is the unique fixpoint of the strictly-triangular
    suppression recurrence (iterated on a (tile, tile) boolean matrix —
    converges in the longest suppression-chain length, a handful of
    passes). Kept boxes then suppress all LATER candidates with one
    vectorized (tile, N) IoU pass. The outer loop exits as soon as
    ``max_out`` boxes are kept — earlier keeps never depend on later
    tiles, so the result equals the serial greedy scan while running
    ~N/tile vector steps instead of ``max_out`` scalar-argmax steps
    (the previous formulation; 1000 serial iterations dominated the DP
    train step's RPN stage).
    """
    n = boxes.shape[0]
    nt = -(-n // tile)
    pad = nt * tile - n
    sc = scores.astype(jnp.float32)
    order = jnp.argsort(-sc, stable=True)
    sboxes = boxes.astype(jnp.float32)[order]
    ssc = sc[order]
    if pad:
        sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
        ssc = jnp.pad(ssc, (0, pad), constant_values=NEG_INF)
        order = jnp.pad(order, (0, pad))
    npad = nt * tile
    pos = jnp.arange(npad)
    alive0 = ssc > NEG_INF / 2

    tri = jnp.triu(jnp.ones((tile, tile), bool), k=1)

    def outer_body(carry):
        t, alive, keep = carry
        start = t * tile
        tb = jax.lax.dynamic_slice(sboxes, (start, 0), (tile, 4))
        talive = jax.lax.dynamic_slice(alive, (start,), (tile,))
        m = (_pair_iou(tb, tb) > iou_threshold) & tri

        # Fixpoint of the triangular suppression recurrence. The plain
        # iteration k <- talive & ~suppressed_by(k) is an ANTITONE map:
        # it can enter a 2-cycle and never reach the fixpoint (observed
        # on real data — an uncapped while_loop span forever). But any
        # position of suppression-rank r (longest M-chain into it) is
        # provably FINAL after r iterations regardless of oscillation
        # elsewhere, and ranks are < tile, so capping at ``tile``
        # iterations yields the exact greedy keep set; the change-check
        # still exits after ~2-3 passes in the common case.
        def inner_cond(c):
            k, prev, it = c
            return jnp.any(k != prev) & (it < tile)

        def inner_body(c):
            k, _, it = c
            sup = jnp.any(m & k[:, None], axis=0)
            return talive & ~sup, k, it + 1

        k, _, _ = jax.lax.while_loop(
            inner_cond, inner_body, (talive, ~talive, jnp.int32(0))
        )
        keep = jax.lax.dynamic_update_slice(keep, k, (start,))
        sup_later = (
            jnp.any((_pair_iou(tb, sboxes) > iou_threshold) & k[:, None],
                    axis=0)
            & (pos >= start + tile)
        )
        return t + 1, alive & ~sup_later, keep

    def outer_cond(carry):
        t, alive, keep = carry
        return (t < nt) & (jnp.sum(keep) < max_out)

    _, _, keep = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(0), alive0, jnp.zeros(npad, bool)),
    )
    # compact the first max_out keeps, preserving score order; pad the
    # static output shape to max_out when there are fewer candidates
    sel = jnp.argsort(jnp.where(keep, pos, npad + pos))[:max_out]
    valid = keep[sel]
    idx = jnp.where(valid, order[sel], 0).astype(jnp.int32)
    if idx.shape[0] < max_out:
        short = max_out - idx.shape[0]
        idx = jnp.concatenate([idx, jnp.zeros(short, jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros(short, bool)])
    return idx, valid


def _iou_one_to_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:4], boxes[:, 2:4])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    area = jnp.clip(box[2] - box[0], 0, None) * jnp.clip(
        box[3] - box[1], 0, None
    )
    areas = jnp.clip(boxes[:, 2] - boxes[:, 0], 0, None) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )
    return inter / jnp.maximum(area + areas - inter, 1e-6)


def batched_nms(
    boxes: jnp.ndarray,  # (N, 4)
    scores: jnp.ndarray,  # (N,)
    ids: jnp.ndarray,  # (N,) int — class / level ids
    iou_threshold: float,
    max_out: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Category-aware NMS via the coordinate-offset trick (mmcv
    ``batched_nms``): boxes of different ids never overlap."""
    offset = (jnp.max(boxes) + 1.0) * ids.astype(boxes.dtype)
    shifted = boxes + offset[:, None]
    return nms(shifted, scores, iou_threshold, max_out)


def _pair_iou_soa(a, b) -> jnp.ndarray:
    """IoU from structure-of-arrays coordinates: ``a``/``b`` are
    4-tuples of ``(..., T)`` / ``(..., M)`` planes -> ``(..., T, M)``.
    The AoS :func:`_pair_iou` broadcasts over a trailing dim of 2 (the
    xy pairs), which wastes all but 2 of the VPU's 128 lanes when the
    pair grid is recomputed per class; the SoA form keeps every
    broadcast at full (..., T, M) lane width."""
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    col = lambda x: x[..., :, None]  # noqa: E731
    row = lambda x: x[..., None, :]  # noqa: E731
    iw = jnp.clip(
        jnp.minimum(col(ax1), row(bx1)) - jnp.maximum(col(ax0), row(bx0)),
        0.0, None,
    )
    ih = jnp.clip(
        jnp.minimum(col(ay1), row(by1)) - jnp.maximum(col(ay0), row(by0)),
        0.0, None,
    )
    inter = iw * ih
    area_a = jnp.clip(ax1 - ax0, 0, None) * jnp.clip(ay1 - ay0, 0, None)
    area_b = jnp.clip(bx1 - bx0, 0, None) * jnp.clip(by1 - by0, 0, None)
    return inter / jnp.maximum(col(area_a) + row(area_b) - inter, 1e-6)


def _sorted_block_nms_lazy(
    sboxes: jnp.ndarray,  # (..., n, 4) — score-DESC-sorted boxes
    sc_sorted: jnp.ndarray,  # (..., n) — NEG_INF marks invalid
    iou_threshold: float,
    tile: int,
) -> jnp.ndarray:
    """Greedy keep set for score-DESC-sorted candidates, vectorized
    over any leading axes (classes, batch), with the IoU computed
    LAZILY per tile block/strip from the sorted boxes — the
    (..., n, n) suppression matrix never exists. Same blocked-
    triangular-fixpoint argument as :func:`nms`, but with a STATIC
    tile loop (``ceil(n/tile)`` steps — 4 at the production n=1000)
    instead of a data-dependent serial scan. The earlier matrix form
    (kept for comparison in ``tools/profile_nms.py``) moved ~8
    full-matrix passes through HBM per class chunk (two row-take
    permutations at the ~75 GB/s gather rate plus two transposes plus
    the fixpoint reads: measured 86.5 ms/image at the OV-LVIS geometry
    C=1203, N=1000); here each tile recomputes its (tile, tile) block
    and (tile, n-after) strip from four SoA coordinate planes and XLA
    fuses the IoU straight into the ``any`` reduction — VPU-compute-
    bound at full lane width instead of gather-bound."""
    n = sc_sorted.shape[-1]
    nt = -(-n // tile)
    pad = nt * tile - n
    if pad:
        # zero-box padding is inert: inter = 0 -> IoU 0 suppresses
        # nothing, and the NEG_INF score keeps the row not-alive
        sboxes = jnp.pad(
            sboxes, (*[(0, 0)] * (sboxes.ndim - 2), (0, pad), (0, 0))
        )
        sc_sorted = jnp.pad(
            sc_sorted, (*[(0, 0)] * (sc_sorted.ndim - 1), (0, pad)),
            constant_values=NEG_INF,
        )
    planes = tuple(sboxes[..., i] for i in range(4))  # SoA (..., npad)
    alive = sc_sorted > NEG_INF / 2
    tri = jnp.triu(jnp.ones((tile, tile), bool), k=1)
    keeps = []
    for t in range(nt):
        a, b = t * tile, (t + 1) * tile
        tb = tuple(p[..., a:b] for p in planes)
        m = (_pair_iou_soa(tb, tb) > iou_threshold) & tri
        talive = alive[..., a:b]

        # capped antitone fixpoint — see the rank-finality argument in
        # :func:`nms`
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
            rest = tuple(p[..., b:] for p in planes)
            sup_later = jnp.any(
                (_pair_iou_soa(tb, rest) > iou_threshold)
                & k[..., :, None],
                axis=-2,
            )
            alive = jnp.concatenate(
                [alive[..., :b], alive[..., b:] & ~sup_later], axis=-1
            )
    keep = jnp.concatenate(keeps, axis=-1)
    return keep[..., :n] if pad else keep


@functools.partial(
    jax.jit,
    static_argnames=('max_per_img', 'num_classes', 'tile', 'class_chunk'),
)
def multiclass_nms(
    boxes: jnp.ndarray,  # (N, 4) or (N, C*4)
    scores: jnp.ndarray,  # (N, C+1) incl. background last
    score_thr: float,
    iou_threshold: float,
    max_per_img: int,
    num_classes: int,
    tile: int = 64,
    class_chunk: int = 1280,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """mmdet ``multiclass_nms``: per-class greedy NMS over the N x C
    candidate grid, then global top-``max_per_img``.

    CLASS-PARALLEL formulation: each class's candidate BOXES are
    gathered into its score order (one flat row-take — the TPU gather
    fast path — of (chunk*N, 4) floats, ~2 MB), and all C per-class
    greedy keep sets are computed together by a STATIC
    ``ceil(N/tile)``-step blocked fixpoint whose IoU blocks/strips are
    recomputed lazily from the sorted boxes
    (:func:`_sorted_block_nms_lazy`) — the (C, N, N) suppression matrix
    never exists. Two earlier formulations were measured and rejected:
    a serial blocked scan over the flattened N*C candidates (offset
    trick) is exact but its early exit is data-dependent — with
    near-uniform scores (score_thr=0 keeps all 65k candidates live) it
    walked up to 254 serial tiles, ~307 ms of a 348 ms inference batch
    (tools/profile_inference2.py); and permuting a precomputed N x N
    bool matrix per class (row-takes + transposes) is
    gather-bandwidth-bound — at the OV-LVIS geometry 86.5 vs 61 ms
    single-dispatch (43.7 ms/img amortized inside a b=2 program), and
    12.4 vs 9.5 ms per b=2 batch at OV-COCO (tools/profile_nms.py
    carries the matrix form for A/B).

    Classes are processed in STATIC chunks of ``class_chunk`` to bound
    the largest fused intermediate (a (chunk, tile, N) IoU strip); the
    default covers OV-LVIS C=1203 in ONE chunk — at tile 64 the
    intermediates are small, the scan body's serialization costs ~6%
    (measured 40.7 vs 38.0 ms/img at tile 128), and single-chunk
    compiles in ~18 s.

    ``tile=64`` is the measured knee of the tile sweep
    (``tools/profile_nms_lvis.py``, v5e, clustered boxes, flat scores,
    b=2 n=1000): per-class block work scales as n*tile while the strip
    work is the fixed n²/2 triangle, so smaller tiles cut the wasted
    intra-block rectangle — OV-LVIS C=1203: 43.9 (tile 256, the old
    default) / 38.0 (128) / 32.1 (64) / 31.8 (32) ms/img; OV-COCO
    C=65: 4.38 / 4.18 / 4.04 / 4.13 ms/batch-image. The extra serial
    fixpoints at small tiles are ~free (the capped antitone loop
    converges in 1-2 passes when earlier strips already killed most of
    the block); below 64 the VPU lane width (8, 128) is under-filled
    and the win stalls.

    Returns ``(dets (M, 5), labels (M,), indices (M,), valid (M,))``
    where ``indices`` point into the original N rows.
    """
    n, c1 = scores.shape
    c = num_classes
    assert c1 == c + 1
    cls_scores = scores[:, :c].astype(jnp.float32)
    # strict >, as mmdet's multiclass_nms (score_thr=0 drops exact 0s)
    sc = jnp.where(cls_scores > score_thr, cls_scores, NEG_INF)
    sc_t = sc.T  # (c, n)
    order = jnp.argsort(-sc_t, axis=-1, stable=True)  # (c, n)
    sc_sorted = jnp.take_along_axis(sc_t, order, axis=-1)

    shared_boxes = boxes.shape[-1] == 4
    boxes_f32 = boxes.astype(jnp.float32)
    if not shared_boxes:
        # (c*n, 4) class-major so a flat row-take can pick any
        # (class, sorted-position) pair
        cboxes_flat = boxes_f32.reshape(n, c, 4).transpose(1, 0, 2)
        cboxes_flat = cboxes_flat.reshape(c * n, 4)

    def chunk_keep(order_k, lo, hi):
        # gather each class's boxes into its score order: ONE flat
        # row-take (the TPU fast path; slice-shaped gathers serialize)
        if shared_boxes:
            sb = boxes_f32[order_k.reshape(-1)]
        else:
            flat_idx = (
                order_k
                + (jnp.arange(lo, hi, dtype=order_k.dtype) * n)[:, None]
            ).reshape(-1)
            sb = cboxes_flat[flat_idx]
        sb = sb.reshape(hi - lo, n, 4)
        return _sorted_block_nms_lazy(
            sb, sc_sorted[lo:hi], iou_threshold, tile
        )

    if c <= class_chunk:
        keep = chunk_keep(order, 0, c)  # (c, n)
    else:
        # Many-class path (OV-LVIS C=1203): roll the uniform chunks
        # into ONE lax.scan body instead of unrolling ~10 copies of
        # the blocked fixpoint — the unrolled form compiled in ~333 s
        # at (C=1203, N=1000, b=2). Classes pad up to a chunk multiple
        # with NEG_INF scores (not-alive rows keep nothing, so their
        # garbage gather indices are inert).
        n_chunks = -(-c // class_chunk)
        c_pad = n_chunks * class_chunk
        order_s = jnp.pad(
            order, ((0, c_pad - c), (0, 0))
        ).reshape(n_chunks, class_chunk, n)
        sc_s = jnp.pad(
            sc_sorted, ((0, c_pad - c), (0, 0)),
            constant_values=NEG_INF,
        ).reshape(n_chunks, class_chunk, n)
        if shared_boxes:
            def body(_, xs):
                ok, sk = xs
                sb = boxes_f32[ok.reshape(-1)].reshape(
                    class_chunk, n, 4
                )
                return None, _sorted_block_nms_lazy(
                    sb, sk, iou_threshold, tile
                )

            _, keep = jax.lax.scan(body, None, (order_s, sc_s))
        else:
            offs = (
                jnp.arange(c_pad, dtype=order.dtype) * n
            ).reshape(n_chunks, class_chunk)

            def body(_, xs):
                ok, sk, off = xs
                flat_idx = jnp.minimum(
                    (ok + off[:, None]).reshape(-1), c * n - 1
                )  # clamp the padded classes' rows into range
                sb = cboxes_flat[flat_idx].reshape(class_chunk, n, 4)
                return None, _sorted_block_nms_lazy(
                    sb, sk, iou_threshold, tile
                )

            _, keep = jax.lax.scan(body, None, (order_s, sc_s, offs))
        keep = keep.reshape(c_pad, n)[:c]
    kept_scores = jnp.where(keep, sc_sorted, NEG_INF)
    k = min(max_per_img, c * n)
    top_sc, top_i = jax.lax.top_k(kept_scores.reshape(-1), k)
    if k < max_per_img:  # fewer candidates than the output shape
        top_sc = jnp.pad(
            top_sc, (0, max_per_img - k), constant_values=NEG_INF
        )
        top_i = jnp.pad(top_i, (0, max_per_img - k))
    kc = (top_i // n).astype(jnp.int32)
    kpos = top_i - kc * n
    rows = order[kc, kpos].astype(jnp.int32)
    valid = top_sc > NEG_INF / 2
    if shared_boxes:
        sel_boxes = boxes.astype(jnp.float32)[rows]
    else:
        sel_boxes = boxes.reshape(n, c, 4).astype(jnp.float32)[rows, kc]
    dets = jnp.concatenate([sel_boxes, top_sc[:, None]], axis=-1)
    dets = jnp.where(valid[:, None], dets, 0.0)
    labels = jnp.where(valid, kc, -1)
    rows = jnp.where(valid, rows, 0)
    return dets, labels, rows, valid
