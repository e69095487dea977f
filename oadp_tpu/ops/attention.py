"""Fused multi-head attention Pallas kernel (TPU).

The CLIP encoders spend most of their time in self-attention over short
sequences (197 tokens after the 2x-grid surgery, 50 stock). XLA's
default lowering materializes the ``(B, heads, N, N)`` fp32 logits and
softmax weights in HBM — ~1 GB of traffic per layer at the OAKE batch
size — while the per-(batch, head) working set (q/k/v tiles + the NxN
score matrix) is ~400 KB and fits comfortably in VMEM.

This kernel runs one (batch, head) pair per grid step entirely in VMEM:
score matmul (MXU) → softmax (VPU, fp32) → value matmul (MXU), no HBM
round trip for the attention weights. Sequences are short, so no
flash-style online softmax tiling is needed.

Used by ``models.clip`` for the unmasked main-stream attention when
running on TPU; a jnp fallback keeps CPU tests exact.
"""

__all__ = [
    'fused_ln_mlp_rows',
    'fused_ln_mlp_rows_supported',
    'fused_ln_qkv_attention',
    'fused_ln_qkv_attention_supported',
    'fused_mha_qkv',
    'fused_mha_qkv_supported',
    'fused_side_attention',
    'fused_side_attention_supported',
    'fused_surgery_layer',
    'fused_surgery_layer_supported',
    'supports_fused_mha',
]

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports_fused_mha() -> bool:
    return jax.default_backend() == 'tpu'


#: logits above this are clamped before ``exp``. Real CLIP attention
#: logits are O(10); the clamp only engages on pathological inputs where
#: fp32 ``exp`` would overflow, and softmax is EXACT whenever the row
#: max is below it (see kernel docstring).
_LOGIT_CLAMP = 80.0


def _mha_packed_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float,
    heads_per_block: int, batch_per_block: int,
):
    """Attention for a ``(bb, N, hpb*hd)`` block (``bb`` batch items ×
    ``hpb`` heads packed along the 128-lane dimension).

    VPU-lean softmax — the kernel is VPU-bound, not MXU-bound, so every
    elementwise pass over the ``(N, N)`` score matrix counts:

    * the scale folds into ``q`` (exact in bf16 for the power-of-two
      scales of head_dim 64) — one pass over ``(N, hd)`` instead of
      ``(N, N)``;
    * instead of the max-subtraction, logits are clamped at
      ``_LOGIT_CLAMP``: softmax is bitwise-equivalent whenever the row
      max is below the clamp (always, for real CLIP activations) and
      merely saturates instead of overflowing otherwise — one
      ``min`` pass replaces a reduce + broadcast-subtract;
    * normalization is DEFERRED past the value matmul:
      ``softmax(s) @ v == (exp(s) @ v) / rowsum(exp(s))`` — the divide
      runs over ``(N, hd)`` instead of ``(N, N)``.
    """
    hd = q_ref.shape[-1] // heads_per_block
    # power-of-two scales are exact in bf16 (pure exponent shift)
    fold_scale = scale > 0 and math.log2(scale).is_integer()
    for bi in range(batch_per_block):  # static unroll
        for h in range(heads_per_block):
            sl = slice(h * hd, (h + 1) * hd)
            q = q_ref[bi, :, sl]
            if fold_scale:
                q = q * q.dtype.type(scale)
            k = k_ref[bi, :, sl]
            v = v_ref[bi, :, sl]
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if not fold_scale:
                s = s * scale
            e = jnp.exp(jnp.minimum(s, _LOGIT_CLAMP))
            o = jnp.dot(
                e.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            o_ref[bi, :, sl] = (
                o / e.sum(-1, keepdims=True)
            ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=('heads', 'scale', 'interpret')
)
def fused_mha_qkv(
    qkv: jax.Array,  # (B, N, 3*D) packed projection output
    heads: int,
    scale: float,
    interpret: bool = False,  # Pallas interpreter (CPU tests)
) -> jax.Array:
    """Fused MHA straight off the packed QKV projection → ``(B, N, D)``.

    Head splitting happens in the BlockSpec index maps (one 128-lane
    block = 2 heads of dim 64), so no transpose or reshape ever
    materializes around the kernel — the surrounding matmuls consume
    ``(B, N, D)`` directly. Mosaic requires 128-divisible lane blocks,
    hence heads are processed in pairs for head_dim 64. Several batch
    items run per grid cell (when the batch divides) so Mosaic's
    load/compute pipeline has fewer, fatter steps.
    """
    b, n, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    hpb = max(128 // hd, 1)  # heads per 128-lane block
    assert heads % hpb == 0 and (hd * hpb) % 128 == 0, (heads, hd)
    block_c = hd * hpb
    bb = 4 if b % 4 == 0 else 1  # batch items per grid cell

    def spec(part):
        return pl.BlockSpec(
            (bb, n, block_c),
            lambda i, h, part=part: (i, 0, part * (d // block_c) + h),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (bb, n, block_c), lambda i, h: (i, 0, h), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _mha_packed_kernel, scale=scale,
            heads_per_block=hpb, batch_per_block=bb,
        ),
        grid=(b // bb, heads // hpb),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * heads * n * n * hd * 2,
            bytes_accessed=4 * b * n * d * qkv.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)


def fused_mha_qkv_supported(heads: int, head_dim: int) -> bool:
    hpb = max(128 // head_dim, 1)
    return (
        supports_fused_mha()
        and heads % hpb == 0
        and (head_dim * hpb) % 128 == 0
    )


# ---------------------------------------------------------------------------
# Fused LayerNorm + QKV projection + attention kernel
# ---------------------------------------------------------------------------


def _ln_qkv_attn_kernel(
    x_ref, s_ref, t_ref, w_ref, b_ref, o_ref,
    *, heads: int, scale: float, batch_per_block: int,
):
    d = x_ref.shape[-1]
    hd = d // heads
    for bi in range(batch_per_block):
        # LayerNorm in fp32 (CLIP semantics, models/clip._layer_norm)
        xx = x_ref[bi].astype(jnp.float32)
        mean = xx.mean(-1, keepdims=True)
        var = jnp.square(xx - mean).mean(-1, keepdims=True)
        h = (xx - mean) * jax.lax.rsqrt(var + 1e-5)
        h = h * s_ref[...] + t_ref[...]
        # QKV projection on the MXU, weights VMEM-resident across the
        # whole grid (constant index map); the (N, 3D) qkv never leaves
        # VMEM — this is the kernel's reason to exist.
        qkv = jax.lax.dot(
            h.astype(x_ref.dtype), w_ref[...],
            preferred_element_type=jnp.float32,
        ) + b_ref[...].astype(jnp.float32)
        qkv = qkv.astype(x_ref.dtype)
        fold_scale = scale > 0 and math.log2(scale).is_integer()
        for hh in range(heads):
            q = qkv[:, hh * hd:(hh + 1) * hd]
            if fold_scale:
                q = q * q.dtype.type(scale)
            k = qkv[:, d + hh * hd:d + (hh + 1) * hd]
            v = qkv[:, 2 * d + hh * hd:2 * d + (hh + 1) * hd]
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if not fold_scale:
                s = s * scale
            e = jnp.exp(jnp.minimum(s, _LOGIT_CLAMP))
            o = jnp.dot(
                e.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            o_ref[bi, :, hh * hd:(hh + 1) * hd] = (
                o / e.sum(-1, keepdims=True)
            ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=('heads', 'scale', 'interpret')
)
def fused_ln_qkv_attention(
    x: jax.Array,  # (B, N, D) residual-stream input (pre-LN)
    ln_scale: jax.Array,  # (D,)
    ln_bias: jax.Array,  # (D,)
    qkv_w: jax.Array,  # (D, 3D)
    qkv_b: jax.Array,  # (3D,)
    heads: int,
    scale: float,
    interpret: bool = False,
):
    """LayerNorm → QKV projection → softmax attention in ONE kernel.

    The split formulation (XLA ln + XLA GEMM + attention kernel)
    round-trips the ``(B, N, 3D)`` qkv tensor and the LN output through
    HBM — ~1.9 GB per layer at the OAKE batch (1024×197×768 bf16), which
    dominates the attention step. Here qkv lives and dies in VMEM; HBM
    traffic per layer drops to ``x`` in + attention out. Measured on
    v5e: ~12% off the full encoder despite Mosaic's GEMM running at
    ~half of XLA's rate.

    Returns ``attn_out (B, N, D)``. (The surgery encoder uses
    :func:`fused_surgery_layer` instead, which additionally folds the
    masked side stream — reference ``oadp/oake/objects.py:224-247``.)
    """
    b, n, d = x.shape
    bb = 2 if b % 2 == 0 else 1
    row = lambda cols: pl.BlockSpec(  # noqa: E731
        (1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    blk = lambda cols: pl.BlockSpec(  # noqa: E731
        (bb, n, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _ln_qkv_attn_kernel, heads=heads, scale=scale,
            batch_per_block=bb,
        ),
        grid=(b // bb,),
        in_specs=[
            blk(d),
            row(d), row(d),
            pl.BlockSpec(
                (d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            row(3 * d),
        ],
        out_specs=blk(d),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * 3 * d + 2 * b * heads * n * n * (d // heads) * 2,
            bytes_accessed=2 * b * n * d * x.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
        interpret=interpret,
    )(
        x,
        ln_scale.astype(jnp.float32).reshape(1, d),
        ln_bias.astype(jnp.float32).reshape(1, d),
        qkv_w,
        qkv_b.reshape(1, 3 * d),
    )


def fused_ln_qkv_attention_supported(heads: int, head_dim: int) -> bool:
    return supports_fused_mha() and (heads * head_dim) % 128 == 0


# ---------------------------------------------------------------------------
# Fully-fused surgery layer: LN + QKV + main attention + side attention
# ---------------------------------------------------------------------------


def _surgery_layer_kernel(
    x_ref, y_ref, bias_ref, s_ref, t_ref, w_ref, b_ref, *refs,
    heads: int, scale: float, batch_per_block: int, with_main: bool,
    fold_out: bool,
):
    d = x_ref.shape[-1]
    hd = d // heads
    n = x_ref.shape[1]
    fold_scale = scale > 0 and math.log2(scale).is_integer()
    if fold_out:
        ow_ref, ob_ref, *out_refs = refs
    else:
        out_refs = refs
    if with_main:
        mo_ref, so_ref = out_refs
    else:
        (so_ref,) = out_refs

    def ln(rows):  # fp32 LayerNorm, matches models/clip._layer_norm
        rows = rows.astype(jnp.float32)
        mean = rows.mean(-1, keepdims=True)
        var = jnp.square(rows - mean).mean(-1, keepdims=True)
        out = (rows - mean) * jax.lax.rsqrt(var + 1e-5)
        return (out * s_ref[...] + t_ref[...]).astype(x_ref.dtype)

    for bi in range(batch_per_block):
        # ln(y) rides as row N of the main GEMM — same projection, and
        # a standalone (1, D) matmul trips Mosaic's layout checks on
        # some dtypes (observed: fp32 "Invalid input layout").
        hy = jnp.concatenate([ln(x_ref[bi]), ln(y_ref[bi])], axis=0)
        qkv_all = jax.lax.dot(
            hy, w_ref[...], preferred_element_type=jnp.float32,
        ) + b_ref[...].astype(jnp.float32)
        qkv_all = qkv_all.astype(x_ref.dtype)
        qkv = qkv_all[:n]
        qkv_y = qkv_all[n:]
        k = qkv[:, d:2 * d]
        v = qkv[:, 2 * d:]

        main_heads = []
        if with_main:
            for hh in range(heads):
                sl = slice(hh * hd, (hh + 1) * hd)
                q = qkv[:, sl]
                if fold_scale:
                    q = q * q.dtype.type(scale)
                s = jax.lax.dot_general(
                    q, k[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if not fold_scale:
                    s = s * scale
                e = jnp.exp(jnp.minimum(s, _LOGIT_CLAMP))
                o = jnp.dot(
                    e.astype(v.dtype), v[:, sl],
                    preferred_element_type=jnp.float32,
                )
                o = (o / e.sum(-1, keepdims=True)).astype(x_ref.dtype)
                if fold_out:
                    main_heads.append(o)
                else:
                    mo_ref[bi, :, sl] = o.astype(mo_ref.dtype)

        # side attention: one query over [patches (k rows 1:), y itself]
        side_heads = []
        bias_p = bias_ref[bi][:, :n - 1]
        bias_y = bias_ref[bi][:, n - 1:n]
        for hh in range(heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            qy = qkv_y[:, sl]
            if fold_scale:  # same precision guard as the main stream:
                qy = qy * qy.dtype.type(scale)  # exact only for 2^-k
            ky = qkv_y[:, d + hh * hd:d + (hh + 1) * hd]
            vy = qkv_y[:, 2 * d + hh * hd:2 * d + (hh + 1) * hd]
            kp = k[1:, sl]
            vp = v[1:, sl]
            s = jax.lax.dot_general(
                qy, kp,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sy = (
                qy.astype(jnp.float32) * ky.astype(jnp.float32)
            ).sum(-1, keepdims=True)
            if not fold_scale:
                s = s * scale
                sy = sy * scale
            s = s + bias_p
            sy = sy + bias_y
            e = jnp.exp(jnp.minimum(s, _LOGIT_CLAMP))
            ey = jnp.exp(jnp.minimum(sy, _LOGIT_CLAMP))
            o = jnp.dot(
                e.astype(vp.dtype), vp, preferred_element_type=jnp.float32
            )
            o = o + ey * vy.astype(jnp.float32)
            o = (o / (e.sum(-1, keepdims=True) + ey)).astype(x_ref.dtype)
            if fold_out:
                side_heads.append(o)
            else:
                so_ref[bi, :, sl] = o.astype(so_ref.dtype)

        if fold_out:
            # out-projection + residual IN-KERNEL: the attention part is
            # MXU-issue-bound with idle MXU slots, so the extra
            # (n+1, D)x(D, D) GEMM is nearly free (measured: the 3x
            # bigger QKV GEMM adds ~2 ms to the bare kernel), while the
            # separate XLA out-proj step's read of attn_out + x and its
            # write of x' (~930 MB/layer at the OAKE batch) disappear.
            # The side row rides the same GEMM as row n (a standalone
            # (1, D) matmul trips Mosaic layout checks).
            attn_all = jnp.concatenate(
                [
                    jnp.concatenate(main_heads, axis=-1),  # (n, d)
                    jnp.concatenate(side_heads, axis=-1),  # (1, d)
                ],
                axis=0,
            )
            proj = jax.lax.dot(
                attn_all, ow_ref[...], preferred_element_type=jnp.float32,
            ) + ob_ref[...].astype(jnp.float32)
            mo_ref[bi] = (
                x_ref[bi].astype(jnp.float32) + proj[:n]
            ).astype(mo_ref.dtype)
            so_ref[bi] = (
                y_ref[bi].astype(jnp.float32) + proj[n:]
            ).astype(so_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        'heads', 'scale', 'with_main', 'interpret', 'block_batch'
    ),
)
def fused_surgery_layer(
    x: jax.Array,  # (B, N, D) main stream (pre-LN)
    y: jax.Array,  # (B, D) side stream (pre-LN)
    bias: jax.Array,  # (B, N) fp32: [patch biases..., y bias]
    ln_scale: jax.Array,  # (D,)
    ln_bias: jax.Array,  # (D,)
    qkv_w: jax.Array,  # (D, 3D)
    qkv_b: jax.Array,  # (3D,)
    heads: int,
    scale: float,
    with_main: bool = True,
    interpret: bool = False,
    block_batch: int | None = None,
    out_w: jax.Array | None = None,  # (D, D): fold out-proj + residual
    out_b: jax.Array | None = None,  # (D,)
):
    """One OAKE-surgery transformer layer's attention in ONE kernel.

    Fuses LayerNorm, the QKV projection, the main stream's unmasked
    self-attention AND the side stream's masked attention-pool
    (reference hook construction ``oadp/oake/objects.py:198-266``).
    K/V — identical between the two streams — are computed once and
    never leave VMEM; vs the split form this removes the per-layer
    HBM round trips of qkv (~930 MB at the OAKE batch), the LN output,
    and the K/V write+read between the main and side kernels.

    Returns ``(main_attn_out (B, N, D), side_out (B, D))`` — or just
    ``side_out`` when ``with_main=False`` (the final block, whose main
    stream is discarded so its attention/out-proj/MLP are skipped;
    reference ``oadp/oake/objects.py:249-258``).

    With ``out_w``/``out_b`` (requires ``with_main``), the attention
    out-projection AND both residual adds are folded in too, and the
    returns become the post-residual streams
    ``(x + attn @ out_w + out_b, y + side @ out_w + out_b)`` — see the
    kernel comment for the HBM accounting.
    """
    b, n, d = x.shape
    fold_out = out_w is not None
    assert not fold_out or with_main, 'fold_out requires the main stream'
    bb = block_batch or (2 if b % 2 == 0 else 1)
    assert b % bb == 0, (b, bb)
    row = lambda cols: pl.BlockSpec(  # noqa: E731
        (1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    blk = lambda cols: pl.BlockSpec(  # noqa: E731
        (bb, n, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    # (B, 1, cols) blocks: TPU block shapes need the trailing two dims
    # to divide (8, 128) or equal the array dims — a unit middle dim
    # satisfies that for per-item row data at any bb.
    brow = lambda cols: pl.BlockSpec(  # noqa: E731
        (bb, 1, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = []
    out_specs = []
    if with_main:
        out_shapes.append(jax.ShapeDtypeStruct((b, n, d), x.dtype))
        out_specs.append(blk(d))
    out_shapes.append(jax.ShapeDtypeStruct((b, 1, d), x.dtype))
    out_specs.append(brow(d))
    in_specs = [
        blk(d),
        brow(d),
        brow(n),
        row(d), row(d),
        pl.BlockSpec(
            (d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        row(3 * d),
    ]
    args = [
        x,
        y.reshape(b, 1, d),
        bias.reshape(b, 1, n),
        ln_scale.astype(jnp.float32).reshape(1, d),
        ln_bias.astype(jnp.float32).reshape(1, d),
        qkv_w,
        qkv_b.reshape(1, 3 * d),
    ]
    if fold_out:
        in_specs.append(pl.BlockSpec(
            (d, d), lambda i: (0, 0), memory_space=pltpu.VMEM
        ))
        in_specs.append(row(d))
        args.append(out_w)
        args.append(out_b.reshape(1, d))
    out = pl.pallas_call(
        functools.partial(
            _surgery_layer_kernel, heads=heads, scale=scale,
            batch_per_block=bb, with_main=with_main, fold_out=fold_out,
        ),
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * 3 * d
            + 2 * b * heads * n * n * (d // heads) * 2
            + (2 * b * (n + 1) * d * d if fold_out else 0),
            bytes_accessed=2 * b * n * d * x.dtype.itemsize,
            transcendentals=b * heads * n * (n + 1),
        ),
        interpret=interpret,
    )(*args)
    if with_main:
        return out[0], out[1][:, 0]
    return out[0][:, 0]


def fused_surgery_layer_supported(heads: int, head_dim: int) -> bool:
    return supports_fused_mha() and (heads * head_dim) % 128 == 0


# ---------------------------------------------------------------------------
# Side-stream (masked attention-pool) kernel
# ---------------------------------------------------------------------------


def _side_attn_kernel(
    k_ref, v_ref, qy_ref, ky_ref, vy_ref, b_ref, o_ref,
    *, heads: int, batch_per_block: int, scale: float,
):
    hd = k_ref.shape[-1] // heads
    n = k_ref.shape[1]
    p = n - 1  # patch rows (row 0 of k/v is the main CLS — excluded)
    fold_scale = scale > 0 and math.log2(scale).is_integer()
    for bi in range(batch_per_block):
        bias_p = b_ref[bi, :p][None, :]
        bias_y = b_ref[bi, p]
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            q = qy_ref[bi, sl][None, :]
            if fold_scale:  # exact in bf16 only for power-of-two scales
                q = q * q.dtype.type(scale)
            kp = k_ref[bi, 1:, sl]
            vp = v_ref[bi, 1:, sl]
            s = jax.lax.dot_general(
                q, kp,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sy = (
                q.astype(jnp.float32) * ky_ref[bi, sl][None, :].astype(
                    jnp.float32
                )
            ).sum()
            if not fold_scale:
                s = s * scale
                sy = sy * scale
            s = s + bias_p
            sy = sy + bias_y
            e = jnp.exp(jnp.minimum(s, _LOGIT_CLAMP))
            ey = jnp.exp(jnp.minimum(sy, _LOGIT_CLAMP))
            o = jnp.dot(
                e.astype(vp.dtype), vp, preferred_element_type=jnp.float32
            )
            o = o + ey * vy_ref[bi, sl][None, :].astype(jnp.float32)
            o_ref[bi, sl] = (o[0] / (e.sum() + ey)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('heads', 'interpret'))
def fused_side_attention(
    k: jax.Array,  # (B, N, D) keys; row 0 (main CLS) is excluded
    v: jax.Array,  # (B, N, D)
    qy: jax.Array,  # (B, D) side-stream query
    ky: jax.Array,  # (B, D) side token's own key
    vy: jax.Array,  # (B, D) side token's own value
    bias: jax.Array,  # (B, N) fp32: [patch biases..., y bias]
    heads: int,
    interpret: bool = False,
) -> jax.Array:
    """One-query masked attention over ``[patches, y]`` → ``(B, D)``.

    The OAKE-objects side stream (``models/clip.image_encoder_surgery``;
    reference hook construction ``oadp/oake/objects.py:198-266``)
    attends a single query against the patch keys per block. The jnp
    formulation materializes two ``(B, heads, P, hd)`` transposes of
    K/V per layer just to feed einsums — pure HBM traffic. This kernel
    reads K/V in their native ``(B, N, D)`` layout and keeps the whole
    per-(batch, head) reduction in VMEM. Same VPU-lean softmax as
    :func:`fused_mha_qkv` (clamp + deferred normalization).
    """
    b, n, d = k.shape
    hd = d // heads
    scale = 1.0 / math.sqrt(hd)
    bb = 8 if b % 8 == 0 else 1

    def kv_spec():
        return pl.BlockSpec(
            (bb, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def row_spec(cols):
        return pl.BlockSpec(
            (bb, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        functools.partial(
            _side_attn_kernel, heads=heads, batch_per_block=bb,
            scale=scale,
        ),
        grid=(b // bb,),
        in_specs=[
            kv_spec(), kv_spec(), row_spec(d), row_spec(d), row_spec(d),
            row_spec(n),
        ],
        out_specs=row_spec(d),
        out_shape=jax.ShapeDtypeStruct((b, d), k.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * d,
            bytes_accessed=2 * b * n * d * k.dtype.itemsize,
            transcendentals=b * heads * n,
        ),
        interpret=interpret,
    )(k, v, qy, ky, vy, bias)


def fused_side_attention_supported(heads: int, head_dim: int) -> bool:
    return supports_fused_mha() and (heads * head_dim) % 128 == 0


# ---------------------------------------------------------------------------
# Row-stream LN + MLP kernel (side-stream per-layer small ops)
# ---------------------------------------------------------------------------


def _row_mlp_kernel(
    y_ref, s_ref, t_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
):
    y = y_ref[...].astype(jnp.float32)
    mean = y.mean(-1, keepdims=True)
    var = jnp.square(y - mean).mean(-1, keepdims=True)
    ln = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    ln = (ln * s_ref[...] + t_ref[...]).astype(y_ref.dtype)
    h = jax.lax.dot(
        ln, w1_ref[...], preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = (h * jax.nn.sigmoid(1.702 * h)).astype(y_ref.dtype)  # quick gelu
    o = jax.lax.dot(
        h, w2_ref[...], preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = (y + o).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_ln_mlp_rows(
    y: jax.Array,  # (B, D) rows
    ln_scale: jax.Array,  # (D,)
    ln_bias: jax.Array,  # (D,)
    fc_w: jax.Array,  # (D, 4D)
    fc_b: jax.Array,  # (4D,)
    proj_w: jax.Array,  # (4D, D)
    proj_b: jax.Array,  # (D,)
    interpret: bool = False,
) -> jax.Array:
    """``y + mlp(layer_norm(y))`` for a 2-D row batch in ONE kernel.

    The surgery side stream runs a per-layer LN+MLP on ``(B, D)`` rows —
    trivial FLOPs, but as ~8 separate XLA ops it costs ~0.6 ms/layer in
    launch latency at the OAKE batch (measured ~7 ms/image total). One
    Pallas kernel per layer keeps the whole residual update in VMEM.
    """
    b, d = y.shape
    rows = 256
    while b % rows:
        rows //= 2
    row = lambda cols: pl.BlockSpec(  # noqa: E731
        (1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    mat = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _row_mlp_kernel,
        grid=(b // rows,),
        in_specs=[
            pl.BlockSpec(
                (rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            row(d), row(d),
            mat(d, fc_w.shape[1]), row(fc_w.shape[1]),
            mat(proj_w.shape[0], d), row(d),
        ],
        out_specs=pl.BlockSpec(
            (rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, d), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * d * fc_w.shape[1],
            bytes_accessed=2 * b * d * y.dtype.itemsize,
            transcendentals=b * fc_w.shape[1],
        ),
        interpret=interpret,
    )(
        y,
        ln_scale.astype(jnp.float32).reshape(1, d),
        ln_bias.astype(jnp.float32).reshape(1, d),
        fc_w,
        fc_b.reshape(1, -1),
        proj_w,
        proj_b.reshape(1, d),
    )


def fused_ln_mlp_rows_supported(rows: int, width: int) -> bool:
    return supports_fused_mha() and width % 128 == 0 and rows % 8 == 0
