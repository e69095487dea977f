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
    'fused_mha_qkv',
    'fused_mha_qkv_supported',
    'supports_fused_mha',
]

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports_fused_mha() -> bool:
    return jax.default_backend() == 'tpu'


def _mha_packed_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, heads_per_block: int
):
    """Attention for ``heads_per_block`` heads packed along the last
    (lane) dimension of a ``(1, N, hpb*hd)`` block."""
    hd = q_ref.shape[-1] // heads_per_block
    for h in range(heads_per_block):  # static unroll
        sl = slice(h * hd, (h + 1) * hd)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / e.sum(-1, keepdims=True)).astype(v.dtype)
        o_ref[0, :, sl] = jnp.dot(
            p, v, preferred_element_type=jnp.float32
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
    hence heads are processed in pairs for head_dim 64.
    """
    b, n, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    hpb = max(128 // hd, 1)  # heads per 128-lane block
    assert heads % hpb == 0 and (hd * hpb) % 128 == 0, (heads, hd)
    block_c = hd * hpb

    def spec(part):
        return pl.BlockSpec(
            (1, n, block_c),
            lambda i, h, part=part: (i, 0, part * (d // block_c) + h),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (1, n, block_c), lambda i, h: (i, 0, h), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _mha_packed_kernel, scale=scale, heads_per_block=hpb
        ),
        grid=(b, heads // hpb),
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
