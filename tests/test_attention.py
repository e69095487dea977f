"""Fused MHA Pallas kernel vs the jnp reference (interpreter mode, so
the kernel logic is exercised on the CPU CI mesh)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from oadp_tpu.ops.attention import fused_mha_qkv


def _reference(qkv, heads, scale):
    b, n, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(t):
        return t.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    s = jnp.einsum('bhnd,bhmd->bhnm', q * scale, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, -1).astype(v.dtype)
    o = jnp.einsum('bhnm,bhmd->bhnd', p, v)
    return o.transpose(0, 2, 1, 3).reshape(b, n, d)


def test_fused_mha_qkv_matches_reference():
    rng = np.random.default_rng(0)
    b, n, heads, hd = 3, 24, 4, 64  # 2 heads per 128-lane block
    d = heads * hd
    qkv = jnp.asarray(
        rng.standard_normal((b, n, 3 * d)).astype(np.float32)
    )
    scale = 1.0 / math.sqrt(hd)
    got = np.asarray(fused_mha_qkv(qkv, heads, scale, interpret=True))
    want = np.asarray(_reference(qkv, heads, scale))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_mha_qkv_head_independence():
    """Each head must only see its own 64 channels."""
    rng = np.random.default_rng(1)
    b, n, heads, hd = 1, 8, 2, 64
    d = heads * hd
    qkv = rng.standard_normal((b, n, 3 * d)).astype(np.float32)
    scale = 1.0 / math.sqrt(hd)
    base = np.asarray(
        fused_mha_qkv(jnp.asarray(qkv), heads, scale, interpret=True)
    )
    # perturb head 1's K at one key position (a uniform shift across
    # positions would be softmax-invariant): head 0 must not move
    qkv2 = qkv.copy()
    qkv2[:, 3, d + hd:d + 2 * hd] += 10.0
    out2 = np.asarray(
        fused_mha_qkv(jnp.asarray(qkv2), heads, scale, interpret=True)
    )
    np.testing.assert_allclose(out2[..., :hd], base[..., :hd], atol=1e-6)
    assert np.abs(out2[..., hd:] - base[..., hd:]).max() > 1e-3


def test_fused_side_attention_matches_reference():
    """The side-stream kernel == masked softmax over [patches, y]
    (the jnp formulation in models/clip.image_encoder_surgery)."""
    from oadp_tpu.ops.attention import fused_side_attention

    rng = np.random.default_rng(2)
    b, n, heads, hd = 4, 17, 2, 64  # n = 1 CLS + 15 patches (+y in bias)
    d = heads * hd
    k = rng.standard_normal((b, n, d)).astype(np.float32)
    v = rng.standard_normal((b, n, d)).astype(np.float32)
    qy = rng.standard_normal((b, d)).astype(np.float32)
    ky = rng.standard_normal((b, d)).astype(np.float32)
    vy = rng.standard_normal((b, d)).astype(np.float32)
    # patch biases (n-1 of them) + y's zero bias
    bias = np.concatenate([
        (rng.random((b, n - 1)) > 0.5).astype(np.float32) * -100.0,
        np.zeros((b, 1), np.float32),
    ], -1)

    got = np.asarray(fused_side_attention(
        jnp.asarray(k), jnp.asarray(v), jnp.asarray(qy),
        jnp.asarray(ky), jnp.asarray(vy), jnp.asarray(bias), heads,
        interpret=True,
    ))

    scale = 1.0 / math.sqrt(hd)
    want = np.empty((b, d), np.float32)
    for bi in range(b):
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            q = qy[bi, sl] * scale
            keys = np.concatenate([k[bi, 1:, sl], ky[bi, sl][None]])
            vals = np.concatenate([v[bi, 1:, sl], vy[bi, sl][None]])
            s = keys @ q + bias[bi]
            e = np.exp(s - s.max())
            w = e / e.sum()
            want[bi, sl] = w @ vals
    np.testing.assert_allclose(got, want, atol=2e-5)


def _ln_qkv_attn_oracle(x, s, t, w, b, heads, scale):
    """Independent float64 numpy oracle: LN -> QKV GEMM -> per-head
    softmax attention (plus the K/V projections)."""
    x64 = x.astype(np.float64)
    mean = x64.mean(-1, keepdims=True)
    var = ((x64 - mean) ** 2).mean(-1, keepdims=True)
    h = (x64 - mean) / np.sqrt(var + 1e-5)
    h = h * s.astype(np.float64) + t.astype(np.float64)
    qkv = h @ w.astype(np.float64) + b.astype(np.float64)
    d = x.shape[-1]
    hd = d // heads
    q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
    out = np.empty_like(q)
    for bi in range(x.shape[0]):
        for hh in range(heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            sc = (q[bi, :, sl] * scale) @ k[bi, :, sl].T
            e = np.exp(sc - sc.max(-1, keepdims=True))
            p = e / e.sum(-1, keepdims=True)
            out[bi, :, sl] = p @ v[bi, :, sl]
    return out, k, v


def test_fused_ln_qkv_attention_matches_oracle():
    """The fused LN+QKV+attention kernel vs a float64 numpy oracle.

    Tolerance is bounded by XLA-CPU's fp32 matmul (~4e-3 abs vs exact
    fp32 on these magnitudes), which both this kernel (interpret mode)
    and the jnp path inherit equally.
    """
    from oadp_tpu.ops.attention import fused_ln_qkv_attention

    rng = np.random.default_rng(3)
    b, n, heads, hd = 4, 13, 2, 64
    d = heads * hd
    x = rng.standard_normal((b, n, d)).astype(np.float32)
    s = rng.standard_normal(d).astype(np.float32)
    t = rng.standard_normal(d).astype(np.float32)
    w = (rng.standard_normal((d, 3 * d)) * 0.05).astype(np.float32)
    bias = (rng.standard_normal(3 * d) * 0.05).astype(np.float32)
    scale = 1.0 / math.sqrt(hd)

    got = fused_ln_qkv_attention(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(t),
        jnp.asarray(w), jnp.asarray(bias), heads, scale, interpret=True,
    )
    want, _, _ = _ln_qkv_attn_oracle(x, s, t, w, bias, heads, scale)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3)


def test_fused_ln_qkv_attention_odd_batch():
    """Batch not divisible by 2 exercises the bb=1 grid path."""
    from oadp_tpu.ops.attention import fused_ln_qkv_attention

    rng = np.random.default_rng(4)
    b, n, heads, hd = 3, 9, 2, 64
    d = heads * hd
    x = rng.standard_normal((b, n, d)).astype(np.float32)
    s = rng.standard_normal(d).astype(np.float32)
    t = rng.standard_normal(d).astype(np.float32)
    w = (rng.standard_normal((d, 3 * d)) * 0.05).astype(np.float32)
    bias = (rng.standard_normal(3 * d) * 0.05).astype(np.float32)
    scale = 1.0 / math.sqrt(hd)
    got = fused_ln_qkv_attention(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(t),
        jnp.asarray(w), jnp.asarray(bias), heads, scale, interpret=True,
    )
    want, _, _ = _ln_qkv_attn_oracle(x, s, t, w, bias, heads, scale)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3)


def test_fused_surgery_layer_matches_oracle():
    """The fully-fused surgery layer (LN+QKV+main attn+side attn) vs a
    float64 numpy oracle of models/clip.image_encoder_surgery's jnp
    formulation (reference ``oadp/oake/objects.py:198-266``)."""
    from oadp_tpu.ops.attention import fused_surgery_layer

    rng = np.random.default_rng(5)
    b, n, heads, hd = 4, 17, 2, 64
    d = heads * hd
    x = rng.standard_normal((b, n, d)).astype(np.float32)
    y = rng.standard_normal((b, d)).astype(np.float32)
    bias = np.concatenate([
        (rng.random((b, n - 1)) > 0.5).astype(np.float64) * -100.0,
        np.zeros((b, 1)),
    ], -1).astype(np.float32)
    s = rng.standard_normal(d).astype(np.float32)
    t = rng.standard_normal(d).astype(np.float32)
    w = (rng.standard_normal((d, 3 * d)) * 0.05).astype(np.float32)
    bb = (rng.standard_normal(3 * d) * 0.05).astype(np.float32)
    scale = 1.0 / math.sqrt(hd)

    def ln64(rows):
        rows = rows.astype(np.float64)
        m = rows.mean(-1, keepdims=True)
        v2 = ((rows - m) ** 2).mean(-1, keepdims=True)
        return (rows - m) / np.sqrt(v2 + 1e-5) * s + t

    w64 = w.astype(np.float64)
    b64 = bb.astype(np.float64)
    mains = np.zeros((b, n, d))
    sides = np.zeros((b, d))
    for bi in range(b):
        qkv = ln64(x[bi]) @ w64 + b64
        q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
        for hh in range(heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            sc = (q[:, sl] * scale) @ k[:, sl].T
            e = np.exp(sc - sc.max(-1, keepdims=True))
            mains[bi, :, sl] = (e / e.sum(-1, keepdims=True)) @ v[:, sl]
        qkvy = ln64(y[bi:bi + 1]) @ w64 + b64
        for hh in range(heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            keys = np.concatenate(
                [k[1:, sl], qkvy[:, d + hh * hd:d + (hh + 1) * hd]])
            vals = np.concatenate(
                [v[1:, sl], qkvy[:, 2 * d + hh * hd:2 * d + (hh + 1) * hd]])
            sc = keys @ (qkvy[0, sl] * scale) + bias[bi]
            e = np.exp(sc - sc.max())
            sides[bi, sl] = (e / e.sum()) @ vals

    mg, sg = fused_surgery_layer(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(bias),
        jnp.asarray(s), jnp.asarray(t), jnp.asarray(w), jnp.asarray(bb),
        heads, scale, with_main=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(mg), mains, atol=6e-3)
    np.testing.assert_allclose(np.asarray(sg), sides, atol=6e-3)
    # with_main=False (final block) computes the same side stream (via
    # a kv-only GEMM, so only matmul-accumulation noise differs)
    so = fused_surgery_layer(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(bias),
        jnp.asarray(s), jnp.asarray(t), jnp.asarray(w), jnp.asarray(bb),
        heads, scale, with_main=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(so), sides, atol=6e-3)
