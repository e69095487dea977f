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
