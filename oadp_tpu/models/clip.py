"""CLIP ViT-B/32 as pure-functional JAX, designed for TPU.

Replaces the reference's external CLIP fork (``clip.load_default`` at
reference ``oadp/oake/globals.py:47``, ``oadp/oake/blocks.py:123``,
``oadp/oake/objects.py:290``) with an in-repo implementation:

* parameters are a plain pytree of ``jnp`` arrays (functional, jit/vmap
  friendly; no module framework);
* compute is laid out for the MXU: patch embedding as one big matmul,
  fused QKV projection, batched attention over padded static shapes;
* a *surgery* variant (:func:`image_encoder_surgery`) implements the
  masked attention-pool dual stream that the reference builds with five
  forward hooks (``oadp/oake/objects.py:198-314``) as an explicit model;
* the text encoder mirrors OpenAI CLIP for prompt building
  (reference ``oadp/prompts/vild.py:56-72``).

Weight layout follows the OpenAI ``ViT-B-32.pt`` state dict so that
:func:`convert_torch_state_dict` is a pure renaming/transposition.
"""

__all__ = [
    'ViTConfig',
    'TextConfig',
    'CLIP_MEAN',
    'CLIP_STD',
    'init_vit_params',
    'init_text_params',
    'image_encoder',
    'image_encoder_surgery',
    'text_encoder',
    'upsample_vit_params',
    'convert_torch_state_dict',
]

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# CLIP preprocessing constants (OpenAI CLIP `_transform`).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """ViT-B/32 image encoder geometry.

    ``stride < patch_size`` realises the reference's model surgery
    (half-stride conv1 + interpolated positional embedding,
    ``oadp/oake/objects.py:293-301``) without mutating the module.
    """
    image_size: int = 224
    patch_size: int = 32
    stride: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512

    @property
    def grid(self) -> int:
        if self.stride == self.patch_size:
            return self.image_size // self.patch_size
        # conv padding (patch_size - 1) // 2, per reference surgery
        pad = (self.patch_size - 1) // 2
        return (self.image_size + 2 * pad - self.patch_size) // self.stride + 1

    @property
    def tokens(self) -> int:
        return self.grid * self.grid + 1


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512


# ---------------------------------------------------------------------------
# Parameter initialization (matches OpenAI CLIP shapes; random init is used
# only by tests — real runs convert the pretrained torch state dict).
# ---------------------------------------------------------------------------


def _init_block(key: jax.Array, width: int, dtype) -> Params:
    k = jax.random.split(key, 4)
    mlp_width = width * 4
    s = width**-0.5
    return {
        'ln_1': {'scale': jnp.ones(width, dtype), 'bias': jnp.zeros(width, dtype)},
        'ln_2': {'scale': jnp.ones(width, dtype), 'bias': jnp.zeros(width, dtype)},
        'attn': {
            'qkv_w': (jax.random.normal(k[0], (width, 3 * width)) * s).astype(dtype),
            'qkv_b': jnp.zeros(3 * width, dtype),
            'out_w': (jax.random.normal(k[1], (width, width)) * s).astype(dtype),
            'out_b': jnp.zeros(width, dtype),
        },
        'mlp': {
            'fc_w': (jax.random.normal(k[2], (width, mlp_width)) * s).astype(dtype),
            'fc_b': jnp.zeros(mlp_width, dtype),
            'proj_w': (jax.random.normal(k[3], (mlp_width, width)) * s).astype(dtype),
            'proj_b': jnp.zeros(width, dtype),
        },
    }


def init_vit_params(
    key: jax.Array,
    config: ViTConfig = ViTConfig(),
    dtype=jnp.float32,
) -> Params:
    keys = jax.random.split(key, config.layers + 4)
    scale = config.width**-0.5
    grid = config.image_size // config.patch_size
    return {
        'conv1': (
            jax.random.normal(
                keys[0],
                (config.patch_size, config.patch_size, 3, config.width),
            ) * scale
        ).astype(dtype),
        'class_embedding':
            (jax.random.normal(keys[1], (config.width,)) * scale).astype(dtype),
        'positional_embedding': (
            jax.random.normal(keys[2], (grid * grid + 1, config.width)) * scale
        ).astype(dtype),
        'ln_pre': {
            'scale': jnp.ones(config.width, dtype),
            'bias': jnp.zeros(config.width, dtype),
        },
        'ln_post': {
            'scale': jnp.ones(config.width, dtype),
            'bias': jnp.zeros(config.width, dtype),
        },
        'proj': (
            jax.random.normal(keys[3], (config.width, config.output_dim)) * scale
        ).astype(dtype),
        'blocks': [
            _init_block(keys[4 + i], config.width, dtype)
            for i in range(config.layers)
        ],
    }


def init_text_params(
    key: jax.Array,
    config: TextConfig = TextConfig(),
    dtype=jnp.float32,
) -> Params:
    keys = jax.random.split(key, config.layers + 4)
    return {
        'token_embedding': (
            jax.random.normal(keys[0], (config.vocab_size, config.width)) * 0.02
        ).astype(dtype),
        'positional_embedding': (
            jax.random.normal(keys[1], (config.context_length, config.width))
            * 0.01
        ).astype(dtype),
        'ln_final': {
            'scale': jnp.ones(config.width, dtype),
            'bias': jnp.zeros(config.width, dtype),
        },
        'text_projection': (
            jax.random.normal(keys[2], (config.width, config.output_dim))
            * config.width**-0.5
        ).astype(dtype),
        'blocks': [
            _init_block(keys[4 + i], config.width, dtype)
            for i in range(config.layers)
        ],
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    """LayerNorm in fp32 regardless of activation dtype (CLIP semantics)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = x.mean(-1, keepdims=True)
    var = jnp.square(x - mean).mean(-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return (y * p['scale'].astype(jnp.float32)
            + p['bias'].astype(jnp.float32)).astype(dtype)


def _split_heads(t: jax.Array, heads: int) -> jax.Array:
    b, n, d = t.shape
    return t.reshape(b, n, heads, d // heads).transpose(0, 2, 1, 3)


def _sdpa(
    q: jax.Array,  # (B, h, M, d)
    k: jax.Array,  # (B, h, N, d)
    v: jax.Array,
    bias: jax.Array | None,
) -> jax.Array:
    """Scaled-dot-product attention core → ``(B, M, h*d)`` (jnp path;
    the hot unbiased self-attention goes through
    :func:`_self_attention_packed` instead)."""
    b, h, m, d = q.shape
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum(
        'bhmd,bhnd->bhmn', q * scale, k,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum('bhmn,bhnd->bhmd', weights, v)
    return out.transpose(0, 2, 1, 3).reshape(b, m, h * d)


def _self_attention_packed(
    qkv: jax.Array,  # (B, N, 3D) packed projection output
    heads: int,
) -> jax.Array:
    """Unbiased self-attention from packed QKV → ``(B, N, D)``; Pallas
    fused kernel on TPU (no transposes materialize), jnp elsewhere."""
    from ..ops.attention import fused_mha_qkv, fused_mha_qkv_supported

    d = qkv.shape[-1] // 3
    scale = 1.0 / math.sqrt(d // heads)
    if fused_mha_qkv_supported(heads, d // heads):
        return fused_mha_qkv(qkv, heads, scale)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return _sdpa(
        _split_heads(q, heads),
        _split_heads(k, heads),
        _split_heads(v, heads),
        None,
    )


def _attention(
    x: jax.Array,
    p: Params,
    heads: int,
    q_tokens: jax.Array | None = None,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Multi-head attention with fused QKV.

    Args:
        x: ``(B, N, D)`` key/value token stream.
        q_tokens: optional ``(B, M, D)`` query stream (defaults to ``x``).
        bias: optional additive attention bias, broadcastable to
            ``(B, heads, M, N)``.
    """
    B, N, D = x.shape
    qkv_w = p['qkv_w']
    qkv_b = p['qkv_b']

    if q_tokens is None and bias is None:
        out = _self_attention_packed(x @ qkv_w + qkv_b, heads)
        return out @ p['out_w'] + p['out_b']

    kv = x @ qkv_w[:, D:] + qkv_b[D:]
    q_in = x if q_tokens is None else q_tokens
    q = q_in @ qkv_w[:, :D] + qkv_b[:D]
    k, v = jnp.split(kv, 2, axis=-1)

    out = _sdpa(
        _split_heads(q, heads),
        _split_heads(k, heads),
        _split_heads(v, heads),
        bias,
    )
    return out @ p['out_w'] + p['out_b']


def _quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _mlp(x: jax.Array, p: Params) -> jax.Array:
    return _quick_gelu(x @ p['fc_w'] + p['fc_b']) @ p['proj_w'] + p['proj_b']


def _block(
    x: jax.Array,
    p: Params,
    heads: int,
    bias: jax.Array | None = None,
) -> jax.Array:
    x = x + _attention(_layer_norm(x, p['ln_1']), p['attn'], heads, bias=bias)
    x = x + _mlp(_layer_norm(x, p['ln_2']), p['mlp'])
    return x


def _block_fused(
    x: jax.Array, p: Params, heads: int, interpret: bool = False
) -> jax.Array:
    """Transformer block with the LN1+QKV+attention Pallas kernel
    (TPU): the qkv tensor and the LN output never round-trip HBM."""
    from ..ops.attention import fused_ln_qkv_attention

    attn = p['attn']
    scale = 1.0 / math.sqrt(x.shape[-1] // heads)
    a = fused_ln_qkv_attention(
        x, p['ln_1']['scale'], p['ln_1']['bias'],
        attn['qkv_w'], attn['qkv_b'], heads, scale,
        interpret=interpret,
    )
    x = x + (a @ attn['out_w'] + attn['out_b'])
    x = x + _mlp(_layer_norm(x, p['ln_2']), p['mlp'])
    return x


def _use_fused_block(config: ViTConfig) -> bool:
    from ..ops.attention import fused_ln_qkv_attention_supported

    return fused_ln_qkv_attention_supported(
        config.heads, config.width // config.heads
    )


def _embed_patches(
    images: jax.Array,
    params: Params,
    config: ViTConfig,
) -> jax.Array:
    """Patchify + linear embed + CLS + positional embedding.

    ``images``: ``(B, H, W, 3)``, already CLIP-normalized, NHWC (TPU-native
    layout). Returns ``(B, tokens, width)``.
    """
    w = params['conv1'].reshape(-1, config.width)  # (P*P*3, D)
    if config.stride == config.patch_size:
        B, H, W, _ = images.shape
        g = H // config.patch_size
        patches = images.reshape(
            B, g, config.patch_size, g, config.patch_size, 3
        ).transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, -1)
        x = patches @ w
    else:
        x = jax.lax.conv_general_dilated(
            images,
            params['conv1'],
            window_strides=(config.stride, config.stride),
            padding=[((config.patch_size - 1) // 2,) * 2] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        )
        x = x.reshape(x.shape[0], -1, config.width)

    cls = jnp.broadcast_to(
        params['class_embedding'].astype(x.dtype),
        (x.shape[0], 1, config.width),
    )
    x = jnp.concatenate([cls, x], axis=1)
    return x + params['positional_embedding'].astype(x.dtype)


def image_encoder(
    params: Params,
    images: jax.Array,
    config: ViTConfig = ViTConfig(),
    interpret_fused: bool = False,
) -> jax.Array:
    """Stock CLIP image encoder: ``(B, H, W, 3)`` → ``(B, output_dim)``.

    Equivalent of ``model.encode_image`` used by the globals/blocks
    pipelines (reference ``oadp/oake/globals.py:57``,
    ``oadp/oake/blocks.py:129``).

    ``interpret_fused`` forces the TPU-fused block wiring through the
    Pallas interpreter so CPU tests exercise the exact on-chip
    residual/MLP sequencing.
    """
    x = _embed_patches(images, params, config)
    x = _layer_norm(x, params['ln_pre'])
    fused = _use_fused_block(config) or interpret_fused
    for block in params['blocks']:
        x = (
            _block_fused(x, block, config.heads, interpret=interpret_fused)
            if fused else _block(x, block, config.heads)
        )
    x = _layer_norm(x[:, 0], params['ln_post'])
    return x @ params['proj']


def image_encoder_surgery(
    params: Params,
    images: jax.Array,
    masks: jax.Array,
    config: ViTConfig = ViTConfig(stride=16),
    interpret_fused: bool = False,
) -> jax.Array:
    """Masked attention-pool CLIP encoder (the OAKE-objects model).

    Explicit dual-stream re-design of the reference's hook construction
    (``oadp/oake/objects.py:198-266``):

    * the **main stream** ``x`` (CLS + patches) evolves through standard
      *unmasked* self-attention — identical to the stock encoder;
    * a **side stream** ``y`` starts as the CLS token and, per block,
      attends over ``ln_1([patches, y])`` with an additive bias of
      ``-100`` on background patches (``mask==1``), then passes through
      its own residual MLP;
    * the final embedding is ``ln_post(y) @ proj``.

    Args:
        images: ``(B, H, W, 3)`` normalized crops.
        masks: ``(B, g, g)`` background masks — 1 for background, 0 for
            the object (reference ``oadp/oake/objects.py:129-155``).
        interpret_fused: force the TPU fused-surgery wiring through the
            Pallas interpreter (CPU tests of the on-chip branch).
    """
    x = _embed_patches(images, params, config)
    x = _layer_norm(x, params['ln_pre'])

    B = x.shape[0]
    D = config.width
    heads = config.heads
    n_patches = config.grid * config.grid
    # (B, 1, 1, n_patches + 1) additive bias; broadcast over heads/queries.
    # Reference appends a zero column for y itself
    # (``oadp/oake/objects.py:209-213``).
    from ..ops.attention import (
        fused_ln_mlp_rows,
        fused_side_attention,
        fused_side_attention_supported,
        fused_surgery_layer,
        fused_surgery_layer_supported,
    )

    bias_flat = jnp.concatenate(
        [
            masks.reshape(B, n_patches).astype(jnp.float32) * -100.0,
            jnp.zeros((B, 1), jnp.float32),
        ],
        axis=-1,
    )  # (B, P+1): patch biases then the side token's own (zero)
    bias = bias_flat[:, None, None, :]
    use_side_kernel = fused_side_attention_supported(heads, D // heads)
    from ..ops.attention import fused_ln_mlp_rows_supported
    use_fused_surgery = (
        (fused_surgery_layer_supported(heads, D // heads)
         and fused_ln_mlp_rows_supported(B, D))
        or interpret_fused
    )

    y = x[:, :1]
    n_blocks = len(params['blocks'])
    for bi, block in enumerate(params['blocks']):
        attn = block['attn']
        qkv_w, qkv_b = attn['qkv_w'], attn['qkv_b']
        last = bi == n_blocks - 1
        # Shared work: the side stream's ln_1 and K/V over the patch
        # tokens are IDENTICAL to the main stream's (same weights, same
        # input — reference ``oadp/oake/objects.py:238-245`` recomputes
        # them through hooks; here they are computed once).
        if use_fused_surgery:
            # One Pallas kernel per layer: LN + QKV + main attention +
            # masked side attention; K/V never leave VMEM.
            args = (
                x, y[:, 0], bias_flat,
                block['ln_1']['scale'], block['ln_1']['bias'],
                qkv_w, qkv_b, heads, 1.0 / math.sqrt(D // heads),
            )
            if last:
                side = fused_surgery_layer(
                    *args, with_main=False, interpret=interpret_fused
                )
                y_row = y[:, 0] + (side @ attn['out_w'] + attn['out_b'])
            else:
                # out-projection + both residual adds folded into the
                # kernel: x/y come back post-residual (see
                # ops/attention.fused_surgery_layer)
                x, y_row = fused_surgery_layer(
                    *args, with_main=True, interpret=interpret_fused,
                    out_w=attn['out_w'], out_b=attn['out_b'],
                )
            # side-stream LN+MLP as one kernel: ~8 tiny XLA ops per
            # layer otherwise (~0.6 ms/layer of launch latency)
            y = fused_ln_mlp_rows(
                y_row,
                block['ln_2']['scale'], block['ln_2']['bias'],
                block['mlp']['fc_w'], block['mlp']['fc_b'],
                block['mlp']['proj_w'], block['mlp']['proj_b'],
                interpret=interpret_fused,
            )[:, None]
            if not last:
                x = x + _mlp(_layer_norm(x, block['ln_2']), block['mlp'])
            continue
        if last:
            # the final x is discarded — only this block's K/V feed the
            # side stream, so the main attention, its out-projection,
            # the x MLP AND the q third of the qkv matmul are skipped
            # (~7% of the encoder FLOPs; y is bit-identical)
            ln_x = _layer_norm(x, block['ln_1'])
            kv = ln_x @ qkv_w[:, D:] + qkv_b[D:]
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            ln_x = _layer_norm(x, block['ln_1'])
            qkv = ln_x @ qkv_w + qkv_b  # (B, N, 3D)
            _, k, v = jnp.split(qkv, 3, axis=-1)

            # Main stream: standard unmasked self-attention + MLP.
            main = _self_attention_packed(qkv, heads)
            x = x + (main @ attn['out_w'] + attn['out_b'])

        # Side stream: q = ln_1(y); keys/values = [patch K/V, y's own].
        ln_y = _layer_norm(y, block['ln_1'])
        qkv_y = ln_y @ qkv_w + qkv_b  # (B, 1, 3D)
        qy, ky, vy = jnp.split(qkv_y, 3, axis=-1)
        if use_side_kernel:
            # Pallas: reads K/V in native (B, N, D) layout — the jnp
            # path below materializes two (B, h, P, d) transposes per
            # layer, pure HBM traffic for a 1-query attention.
            side = fused_side_attention(
                k, v, qy[:, 0], ky[:, 0], vy[:, 0], bias_flat, heads
            )[:, None]
        else:
            # The K/V concat is done on the tiny LOGITS instead of the
            # (B, N, D) tensors — appending one row to K and V would
            # otherwise materialize two full activation tensors per
            # layer.
            qy_h = _split_heads(qy, heads)  # (B, h, 1, d)
            ky_h = _split_heads(ky, heads)
            vy_h = _split_heads(vy, heads)
            k_p = _split_heads(k[:, 1:], heads)  # (B, h, P, d)
            v_p = _split_heads(v[:, 1:], heads)
            d_h = qy_h.shape[-1]
            scale = 1.0 / math.sqrt(d_h)
            logits_p = jnp.einsum(
                'bhmd,bhnd->bhmn', qy_h * scale, k_p,
                preferred_element_type=jnp.float32,
            )
            logit_y = (qy_h * scale * ky_h).sum(
                -1, keepdims=True
            ).astype(jnp.float32)
            logits = jnp.concatenate([logits_p, logit_y], axis=-1) + bias
            weights = jax.nn.softmax(logits, axis=-1).astype(v_p.dtype)
            side = (
                jnp.einsum('bhmn,bhnd->bhmd', weights[..., :-1], v_p)
                + weights[..., -1:] * vy_h
            )
            side = side.transpose(0, 2, 1, 3).reshape(B, 1, D)
        y = y + (side @ attn['out_w'] + attn['out_b'])

        y = y + _mlp(_layer_norm(y, block['ln_2']), block['mlp'])
        if not last:
            x = x + _mlp(_layer_norm(x, block['ln_2']), block['mlp'])

    y = _layer_norm(y[:, 0], params['ln_post'])
    return y @ params['proj']


def text_encoder(
    params: Params,
    tokens: jax.Array,
    config: TextConfig = TextConfig(),
) -> jax.Array:
    """CLIP text encoder: ``(B, context)`` int tokens → ``(B, output_dim)``.

    Uses the causal mask and takes features at the argmax (EOT) token,
    matching OpenAI CLIP ``encode_text``.
    """
    x = params['token_embedding'][tokens]
    x = x + params['positional_embedding'][None, :x.shape[1]]
    n = x.shape[1]
    causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
    for block in params['blocks']:
        x = _block(x, block, config.heads, bias=causal[None, None])
    x = _layer_norm(x, params['ln_final'])
    eot = tokens.argmax(-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return x @ params['text_projection']


# ---------------------------------------------------------------------------
# Surgery: positional-embedding upsampling
# ---------------------------------------------------------------------------


def _torch_bicubic_weights(in_size: int, out_size: int) -> np.ndarray:
    """Dense ``(out, in)`` matrix reproducing ``torch.nn.functional.
    interpolate(mode='bicubic', align_corners=False)``: cubic convolution
    with a = -0.75, half-pixel centers, border taps clamped (not
    renormalized)."""
    a = -0.75

    def k(x):
        x = np.abs(x)
        return np.where(
            x <= 1,
            ((a + 2) * x - (a + 3)) * x * x + 1,
            np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0),
        )

    out = np.zeros((out_size, in_size), np.float64)
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        x0 = math.floor(src)
        for tap in range(x0 - 1, x0 + 3):
            out[i, min(max(tap, 0), in_size - 1)] += k(src - tap)
    return out


def upsample_vit_params(
    params: Params,
    config: ViTConfig = ViTConfig(),
    upsample: int = 2,
) -> tuple[Params, ViTConfig]:
    """Interpolate the positional embedding to a ``upsample``× denser grid
    and halve the patch stride (reference ``oadp/oake/objects.py:293-301``).
    Uses torch-style bicubic so the result matches the reference fork's
    ``interpolate_positional_embedding``."""
    grid = config.image_size // config.patch_size
    new_grid = grid * upsample
    pe = np.asarray(params['positional_embedding'], np.float64)
    cls_pe, patch_pe = pe[:1], pe[1:]
    patch_pe = patch_pe.reshape(grid, grid, -1)
    w = _torch_bicubic_weights(grid, new_grid)
    patch_pe = np.einsum('oh,hwc->owc', w, patch_pe)
    patch_pe = np.einsum('ow,hwc->hoc', w, patch_pe)
    new_pe = jnp.asarray(
        np.concatenate(
            [cls_pe, patch_pe.reshape(new_grid * new_grid, -1)]
        ),
        dtype=params['positional_embedding'].dtype,
    )
    new_params = dict(params)
    new_params['positional_embedding'] = new_pe
    new_config = dataclasses.replace(
        config, stride=config.patch_size // upsample
    )
    assert new_config.grid == new_grid
    return new_params, new_config


# ---------------------------------------------------------------------------
# Weight conversion from the OpenAI / reference torch state dict
# ---------------------------------------------------------------------------


def convert_torch_state_dict(
    state: dict[str, np.ndarray],
    prefix_visual: str = 'visual.',
    dtype=np.float32,
) -> tuple[Params, Params]:
    """Convert an OpenAI CLIP state dict (numpy arrays) to (vit, text) params.

    Torch ``nn.Linear`` stores ``(out, in)`` weights; JAX matmuls here use
    ``(in, out)`` — so linear weights are transposed. ``conv1`` is
    ``(D, 3, P, P)`` → ``(P, P, 3, D)`` (HWIO).
    """

    def a(name):
        return np.asarray(state[name], dtype=dtype)

    def block(p):
        return {
            'ln_1': {'scale': a(f'{p}.ln_1.weight'), 'bias': a(f'{p}.ln_1.bias')},
            'ln_2': {'scale': a(f'{p}.ln_2.weight'), 'bias': a(f'{p}.ln_2.bias')},
            'attn': {
                'qkv_w': a(f'{p}.attn.in_proj_weight').T,
                'qkv_b': a(f'{p}.attn.in_proj_bias'),
                'out_w': a(f'{p}.attn.out_proj.weight').T,
                'out_b': a(f'{p}.attn.out_proj.bias'),
            },
            'mlp': {
                'fc_w': a(f'{p}.mlp.c_fc.weight').T,
                'fc_b': a(f'{p}.mlp.c_fc.bias'),
                'proj_w': a(f'{p}.mlp.c_proj.weight').T,
                'proj_b': a(f'{p}.mlp.c_proj.bias'),
            },
        }

    v = prefix_visual
    vit_prefix = f'{v}transformer.resblocks.'
    n_vit = max(
        int(k[len(vit_prefix):].split('.')[0]) for k in state
        if k.startswith(vit_prefix)
    ) + 1
    vit = {
        'conv1': a(f'{v}conv1.weight').transpose(2, 3, 1, 0),
        'class_embedding': a(f'{v}class_embedding'),
        'positional_embedding': a(f'{v}positional_embedding'),
        'ln_pre': {
            'scale': a(f'{v}ln_pre.weight'), 'bias': a(f'{v}ln_pre.bias')
        },
        'ln_post': {
            'scale': a(f'{v}ln_post.weight'), 'bias': a(f'{v}ln_post.bias')
        },
        'proj': a(f'{v}proj'),
        'blocks': [
            block(f'{v}transformer.resblocks.{i}') for i in range(n_vit)
        ],
    }

    text: Params = {}
    if 'token_embedding.weight' in state:
        text_prefix = 'transformer.resblocks.'
        n_text = max(
            int(k[len(text_prefix):].split('.')[0]) for k in state
            if k.startswith(text_prefix)
        ) + 1
        text = {
            'token_embedding': a('token_embedding.weight'),
            'positional_embedding': a('positional_embedding'),
            'ln_final': {
                'scale': a('ln_final.weight'), 'bias': a('ln_final.bias')
            },
            'text_projection': a('text_projection'),
            'blocks': [
                block(f'transformer.resblocks.{i}') for i in range(n_text)
            ],
        }
    return jax.tree.map(jnp.asarray, vit), jax.tree.map(jnp.asarray, text)
