"""FCN mask head (class-agnostic), functional JAX.

Replaces mmdet's ``FCNMaskHead`` as configured for OV-LVIS at reference
``configs/dp/models/mask.py``: 4x (3x3 conv 256 + ReLU), 2x transposed
conv upsample + ReLU, 1x1 logits; ``class_agnostic=True`` → one mask
channel; targets at 28x28 from a 14x14 RoIAlign; BCE loss over positive
RoIs (``use_mask`` CrossEntropyLoss).
"""

__all__ = [
    'MaskHeadConfig',
    'init_mask_head',
    'mask_head_forward',
    'mask_loss',
    'convert_torch_mask_head',
]

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..base.losses import binary_cross_entropy
from .layers import conv, init_conv

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MaskHeadConfig:
    num_convs: int = 4
    in_channels: int = 256
    conv_channels: int = 256
    roi_size: int = 14
    mask_size: int = 28
    mask_thr_binary: float = 0.5


def init_mask_head(
    key: jax.Array, config: MaskHeadConfig = MaskHeadConfig()
) -> Params:
    ks = jax.random.split(key, config.num_convs + 2)
    params: Params = {'convs': []}
    c = config.in_channels
    for i in range(config.num_convs):
        params['convs'].append(
            init_conv(ks[i], 3, c, config.conv_channels, bias=True)
        )
        c = config.conv_channels
    params['upsample'] = init_conv(ks[-2], 2, c, c, bias=True)
    params['logits'] = init_conv(ks[-1], 1, c, 1, bias=True)
    return params


def mask_head_forward(
    params: Params,
    x: jax.Array,  # (R, roi, roi, C)
) -> jax.Array:
    """Returns ``(R, 2*roi, 2*roi)`` mask logits."""
    for p in params['convs']:
        x = jax.nn.relu(conv(x, p, padding=1))
    # ConvTranspose2d(k=2, s=2) has no tap overlap: each input pixel
    # maps linearly onto its own 2x2 output block — one einsum, exact
    # torch semantics, MXU-friendly (no conv_transpose lowering).
    w = params['upsample']['w'].astype(x.dtype)  # (2, 2, C, C')
    up = jnp.einsum(
        'bijc,xyco->bixjyo', x, w, precision=jax.lax.Precision.HIGHEST
    )
    r, h, _, w_, _, o = up.shape
    x = up.reshape(r, h * 2, w_ * 2, o) + params['upsample']['b'].astype(
        x.dtype
    )
    x = jax.nn.relu(x)
    x = conv(x, params['logits'], padding=0)
    return x[..., 0]


def mask_loss(
    logits: jax.Array,  # (R, m, m)
    targets: jax.Array,  # (R, m, m) float 0/1
    pos_mask: jax.Array,  # (R,)
) -> jax.Array:
    """mmdet mask CE: per-pixel BCE averaged over pixels, mean over
    positive RoIs."""
    weights = jnp.broadcast_to(
        pos_mask[:, None, None].astype(jnp.float32), logits.shape
    )
    n_pos = jnp.maximum(pos_mask.sum().astype(jnp.float32), 1.0)
    per_pixel = logits.shape[1] * logits.shape[2]
    return binary_cross_entropy(
        logits, targets, weights, n_pos * per_pixel
    )


def convert_torch_mask_head(
    state: dict, prefix: str = 'roi_head.mask_head.'
) -> Params:
    """mmdet FCNMaskHead state dict → params. Torch ConvTranspose2d
    stores ``(in, out, kH, kW)`` → ``(kH, kW, in, out)``."""
    import numpy as np

    def a(name):
        return np.asarray(state[prefix + name], np.float32)

    params: Params = {'convs': []}
    i = 0
    while f'{prefix}convs.{i}.conv.weight' in state:
        params['convs'].append({
            'w': a(f'convs.{i}.conv.weight').transpose(2, 3, 1, 0),
            'b': a(f'convs.{i}.conv.bias'),
        })
        i += 1
    params['upsample'] = {
        'w': a('upsample.weight').transpose(2, 3, 0, 1),
        'b': a('upsample.bias'),
    }
    params['logits'] = {
        'w': a('conv_logits.weight').transpose(2, 3, 1, 0),
        'b': a('conv_logits.bias'),
    }
    return jax.tree.map(jnp.asarray, params)
