"""FCN mask head (class-agnostic), functional JAX.

Replaces mmdet's ``FCNMaskHead`` as configured for OV-LVIS at reference
``configs/dp/models/mask.py``: 4x (3x3 conv 256 + ReLU), 2x transposed
conv upsample + ReLU, 1x1 logits; ``class_agnostic=True`` → one mask
channel; targets at 28x28 from a 14x14 RoIAlign; BCE loss over positive
RoIs (``use_mask`` CrossEntropyLoss).
"""

__all__ = ['MaskHeadConfig', 'init_mask_head', 'mask_head_forward',
           'mask_loss']

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
    # ConvTranspose2d(k=2, s=2) == 2x nearest-block expansion through
    # the kernel: implement via conv_transpose
    x = jax.lax.conv_transpose(
        x,
        params['upsample']['w'].astype(x.dtype),
        strides=(2, 2),
        padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    ) + params['upsample']['b'].astype(x.dtype)
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
