"""Functional NN building blocks (conv / batch norm) shared by the
detector stack.

Conventions (TPU-native):

* activations are NHWC, conv kernels HWIO;
* parameters and batch-norm statistics are plain pytrees;
* batch norm is *functional*: train mode returns updated running stats
  instead of mutating them. Under ``pjit`` with the batch sharded over
  the mesh, the batch-statistics reductions are global — which is
  exactly mmcv ``SyncBN`` (reference ``configs/dp/models/
  vild_ensemble_faster_rcnn_r50_fpn.py:8,13``) with zero extra code.
"""

__all__ = [
    'conv',
    'init_conv',
    'batch_norm',
    'init_bn',
    'max_pool',
]

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch default


def init_conv(
    key: jax.Array,
    k: int,
    c_in: int,
    c_out: int,
    bias: bool = False,
    dtype=jnp.float32,
) -> Params:
    """Kaiming-uniform fan-in init (torch Conv2d default)."""
    fan_in = k * k * c_in
    bound = (6.0 / fan_in) ** 0.5  # kaiming_uniform a=sqrt(5) gain
    kk, kb = jax.random.split(key)
    p = {
        'w': jax.random.uniform(
            kk, (k, k, c_in, c_out), dtype, -bound, bound
        )
    }
    if bias:
        b_bound = (1.0 / fan_in) ** 0.5
        p['b'] = jax.random.uniform(kb, (c_out,), dtype, -b_bound, b_bound)
    return p


def conv(
    x: jax.Array,
    p: Params,
    stride: int = 1,
    padding: int | str = 'SAME',
    dilation: int = 1,
) -> jax.Array:
    pad = (
        padding
        if isinstance(padding, str)
        else [(padding, padding), (padding, padding)]
    )
    out = jax.lax.conv_general_dilated(
        x,
        p['w'].astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )
    if 'b' in p:
        out = out + p['b'].astype(x.dtype)
    return out


def init_bn(c: int, dtype=jnp.float32) -> tuple[Params, Params]:
    """Returns ``(params, stats)``: affine params and running stats."""
    params = {'scale': jnp.ones(c, dtype), 'bias': jnp.zeros(c, dtype)}
    stats = {'mean': jnp.zeros(c, jnp.float32), 'var': jnp.ones(c, jnp.float32)}
    return params, stats


def batch_norm(
    x: jax.Array,
    p: Params,
    stats: Params,
    train: bool,
    momentum: float = BN_MOMENTUM,
    eps: float = BN_EPS,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, Params]:
    """Torch-semantics BN. ``train=True`` normalizes with (global) batch
    statistics and returns updated running stats; ``train=False`` uses
    the running stats and returns them unchanged.

    ``mask`` (leading-dim bool) excludes padded rows from the batch
    statistics — mmdet never pads RoI batches, so unmasked stats would
    be biased toward zero here."""
    dtype = x.dtype
    if train:
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if mask is None:
            mean = xf.mean(axes)
            var = jnp.square(xf - mean).mean(axes)
            n = 1
            for a in axes:
                n *= x.shape[a]
        else:
            m = mask.reshape(
                mask.shape + (1,) * (x.ndim - mask.ndim)
            ).astype(jnp.float32)
            n = jnp.maximum(m.sum() * np.prod(x.shape[1:-1]), 1.0)
            mean = (xf * m).sum(axes) / n
            var = (jnp.square(xf - mean) * m).sum(axes) / n
        unbiased = var * n / jnp.maximum(n - 1, 1)
        new_stats = {
            'mean': (1 - momentum) * stats['mean'] + momentum * mean,
            'var': (1 - momentum) * stats['var'] + momentum * unbiased,
        }
    else:
        mean, var = stats['mean'], stats['var']
        new_stats = stats
    inv = jax.lax.rsqrt(var + eps) * p['scale'].astype(jnp.float32)
    out = (x.astype(jnp.float32) - mean) * inv + p['bias'].astype(
        jnp.float32
    )
    return out.astype(dtype), new_stats


def max_pool(
    x: jax.Array, window: int, stride: int, padding: int
) -> jax.Array:
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )
