"""Feature Pyramid Network, functional JAX (NHWC).

Replaces mmdet's ``FPN`` as configured at reference
``configs/dp/models/faster_rcnn_r50_fpn.py:17-23``: in_channels
[256, 512, 1024, 2048], out 256, num_outs 5, ``norm_cfg`` BN/SyncBN
(the ViLD overlay, ``vild_ensemble_faster_rcnn_r50_fpn.py:8``).

mmdet semantics kept: 1x1 lateral convs (no bias when normed), nearest
2x top-down upsample, 3x3 output convs, extra P6 from stride-2 max pool
of P5, no activations. SyncBN = plain batch norm under pjit (global
reductions come from the sharding).
"""

__all__ = ['init_fpn_params', 'fpn_forward', 'convert_torch_fpn']

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .layers import batch_norm, conv, init_bn, init_conv, max_pool

Params = dict[str, Any]


def init_fpn_params(
    key: jax.Array,
    in_channels: tuple = (256, 512, 1024, 2048),
    out_channels: int = 256,
) -> tuple[Params, Params]:
    n = len(in_channels)
    keys = jax.random.split(key, 2 * n)
    params: Params = {'laterals': [], 'outputs': []}
    stats: Params = {'laterals': [], 'outputs': []}
    for i, c in enumerate(in_channels):
        bn, s = init_bn(out_channels)
        params['laterals'].append(
            {'conv': init_conv(keys[i], 1, c, out_channels), 'bn': bn}
        )
        stats['laterals'].append({'bn': s})
        bn, s = init_bn(out_channels)
        params['outputs'].append(
            {
                'conv': init_conv(keys[n + i], 3, out_channels, out_channels),
                'bn': bn,
            }
        )
        stats['outputs'].append({'bn': s})
    return params, stats


def _upsample_nearest_2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def fpn_forward(
    params: Params,
    stats: Params,
    feats: list[jax.Array],  # [C2..C5] NHWC
    num_outs: int = 5,
    train: bool = False,
) -> tuple[list[jax.Array], Params]:
    """Returns ``([P2..P6], new_stats)``."""
    n = len(feats)
    new_stats: Params = {'laterals': [None] * n, 'outputs': [None] * n}
    laterals = []
    for i, f in enumerate(feats):
        x = conv(f, params['laterals'][i]['conv'], padding=0)
        x, s = batch_norm(
            x, params['laterals'][i]['bn'],
            stats['laterals'][i]['bn'], train,
        )
        laterals.append(x)
        new_stats['laterals'][i] = {'bn': s}
    for i in range(n - 1, 0, -1):
        laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(laterals[i])
    outs = []
    for i, x in enumerate(laterals):
        y = conv(x, params['outputs'][i]['conv'], padding=1)
        y, s = batch_norm(
            y, params['outputs'][i]['bn'],
            stats['outputs'][i]['bn'], train,
        )
        outs.append(y)
        new_stats['outputs'][i] = {'bn': s}
    while len(outs) < num_outs:
        outs.append(max_pool(outs[-1], 1, 2, 0))
    return outs, new_stats


def convert_torch_fpn(
    state: dict[str, np.ndarray],
    prefix: str = 'neck.',
    n_levels: int = 4,
) -> tuple[Params, Params]:
    """mmdet FPN state dict (``neck.lateral_convs.{i}.conv/bn``,
    ``neck.fpn_convs.{i}.conv/bn``) → ``(params, stats)``. Handles both
    normed (ConvModule with .bn) and plain (conv bias) checkpoints."""

    def a(name):
        return np.asarray(state[prefix + name], np.float32)

    def module(base, c_out_default):
        p: Params = {'conv': {'w': a(f'{base}.conv.weight').transpose(2, 3, 1, 0)}}
        if f'{prefix}{base}.conv.bias' in state:
            p['conv']['b'] = a(f'{base}.conv.bias')
        if f'{prefix}{base}.bn.weight' in state:
            p['bn'] = {
                'scale': a(f'{base}.bn.weight'),
                'bias': a(f'{base}.bn.bias'),
            }
            s = {
                'mean': a(f'{base}.bn.running_mean'),
                'var': a(f'{base}.bn.running_var'),
            }
        else:  # identity norm: fold into BN formulation
            c = p['conv']['w'].shape[-1]
            p['bn'] = {
                'scale': np.ones(c, np.float32),
                'bias': np.zeros(c, np.float32),
            }
            s = {'mean': np.zeros(c, np.float32), 'var': np.ones(c, np.float32) - 1e-5}
        return p, {'bn': s}

    params: Params = {'laterals': [], 'outputs': []}
    stats: Params = {'laterals': [], 'outputs': []}
    for i in range(n_levels):
        p, s = module(f'lateral_convs.{i}', 256)
        params['laterals'].append(p)
        stats['laterals'].append(s)
        p, s = module(f'fpn_convs.{i}', 256)
        params['outputs'].append(p)
        stats['outputs'].append(s)
    return (
        jax.tree.map(jnp.asarray, params),
        jax.tree.map(jnp.asarray, stats),
    )
