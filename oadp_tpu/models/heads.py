"""RoI heads and text-embedding classifiers for the DP stage.

Functional JAX redesign of the reference head zoo:

* :func:`classifier_forward` — ``BaseClassifier``/``Classifier``/
  ``ViLDClassifier`` (reference ``oadp/dp/classifiers.py``): Normalized
  Linear image projection, cosine logits against frozen CLIP text
  embeddings (+ optional learnable background embedding), novel logits
  masked to -inf during training, ViLD temperature or affine
  scaler/bias.
* :func:`init_convfc_head` / :func:`convfc_forward` — mmdet
  ``Shared{2FC,4Conv1FC}BBoxHead`` towers (``configs/dp/models/
  vild_ensemble_faster_rcnn_r50_fpn.py:10-16``; ``oadp/dp/
  bbox_heads.py``). The distillation "hook" of the reference
  (``.fc_cls._linear`` capture) is an explicit return value: every head
  returns its normalized 512-d projection.
* :func:`global_head_forward` — ``GlobalHead`` (``oadp/dp/
  detectors.py:21-57``): mean-pooled P6 -> Classifier.

All "frozen CLIP text embedding" tensors take no gradient
(``stop_gradient``); the object head additionally freezes its
background embedding (reference ``oadp/dp/bbox_heads.py:45-60``).
"""

__all__ = [
    'ClassifierConfig',
    'init_classifier',
    'classifier_forward',
    'HeadConfig',
    'init_convfc_head',
    'convfc_forward',
    'init_global_head',
    'global_head_forward',
    'NEG_INF',
]

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .layers import batch_norm, conv, init_bn, init_conv

Params = dict[str, Any]
NEG_INF = -1e10


# ---------------------------------------------------------------------------
# Classifiers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    in_features: int = 1024
    embedding_dim: int = 512
    num_bases: int = 48
    num_all: int = 65
    with_bg: bool = True
    freeze_bg: bool = False  # object head: bg exists but never trains
    # 'vild': logits / (train ? scaler_train : scaler_val)
    # 'affine': logits * scaler - bias
    # 'none': raw cosine logits
    mode: str = 'none'
    scaler_train: float = 0.007
    scaler_val: float = 0.01
    scaler: float = 1.0
    bias: float = 0.0


def init_classifier(
    key: jax.Array,
    embeddings: jnp.ndarray,  # (num_all, D) frozen text embeddings
    config: ClassifierConfig,
) -> Params:
    k1, k2 = jax.random.split(key)
    d = embeddings.shape[1]
    fan = config.in_features + d
    bound = (6.0 / fan) ** 0.5  # xavier_uniform
    p: Params = {
        'linear': {
            'w': jax.random.uniform(
                k1, (config.in_features, d), jnp.float32, -bound, bound
            ),
            'b': jnp.zeros(d),
        },
        # copy=True: several heads share one prompt table; aliased
        # buffers across params leaves break jit donation
        'embeddings': jnp.array(embeddings, jnp.float32, copy=True),
    }
    if config.with_bg:
        b_bound = (6.0 / (1 + d)) ** 0.5
        p['bg'] = jax.random.uniform(
            k2, (1, d), jnp.float32, -b_bound, b_bound
        )
    return p


def classifier_forward(
    params: Params,
    x: jax.Array,  # (N, in_features)
    config: ClassifierConfig,
    train: bool,
) -> tuple[jax.Array, jax.Array]:
    """Returns ``(logits (N, K[+1]), projection (N, D))`` where the
    projection is the L2-normalized NormalizedLinear output — the
    reference's distillation capture point
    (``configs/dp/models/vild_ensemble_faster_rcnn_r50_fpn.py:25-28``).
    """
    w = params['linear']['w'].astype(x.dtype)
    proj = x @ w + params['linear']['b'].astype(x.dtype)
    proj = proj.astype(jnp.float32)
    proj = proj / jnp.maximum(
        jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12
    )

    emb = jax.lax.stop_gradient(params['embeddings'])
    if 'bg' in params:
        bg = params['bg']
        if config.freeze_bg:
            bg = jax.lax.stop_gradient(bg)
        bg = bg / jnp.maximum(jnp.linalg.norm(bg, axis=-1, keepdims=True),
                              1e-12)
        emb = jnp.concatenate([emb, bg])
    logits = proj @ emb.T

    if train:
        k = jnp.arange(logits.shape[-1])
        novel = (k >= config.num_bases) & (k < config.num_all)
        logits = jnp.where(novel, NEG_INF, logits)

    if config.mode == 'vild':
        logits = logits / (config.scaler_train if train else config.scaler_val)
    elif config.mode == 'affine':
        logits = logits * config.scaler - config.bias
    return logits, proj


# ---------------------------------------------------------------------------
# ConvFC towers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    num_convs: int = 0
    num_fcs: int = 2
    in_channels: int = 256
    conv_channels: int = 256
    fc_channels: int = 1024
    roi_size: int = 7
    with_reg: bool = False
    reg_class_agnostic: bool = True
    # ObjectMixin: force the background logit to -inf
    suppress_bg_logit: bool = False
    classifier: ClassifierConfig = ClassifierConfig()


def init_convfc_head(
    key: jax.Array,
    embeddings: jnp.ndarray,
    config: HeadConfig,
) -> tuple[Params, Params]:
    """Returns ``(params, bn_stats)``."""
    n = config.num_convs + config.num_fcs + 2
    keys = jax.random.split(key, n)
    params: Params = {'convs': [], 'fcs': []}
    stats: Params = {'convs': []}
    c = config.in_channels
    for i in range(config.num_convs):
        bn, s = init_bn(config.conv_channels)
        params['convs'].append(
            {'conv': init_conv(keys[i], 3, c, config.conv_channels),
             'bn': bn}
        )
        stats['convs'].append({'bn': s})
        c = config.conv_channels
    dim = c * config.roi_size * config.roi_size
    for i in range(config.num_fcs):
        k = keys[config.num_convs + i]
        bound = (6.0 / (dim + config.fc_channels)) ** 0.5
        params['fcs'].append({
            'w': jax.random.uniform(
                k, (dim, config.fc_channels), jnp.float32, -bound, bound
            ),
            'b': jnp.zeros(config.fc_channels),
        })
        dim = config.fc_channels
    params['cls'] = init_classifier(keys[-2], embeddings, config.classifier)
    if config.with_reg:
        out = 4 if config.reg_class_agnostic else 4 * config.classifier.num_all
        params['reg'] = {
            'w': jax.random.normal(keys[-1], (dim, out)) * 0.001,
            'b': jnp.zeros(out),
        }
    return params, stats


def convfc_forward(
    params: Params,
    stats: Params,
    x: jax.Array,  # (R, roi, roi, C)
    config: HeadConfig,
    train: bool,
    valid: jax.Array | None = None,  # (R,) padded-row mask for BN stats
) -> tuple[jax.Array, jax.Array | None, jax.Array, Params]:
    """Returns ``(cls_logits, reg_deltas | None, projection, new_stats)``."""
    new_stats: Params = {'convs': []}
    for p, s in zip(params['convs'], stats['convs']):
        x = conv(x, p['conv'], padding=1)
        x, ns = batch_norm(x, p['bn'], s['bn'], train, mask=valid)
        new_stats['convs'].append({'bn': ns})
        x = jax.nn.relu(x)
    # NHWC flatten; torch flattens CHW — converters must permute.
    x = x.reshape(x.shape[0], -1)
    for p in params['fcs']:
        x = jax.nn.relu(x @ p['w'].astype(x.dtype) + p['b'].astype(x.dtype))
    logits, proj = classifier_forward(
        params['cls'], x, config.classifier, train
    )
    if config.suppress_bg_logit:
        logits = logits.at[:, -1].set(NEG_INF)
    reg = None
    if 'reg' in params:
        reg = x @ params['reg']['w'].astype(x.dtype) + params['reg'][
            'b'
        ].astype(x.dtype)
    return logits, reg, proj, new_stats


# ---------------------------------------------------------------------------
# Global head
# ---------------------------------------------------------------------------


def init_global_head(
    key: jax.Array,
    embeddings: jnp.ndarray,
    config: ClassifierConfig,
) -> Params:
    return {'cls': init_classifier(key, embeddings, config)}


def global_head_forward(
    params: Params,
    feats: list[jax.Array],  # FPN levels, NHWC
    config: ClassifierConfig,
    train: bool,
) -> tuple[jax.Array, jax.Array]:
    """Mean-pool the last FPN map → classifier (reference
    ``oadp/dp/detectors.py:36-38``)."""
    pooled = feats[-1].mean(axis=(1, 2))  # (B, C)
    return classifier_forward(params['cls'], pooled, config, train)


# ---------------------------------------------------------------------------
# Torch checkpoint interop
# ---------------------------------------------------------------------------


def convert_torch_convfc_head(
    state: dict,
    prefix: str,
    config: HeadConfig,
    init_params: Params,
) -> tuple[Params, Params]:
    """mmdet ``ConvFCBBoxHead`` (+ OADP ``Classifier``) state dict →
    ``(params, stats)``.

    Key layout (reference ``oadp/dp/bbox_heads.py`` over mmdet
    ``Shared{4Conv1FC,2FC}BBoxHead``): ``shared_convs.{i}.conv/bn``,
    ``shared_fcs.{i}``, ``fc_cls._linear`` (NormalizedLinear),
    ``fc_cls._bg_embedding``, ``fc_reg``. The CLIP text ``_embeddings``
    buffer is non-persistent in the reference (rebuilt from prompts), so
    the embeddings from ``init_params`` are kept.

    Torch flattens RoI features as (C, H, W); this stack flattens
    (H, W, C) — the first fc's input columns are permuted accordingly.
    """
    import numpy as np

    def a(name):
        return np.asarray(state[prefix + name], np.float32)

    params: Params = {'convs': [], 'fcs': []}
    stats: Params = {'convs': []}
    c = config.in_channels
    for i in range(config.num_convs):
        params['convs'].append({
            'conv': {
                'w': a(f'shared_convs.{i}.conv.weight').transpose(
                    2, 3, 1, 0
                ),
            },
            'bn': {
                'scale': a(f'shared_convs.{i}.bn.weight'),
                'bias': a(f'shared_convs.{i}.bn.bias'),
            },
        })
        stats['convs'].append({'bn': {
            'mean': a(f'shared_convs.{i}.bn.running_mean'),
            'var': a(f'shared_convs.{i}.bn.running_var'),
        }})
        c = config.conv_channels
    for i in range(config.num_fcs):
        w = a(f'shared_fcs.{i}.weight')  # (out, in)
        if i == 0:
            # torch flattened (C, roi, roi); ours flattens (roi, roi, C)
            w = w.reshape(-1, c, config.roi_size, config.roi_size)
            w = w.transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
        params['fcs'].append({
            'w': w.T.copy(),
            'b': a(f'shared_fcs.{i}.bias'),
        })
    cls: Params = {
        'linear': {
            'w': a('fc_cls._linear.weight').T.copy(),
            'b': a('fc_cls._linear.bias'),
        },
        # non-persistent buffer in the reference; rebuilt from prompts
        'embeddings': np.asarray(
            init_params['cls']['embeddings'], np.float32
        ),
    }
    if prefix + 'fc_cls._bg_embedding' in state:
        cls['bg'] = a('fc_cls._bg_embedding')
    elif 'bg' in init_params['cls']:
        cls['bg'] = np.asarray(init_params['cls']['bg'], np.float32)
    params['cls'] = cls
    if config.with_reg and prefix + 'fc_reg.weight' in state:
        params['reg'] = {
            'w': a('fc_reg.weight').T.copy(),
            'b': a('fc_reg.bias'),
        }
    elif 'reg' in init_params:
        params['reg'] = init_params['reg']
    return params, stats
