"""Config → detector assembly shared by the DP CLIs.

Bridges the Python-dict config tree (mirroring reference
``configs/dp/*``) to ``models.detector``: prompt loading + category
reordering (reference ``oadp/dp/classifiers.py:20-49``), detector
config/params construction, pretrained-checkpoint grafting
(SoCo / torchvision, reference ``configs/dp/base.py:12``), and anchor
precomputation for the static canvases.
"""

__all__ = [
    'load_prompts',
    'build_detector',
    'canvas_anchors',
    'DetectorBundle',
]

import dataclasses
import pathlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Categories
from ..models import detector as DET
from ..models import fpn as FP
from ..models import resnet as RN
from ..models import rpn as RPN
from ..utils import Config, load_pth, logger


def load_prompts(
    path: str,
    categories: Categories,
    embedding_dim: int = 512,
) -> dict[str, Any]:
    """Load a prompt file ``{names, embeddings[, scaler, bias]}`` and
    reorder rows to ``categories.all_``. Missing file → random
    normalized embeddings (DRY_RUN / tests) with a warning."""
    if path and pathlib.Path(path).exists():
        data = load_pth(path)
        names = list(data['names'])
        emb = np.asarray(data['embeddings'], np.float32)
        indices = [names.index(n) for n in categories.all_]
        emb = emb[indices]
        out = {'embeddings': emb}
        if 'scaler' in data:
            out['scaler'] = float(np.asarray(data['scaler']).reshape(()))
            out['bias'] = float(np.asarray(data['bias']).reshape(()))
        return out
    logger.warning('prompt file %s not found; using random embeddings', path)
    rng = np.random.default_rng(0)
    emb = rng.standard_normal(
        (categories.num_all, embedding_dim)
    ).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    return {'embeddings': emb}


@dataclasses.dataclass
class DetectorBundle:
    config: DET.DetectorConfig
    params: Any
    stats: Any

    def _graft_heads(self, state: dict, path: str) -> None:
        """Graft a TRAINED reference checkpoint's RoI/global heads
        (reference naming: ``roi_head.bbox_head``,
        ``roi_head._object_head``, ``roi_head._block_head``,
        ``_global_head._classifier`` — ``oadp/dp/roi_heads.py:49``,
        ``oadp/dp/detectors.py:159``), so reference-trained models can
        be evaluated directly by ``dp/test.py``."""
        from ..models.heads import convert_torch_convfc_head

        heads = [
            ('bbox_head', 'roi_head.bbox_head.', self.config.bbox_head),
            (
                'object_head', 'roi_head._object_head.',
                self.config.object_head,
            ),
            (
                'block_head', 'roi_head._block_head.',
                self.config.block_head,
            ),
        ]
        for name, prefix, cfg in heads:
            if name not in self.params:
                continue
            if not any(k.startswith(prefix) for k in state):
                continue
            p, s = convert_torch_convfc_head(
                state, prefix, cfg, self.params[name]
            )
            self.params[name] = p
            if name in self.stats:
                self.stats[name] = s
            logger.info('grafted %s from %s', name, path)
        gp = '_global_head._classifier.'
        if 'global_head' in self.params and any(
            k.startswith(gp) for k in state
        ):
            cls = self.params['global_head']['cls']
            cls['linear'] = {
                'w': np.asarray(
                    state[gp + '_linear.weight'], np.float32
                ).T.copy(),
                'b': np.asarray(state[gp + '_linear.bias'], np.float32),
            }
            if gp + '_bg_embedding' in state:
                cls['bg'] = np.asarray(
                    state[gp + '_bg_embedding'], np.float32
                )
            logger.info('grafted global_head from %s', path)

    def load_pretrained(self, path: str) -> None:
        """Graft a torch checkpoint (SoCo / mmdet-style ``state_dict``
        with ``backbone.*`` / ``neck.*``; or a bare torchvision ResNet)
        onto the random-init params."""
        if not path or not pathlib.Path(path).exists():
            if path:
                logger.warning('pretrained %s not found; keeping init', path)
            return
        import torch
        raw = torch.load(path, map_location='cpu', weights_only=False)
        state = raw.get('state_dict', raw) if isinstance(raw, dict) else raw
        state = {
            k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
            for k, v in state.items()
        }
        if any(k.startswith('backbone.') for k in state):
            bp, bs = RN.convert_torch_resnet(state, 'backbone.')
            self.params['backbone'] = bp
            self.stats['backbone'] = bs
            if any(k.startswith('neck.') for k in state):
                fp, fs = FP.convert_torch_fpn(state, 'neck.')
                self.params['fpn'] = fp
                self.stats['fpn'] = fs
            if any(k.startswith('rpn_head.') for k in state):
                self.params['rpn'] = RPN.convert_torch_rpn(state)
            if (
                'mask_head' in self.params
                and any(
                    k.startswith('roi_head.mask_head.') for k in state
                )
            ):
                from ..models.mask_head import convert_torch_mask_head
                try:
                    self.params['mask_head'] = convert_torch_mask_head(
                        state
                    )
                    logger.info('grafted mask head from %s', path)
                except KeyError as e:
                    logger.warning('mask head graft failed: %s', e)
            if any(k.startswith('roi_head.bbox_head.') for k in state):
                self._graft_heads(state, path)
            logger.info('loaded pretrained backbone(+neck) from %s', path)
        elif 'conv1.weight' in state:
            bp, bs = RN.convert_torch_resnet(state)
            self.params['backbone'] = bp
            self.stats['backbone'] = bs
            logger.info('loaded torchvision backbone from %s', path)
        else:
            logger.warning('unrecognized checkpoint format: %s', path)


def build_detector(
    model_cfg: Config,
    categories: Categories,
    seed: int = 0,
) -> DetectorBundle:
    """``model_cfg`` mirrors the reference model config surface:
    prompts, scalers, head toggles, optional size overrides."""
    emb_dim = model_cfg.get('sizes', {}).get('embedding_dim', 512)
    bbox_prompts = load_prompts(
        model_cfg.get('prompts', 'data/prompts/vild.pth'), categories,
        embedding_dim=emb_dim,
    )
    ml = load_prompts(
        model_cfg.get('ml_prompts', 'data/prompts/ml_coco.pth'),
        categories, embedding_dim=emb_dim,
    )
    vild_scaler = model_cfg.get('vild_scaler', {})
    config = DET.DetectorConfig.build(
        categories.num_bases,
        categories.num_all,
        with_global=model_cfg.get('with_global', True),
        with_block=model_cfg.get('with_block', True),
        with_mask=model_cfg.get('with_mask', False),
        backbone_style=model_cfg.get('backbone_style', 'caffe'),
        vild_scaler_train=vild_scaler.get('train', 0.007),
        vild_scaler_val=vild_scaler.get('val', 0.01),
        cls_scaler=ml.get('scaler', 1.0),
        cls_bias=ml.get('bias', 0.0),
        head_cls_mode=model_cfg.get('head_cls_mode', 'affine'),
        global_vild_scaler=(
            tuple(model_cfg['global_vild_scaler'])
            if 'global_vild_scaler' in model_cfg else None
        ),
        **model_cfg.get('overrides', {}),
    )
    config = _apply_size_overrides(config, model_cfg)
    params, stats = DET.init_detector(
        jax.random.key(seed),
        config,
        jnp.asarray(bbox_prompts['embeddings']),
        jnp.asarray(ml['embeddings']),
    )
    bundle = DetectorBundle(config, params, stats)
    bundle.load_pretrained(model_cfg.get('pretrained', ''))
    return bundle


def _apply_size_overrides(
    config: DET.DetectorConfig, model_cfg: Config
) -> DET.DetectorConfig:
    """Optional scale-down knobs for tests/DRY_RUN (mini backbone etc.)."""
    sizes = model_cfg.get('sizes')
    if not sizes:
        return config
    base = sizes.get('base_channels', 64)
    fpn_ch = sizes.get('fpn_channels', 256)
    fc = sizes.get('fc_channels', 1024)
    emb = sizes.get('embedding_dim', 512)

    def head(h, num_fcs_in=None):
        return dataclasses.replace(
            h,
            in_channels=fpn_ch,
            conv_channels=fpn_ch,
            fc_channels=fc,
            classifier=dataclasses.replace(
                h.classifier, in_features=fc, embedding_dim=emb
            ),
        )

    return dataclasses.replace(
        config,
        backbone=dataclasses.replace(
            config.backbone,
            base_channels=base,
            blocks=tuple(sizes['stage_blocks'])
            if 'stage_blocks' in sizes else None,
        ),
        fpn_channels=fpn_ch,
        bbox_head=head(config.bbox_head),
        object_head=head(config.object_head),
        block_head=head(config.block_head),
        global_cls=dataclasses.replace(
            config.global_cls, in_features=fpn_ch, embedding_dim=emb
        ),
        mask_head=dataclasses.replace(
            config.mask_head, in_channels=fpn_ch, conv_channels=fpn_ch
        ),
    )


def canvas_anchors(
    config: DET.DetectorConfig, canvas: tuple[int, int]
) -> list[jnp.ndarray]:
    """Per-level anchors for a static (H, W) canvas."""
    gen = config.anchor_generator
    sizes = [
        (-(-canvas[0] // s), -(-canvas[1] // s)) for s in gen.strides
    ]
    return [jnp.asarray(a) for a in gen.grid_anchors(sizes)]
