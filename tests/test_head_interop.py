"""Reference-trained checkpoint interop: mmdet ConvFCBBoxHead + OADP
Classifier state dicts convert onto the JAX head and produce the same
eval-mode outputs (reference ``oadp/dp/bbox_heads.py``,
``oadp/dp/classifiers.py``)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from oadp_tpu.models.heads import (
    ClassifierConfig,
    HeadConfig,
    convert_torch_convfc_head,
    convfc_forward,
    init_convfc_head,
)

torch = pytest.importorskip('torch')
nn = torch.nn

NUM_BASES, NUM_ALL, EMB = 3, 5, 16


class _OracleHead(nn.Module):
    """mmdet Shared4Conv1FCBBoxHead + OADP Classifier, eval semantics."""

    def __init__(self, c_in=32, c_conv=32, c_fc=64, with_reg=True):
        super().__init__()
        torch.manual_seed(0)
        self.shared_convs = nn.ModuleList()
        c = c_in
        for _ in range(4):
            m = nn.Module()
            m.conv = nn.Conv2d(c, c_conv, 3, padding=1, bias=False)
            m.bn = nn.BatchNorm2d(c_conv)
            # non-trivial running stats
            m.bn.running_mean.normal_(0, 0.5)
            m.bn.running_var.uniform_(0.5, 2.0)
            self.shared_convs.append(m)
            c = c_conv
        self.shared_fcs = nn.ModuleList(
            [nn.Linear(c * 49, c_fc)]
        )
        self.fc_cls_linear = nn.Linear(c_fc, EMB)
        self.bg = nn.Parameter(torch.randn(1, EMB))
        emb = torch.randn(NUM_ALL, EMB)
        self.embeddings = emb / emb.norm(dim=-1, keepdim=True)
        self.fc_reg = nn.Linear(c_fc, 4) if with_reg else None
        self.scaler, self.bias = 2.0, 0.5

    def forward(self, x):  # (R, C, 7, 7)
        for m in self.shared_convs:
            x = torch.relu(m.bn(m.conv(x)))
        x = x.flatten(1)  # torch flattens (C, H, W)
        for fc in self.shared_fcs:
            x = torch.relu(fc(x))
        proj = torch.nn.functional.normalize(self.fc_cls_linear(x))
        emb = torch.cat(
            [self.embeddings,
             torch.nn.functional.normalize(self.bg)]
        )
        logits = proj @ emb.T
        logits = logits * self.scaler - self.bias  # eval-mode affine
        reg = self.fc_reg(x) if self.fc_reg is not None else None
        return logits, reg, proj

    def state_dict_mmdet(self, prefix=''):
        state = {}
        for i, m in enumerate(self.shared_convs):
            state[f'{prefix}shared_convs.{i}.conv.weight'] = (
                m.conv.weight.detach().numpy()
            )
            state[f'{prefix}shared_convs.{i}.bn.weight'] = (
                m.bn.weight.detach().numpy()
            )
            state[f'{prefix}shared_convs.{i}.bn.bias'] = (
                m.bn.bias.detach().numpy()
            )
            state[f'{prefix}shared_convs.{i}.bn.running_mean'] = (
                m.bn.running_mean.numpy()
            )
            state[f'{prefix}shared_convs.{i}.bn.running_var'] = (
                m.bn.running_var.numpy()
            )
        for i, fc in enumerate(self.shared_fcs):
            state[f'{prefix}shared_fcs.{i}.weight'] = (
                fc.weight.detach().numpy()
            )
            state[f'{prefix}shared_fcs.{i}.bias'] = (
                fc.bias.detach().numpy()
            )
        state[f'{prefix}fc_cls._linear.weight'] = (
            self.fc_cls_linear.weight.detach().numpy()
        )
        state[f'{prefix}fc_cls._linear.bias'] = (
            self.fc_cls_linear.bias.detach().numpy()
        )
        state[f'{prefix}fc_cls._bg_embedding'] = self.bg.detach().numpy()
        if self.fc_reg is not None:
            state[f'{prefix}fc_reg.weight'] = (
                self.fc_reg.weight.detach().numpy()
            )
            state[f'{prefix}fc_reg.bias'] = (
                self.fc_reg.bias.detach().numpy()
            )
        return state


def _config(with_reg=True):
    return HeadConfig(
        num_convs=4, num_fcs=1, in_channels=32, conv_channels=32,
        fc_channels=64, with_reg=with_reg, reg_class_agnostic=True,
        classifier=ClassifierConfig(
            in_features=64, embedding_dim=EMB, num_bases=NUM_BASES,
            num_all=NUM_ALL, with_bg=True, mode='affine',
            scaler=2.0, bias=0.5,
        ),
    )


def test_convfc_converter_matches_torch_forward():
    import jax

    oracle = _OracleHead().eval()
    config = _config()
    init_p, _ = init_convfc_head(
        jax.random.key(0), jnp.asarray(oracle.embeddings.numpy()), config
    )
    state = oracle.state_dict_mmdet('roi_head.bbox_head.')
    params, stats = convert_torch_convfc_head(
        state, 'roi_head.bbox_head.', config, init_p
    )

    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, 7, 7, 32)).astype(np.float32)
    with torch.no_grad():
        want_logits, want_reg, want_proj = oracle(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )
    got_logits, got_reg, got_proj, _ = convfc_forward(
        params, stats, jnp.asarray(x), config, train=False
    )
    np.testing.assert_allclose(
        np.asarray(got_proj), want_proj.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), want_logits.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_reg), want_reg.numpy(), atol=2e-5
    )


def test_bundle_grafts_reference_heads():
    """DetectorBundle picks up roi_head.* and _global_head.* keys."""
    import jax

    from oadp_tpu.dp.builder import DetectorBundle
    from oadp_tpu.models import detector as DET

    config = DET.DetectorConfig.build(
        NUM_BASES, NUM_ALL,
        cls_scaler=2.0, cls_bias=0.5,
    )
    config = dataclasses.replace(
        config,
        bbox_head=_config(with_reg=True),
        object_head=dataclasses.replace(
            _config(with_reg=False), suppress_bg_logit=True,
            classifier=dataclasses.replace(
                _config().classifier, freeze_bg=True
            ),
        ),
        block_head=dataclasses.replace(
            _config(with_reg=False), num_convs=0, num_fcs=2,
            in_channels=32,
        ),
        global_cls=dataclasses.replace(
            _config().classifier, in_features=16, with_bg=False
        ),
    )
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((NUM_ALL, EMB)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    params, stats = DET.init_detector(
        jax.random.key(0), config, jnp.asarray(emb)
    )
    bundle = DetectorBundle(config, params, stats)

    oracle = _OracleHead().eval()
    state = oracle.state_dict_mmdet('roi_head.bbox_head.')
    state.update(oracle.state_dict_mmdet('roi_head._object_head.'))
    glin = nn.Linear(16, EMB)
    state['_global_head._classifier._linear.weight'] = (
        glin.weight.detach().numpy()
    )
    state['_global_head._classifier._linear.bias'] = (
        glin.bias.detach().numpy()
    )
    bundle._graft_heads(state, '<test>')

    np.testing.assert_allclose(
        np.asarray(bundle.params['bbox_head']['cls']['linear']['w']),
        oracle.fc_cls_linear.weight.detach().numpy().T, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(bundle.params['object_head']['cls']['bg']),
        oracle.bg.detach().numpy(), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(bundle.params['global_head']['cls']['linear']['w']),
        glin.weight.detach().numpy().T, atol=1e-6,
    )
    # embeddings kept from prompts (non-persistent buffer in reference)
    np.testing.assert_allclose(
        np.asarray(bundle.params['bbox_head']['cls']['embeddings']),
        emb, atol=1e-6,
    )
