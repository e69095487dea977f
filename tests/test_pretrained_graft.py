"""``DetectorBundle.load_pretrained``: the reference's ``load_from``
contract (``configs/dp/base.py:12`` points at the SoCo-pretrained
R50-FPN; mmdet loads it via ``load_checkpoint`` at train start).

The converters themselves are oracle-tested elsewhere
(``test_backbone``, ``test_composite_parity``); this covers the
GRAFTING path: ``{'state_dict': ...}`` unwrap, ``backbone.``/``neck.``/
``rpn_head.`` prefix detection, stats replacement, and the
missing-file / unrecognized-format fallbacks.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')


def _mini_bundle(monkeypatch):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as G
    import oadp_tpu.models.resnet as RN
    from oadp_tpu.dp.builder import DetectorBundle
    from oadp_tpu.models import detector as DET

    monkeypatch.setitem(RN.STAGE_BLOCKS, 50, (1, 1, 1, 1))
    config = G._mini_detector_config()
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((5, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    params, stats = DET.init_detector(
        jax.random.key(1), config, jnp.asarray(emb)
    )
    return DetectorBundle(config, params, stats)


def _soco_style_checkpoint(tmp_path, num_base_anchors):
    """Synthetic mmdet-style checkpoint at the mini geometry: the SoCo
    release wraps its state dict in ``{'state_dict': ..., 'meta': ...}``."""
    from tests.oracles import resnet_torch as bb_oracle
    from tests.test_composite_parity import _TorchRPN

    torch.manual_seed(7)
    backbone = bb_oracle.ResNet(
        blocks=(1, 1, 1, 1), base=8, style='caffe'
    ).eval()
    bb_oracle.randomize_bn_stats(backbone, 3)
    in_ch = tuple(8 * 4 * (2 ** i) for i in range(4))
    fpn = bb_oracle.FPN(in_channels=in_ch, out=16).eval()
    rpn = _TorchRPN(16, num_base_anchors).eval()
    state = {}
    for prefix, mod in (
        ('backbone.', backbone), ('neck.', fpn), ('rpn_head.', rpn)
    ):
        for k, v in mod.state_dict().items():
            state[prefix + k] = v
    path = tmp_path / 'soco_mini.pth'
    torch.save({'state_dict': state, 'meta': {'synthetic': True}}, str(path))
    return path, backbone, fpn, rpn


def test_load_pretrained_mmdet_style(tmp_path, monkeypatch):
    bundle = _mini_bundle(monkeypatch)
    path, backbone, fpn, rpn = _soco_style_checkpoint(
        tmp_path, bundle.config.anchor_generator.num_base_anchors
    )
    head_before = np.asarray(
        bundle.params['bbox_head']['fcs'][0]['w']
    ).copy()
    bundle.load_pretrained(str(path))

    # backbone stem conv grafted (torch OIHW -> HWIO)
    np.testing.assert_array_equal(
        np.asarray(bundle.params['backbone']['stem']['conv']['w']),
        backbone.state_dict()['conv1.weight'].numpy().transpose(2, 3, 1, 0),
    )
    # BN running stats land in the STATS tree, not params
    np.testing.assert_array_equal(
        np.asarray(bundle.stats['backbone']['stem']['bn']['mean']),
        backbone.state_dict()['bn1.running_mean'].numpy(),
    )
    # FPN lateral conv grafted
    np.testing.assert_array_equal(
        np.asarray(bundle.params['fpn']['laterals'][0]['conv']['w']),
        fpn.state_dict()['lateral_convs.0.conv.weight']
        .numpy().transpose(2, 3, 1, 0),
    )
    # RPN grafted
    np.testing.assert_array_equal(
        np.asarray(bundle.params['rpn']['conv']['w']),
        rpn.state_dict()['rpn_conv.weight'].numpy().transpose(2, 3, 1, 0),
    )
    # heads NOT in the checkpoint keep their init (SoCo is backbone-only
    # pretraining; the OV heads always train from scratch)
    np.testing.assert_array_equal(
        np.asarray(bundle.params['bbox_head']['fcs'][0]['w']), head_before
    )


def test_load_pretrained_missing_file_keeps_init(tmp_path, monkeypatch):
    import jax

    bundle = _mini_bundle(monkeypatch)
    before = [np.asarray(x).copy() for x in jax.tree.leaves(bundle.params)]
    bundle.load_pretrained(str(tmp_path / 'nope.pth'))  # warns, no-op
    after = jax.tree.leaves(bundle.params)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_load_pretrained_unrecognized_format(tmp_path, monkeypatch):
    import jax

    bundle = _mini_bundle(monkeypatch)
    path = tmp_path / 'junk.pth'
    torch.save({'state_dict': {'something.weight': torch.zeros(2)}},
               str(path))
    before = [np.asarray(x).copy() for x in jax.tree.leaves(bundle.params)]
    bundle.load_pretrained(str(path))  # warns, no-op
    for a, b in zip(before, jax.tree.leaves(bundle.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
