"""ResNet + FPN fp32 parity vs the torch oracle (SURVEY.md §7.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from oadp_tpu.models import fpn as FP  # noqa: E402
from oadp_tpu.models import resnet as RN  # noqa: E402
from tests.oracles import resnet_torch as oracle  # noqa: E402

# Scaled-down ResNet (same topology, base 8) keeps CPU runtime sane.
BLOCKS = (2, 2, 2, 2)
BASE = 8


def _mini_config(style):
    return RN.ResNetConfig(
        depth=50, style=style, frozen_stages=-1, base_channels=BASE
    )


def _make_pair(style, seed=0):
    torch.manual_seed(seed)
    net = oracle.ResNet(blocks=BLOCKS, base=BASE, style=style).eval()
    oracle.randomize_bn_stats(net, seed)
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    params, stats = RN.convert_torch_resnet(state, depth=50)
    return net, params, stats


@pytest.fixture(autouse=True)
def _patch_stage_blocks(monkeypatch):
    monkeypatch.setitem(RN.STAGE_BLOCKS, 50, BLOCKS)


@pytest.mark.parametrize('style', ['pytorch', 'caffe'])
def test_resnet_parity(style):
    net, params, stats = _make_pair(style)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        expected = [
            o.numpy().transpose(0, 2, 3, 1)
            for o in net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ]
    outs, _ = RN.resnet_forward(
        params, stats, jnp.asarray(x), _mini_config(style)
    )
    assert len(outs) == 4
    for got, exp in zip(outs, expected):
        np.testing.assert_allclose(np.asarray(got), exp, atol=2e-4)


def test_fpn_parity():
    torch.manual_seed(1)
    in_ch = tuple(BASE * 4 * (2 ** i) for i in range(4))
    net = oracle.FPN(in_channels=in_ch, out=16).eval()
    oracle.randomize_bn_stats(net, 1)
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    params, stats = FP.convert_torch_fpn(state, prefix='')

    rng = np.random.default_rng(1)
    feats_np = [
        rng.standard_normal((2, 16 // (2 ** i), 16 // (2 ** i), c))
        .astype(np.float32)
        for i, c in enumerate(in_ch)
    ]
    with torch.no_grad():
        expected = [
            o.numpy().transpose(0, 2, 3, 1)
            for o in net([
                torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_np
            ])
        ]
    outs, _ = FP.fpn_forward(
        params, stats, [jnp.asarray(f) for f in feats_np]
    )
    assert len(outs) == 5
    for got, exp in zip(outs, expected):
        np.testing.assert_allclose(np.asarray(got), exp, atol=2e-4)


def test_frozen_stages_stop_gradient():
    _, params, stats = _make_pair('pytorch')
    cfg = RN.ResNetConfig(
        depth=50, style='pytorch', frozen_stages=1, base_channels=BASE
    )
    x = jnp.ones((1, 32, 32, 3))

    def loss(p):
        outs, _ = RN.resnet_forward(p, stats, x, cfg)
        return sum(o.sum() for o in outs)

    grads = jax.grad(loss)(params)
    stem_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads['stem'])
    )
    l1_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads['layer1'])
    )
    l2_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads['layer2'])
    )
    assert stem_norm == 0 and l1_norm == 0
    assert l2_norm > 0


def test_bn_train_mode_updates_stats():
    from oadp_tpu.models.layers import batch_norm, init_bn
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 6)).astype(np.float32))
    p, s = init_bn(6)
    out, s2 = batch_norm(x, p, s, train=True)
    # normalized output: ~zero mean, unit var per channel
    np.testing.assert_allclose(
        np.asarray(out).mean((0, 1, 2)), 0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out).std((0, 1, 2)), 1, atol=1e-2
    )
    # torch running update with momentum .1 and unbiased variance
    n = 4 * 8 * 8
    xf = np.asarray(x)
    np.testing.assert_allclose(
        np.asarray(s2['mean']), 0.1 * xf.mean((0, 1, 2)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s2['var']),
        0.9 + 0.1 * xf.var((0, 1, 2)) * n / (n - 1),
        atol=1e-5,
    )


def test_conv_bn_eval_fold_gradient_equivalence():
    """The eval-BN conv-fold (``resnet._conv_bn_eval``) must be an
    exact reparameterization: values AND gradients w.r.t. the conv
    weight and the (trainable) BN affine match the explicit
    conv -> eval-mode batch_norm composition."""
    from oadp_tpu.models.layers import batch_norm, conv

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 5)).astype(np.float32))
    cot = jnp.asarray(
        rng.standard_normal((2, 5, 6, 4)).astype(np.float32)
    )
    cp = {'w': jnp.asarray(
        rng.standard_normal((3, 3, 5, 4)).astype(np.float32) * 0.2
    )}
    bp = {
        'scale': jnp.asarray(
            rng.uniform(0.5, 1.5, 4).astype(np.float32)
        ),
        'bias': jnp.asarray(rng.standard_normal(4).astype(np.float32)),
    }
    bs = {
        'mean': jnp.asarray(rng.standard_normal(4).astype(np.float32)),
        'var': jnp.asarray(rng.uniform(0.2, 2.0, 4).astype(np.float32)),
    }

    def folded(cp, bp):
        return jnp.sum(
            RN._conv_bn_eval(x, cp, bp, bs, stride=2, padding=1) * cot
        )

    def unfolded(cp, bp):
        out = conv(x, cp, stride=2, padding=1)
        out, _ = batch_norm(out, bp, bs, train=False)
        return jnp.sum(out * cot)

    vf, (gcf, gbf) = jax.value_and_grad(folded, argnums=(0, 1))(cp, bp)
    vu, (gcu, gbu) = jax.value_and_grad(unfolded, argnums=(0, 1))(cp, bp)
    np.testing.assert_allclose(float(vf), float(vu), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gcf['w']), np.asarray(gcu['w']), rtol=1e-4, atol=1e-5
    )
    for k in ('scale', 'bias'):
        np.testing.assert_allclose(
            np.asarray(gbf[k]), np.asarray(gbu[k]), rtol=1e-4, atol=1e-5
        )
