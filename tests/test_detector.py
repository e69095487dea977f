"""OADP detector: train losses, gradient flow, calibrated inference.

Tiny geometry (mini ResNet, 128x128 canvas) keeps CPU runtime sane while
exercising the full jitted train/test graph.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oadp_tpu.models.resnet as RN
from oadp_tpu.models import detector as DET

NUM_BASES, NUM_ALL = 3, 5
EMB_DIM = 16
CANVAS = 128


@pytest.fixture(autouse=True)
def _mini_resnet(monkeypatch):
    monkeypatch.setitem(RN.STAGE_BLOCKS, 50, (1, 1, 1, 1))


@pytest.fixture(scope='module')
def setup():
    config = DET.DetectorConfig.build(
        NUM_BASES, NUM_ALL, backbone_style='caffe',
        rcnn_samples=32, rpn_samples=16,
        rpn_train_nms_pre=64, rpn_train_max=32,
        rpn_test_nms_pre=64, rpn_test_max=32,
        rcnn_max_per_img=8,
    )
    config = dataclasses.replace(
        config,
        backbone=RN.ResNetConfig(style='caffe', base_channels=8),
        fpn_channels=32,
        bbox_head=dataclasses.replace(
            config.bbox_head, in_channels=32, conv_channels=32,
            fc_channels=64,
            classifier=dataclasses.replace(
                config.bbox_head.classifier, in_features=64,
                embedding_dim=EMB_DIM,
            ),
        ),
        object_head=dataclasses.replace(
            config.object_head, in_channels=32, conv_channels=32,
            fc_channels=64,
            classifier=dataclasses.replace(
                config.object_head.classifier, in_features=64,
                embedding_dim=EMB_DIM,
            ),
        ),
        block_head=dataclasses.replace(
            config.block_head, in_channels=32, fc_channels=64,
            classifier=dataclasses.replace(
                config.block_head.classifier, in_features=64,
                embedding_dim=EMB_DIM,
            ),
        ),
        global_cls=dataclasses.replace(
            config.global_cls, in_features=32, embedding_dim=EMB_DIM,
        ),
    )
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((NUM_ALL, EMB_DIM)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    params, stats = DET.init_detector(
        jax.random.key(0), config, jnp.asarray(emb)
    )
    gen = config.anchor_generator
    sizes = [
        (CANVAS // s, CANVAS // s) for s in gen.strides
    ]
    level_anchors = [jnp.asarray(a) for a in gen.grid_anchors(sizes)]
    return config, params, stats, level_anchors


def _batch(b=2, g=4, k=6, o=8):
    rng = np.random.default_rng(1)
    xy = rng.uniform(0, 80, (b, g, 2))
    gt = np.concatenate([xy, xy + rng.uniform(8, 40, (b, g, 2))], -1)
    oxy = rng.uniform(0, 80, (b, o, 2))
    ob = np.concatenate([oxy, oxy + rng.uniform(8, 40, (b, o, 2))], -1)
    bxy = rng.uniform(0, 60, (b, k, 2))
    bb = np.concatenate([bxy, bxy + rng.uniform(30, 60, (b, k, 2))], -1)
    return {
        'images': jnp.asarray(
            rng.standard_normal((b, CANVAS, CANVAS, 3)), jnp.float32
        ),
        'img_hw': jnp.asarray([[CANVAS, CANVAS]] * b, jnp.float32),
        'gt_boxes': jnp.asarray(gt, jnp.float32),
        'gt_labels': jnp.asarray(
            rng.integers(0, NUM_BASES, (b, g)), jnp.int32
        ),
        'gt_valid': jnp.asarray([[True] * 3 + [False]] * b),
        'clip_global': jnp.asarray(
            rng.standard_normal((b, EMB_DIM)), jnp.float32
        ),
        'block_boxes': jnp.asarray(bb, jnp.float32),
        'block_labels': jnp.asarray(
            rng.random((b, k, NUM_ALL)) > 0.7
        ),
        'clip_blocks': jnp.asarray(
            rng.standard_normal((b, k, EMB_DIM)), jnp.float32
        ),
        'block_valid': jnp.asarray([[True] * 5 + [False]] * b),
        'object_boxes': jnp.asarray(ob, jnp.float32),
        'clip_objects': jnp.asarray(
            rng.standard_normal((b, o, EMB_DIM)), jnp.float32
        ),
        'object_valid': jnp.asarray([[True] * 7 + [False]] * b),
    }


EXPECTED_LOSSES = {
    'loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox',
    'loss_clip_objects', 'loss_block', 'loss_clip_blocks',
    'loss_clip_block_relations', 'loss_global', 'loss_clip_global',
}


def test_forward_train_losses(setup):
    config, params, stats, level_anchors = setup
    losses, new_stats = DET.forward_train(
        params, stats, _batch(), config, level_anchors,
        jnp.asarray(100), jax.random.key(0),
    )
    assert EXPECTED_LOSSES <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    for k in EXPECTED_LOSSES:
        assert float(losses[k]) >= 0, k


def test_warmup_zero_at_step0(setup):
    config, params, stats, level_anchors = setup
    losses, _ = DET.forward_train(
        params, stats, _batch(), config, level_anchors,
        jnp.asarray(0), jax.random.key(0),
    )
    assert float(losses['loss_clip_objects']) == 0
    assert float(losses['loss_clip_global']) == 0


def test_gradients_flow_and_frozen_embeddings(setup):
    config, params, stats, level_anchors = setup
    batch = _batch()

    def total(p):
        losses, _ = DET.forward_train(
            p, stats, batch, config, level_anchors,
            jnp.asarray(100), jax.random.key(0),
        )
        return sum(
            v for k, v in losses.items() if k.startswith('loss')
        )

    grads = jax.grad(total)(params)

    def norm(tree):
        return sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(tree))

    # trains: rpn, heads, fpn
    assert norm(grads['rpn']) > 0
    assert norm(grads['bbox_head']['cls']['linear']) > 0
    assert norm(grads['object_head']['cls']['linear']) > 0
    # frozen: text embeddings everywhere, object-head bg embedding
    assert norm(grads['bbox_head']['cls']['embeddings']) == 0
    assert norm(grads['object_head']['cls']['embeddings']) == 0
    assert norm(grads['object_head']['cls']['bg']) == 0
    # trainable bg for the bbox head
    assert norm(grads['bbox_head']['cls']['bg']) > 0
    # frozen stage 1
    assert norm(grads['backbone']['stem']) == 0
    assert norm(grads['backbone']['layer1']) == 0
    assert norm(grads['backbone']['layer3']) > 0


def test_simple_test_calibration(setup):
    config, params, stats, level_anchors = setup
    batch = _batch()
    out = DET.simple_test(params, stats, batch, config, level_anchors)
    b = 2
    m = config.rcnn_max_per_img
    assert out['dets'].shape == (b, m, 5)
    assert out['labels'].shape == (b, m)
    dets = np.asarray(out['dets'])
    valid = np.asarray(out['valid'])
    assert valid.any()
    scores = dets[..., 4][valid]
    assert (scores >= 0).all() and (scores <= 1).all()
    labels = np.asarray(out['labels'])[valid]
    assert (labels >= 0).all() and (labels < NUM_ALL).all()
    # scores are descending per image among valid dets
    for i in range(b):
        s = dets[i, valid[i], 4]
        assert (np.diff(s) <= 1e-6).all()


def test_novel_masked_during_training(setup):
    """Training-mode classifier must never produce finite novel logits."""
    config, params, stats, level_anchors = setup
    from oadp_tpu.models.heads import classifier_forward
    x = jnp.ones((4, 64))
    logits, _ = classifier_forward(
        params['bbox_head']['cls'], x, config.bbox_head.classifier, True
    )
    novel = np.asarray(logits)[:, NUM_BASES:NUM_ALL]
    assert (novel < -1e8).all()
    logits_eval, _ = classifier_forward(
        params['bbox_head']['cls'], x, config.bbox_head.classifier, False
    )
    assert np.isfinite(np.asarray(logits_eval)).all()


def test_detector_learns(setup):
    """30 SGD steps on one fixed batch must substantially reduce the
    supervised losses — end-to-end gradient/optimizer plumbing proof."""
    from oadp_tpu.dp.trainer import sgd_init, sgd_update, _lr_mult_tree

    config, params, stats, level_anchors = setup
    batch = _batch()
    lr_mults = _lr_mult_tree(params, {})

    @jax.jit
    def step(params, stats, bufs, key):
        def loss_fn(p):
            losses, new_stats = DET.forward_train(
                p, stats, batch, config, level_anchors,
                jnp.asarray(0), key,  # step 0: distillation warmup = 0
            )
            sup = (
                losses['loss_rpn_cls'] + losses['loss_rpn_bbox']
                + losses['loss_cls'] + losses['loss_bbox']
            )
            return sup, new_stats

        (sup, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        params, bufs = sgd_update(
            params, grads, bufs, jnp.asarray(0.005), lr_mults,
            momentum=0.9, weight_decay=0.0,
        )
        return params, new_stats, bufs, sup

    # lr 0.005: at 0.02 this tiny synthetic batch diverges for most
    # sampling streams (the production schedule has 500-iter warmup
    # before 0.02, which this plumbing test doesn't replicate).
    bufs = sgd_init(params)
    key = jax.random.key(0)
    losses = []
    p, s, b = params, stats, bufs
    for i in range(30):
        p, s, b, sup = step(p, s, b, key)  # fixed key: same sampling
        losses.append(float(sup))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_trainable_mask_matches_stop_gradient_rules(setup):
    """Frozen leaves (frozen backbone stages, CLIP text embeddings, the
    object head's frozen bg) must be skipped by the optimizer entirely —
    torch.optim.SGD never applies weight decay to grad-None params."""
    from oadp_tpu.dp.trainer import (
        _lr_mult_tree,
        sgd_init,
        sgd_update,
        trainable_mask_tree,
    )

    config, params, stats, _ = setup
    mask = trainable_mask_tree(params, config)
    # structure identical to params
    assert jax.tree.structure(mask) == jax.tree.structure(params)
    # frozen_stages=1: stem + layer1 frozen, layer2+ trains
    assert not any(jax.tree.leaves(mask['backbone']['stem']))
    assert not any(jax.tree.leaves(mask['backbone']['layer1']))
    assert all(jax.tree.leaves(mask['backbone']['layer2']))
    # text embeddings frozen everywhere; bg frozen only on object head
    assert mask['bbox_head']['cls']['embeddings'] is False
    assert mask['object_head']['cls']['embeddings'] is False
    assert mask['global_head']['cls']['embeddings'] is False
    assert mask['object_head']['cls']['bg'] is False
    assert mask['bbox_head']['cls']['bg'] is True
    assert all(jax.tree.leaves(mask['fpn']))
    assert all(jax.tree.leaves(mask['rpn']))

    # zero grads + nonzero wd: frozen leaves bit-identical, trainable
    # leaves decay by exactly (1 - lr*wd)
    lr, wd = 0.02, 1e-2
    grads = jax.tree.map(jnp.zeros_like, params)
    p2, _ = sgd_update(
        params, grads, sgd_init(params), jnp.asarray(lr),
        _lr_mult_tree(params, {}), 0.9, wd, mask,
    )
    for m, a, b in zip(
        jax.tree.leaves(mask), jax.tree.leaves(params),
        jax.tree.leaves(p2),
    ):
        if m:
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a) * (1 - lr * wd),
                rtol=1e-6, atol=1e-8,
            )
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
