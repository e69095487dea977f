"""Trainer pieces: torch-SGD parity, LR schedule, lr_mult rules."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oadp_tpu.dp.trainer import _lr_mult_tree, lr_at, sgd_init, sgd_update

torch = pytest.importorskip('torch')


def test_sgd_matches_torch():
    """Momentum + coupled weight decay, several steps, vs torch.optim.SGD."""
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [
        rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)
    ]
    lr, momentum, wd = 0.02, 0.9, 2.5e-5

    t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([t], lr=lr, momentum=momentum, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        t.grad = torch.from_numpy(g.copy())
        opt.step()

    params = {'w': jnp.asarray(w0)}
    bufs = sgd_init(params)
    mults = _lr_mult_tree(params, {})
    for g in grads:
        params, bufs = sgd_update(
            params, {'w': jnp.asarray(g)}, bufs, jnp.asarray(lr),
            mults, momentum, wd,
        )
    np.testing.assert_allclose(
        np.asarray(params['w']), t.detach().numpy(), atol=1e-6
    )


def test_lr_schedule():
    # warmup: lr(0) = ratio * base; lr(500) = base; step decay at 30k
    assert np.isclose(float(lr_at(jnp.asarray(0), 0.02, (30000,))),
                      0.02 * 0.001)
    assert np.isclose(float(lr_at(jnp.asarray(500), 0.02, (30000,))), 0.02)
    assert np.isclose(float(lr_at(jnp.asarray(29999), 0.02, (30000,))),
                      0.02)
    assert np.isclose(float(lr_at(jnp.asarray(30000), 0.02, (30000,))),
                      0.002)
    # two milestones compose
    assert np.isclose(
        float(lr_at(jnp.asarray(50000), 0.02, (30000, 40000))), 0.0002
    )


def test_lr_mult_rules():
    params = {
        'bbox_head': {'w': jnp.ones(2)},
        'rpn': {'w': jnp.ones(2)},
    }
    mults = _lr_mult_tree(params, {'bbox_head': 0.5})
    assert mults['bbox_head']['w'] == 0.5
    assert mults['rpn']['w'] == 1.0
    # the multiplier scales the applied update
    grads = jax.tree.map(jnp.ones_like, params)
    p2, _ = sgd_update(
        params, grads, sgd_init(params), jnp.asarray(1.0), mults,
        momentum=0.0, weight_decay=0.0,
    )
    np.testing.assert_allclose(np.asarray(p2['bbox_head']['w']), 0.5)
    np.testing.assert_allclose(np.asarray(p2['rpn']['w']), 0.0)


def test_eval_hook_by_epoch(tmp_path):
    """Under EpochBasedRunner the evaluation interval counts EPOCHS
    (configs/dp/schedules/2x.py: interval=4 => every 4 epochs), not
    iterations — a 4-iteration epoch with interval=2 must evaluate
    after epochs 2 and 4 only."""
    from tests.test_multichip import _mini_setup

    from oadp_tpu.dp.builder import DetectorBundle
    from oadp_tpu.dp.trainer import Trainer
    from oadp_tpu.utils import Config

    config, params, stats, anchors, batch = _mini_setup()
    half = {k: v[:4] for k, v in batch.items()}

    class _Loader:
        def __len__(self):
            return 2  # iters per epoch

        def epoch(self, epoch):
            for _ in range(2):
                yield dict(half)

    calls = []

    class _Evaluator:
        def run(self, params, stats):
            calls.append(1)
            return {}

    trainer_cfg = Config({
        'optimizer': {'lr': 0.001},
        'lr_config': {'by_epoch': True, 'step': [100]},
        'runner': {'type': 'EpochBasedRunner', 'max_epochs': 4},
        'log_config': {'interval': 1000},
        'checkpoint_config': {'by_epoch': True, 'interval': 1000},
        'evaluation': {'interval': 2},
        'n_devices': 1,
    })
    trainer = Trainer(
        DetectorBundle(config, params, stats), trainer_cfg,
        _Loader(), tmp_path, evaluator=_Evaluator(),
    )
    assert trainer.eval_by_epoch  # inherits from the runner type
    trainer.fit()
    # epochs 2 and 4 -> exactly two evaluation runs (NOT one per 2 iters)
    assert len(calls) == 2, calls


def test_synthetic_batch_boxes_stay_in_canvas():
    """make_train_batch must produce valid in-canvas boxes at any
    geometry — the 64x64 dry-run canvas previously crashed it and the
    bench canvas produced out-of-canvas blocks."""
    from oadp_tpu.dp.synthetic import make_train_batch

    for canvas in ((64, 64), (832, 1344), (192, 256)):
        batch = make_train_batch(
            2, canvas, num_bases=3, num_all=5, emb_dim=8,
            n_gt=4, n_blocks=6, n_objects=8,
        )
        h, w = canvas
        for key in ('gt_boxes', 'block_boxes', 'object_boxes'):
            bx = batch[key]
            assert (bx[..., 2] > bx[..., 0]).all(), (canvas, key)
            assert (bx[..., 3] > bx[..., 1]).all(), (canvas, key)
            assert bx[..., 2].max() <= w and bx[..., 3].max() <= h, (
                canvas, key)
