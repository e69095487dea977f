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


def test_deterministic_resume(tmp_path):
    """ckpt@6 -> resume -> 2 more steps must equal 8 uninterrupted
    steps BITWISE on params/bufs/stats: the checkpoint carries the RNG
    stream position + metric window, and ``fit`` re-enters the
    interrupted epoch at the checkpointed batch (the reference resumes
    runner iteration + optimizer via mmdet ``resume_from``,
    configs/dp/base.py:11)."""
    from tests.test_multichip import _mini_setup

    from oadp_tpu.dp.builder import DetectorBundle
    from oadp_tpu.dp.trainer import Trainer, TrainState
    from oadp_tpu.utils import Config

    config, params, stats, anchors, batch = _mini_setup()
    rng = np.random.default_rng(5)
    # 4 DISTINCT per-position batches: a resume that restarts the epoch
    # or lands at the wrong position changes the data stream and the
    # final params
    batches = []
    for _ in range(4):
        b = {k: v[:4] for k, v in batch.items()}
        b['images'] = (
            b['images']
            + rng.standard_normal(b['images'].shape).astype(np.float32)
        )
        batches.append(b)

    class _Loader:
        def __len__(self):
            return 4  # epoch length; step 6 resumes mid-epoch (skip=2)

        def epoch(self, epoch, start=0):
            for b in batches[start:]:
                yield dict(b)

    def make_trainer(work_dir, ckpt_interval):
        trainer_cfg = Config({
            'optimizer': {'lr': 0.001},
            'lr_config': {'by_epoch': False, 'step': [100]},
            'runner': {'type': 'IterBasedRunner', 'max_iters': 8},
            'log_config': {'interval': 3},  # exercises the window fetch
            'checkpoint_config': {
                'by_epoch': False, 'interval': ckpt_interval,
            },
            'n_devices': 1,
            'seed': 11,
        })
        # fit() donates its carry — give each trainer its own copy of
        # the shared init arrays
        copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)  # noqa: E731
        return Trainer(
            DetectorBundle(config, copy(params), copy(stats)),
            trainer_cfg, _Loader(), work_dir,
        )

    run_a = tmp_path / 'a'
    run_b = tmp_path / 'b'
    run_a.mkdir(), run_b.mkdir()
    final_a = make_trainer(run_a, 1000).fit()  # uninterrupted 8 steps

    make_trainer(run_b, 6).fit()  # writes ckpt_6 (epoch 1, position 2)
    template = {
        'params': params,
        'stats': stats,
        'bufs': jax.tree.map(jnp.zeros_like, params),
        'step': 0,
    }
    restored = Trainer.restore(run_b / 'ckpt_6', template)
    assert int(restored['step']) == 6
    assert restored.get('key') is not None  # RNG stream position
    resume = TrainState(
        params=restored['params'],
        stats=restored['stats'],
        bufs=restored['bufs'],
        step=6,
        key_data=restored['key'],
        win=restored['win'],
    )
    final_b = make_trainer(tmp_path / 'b2', 1000).fit(resume)

    for name, tree_a, tree_b in (
        ('params', final_a.params, final_b.params),
        ('bufs', final_a.bufs, final_b.bufs),
        ('stats', final_a.stats, final_b.stats),
    ):
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), name
    # the metric window is cumulative across the resume too
    assert np.array_equal(
        np.asarray(final_a.win), np.asarray(final_b.win)
    )


def test_restore_legacy_vs_corrupt(tmp_path):
    """``Trainer.restore`` falls back ONLY for round-3-era checkpoints
    that genuinely lack the RNG-stream/metric-window leaves; any other
    template mismatch must raise instead of silently restarting the
    RNG stream (which would break deterministic resume untraceably)."""
    import orbax.checkpoint as ocp

    from oadp_tpu.dp.trainer import Trainer

    tpl = {
        'params': {'w': np.zeros(3, np.float32)},
        'step': np.asarray(0),
    }
    legacy = tmp_path / 'legacy'
    with ocp.StandardCheckpointer() as c:
        c.save(
            legacy,
            {
                'params': {'w': np.arange(3, dtype=np.float32)},
                'step': np.asarray(7),
            },
            force=True,
        )
    out = Trainer.restore(legacy, dict(tpl))
    assert 'key' not in out and int(out['step']) == 7
    np.testing.assert_array_equal(
        out['params']['w'], np.arange(3, dtype=np.float32)
    )
    # a template leaf the checkpoint lacks (renamed param, wrong tree)
    # is NOT a legacy checkpoint: surface the error
    bad_tpl = dict(tpl)
    bad_tpl['params'] = {'w': np.zeros(3, np.float32),
                         'v': np.zeros(2, np.float32)}
    with pytest.raises(ValueError):
        Trainer.restore(legacy, bad_tpl)


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
