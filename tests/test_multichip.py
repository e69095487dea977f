"""Multi-device correctness: 8-way-sharded training numerically equals
single-device, the evaluator shards over the mesh, the multi-host
gather and the OAKE process interleave partition work (SURVEY.md §2c;
reference DDP contract ``oadp/dp/train.py:61-63``).

Runs on the virtual 8-device CPU mesh from ``conftest.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Sp


def _mini_setup():
    import __graft_entry__ as G
    from oadp_tpu.dp.builder import canvas_anchors
    from oadp_tpu.models import detector as DET

    config = G._mini_detector_config()
    canvas = 64
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((5, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    params, stats = DET.init_detector(
        jax.random.key(0), config, jnp.asarray(emb)
    )
    anchors = canvas_anchors(config, (canvas, canvas))
    b, g, k, o = 8, 4, 6, 8
    batch = {
        'images': rng.standard_normal(
            (b, canvas, canvas, 3)
        ).astype(np.float32),
        'img_hw': np.asarray([[canvas, canvas]] * b, np.float32),
        'gt_boxes': np.abs(
            rng.standard_normal((b, g, 4))
        ).cumsum(-1).astype(np.float32) * 8,
        'gt_labels': rng.integers(0, 3, (b, g)).astype(np.int32),
        'gt_valid': np.asarray([[True] * 3 + [False]] * b),
        'clip_global': rng.standard_normal((b, 8)).astype(np.float32),
        'block_boxes': np.abs(
            rng.standard_normal((b, k, 4))
        ).cumsum(-1).astype(np.float32) * 8,
        'block_labels': (rng.random((b, k, 5)) > 0.7),
        'clip_blocks': rng.standard_normal((b, k, 8)).astype(np.float32),
        'block_valid': np.ones((b, k), bool),
        'object_boxes': np.abs(
            rng.standard_normal((b, o, 4))
        ).cumsum(-1).astype(np.float32) * 8,
        'clip_objects': rng.standard_normal((b, o, 8)).astype(np.float32),
        'object_valid': np.ones((b, o), bool),
    }
    return config, params, stats, anchors, batch


def _run_steps(config, params, stats, anchors, batch, n_devices, n_steps):
    from oadp_tpu.dp.trainer import (
        _lr_mult_tree,
        sgd_init,
        sgd_update,
        trainable_mask_tree,
    )
    from oadp_tpu.models import detector as DET

    devices = jax.devices('cpu')
    assert len(devices) >= n_devices, 'conftest must force 8 CPU devices'
    mesh = Mesh(np.asarray(devices[:n_devices]), ('data',))
    repl = NamedSharding(mesh, Sp())
    shard = NamedSharding(mesh, Sp('data'))
    lr_mults = _lr_mult_tree(params, {'bbox_head': 0.5})
    trainable = trainable_mask_tree(params, config)

    def train_step(params, stats, bufs, batch, step, key):
        def loss_fn(p):
            losses, new_stats = DET.forward_train(
                p, stats, batch, config, anchors, step, key
            )
            total = sum(
                v for k, v in losses.items() if k.startswith('loss')
            )
            return total, new_stats

        (total, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        params, bufs = sgd_update(
            params, grads, bufs, jnp.asarray(0.02), lr_mults,
            trainable=trainable,
        )
        return params, new_stats, bufs, total

    p = jax.device_put(params, repl)
    s = jax.device_put(stats, repl)
    bufs = jax.device_put(sgd_init(params), repl)
    dev_batch = {k: jax.device_put(v, shard) for k, v in batch.items()}
    step = jax.jit(train_step)
    totals = []
    for i in range(n_steps):
        p, s, bufs, total = step(
            p, s, bufs, dev_batch, jnp.asarray(100 + i), jax.random.key(7)
        )
        totals.append(float(total))
    return jax.tree.map(np.asarray, p), totals


def test_sharded_step_equals_single_device():
    """The grad psum + cross-replica BN that XLA inserts from the
    sharding annotations must reproduce the single-device math.

    One step is compared tightly (reduction-order ulps only). Multi-step
    param comparison is NOT meaningful: an ulp change in an RPN score
    flips top-k/NMS tie-breaks, resampling different-but-equally-valid
    RoIs — so across 3 steps only the loss trajectory is required to
    stay close."""
    config, params, stats, anchors, batch = _mini_setup()
    p1, t1 = _run_steps(config, params, stats, anchors, batch, 1, 1)
    p8, t8 = _run_steps(config, params, stats, anchors, batch, 8, 1)
    np.testing.assert_allclose(t8[0], t1[0], rtol=1e-5)
    flat1 = jax.tree.leaves(p1)
    flat8 = jax.tree.leaves(p8)
    assert len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        scale = float(np.abs(a).max()) + 1e-3
        assert float(np.abs(b - a).max()) <= 1e-4 * scale, (
            float(np.abs(b - a).max()), scale
        )
    # 3-step trajectories stay close (no systematic drift)
    _, t1 = _run_steps(config, params, stats, anchors, batch, 1, 3)
    _, t8 = _run_steps(config, params, stats, anchors, batch, 8, 3)
    np.testing.assert_allclose(np.asarray(t8), np.asarray(t1), rtol=5e-3)


def test_eval_gather_two_processes(tmp_path):
    """Rank-0 merges atomically-published parts; non-zero ranks return
    None (reference all-gather, ``oadp/dp/test_nni.py:144-150``)."""
    from oadp_tpu.dp.evaluator import DetEvaluator

    stub = type('Stub', (), {})()
    dets0 = [dict(image_id=1, score=0.5)]
    dets1 = [dict(image_id=2, score=0.7), dict(image_id=3, score=0.1)]
    barrier = lambda: None  # noqa: E731
    start_round = DetEvaluator._gather_round
    # rank 1 publishes first, then rank 0 merges
    out1 = DetEvaluator._gather(
        stub, dets1, process_index=1, process_count=2,
        root=tmp_path, barrier=barrier,
    )
    assert out1 is None
    DetEvaluator._gather_round = start_round  # same round on "rank 0"
    out0 = DetEvaluator._gather(
        stub, dets0, process_index=0, process_count=2,
        root=tmp_path, barrier=barrier, timeout_s=5.0,
    )
    assert out0 == dets0 + dets1
    # rank 0 cleans its round's parts up after merging
    assert not list(tmp_path.glob('eval_gather/round*')), (
        list(tmp_path.glob('eval_gather/*')))
    # a missing part raises instead of silently evaluating partial data
    DetEvaluator._gather_round = start_round + 10
    with pytest.raises(TimeoutError):
        DetEvaluator._gather(
            stub, dets0, process_index=0, process_count=2,
            root=tmp_path, barrier=barrier, timeout_s=0.3,
        )


def test_loader_striping_canvas_aligned():
    """Multi-process batch striping: every rank's step-k batch comes
    from the SAME aspect group (the jitted program is canvas-keyed and
    a multi-process mesh must launch identical collective programs in
    lockstep), all ranks see the same batch count, and eval (no
    shuffle) covers every image."""
    from oadp_tpu.dp.datasets import Loader

    class DS:
        def __init__(self, groups):
            self._g = groups

        def __len__(self):
            return len(self._g)

        def aspect_group(self, i):
            return self._g[i]

    for shuffle in (False, True):
        for n, pc, bs in [(5, 2, 2), (7, 2, 2), (9, 3, 2), (6, 2, 3)]:
            groups = [i % 2 for i in range(n)]  # mixed orientations
            ds = DS(groups)
            per_rank = []
            for pi in range(pc):
                ld = Loader(
                    ds, builder=None, batch_size=bs, transform=None,
                    shuffle=shuffle, seed=3,
                    process_index=pi, process_count=pc,
                )
                per_rank.append(ld._index_batches(0))
            # same number of lockstep steps on every rank
            assert len({len(r) for r in per_rank}) == 1, (shuffle, n, pc)
            for k in range(len(per_rank[0])):
                step_groups = {
                    ds.aspect_group(i) for r in per_rank for i in r[k]
                }
                assert len(step_groups) == 1, (
                    shuffle, n, pc, k,
                    [r[k] for r in per_rank],
                )
            if not shuffle:  # eval: every image evaluated somewhere
                seen = {i for r in per_rank for b in r for i in b}
                assert seen == set(range(n)), (n, pc, seen)


def test_metrics_dedup_across_ranks(monkeypatch):
    """Batch-count padding can repeat a whole batch on a DIFFERENT
    rank; the rank-0 merge must dedup by image id or every duplicated
    TP becomes an extra unmatched FP."""
    from oadp_tpu.dp import evaluator as EV

    captured = {}

    class FakeEval:
        def __init__(self, *a, **k):
            pass

        def evaluate(self, detections):
            captured['dets'] = detections

    stub = type('Stub', (), {})()
    stub.eval_type = 'ov_coco'
    stub.dataset = type('D', (), {'dataset': None, 'cat_ids': [1]})()
    stub.categories = type('C', (), {'num_bases': 1, 'num_novels': 1})()
    # rank 0 saw images 1,2; rank 1 saw 3 plus a REPEAT of 1 (padding)
    parts = [
        (1, [dict(image_id=1, score=0.9)]),
        (2, [dict(image_id=2, score=0.8)]),
        (1, [dict(image_id=1, score=0.9)]),  # duplicate from rank 1
        (3, [dict(image_id=3, score=0.7)]),
    ]
    stub._gather = lambda items: parts
    monkeypatch.setattr(EV, 'CocoEvaluator', FakeEval)
    monkeypatch.setattr(
        EV, 'ov_coco_summary', lambda e, b, n: {'ok': 1.0}
    )
    out = EV.DetEvaluator._metrics(stub, {1: parts[0][1]})
    assert out == {'ok': 1.0}
    ids = sorted(d['image_id'] for d in captured['dets'])
    assert ids == [1, 2, 3], ids  # image 1 counted exactly once


def test_oake_interleave_partitions_ids(tmp_path, monkeypatch):
    """Index interleave over processes covers every image exactly once
    (reference DistributedSampler, ``oadp/oake/base.py:84-88``)."""
    import sys

    sys.path.insert(0, '/root/repo')
    from tests.synthetic_data import make_synthetic_coco

    from oadp_tpu.oake import base as OB

    data = make_synthetic_coco(tmp_path, split='val2017')
    dataset = OB.CocoImageSet(data['root'], data['ann_file'])

    class _Probe(OB.BaseOakePipeline):
        def __init__(self):  # skip CLIP load
            pass

        def prepare(self, item):
            return item

        def execute_batch(self, prepared):
            return prepared

    probe = _Probe()
    out_dir = tmp_path / 'out'
    out_dir.mkdir()
    seen: dict[int, list[int]] = {}
    for pi in range(2):
        monkeypatch.setattr(jax, 'process_index', lambda pi=pi: pi)
        monkeypatch.setattr(jax, 'process_count', lambda: 2)
        items = list(probe._items(dataset, out_dir, False, {}))
        seen[pi] = [it['id'] for it in items]
    all_ids = sorted(seen[0] + seen[1])
    assert all_ids == sorted(dataset.ids)
    assert not set(seen[0]) & set(seen[1])
    # resume contract: existing outputs are skipped
    done_id = seen[0][0]
    import torch

    torch.save({'x': 1}, out_dir / f'{done_id:012d}.pth')
    monkeypatch.setattr(jax, 'process_index', lambda: 0)
    items = list(probe._items(dataset, out_dir, False, {}))
    assert done_id not in [it['id'] for it in items]


@pytest.fixture(scope='module')
def workspace8(tmp_path_factory):
    import pathlib
    import sys

    sys.path.insert(0, '/root/repo')
    from tests.synthetic_data import make_synthetic_dp
    from tests.test_dp_e2e import CFG_TEMPLATE

    root = tmp_path_factory.mktemp('dp8')
    data = make_synthetic_dp(root)
    cfg = root / 'config.py'
    cfg.write_text(CFG_TEMPLATE.format(
        vild=str(pathlib.Path(data['prompts']) / 'vild.pth'),
        ml=str(pathlib.Path(data['prompts']) / 'ml.pth'),
        ann=data['ann_file'],
        img=data['root'],
        oake=data['oake_root'],
    ).replace('n_devices=1', 'n_devices=8'))
    return root, cfg, data


def test_train_cli_8_devices(workspace8, monkeypatch):
    """The real train CLI on the 8-device mesh: global batch 8 sharded
    over the data axis (3 DRY_RUN images wrap to a full batch)."""
    root, cfg, data = workspace8
    monkeypatch.chdir(root)
    monkeypatch.setenv('DRY_RUN', '1')
    from oadp_tpu.dp import train as train_cli

    train_cli.main([
        'e2e8', str(cfg),
        '--override', '.trainer.runner.max_iters:2',
        '.trainer.evaluation.interval:1000000',
    ])
    log = (root / 'work_dirs' / 'dry_run' / 'e2e8' / 'train.log').read_text()
    assert 'iter 2/2' in log
    assert 'loss_clip_objects' in log


def test_test_cli_8_devices(workspace8, monkeypatch):
    """The test CLI shards eval batches over the 8-device mesh."""
    root, cfg, data = workspace8
    monkeypatch.chdir(root)
    monkeypatch.setenv('DRY_RUN', '1')
    from oadp_tpu.dp import test as test_cli

    ckpt = root / 'work_dirs' / 'dry_run' / 'e2e8' / 'latest.txt'
    assert ckpt.exists(), 'run test_train_cli_8_devices first'
    metrics = test_cli.main([str(cfg), str(ckpt)])
    assert 'COCO_48_17_bbox_mAP_50' in metrics
