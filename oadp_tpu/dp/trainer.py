"""DP training runtime: SGD + schedules, sharded train step, hooks.

Replaces mmdet's runner/DDP machinery (reference ``oadp/dp/train.py:
110-118``, ``configs/dp/schedules/*``) TPU-natively:

* the train step is ONE jitted function ``(params, stats, opt_state,
  batch, step, rng) -> (params, stats, opt_state, metrics)`` with
  donated state;
* data parallelism is a 1-D ``data`` mesh with ``NamedSharding`` —
  gradients are averaged by XLA-inserted collectives, replacing NCCL
  DDP buckets (SURVEY.md §2c);
* torch-SGD semantics: momentum buffers, coupled weight decay, per-path
  lr multipliers (``configs/dp/oadp_ov_coco.py:37-44``: bbox_head 0.5);
* linear warmup 500 iters at ratio 0.001 then step decay
  (``configs/dp/schedules/base.py``);
* mixed precision = bf16 activations (params fp32, losses fp32) — the
  TPU replacement for mmcv fp16 + loss scaling (``configs/dp/base.py:9``).
"""

__all__ = [
    'TrainState', 'Trainer', 'build_train_step', 'sgd_init',
    'sgd_update', 'lr_at', 'trainable_mask_tree',
]

import dataclasses
import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..models import detector as DET
from ..utils import Config, logger, replicate_tree
from . import datasets
from .builder import DetectorBundle, canvas_anchors

Params = dict[str, Any]

# static width of the carried metric vector (see Trainer._make_step):
# the packed loss/metric stack is padded to this length so the device
# carry has a known shape before the step is ever traced
_VEC_PAD = 32


def sgd_init(params: Params) -> Params:
    return jax.tree.map(jnp.zeros_like, params)


def lr_at(
    step: jnp.ndarray,
    base_lr: float,
    milestones: tuple,
    warmup_iters: int = 500,
    warmup_ratio: float = 0.001,
    gamma: float = 0.1,
) -> jnp.ndarray:
    """mmcv StepLrUpdater with linear warmup."""
    step = step.astype(jnp.float32)
    frac = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
    warm = warmup_ratio + (1.0 - warmup_ratio) * frac
    decay = jnp.asarray(1.0, jnp.float32)
    for m in milestones:
        decay = decay * jnp.where(step >= m, gamma, 1.0)
    return base_lr * warm * decay


def _lr_mult_tree(params: Params, rules: dict[str, float]) -> Params:
    """Per-leaf lr multipliers by top-level path prefix (mmdet
    ``paramwise_cfg.custom_keys``)."""

    def mult_for(path: str) -> float:
        for key, mult in rules.items():
            if path.startswith(key):
                return mult
        return 1.0

    return {
        k: jax.tree.map(lambda _: mult_for(k), v)
        for k, v in params.items()
    }


def trainable_mask_tree(params: Params, config) -> Params:
    """Per-leaf trainable flags mirroring the model's ``stop_gradient``
    rules.

    ``torch.optim.SGD`` skips parameters whose grad is ``None`` — and
    the reference's frozen pieces (frozen backbone stages,
    ``oadp/dp/...`` CLIP text embeddings registered as buffers, the
    object head's frozen background embedding) therefore never receive
    the coupled weight decay. A pure ``stop_gradient`` only zeroes the
    gradient, so without this mask those leaves would still decay by
    ``lr*wd`` every step (~14% over a 40k run). ``config`` is a
    :class:`~oadp_tpu.models.detector.DetectorConfig`.
    """

    def full(tree, val):
        return jax.tree.map(lambda _: val, tree)

    mask = {k: full(v, True) for k, v in params.items()}
    fs = config.backbone.frozen_stages
    bb = params['backbone']
    if fs >= 0:
        mask['backbone']['stem'] = full(bb['stem'], False)
    for i in range(1, 5):
        name = f'layer{i}'
        if fs >= i and name in bb:
            mask['backbone'][name] = full(bb[name], False)
    heads = [
        ('bbox_head', config.bbox_head.classifier),
        ('object_head', config.object_head.classifier),
        ('block_head', config.block_head.classifier),
        ('global_head', config.global_cls),
    ]
    for head, cls_cfg in heads:
        if head not in params:
            continue
        cls = params[head]['cls']
        mask[head]['cls']['embeddings'] = full(cls['embeddings'], False)
        if cls_cfg.freeze_bg and 'bg' in cls:
            mask[head]['cls']['bg'] = full(cls['bg'], False)
    return mask


def sgd_update(
    params: Params,
    grads: Params,
    bufs: Params,
    lr: jnp.ndarray,
    lr_mults: Params,
    momentum: float = 0.9,
    weight_decay: float = 2.5e-5,
    trainable: Params | None = None,
) -> tuple[Params, Params]:
    """torch.optim.SGD: ``buf = m*buf + (g + wd*p); p -= lr*mult*buf``.

    Leaves marked ``False`` in ``trainable`` are returned untouched —
    torch skips ``grad is None`` params entirely, so neither weight
    decay nor the momentum buffer applies to them.
    """
    if trainable is None:
        trainable = jax.tree.map(lambda _: True, params)

    def upd(p, g, b, m, t):
        if not t:  # static python bool — resolved at trace time
            return p, b
        g = g.astype(jnp.float32) + weight_decay * p.astype(jnp.float32)
        b = momentum * b + g
        return (p - lr * m * b).astype(p.dtype), b

    flat = jax.tree.map(upd, params, grads, bufs, lr_mults, trainable)
    new_params = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
    new_bufs = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_bufs


def build_train_step(
    config,
    anchors,
    lr_mults: Params,
    trainable: Params,
    base_lr: float = 0.02,
    milestones: tuple = (30000,),
    momentum: float = 0.9,
    weight_decay: float = 2.5e-5,
    warmup_iters: int = 500,
    warmup_ratio: float = 0.001,
    n_dev: int = 1,
) -> Callable:
    """THE production train step: all losses + torch-SGD update.

    The single source shared by ``Trainer._make_step``, ``bench.py``,
    ``tools/profile_dp.py`` and the ``__graft_entry__`` dry run (via
    ``dp.synthetic``), so benchmarks can't drift from training.

    ``n_dev``: the reference's sum-reduced global distill loss runs
    per-GPU under DDP whose grad all-reduce MEANS across ranks, so its
    effective gradient is sum/world_size; a jitted step over the global
    batch must divide explicitly.
    """

    def step_fn(params, stats, bufs, batch, step, rng):
        def loss_fn(p):
            losses, new_stats = DET.forward_train(
                p, stats, batch, config, anchors, step, rng
            )
            if 'loss_clip_global' in losses:
                losses['loss_clip_global'] = (
                    losses['loss_clip_global'] / n_dev
                )
            total = sum(
                v for k, v in losses.items() if k.startswith('loss')
            )
            return total, (losses, new_stats)

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        lr = lr_at(step, base_lr, milestones, warmup_iters, warmup_ratio)
        params, bufs = sgd_update(
            params, grads, bufs, lr, lr_mults, momentum, weight_decay,
            trainable,
        )
        losses['total'] = total
        losses['lr'] = lr
        # all metrics stacked into ONE device buffer (sorted-key order):
        # the training loop logs from this vector with a single fetch
        # per log window — fetching each scalar individually costs a
        # full transport round trip on tunneled/remote backends
        # (measured ~28 ms EACH, i.e. seconds per 50-step window)
        losses['_vec'] = jnp.stack([
            v.astype(jnp.float32) for _, v in sorted(losses.items())
        ])
        return params, new_stats, bufs, losses

    return step_fn


@dataclasses.dataclass
class TrainState:
    params: Params
    stats: Params
    bufs: Params
    step: int
    # deterministic-resume extras (reference: mmdet's resume_from
    # restores the runner iteration + optimizer state so training
    # continues as if uninterrupted, configs/dp/base.py:11): the raw
    # RNG key data (jax.random.key_data) and the cumulative metric
    # window vector. None on fresh starts / legacy checkpoints.
    key_data: Any = None
    win: Any = None


class Trainer:
    """Iteration- or epoch-based training with log/ckpt/eval hooks."""

    def __init__(
        self,
        bundle: DetectorBundle,
        trainer_cfg: Config,
        train_loader,
        work_dir,
        evaluator=None,
        bf16: bool = False,
    ) -> None:
        self.bundle = bundle
        self.cfg = trainer_cfg
        self.loader = train_loader
        self.work_dir = work_dir
        self.evaluator = evaluator
        self.bf16 = bf16

        opt = trainer_cfg.get('optimizer', Config())
        self.base_lr = float(opt.get('lr', 0.02))
        self.momentum = float(opt.get('momentum', 0.9))
        self.weight_decay = float(opt.get('weight_decay', 2.5e-5))
        self.lr_rules = {
            k: float(v.get('lr_mult', 1.0))
            for k, v in opt.get('paramwise', {}).items()
        }
        lr_cfg = trainer_cfg.get('lr_config', Config())
        self.milestones = tuple(lr_cfg.get('step', ()))
        self.warmup_iters = int(lr_cfg.get('warmup_iters', 500))
        self.warmup_ratio = float(lr_cfg.get('warmup_ratio', 0.001))
        self.by_epoch = bool(lr_cfg.get('by_epoch', True))

        runner = trainer_cfg.get('runner', Config())
        self.epoch_based = runner.get('type', 'IterBasedRunner') == (
            'EpochBasedRunner'
        )
        self.max_iters = int(runner.get('max_iters', 0) or 0)
        self.max_epochs = int(runner.get('max_epochs', 0) or 0)

        self.log_interval = int(
            trainer_cfg.get('log_config', {}).get('interval', 50)
        )
        self.ckpt_interval = int(
            trainer_cfg.get('checkpoint_config', {}).get('interval', 2000)
        )
        self.ckpt_by_epoch = bool(
            trainer_cfg.get('checkpoint_config', {}).get('by_epoch', True)
        )
        # Under mmcv's EpochBasedRunner the EvalHook interval counts
        # EPOCHS (configs/dp/schedules/2x.py: interval=4 => every 4
        # epochs), under IterBasedRunner it counts iters.
        self.eval_interval = int(
            trainer_cfg.get('evaluation', {}).get('interval', 2000)
        )
        self.eval_by_epoch = bool(
            trainer_cfg.get('evaluation', {}).get(
                'by_epoch', self.epoch_based
            )
        )
        self.seed = int(trainer_cfg.get('seed', 3407))
        # optional jax.profiler window: profile=dict(start=i, stop=j,
        # dir='...') — the reference stack has no tracing (SURVEY.md §5)
        self.profile = trainer_cfg.get('profile')

        if jax.process_count() > 1:
            # multi-process (reference: torchrun DDP world,
            # oadp/dp/train.py:61-63): the mesh MUST span every device
            # of every process — collectives are inserted by XLA from
            # the sharding; n_devices would otherwise select the first
            # n GLOBAL device ids, which are not this process's
            devices = jax.devices()
        else:
            n_dev = int(
                trainer_cfg.get('n_devices', 0)
            ) or len(jax.devices())
            devices = jax.devices()[:n_dev]
        self.n_devices = len(devices)
        self.mesh = Mesh(np.asarray(devices), ('data',))
        self.repl = NamedSharding(self.mesh, PartitionSpec())
        self.shard = NamedSharding(self.mesh, PartitionSpec('data'))
        self._step_fn: dict[tuple, Callable] = {}
        # filled at trace time with the sorted metric-key order of the
        # packed vector (single element: list[str])
        self._loss_keys: list[list[str]] = []

    # -- jitted step --------------------------------------------------------

    def _milestone_iters(self, epoch_len: int) -> tuple:
        if self.by_epoch and self.epoch_based:
            return tuple(int(m) * epoch_len for m in self.milestones)
        return tuple(int(m) for m in self.milestones)

    def _make_step(
        self, canvas: tuple, epoch_len: int, pack_spec: tuple = (),
    ) -> Callable:
        config = self.bundle.config
        step_fn = build_train_step(
            config,
            canvas_anchors(config, canvas),
            _lr_mult_tree(self.bundle.params, self.lr_rules),
            trainable_mask_tree(self.bundle.params, config),
            base_lr=self.base_lr,
            milestones=self._milestone_iters(epoch_len),
            momentum=self.momentum,
            weight_decay=self.weight_decay,
            warmup_iters=self.warmup_iters,
            warmup_ratio=self.warmup_ratio,
            n_dev=self.n_devices,
        )
        act_dtype = jnp.bfloat16 if self.bf16 else jnp.float32
        shard = self.shard
        keys_box = self._loss_keys

        def stepped(carry, batch):
            # The full training state — params, momentum bufs, BN stats,
            # the step counter, the RNG key and the metric window
            # accumulator — lives ON DEVICE in one donated carry. The
            # host loop never touches a device scalar between steps: on
            # a tunneled/remote backend every eager op (random.split,
            # jnp.asarray(step), a metric add) is a serialized ~25 ms
            # round trip, which cost ~40 ms/step before this shape.
            # The key rides as RAW uint32 data: a typed PRNG key can't
            # device_put to a multi-process (non-addressable) sharding,
            # and raw data is also what the checkpoint stores.
            params, stats, bufs, step, key_data, win = carry
            key, sub = jax.random.split(
                jax.random.wrap_key_data(key_data)
            )
            key = jax.random.key_data(key)
            batch = {
                k: jax.lax.with_sharding_constraint(v, shard)
                for k, v in batch.items()
            }
            if pack_spec:  # one flat uint8 buffer -> field dict
                batch = datasets.unpack_batch(batch['packed'], pack_spec)
            # uint8 loader canvases -> normalized activations, fused
            # into the step (see models.detector.ingest_images)
            batch['images'] = DET.ingest_images(
                batch['images'], act_dtype
            )
            params, stats, bufs, losses = step_fn(
                params, stats, bufs, batch, step, sub
            )
            vec = losses.pop('_vec')
            if not keys_box:  # trace-time: record the metric order once
                keys_box.append(sorted(losses))
            assert vec.shape[0] <= _VEC_PAD, 'raise _VEC_PAD'
            vec = jnp.pad(vec, (0, _VEC_PAD - vec.shape[0]))
            # win accumulates CUMULATIVELY; the host fetches it once per
            # log window and differences against the previous fetch
            return params, stats, bufs, step + 1, key, win + vec

        return jax.jit(stepped, donate_argnums=(0,))

    def _device_batch(self, batch: dict) -> dict:
        # ASYNC per-key puts: each returns immediately and the transfer
        # overlaps the previous step's device compute. Passing the
        # numpy batch straight into the jitted call instead uploads
        # synchronously inside the dispatch (measured: 13 -> 11 img/s
        # on the tunneled chip); eager puts keep the device busy.
        # Multi-process: each process holds only ITS loader's rows of
        # the global batch (the loader shards batches by process), so
        # the global sharded array is assembled from process-local data.
        if jax.process_count() > 1:
            put = functools.partial(
                jax.make_array_from_process_local_data, self.shard
            )
        else:
            put = functools.partial(jax.device_put, device=self.shard)
        return {
            k: put(v)
            for k, v in batch.items()
            if k not in ('image_ids', 'scale_factor', '_pack_spec')
        }

    # -- loop ---------------------------------------------------------------

    def fit(self, resume_state: TrainState | None = None) -> TrainState:
        epoch_len = max(len(self.loader), 1)
        max_iters = (
            self.max_epochs * epoch_len if self.epoch_based
            else self.max_iters
        )
        state = resume_state or TrainState(
            params=self.bundle.params,
            stats=self.bundle.stats,
            bufs=sgd_init(self.bundle.params),
            step=0,
        )
        step = state.step
        # deterministic resume: continue the exact RNG stream and the
        # cumulative metric window from the checkpoint (fresh start:
        # seed-derived key, zero window). The carry holds the RAW key
        # data (see _make_step).
        key = (
            jnp.asarray(state.key_data)
            if state.key_data is not None
            else jax.random.key_data(jax.random.key(self.seed))
        )
        win0 = (
            jnp.asarray(state.win, jnp.float32)
            if state.win is not None
            else jnp.zeros(_VEC_PAD, jnp.float32)
        )
        if win0.shape != (_VEC_PAD,):
            # a checkpoint written under a different _VEC_PAD: keep the
            # leading entries (metric order is stable) and re-pad
            win0 = jnp.zeros(_VEC_PAD, jnp.float32).at[
                :min(win0.shape[0], _VEC_PAD)
            ].set(win0[:_VEC_PAD])
        # the WHOLE training state rides one donated device carry:
        # (params, stats, bufs, step, rng key, cumulative metric vec).
        # The host loop issues exactly ONE async dispatch per step (the
        # numpy batch rides it) and fetches one vector per log window —
        # on tunneled/remote backends every other eager op is a
        # serialized ~25 ms round trip (measured: this shape took the
        # real train CLI from ~13 to the modeled ~17 img/s).
        def repl_put(tree):
            return replicate_tree(tree, self.repl)

        carry = (
            repl_put(state.params),
            repl_put(state.stats),
            repl_put(state.bufs),
            jax.device_put(jnp.asarray(step, jnp.int32), self.repl),
            repl_put(key),
            repl_put(win0),
        )
        t0 = time.time()
        win_n = 0
        prev_cum = np.asarray(win0)
        epoch = step // epoch_len
        # re-enter the interrupted epoch at the checkpointed batch
        # position — the loader's order is a pure function of
        # (seed, epoch), so the remaining stream matches the
        # uninterrupted run's
        skip = step % epoch_len

        def sync_state():
            state.params, state.stats, state.bufs = carry[:3]
            state.step = step
            state.key_data = carry[4]  # already raw uint32 data
            state.win = carry[5]

        while step < max_iters:
            batches = (
                self.loader.epoch(epoch, start=skip) if skip
                else self.loader.epoch(epoch)
            )
            skip = 0
            for batch in batches:
                if step >= max_iters:
                    break
                canvas = datasets.batch_canvas(batch)
                step_key = (canvas, epoch_len)  # jit-cache key (NOT
                # the RNG `key` above, which lives in the carry)
                if step_key not in self._step_fn:
                    self._step_fn[step_key] = self._make_step(
                        canvas, epoch_len,
                        batch.get('_pack_spec', ()),
                    )
                if self.profile and step == int(self.profile['start']):
                    jax.profiler.start_trace(str(self.profile['dir']))
                carry = self._step_fn[step_key](
                    carry, self._device_batch(batch)
                )
                step += 1
                win_n += 1
                if self.profile and step == int(self.profile['stop']):
                    np.asarray(carry[5])  # drain the pipeline
                    jax.profiler.stop_trace()
                    logger.info('profiler trace written to %s',
                                self.profile['dir'])
                if step % self.log_interval == 0:
                    cum = np.asarray(carry[5])  # ONE fetch per window
                    keys = self._loss_keys[0]
                    avg = dict(zip(
                        keys, (cum - prev_cum)[:len(keys)] / win_n
                    ))
                    prev_cum = cum
                    b = batch.get(
                        'packed', batch.get('images')
                    ).shape[0]
                    ips = win_n * b / max(time.time() - t0, 1e-6)
                    logger.info(
                        'iter %d/%d lr %.2e total %.4f (%s) %.2f img/s',
                        step, max_iters, avg.pop('lr'),
                        avg.pop('total'),
                        ' '.join(
                            f'{k} {v:.4f}' for k, v in sorted(avg.items())
                        ),
                        ips,
                    )
                    win_n = 0
                    t0 = time.time()
                if not self.ckpt_by_epoch and step % self.ckpt_interval == 0:
                    sync_state()
                    self.save(state)
                if (
                    self.evaluator is not None
                    and not self.eval_by_epoch
                    and step % self.eval_interval == 0
                ):
                    sync_state()
                    metrics = self.evaluator.run(state.params, state.stats)
                    logger.info('eval @%d: %s', step, metrics)
            epoch += 1
            if self.ckpt_by_epoch and self.epoch_based:
                if epoch % max(self.ckpt_interval, 1) == 0:
                    sync_state()
                    self.save(state)
            if (
                self.evaluator is not None
                and self.eval_by_epoch
                and epoch % max(self.eval_interval, 1) == 0
            ):
                sync_state()
                metrics = self.evaluator.run(state.params, state.stats)
                logger.info('eval @epoch %d: %s', epoch, metrics)
        sync_state()
        self.save(state)
        return state

    # -- checkpointing -------------------------------------------------------

    def save(self, state: TrainState) -> None:
        import orbax.checkpoint as ocp
        path = (self.work_dir / f'ckpt_{state.step}').absolute()
        key_data = (
            np.asarray(state.key_data) if state.key_data is not None
            else np.asarray(
                jax.random.key_data(jax.random.key(self.seed))
            )
        )
        win = (
            np.asarray(state.win, np.float32) if state.win is not None
            else np.zeros(_VEC_PAD, np.float32)
        )
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                path,
                {
                    'params': state.params,
                    'stats': state.stats,
                    'bufs': state.bufs,
                    'step': np.asarray(state.step),
                    # deterministic resume: the RNG stream position and
                    # the cumulative metric window
                    'key': key_data,
                    'win': win,
                },
                force=True,
            )
        if jax.process_index() != 0:
            # orbax's save above is cooperative (all processes write
            # their shards); the sidecar meta/latest files are rank-0's
            return
        # Self-describing checkpoint meta (framework version + class
        # names), the reference's ``checkpoint_config.meta`` contract
        # (``oadp/dp/train.py:105-108`` embeds mmdet_version + CLASSES).
        # Written beside the orbax dir so its layout stays untouched.
        import json

        import oadp_tpu
        from ..base import Globals
        cats = getattr(Globals, 'categories', None)
        meta = {
            'oadp_tpu_version': oadp_tpu.__version__,
            'jax_version': jax.__version__,
            'step': int(state.step),
            'classes': list(cats.all_) if cats is not None else None,
        }
        path.with_name(f'{path.name}.meta.json').write_text(
            json.dumps(meta)
        )
        latest = self.work_dir / 'latest.txt'
        latest.write_text(str(path))
        logger.info('saved checkpoint %s', path)

    @staticmethod
    def restore(path, template: dict) -> dict:
        import orbax.checkpoint as ocp
        import pathlib
        path = pathlib.Path(path)
        if path.is_file():  # latest.txt pointer
            path = pathlib.Path(path.read_text().strip())
        with ocp.StandardCheckpointer() as ckptr:
            full = dict(template)
            if 'key' not in full:
                # current checkpoints carry the RNG stream + metric
                # window (deterministic resume); round-3-era ones don't
                full['key'] = np.zeros(
                    np.asarray(
                        jax.random.key_data(jax.random.key(0))
                    ).shape,
                    np.uint32,
                )
                full['win'] = np.zeros(_VEC_PAD, np.float32)
                try:
                    return ckptr.restore(path.absolute(), full)
                except ValueError as orig:
                    # Fall back ONLY for a checkpoint that genuinely
                    # lacks the extra leaves: the legacy-template
                    # restore below SUCCEEDS exactly then (a checkpoint
                    # that does carry key/win fails it with the inverse
                    # mismatch, and a corrupt/renamed tree fails both).
                    # Any other failure re-raises the original error —
                    # a silent fallback would restart the RNG stream
                    # and break deterministic resume with no trace.
                    # (Template SHAPE mismatches don't land here:
                    # orbax returns the stored array regardless of the
                    # template's shape, so e.g. a _VEC_PAD change still
                    # restores — fit() re-pads the window.)
                    try:
                        out = ckptr.restore(path.absolute(), template)
                    except ValueError:
                        raise orig from None
                    logger.warning(
                        'legacy checkpoint without RNG stream/metric '
                        'window (%s): resume will restart the RNG '
                        'stream — not bitwise-deterministic', path,
                    )
                    return out
            return ckptr.restore(path.absolute(), full)
