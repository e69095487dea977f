"""DP training CLI: ``python -m oadp_tpu.dp.train <name> <config>
[--override .k:v ...]`` (reference ``oadp/dp/train.py``).

Reference semantics preserved: work dir ``work_dirs/{name}`` (DRY_RUN →
``work_dirs/dry_run/{name}``), resolved-config dump, categories from the
config string, ``TRAIN_WITH_VAL_DATASET`` dataset substitution, DRY_RUN
interval shrinking (log 1 / ckpt 6 / eval 3, batch 1 —
``oadp/dp/train.py:34-56``), seed 3407.
"""

__all__ = ['main', 'parse_args']

import argparse
import pathlib

import jax

from ..base import Globals, coco, lvis
from ..utils import Config, DictAction, Store, add_file_handler, logger
from .builder import build_detector
from .datasets import (
    BatchBuilder,
    ClassBalancedWrapper,
    CocoDetDataset,
    LoadClipFeatures,
    Loader,
    TrainTransform,
)
from .evaluator import DetEvaluator
from .trainer import Trainer


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('name', type=str)
    parser.add_argument('config', type=Config.load)
    parser.add_argument('--override', action=DictAction, nargs='+')
    return parser.parse_args(argv)


def _n_devices(config: Config) -> int:
    return int(
        config.trainer.get('n_devices', 0)
    ) or jax.local_device_count()


def build_train_loader(config: Config, categories, model_cfg) -> Loader:
    ds_cfg = config.trainer.dataloader.dataset
    if Store.TRAIN_WITH_VAL_DATASET:
        val_ds = config.validator.dataloader.dataset
        ds_cfg = ds_cfg.copy()
        ds_cfg.update(
            ann_file=val_ds.ann_file, img_prefix=val_ds.img_prefix
        )
        if 'clip_features' in ds_cfg:
            # the OAKE stores must follow the dataset swap (reference
            # oadp/dp/datasets.py:152-155: task_name train -> val)
            ds_cfg.clip_features = {
                k: v.replace('train', 'val') if isinstance(v, str) else v
                for k, v in ds_cfg.clip_features.items()
            }
    clip = None
    if 'clip_features' in ds_cfg:
        clip = LoadClipFeatures(**ds_cfg.clip_features)
    with_mask = bool(model_cfg.get('with_mask', False))
    dataset = CocoDetDataset(
        ds_cfg.ann_file,
        ds_cfg.img_prefix,
        categories,
        clip_features=clip,
        with_mask=with_mask,
    )
    if ds_cfg.get('oversample_thr'):
        dataset = ClassBalancedWrapper(
            dataset, float(ds_cfg.oversample_thr)
        )
    batch_cfg = config.trainer.dataloader.get('batch', Config())
    builder = BatchBuilder(
        canvas=tuple(batch_cfg.get('canvas', (832, 1344))),
        max_gts=batch_cfg.get('max_gts', 100),
        max_blocks=batch_cfg.get('max_blocks', 128),
        max_objects=batch_cfg.get('max_objects', 512),
        embedding_dim=model_cfg.get('sizes', {}).get('embedding_dim', 512),
        num_all=categories.num_all,
        with_clip=clip is not None,
        with_mask=with_mask,
        max_polygon_parts=batch_cfg.get('max_polygon_parts', 8),
        max_polygon_verts=batch_cfg.get('max_polygon_verts', 96),
        # production loaders ship ONE uint8 buffer per batch (packed on
        # the worker thread; see datasets.pack_batch)
        pack=bool(batch_cfg.get('pack', True)),
    )
    samples_per_device = int(
        config.trainer.dataloader.get('samples_per_gpu', 2)
    )
    return Loader(
        dataset,
        builder,
        samples_per_device * _n_devices(config),
        TrainTransform(
            scales=tuple(
                tuple(s) for s in batch_cfg.get(
                    'scales', ((1330, 640), (1333, 800))
                )
            ),
            seed=config.trainer.get('seed', 3407) + jax.process_index(),
        ),
        shuffle=True,
        seed=config.trainer.get('seed', 3407),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )


def build_evaluator(
    config: Config, categories, bundle, bf16: bool, work_dir=None,
):
    val_cfg = config.validator.dataloader.dataset
    dataset = CocoDetDataset(
        val_cfg.ann_file, val_cfg.img_prefix, categories, test_mode=True
    )
    batch_cfg = config.validator.dataloader.get('batch', Config())
    return DetEvaluator(
        dataset,
        bundle.config,
        categories,
        batch_size=int(config.validator.dataloader.get(
            'samples_per_gpu', 1
        )) * _n_devices(config),
        canvas=tuple(batch_cfg.get('canvas', (832, 1344))),
        scale=tuple(batch_cfg.get('scale', (1333, 800))),
        eval_type='lvis' if config.categories == 'lvis' else 'ov_coco',
        bf16=bf16,
        n_devices=_n_devices(config),
        work_dir=work_dir,
    )


def main(argv=None) -> None:
    # BEFORE any jax API (even process_index initializes the backend,
    # after which distributed init is impossible) — reference NCCL
    # init sits at the top of its main too (oadp/dp/train.py:61-63)
    from ..utils import maybe_initialize_distributed
    maybe_initialize_distributed()

    args = parse_args(argv)
    config: Config = args.config
    if args.override:
        config.override(args.override)

    name = pathlib.Path(args.name)
    if Store.DRY_RUN:
        name = pathlib.Path('dry_run') / name
        config.trainer.setdefault('log_config', Config())['interval'] = 1
        config.trainer.setdefault('checkpoint_config', Config())[
            'interval'
        ] = 6
        config.trainer.setdefault('evaluation', Config())['interval'] = 3
        config.trainer.dataloader['samples_per_gpu'] = 1
        config.validator.dataloader['samples_per_gpu'] = 1
    work_dir = pathlib.Path('work_dirs') / name
    work_dir.mkdir(parents=True, exist_ok=True)
    # multi-process: all ranks share work_dir — the resolved-config dump
    # is rank 0's; each rank logs to its own file (rank 0 keeps the
    # reference's train.log name)
    if jax.process_index() == 0:
        config.dump(work_dir / 'config.py')
        add_file_handler(work_dir / 'train.log')
    else:
        add_file_handler(
            work_dir / f'train.rank{jax.process_index()}.log'
        )

    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    Globals.categories = {'coco': coco, 'lvis': lvis}[config.categories]
    # env-info dump, the reference's collect_env log (oadp/dp/train.py:82-84)
    import oadp_tpu
    logger.info(
        'env: oadp_tpu %s, jax %s, backend %s, %d process(es)',
        oadp_tpu.__version__, jax.__version__, jax.default_backend(),
        jax.process_count(),
    )
    logger.info('devices: %s', jax.devices())

    bundle = build_detector(
        config.model, Globals.categories,
        seed=config.trainer.get('seed', 3407),
    )
    if config.trainer.get('load_from'):
        bundle.load_pretrained(config.trainer.load_from)

    loader = build_train_loader(config, Globals.categories, config.model)
    bf16 = bool(config.trainer.get('bf16', Store.TPU))
    evaluator = build_evaluator(
        config, Globals.categories, bundle, bf16, work_dir=work_dir,
    )
    trainer = Trainer(
        bundle, config.trainer, loader, work_dir,
        evaluator=evaluator, bf16=bf16,
    )

    resume = None
    if config.trainer.get('resume_from'):
        from .trainer import TrainState, sgd_init
        template = {
            'params': bundle.params,
            'stats': bundle.stats,
            'bufs': sgd_init(bundle.params),
            'step': 0,
        }
        restored = Trainer.restore(config.trainer.resume_from, template)
        resume = TrainState(
            params=restored['params'],
            stats=restored['stats'],
            bufs=restored['bufs'],
            step=int(restored['step']),
            key_data=restored.get('key'),
            win=restored.get('win'),
        )
        logger.info('resumed from %s @ step %d',
                    config.trainer.resume_from, resume.step)

    trainer.fit(resume)


if __name__ == '__main__':
    main()
