"""DP test CLI: ``python -m oadp_tpu.dp.test <config> <checkpoint>
[--override .k:v ...]`` (reference ``oadp/dp/test.py``).

Runs sharded inference over the validator dataset and prints the
OV-COCO triple summary. With ``DUMP=<dir>`` set, writes per-image raw
logit records instead (consumed by the post-hoc calibration sweep,
reference ``oadp/dp/test_nni.py``).
"""

__all__ = ['main', 'parse_args']

import argparse
import pathlib

import jax

from ..base import Globals, coco, lvis
from ..utils import Config, DictAction, Store, logger
from .builder import build_detector
from .datasets import CocoDetDataset
from .evaluator import DetEvaluator
from .trainer import Trainer, sgd_init


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('config', type=Config.load)
    parser.add_argument('checkpoint', type=str)
    parser.add_argument('--override', action=DictAction, nargs='+')
    return parser.parse_args(argv)


def main(argv=None) -> dict:
    args = parse_args(argv)
    config: Config = args.config
    if args.override:
        config.override(args.override)
    if Store.DRY_RUN:
        config.validator.dataloader['samples_per_gpu'] = 1

    from ..utils import enable_compilation_cache, maybe_initialize_distributed
    maybe_initialize_distributed()  # reference NCCL init: oadp/dp/test.py:50-52
    enable_compilation_cache()
    Globals.categories = {'coco': coco, 'lvis': lvis}[config.categories]
    bundle = build_detector(config.model, Globals.categories)
    if args.checkpoint and args.checkpoint != 'none':
        template = {
            'params': bundle.params,
            'stats': bundle.stats,
            'bufs': sgd_init(bundle.params),
            'step': 0,
        }
        restored = Trainer.restore(args.checkpoint, template)
        bundle.params = restored['params']
        bundle.stats = restored['stats']
        logger.info('loaded checkpoint %s', args.checkpoint)

    # Multi-host eval needs a gather root every rank shares: without a
    # checkpoint (work_dir None) and without DUMP, DetEvaluator._gather
    # would fall through to per-host /tmp, stranding non-rank-0 parts
    # until the 600 s timeout. Fail fast with the fix instead.
    if (
        jax.process_count() > 1
        and (not args.checkpoint or args.checkpoint == 'none')
        and not Store.DUMP
    ):
        raise SystemExit(
            'multi-process dp.test without a checkpoint has no shared '
            'gather root: pass a checkpoint path on a filesystem all '
            'ranks share (its directory becomes the exchange root, as '
            'dp.train\'s work_dirs/<name> is), or set DUMP=<shared dir>'
        )

    val_cfg = config.validator.dataloader.dataset
    dataset = CocoDetDataset(
        val_cfg.ann_file, val_cfg.img_prefix, Globals.categories,
        test_mode=True,
    )
    batch_cfg = config.validator.dataloader.get('batch', Config())
    evaluator = DetEvaluator(
        dataset,
        bundle.config,
        Globals.categories,
        batch_size=int(config.validator.dataloader.get(
            'samples_per_gpu', 1
        )) * (int(config.get('trainer', Config()).get('n_devices', 0))
              or jax.local_device_count()),
        canvas=tuple(batch_cfg.get('canvas', (832, 1344))),
        scale=tuple(batch_cfg.get('scale', (1333, 800))),
        eval_type='lvis' if config.categories == 'lvis' else 'ov_coco',
        bf16=bool(config.get('validator', Config()).get('bf16', False)),
        n_devices=(
            int(config.get('trainer', Config()).get('n_devices', 0))
            or jax.local_device_count()
        ),
        # multi-host gather root: the checkpoint's directory is the one
        # path every rank demonstrably shares (they all just read the
        # checkpoint from it)
        work_dir=(
            pathlib.Path(args.checkpoint).parent
            if args.checkpoint and args.checkpoint != 'none' else None
        ),
    )
    metrics = evaluator.run(bundle.params, bundle.stats)
    if jax.process_index() == 0:
        for k, v in sorted(metrics.items()):
            logger.info('%s: %s', k, v)
    return metrics


if __name__ == '__main__':
    main()
