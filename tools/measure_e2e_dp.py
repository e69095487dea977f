"""Measure the REAL DP train loop end-to-end on the chip.

``bench.py`` models the train step with a resident batch;  this tool
runs the actual ``oadp_tpu.dp.train`` CLI — threaded JPEG loader, OAKE
feature reads, two-canvas static batching, host->device transfer,
logging — on synthetic COCO-like data at the PRODUCTION config
(``configs/dp/oadp_ov_coco.py``: R50 OADP, batch 2, canvas 832x1344,
bf16) and reports measured img/s next to the modeled bench number
(replaces the mmdet runner loop, reference ``oadp/dp/train.py:110-118``).

Usage: python tools/measure_e2e_dp.py [iters] [workdir]
"""

import json
import os
import pathlib
import re
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    workdir = pathlib.Path(
        sys.argv[2] if len(sys.argv) > 2 else '/tmp/dp_e2e'
    )
    from oadp_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from tests.synthetic_data import make_synthetic_dp

    workdir.mkdir(parents=True, exist_ok=True)
    os.chdir(workdir)
    if not (workdir / 'coco').exists():
        make_synthetic_dp(workdir, embedding_dim=512)

    d = workdir / 'coco'
    log_every = int(os.environ.get('LOG_EVERY', '8'))
    overrides = [
        f'.trainer.dataloader.dataset.ann_file:'
        f'{str(d / "annotations/instances_val2017.json")!r}',
        f'.trainer.dataloader.dataset.img_prefix:'
        f'{str(d / "val2017")!r}',
        f'.trainer.dataloader.dataset.clip_features.globals_:'
        f'{str(d / "oake/globals/val2017")!r}',
        f'.trainer.dataloader.dataset.clip_features.blocks:'
        f'{str(d / "oake/blocks/val2017")!r}',
        f'.trainer.dataloader.dataset.clip_features.objects:'
        f'{str(d / "oake/objects/val2017")!r}',
        f'.model.prompts:{str(workdir / "prompts/vild.pth")!r}',
        f'.model.ml_prompts:{str(workdir / "prompts/ml.pth")!r}',
        f'.validator.dataloader.dataset.ann_file:'
        f'{str(d / "annotations/instances_val2017.json")!r}',
        f'.validator.dataloader.dataset.img_prefix:'
        f'{str(d / "val2017")!r}',
        '.trainer.load_from:None',
        f'.trainer.runner.max_iters:{iters}',
        f'.trainer.log_config.interval:{log_every}',
        '.trainer.checkpoint_config.interval:1000000',
        '.trainer.evaluation.interval:1000000',
    ]

    # capture the trainer's own img/s log lines
    rates: list[float] = []
    import logging

    class Capture(logging.Handler):
        def emit(self, record):
            m = re.search(r'([\d.]+) img/s', record.getMessage())
            if m:
                rates.append(float(m.group(1)))

    logging.getLogger('oadp_tpu').addHandler(Capture())

    from oadp_tpu.dp import train as train_cli
    t0 = time.time()
    train_cli.main([
        'e2e_dp', str(REPO / 'configs/dp/oadp_ov_coco.py'),
        '--override', *overrides,
    ])
    wall = time.time() - t0
    # steady state = the last log windows (first window pays compiles)
    steady = rates[1:] or rates
    print(json.dumps({
        'metric': 'dp_train_e2e_measured_images_per_sec_per_chip',
        'value': round(max(steady), 3) if steady else None,
        'windows': rates,
        'iters': iters,
        'wall_s': round(wall, 1),
        'unit': 'images/sec/chip, real dp.train CLI loop (loader + '
                'transfer + logging; batch 2, canvas 832x1344, bf16)',
    }), flush=True)


if __name__ == '__main__':
    main()
