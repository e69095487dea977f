"""Calibration hyperparameter sweep (reference ``tools/nni_dp_test.py``).

The reference drives an NNI TPE experiment over 9 ensemble-calibration
scalars; NNI is not available in this environment, so the built-in
driver runs an in-process TPE (``oadp_tpu.utils.search.TpeSampler``,
matching NNI's tuner scheme) — or pure random search with
``--sampler random`` — over the same space (records are loaded once,
trials are jitted re-scores).

Usage:
    python tools/calibrate_sweep.py <config> <dump_root> \
        [--trials 100] [--seed 0] [--sampler tpe|random]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, '')

from oadp_tpu.base import Globals  # noqa: E402
from oadp_tpu.dp.test_calibrate import (  # noqa: E402
    DEFAULT_PARAMS,
    CalibrationRunner,
)
from oadp_tpu.utils import Config, logger  # noqa: E402
from oadp_tpu.utils.search import TpeSampler  # noqa: E402

# reference search space (tools/nni_dp_test.py:17-57)
SEARCH_SPACE = {
    'bbox_base_scaler': (0.2, 1.5),
    'bbox_novel_scaler': (0.2, 1.5),
    'bbox_base_gamma': (0.2, 0.8),
    'bbox_novel_gamma': (0.2, 0.8),
    'object_base_scaler': (0.2, 1.5),
    'object_novel_scaler': (0.2, 1.5),
    'object_base_gamma': (0.2, 0.8),
    'object_novel_gamma': (0.2, 0.8),
    'objectness_gamma': (0.0, 1.0),
}


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('config', type=Config.load)
    parser.add_argument('root')
    parser.add_argument('--trials', type=int, default=100)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--sampler', choices=('tpe', 'random'),
                        default='tpe')
    parser.add_argument('--output', default='work_dirs/calibration.json')
    args = parser.parse_args()

    runner = CalibrationRunner(args.config, args.root)
    key = f'COCO_{Globals.categories.num_bases}_bbox_mAP_50'
    rng = np.random.default_rng(args.seed)
    sampler = (
        TpeSampler(SEARCH_SPACE, seed=args.seed)
        if args.sampler == 'tpe' else None
    )

    best = (-1.0, dict(DEFAULT_PARAMS))
    history = []
    for i in range(args.trials):
        if i == 0:  # trial 0 = the reference defaults (lambda 2/3, 1/3)
            params = dict(DEFAULT_PARAMS)
        elif sampler is not None:
            params = sampler.ask()
        else:
            params = {
                k: float(rng.uniform(lo, hi))
                for k, (lo, hi) in SEARCH_SPACE.items()
            }
        metrics = runner.run_trial(params)
        value = float(metrics.get(key, -1.0))
        if sampler is not None:
            sampler.tell(params, value)
        history.append({'params': params, key: value})
        if value > best[0]:
            best = (value, params)
        logger.info('trial %d/%d: %s=%.4f (best %.4f)',
                    i + 1, args.trials, key, value, best[0])

    out = {'best_value': best[0], 'best_params': best[1],
           'metric': key, 'history': history}
    import pathlib
    pathlib.Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    pathlib.Path(args.output).write_text(json.dumps(out, indent=2))
    print(json.dumps({'metric': key, 'value': best[0],
                      'params': best[1]}))


if __name__ == '__main__':
    main()
