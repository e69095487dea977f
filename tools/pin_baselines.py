"""Pin the measured reference host-prep baselines.

``bench.py``'s ``vs_baseline`` denominators are MEASURED ceilings of the
reference's host-side preprocessing (it publishes no throughput numbers,
SURVEY.md §6). Re-measuring them inline every bench run made the ratio
drift with host load (observed 0.61-0.82 img/s across rounds for the
objects ceiling — ±35%), so the comparison is PINNED: this tool runs the
measurement N times, records every trial, and stores the median as the
constant ``bench.py`` divides by. The inline re-measure is still
reported alongside (``baseline_inline``) so drift stays auditable.

Methodology per trial (see ``tools/measure_reference_hostprep.py``):
each trial is itself a best-of-5 (fastest pass = the most conservative
ceiling, i.e. the benchmark-friendliest host phase); the pin is the
median across trials, so one anomalous phase cannot move it.

Run on an OTHERWISE IDLE host: ``python tools/pin_baselines.py
[--trials 9]``. Writes ``tools/pinned_baselines.json``.
"""

import argparse
import json
import pathlib
import statistics
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

OUT = pathlib.Path(__file__).parent / 'pinned_baselines.json'


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--trials', type=int, default=9)
    parser.add_argument('--crops', type=int, default=256)
    args = parser.parse_args()

    from tools.measure_reference_hostprep import (
        measure_blocks_ms_per_image,
        measure_ms_per_crop,
    )

    obj_trials, blk_trials = [], []
    for t in range(args.trials):
        ms, items = measure_ms_per_crop(args.crops, itemize=True)
        obj_trials.append(
            {'ms_per_crop': round(ms, 4), 'items': items}
        )
        blk_trials.append(round(measure_blocks_ms_per_image(), 3))
        print(
            f'trial {t + 1}/{args.trials}: objects {ms:.3f} ms/crop, '
            f'blocks {blk_trials[-1]:.1f} ms/img',
            flush=True,
        )

    session = {
        'trials': args.trials,
        'objects_ms_per_crop_median': round(
            statistics.median(t['ms_per_crop'] for t in obj_trials), 4
        ),
        'blocks_ms_per_image_median': round(
            statistics.median(blk_trials), 3
        ),
        'objects_trials': obj_trials,
        'blocks_trials': blk_trials,
    }
    # accumulate sessions; the PIN is the most conservative (fastest
    # host = highest reference ceiling) session median ever recorded,
    # so the comparison can never be flattered by a slow host phase
    sessions = []
    if OUT.exists():
        sessions = json.loads(OUT.read_text()).get('sessions', [])
    sessions.append(session)
    obj_ms = min(s['objects_ms_per_crop_median'] for s in sessions)
    blk_ms = min(s['blocks_ms_per_image_median'] for s in sessions)
    pinned = {
        'methodology': (
            'per session: median over N idle-host trials, each trial '
            'a best-of-5 (fastest pass) timing of the exact reference '
            'worker ops (tools/measure_reference_hostprep.py); the pin '
            'is the FASTEST session median across all recorded '
            'sessions — i.e. the most conservative ceiling, immune to '
            'slow host phases'
        ),
        'objects': {
            'ms_per_crop': obj_ms,
            # ceiling = workers / (ms_per_crop * crops_per_image)
            'ceiling_img_per_sec_per_gpu': round(
                2.0 / (obj_ms / 1000.0 * 1024), 4
            ),
            'workers': 2,
            'crops_per_image': 1024,
        },
        'blocks': {
            'ms_per_image': blk_ms,
            'ceiling_img_per_sec_per_gpu': round(
                2.0 / (blk_ms / 1000.0), 4
            ),
            'workers': 2,
        },
        'sessions': sessions,
    }
    OUT.write_text(json.dumps(pinned, indent=1))
    print(json.dumps({
        'objects_ceiling': pinned['objects'][
            'ceiling_img_per_sec_per_gpu'
        ],
        'blocks_ceiling': pinned['blocks'][
            'ceiling_img_per_sec_per_gpu'
        ],
        'written': str(OUT),
    }))


if __name__ == '__main__':
    main()
