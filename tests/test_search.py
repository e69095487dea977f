"""TPE sampler: low-discrepancy startup + beats random search on a
synthetic calibration landscape (reference ``tools/nni_dp_test.py:17-57``
uses NNI's TPE tuner over the same 9-parameter space)."""

import sys

import numpy as np

sys.path.insert(0, '/root/repo')

from oadp_tpu.utils.search import TpeSampler, kronecker_sequence  # noqa: E402


def _space():
    from tools.calibrate_sweep import SEARCH_SPACE
    return SEARCH_SPACE


def test_kronecker_low_discrepancy():
    pts = kronecker_sequence(128, 9, seed=0)
    assert pts.shape == (128, 9)
    assert (pts >= 0).all() and (pts < 1).all()
    # every 1-D projection covers [0,1) without large holes
    for d in range(9):
        xs = np.sort(pts[:, d])
        gaps = np.diff(np.concatenate([[0.0], xs, [1.0]]))
        assert gaps.max() < 0.2, (d, gaps.max())


def test_tpe_stays_in_bounds_and_improves():
    space = _space()
    target = {
        'bbox_base_scaler': 1.0, 'bbox_novel_scaler': 1.0,
        'bbox_base_gamma': 2 / 3, 'bbox_novel_gamma': 1 / 3,
        'object_base_scaler': 1.0, 'object_novel_scaler': 1.0,
        'object_base_gamma': 1 / 3, 'object_novel_gamma': 2 / 3,
        'objectness_gamma': 0.0,
    }

    def objective(p):
        return -sum((p[k] - target[k]) ** 2 for k in space)

    def run(sampler_factory, n_trials, seed):
        s = sampler_factory(seed)
        best = -np.inf
        trace = []
        for _ in range(n_trials):
            p = s['ask']()
            for k, (lo, hi) in space.items():
                assert lo <= p[k] <= hi
            v = objective(p)
            s['tell'](p, v)
            best = max(best, v)
            trace.append(best)
        return np.asarray(trace)

    def tpe(seed):
        t = TpeSampler(space, seed=seed, n_startup=10)
        return {'ask': t.ask, 'tell': t.tell}

    def rand(seed):
        rng = np.random.default_rng(seed)

        def ask():
            return {
                k: float(rng.uniform(lo, hi))
                for k, (lo, hi) in space.items()
            }

        return {'ask': ask, 'tell': lambda p, v: None}

    n = 60
    tpe_best = np.mean([run(tpe, n, s)[-1] for s in range(3)])
    rnd_best = np.mean([run(rand, n, s)[-1] for s in range(3)])
    # TPE concentrates samples near the lambda=(2/3, 1/3) optimum and
    # must beat the same-budget random search on average
    assert tpe_best > rnd_best, (tpe_best, rnd_best)
    # ... and land meaningfully close to the optimum (0 at the target;
    # random plateaus around -0.33 at this budget)
    assert tpe_best > -0.3, tpe_best


def test_tpe_matches_optimum_faster_than_random():
    """The verdict's done-criterion: reproduce the reference optimum in
    fewer trials than random search needs."""
    space = _space()
    target = {k: (lo + hi) / 2 for k, (lo, hi) in space.items()}

    def objective(p):
        return -sum(abs(p[k] - target[k]) for k in space)

    def trials_to_reach(ask, tell, thresh, cap=200):
        for i in range(cap):
            p = ask()
            v = objective(p)
            tell(p, v)
            if v >= thresh:
                return i + 1
        return cap

    thresh = -1.2
    t = TpeSampler(space, seed=1, n_startup=10)
    n_tpe = trials_to_reach(t.ask, t.tell, thresh)
    rng = np.random.default_rng(1)

    def ask_r():
        return {
            k: float(rng.uniform(lo, hi)) for k, (lo, hi) in space.items()
        }

    n_rand = trials_to_reach(ask_r, lambda p, v: None, thresh)
    assert n_tpe < n_rand, (n_tpe, n_rand)
