"""Measure DP inference (``models.detector.simple_test``) throughput on
the real chip at the production eval geometry — the reproducible source
of PARITY.md's "DP inference" line.

The program is the full calibrated test path (backbone+FPN -> RPN
proposals -> RoIAlign -> bbox/object towers -> lambda-calibrated
ensemble -> blocked multiclass NMS), jitted exactly as
``dp/evaluator.DetEvaluator`` builds it (uint8 canvases ingested on
device). First-ever compile is ~14 min on a v5e; the persisted
compilation cache makes reruns seconds (see ``dp/evaluator._fn``).

Usage: ``python tools/measure_inference.py [batch]``
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def measure(
    b: int = 2, n: int = 10, windows: int = 3, lvis: bool = False
) -> dict:
    import jax
    import jax.numpy as jnp

    from oadp_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from oadp_tpu.dp.builder import canvas_anchors
    from oadp_tpu.dp.synthetic import make_embeddings
    from oadp_tpu.models import detector as DET
    canvas = (832, 1344)  # the landscape eval canvas (dp/evaluator.py)
    emb_dim = 512
    if lvis:
        # the OV-LVIS production eval workload (reference
        # configs/dp/oadp_ov_lvis.py): Mask R-CNN head, ViLD classifier
        # temps, C=1203 single-chunk class-parallel NMS
        config = DET.DetectorConfig.build(
            866, 1203, with_mask=True, backbone_style='caffe',
            head_cls_mode='vild',
            vild_scaler_train=0.01, vild_scaler_val=0.007,
            global_vild_scaler=(0.007, 0.01),
        )
        emb = make_embeddings(1203, emb_dim)
    else:
        config = DET.DetectorConfig.build(48, 65, backbone_style='caffe')
        emb = make_embeddings(65, emb_dim)
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        params, stats = DET.init_detector(
            jax.random.key(0), config, jnp.asarray(emb)
        )
    device = jax.local_devices()[0]
    params = jax.device_put(params, device)
    stats = jax.device_put(stats, device)
    anchors = canvas_anchors(config, canvas)

    rng = np.random.default_rng(0)
    batch = {
        'images': rng.integers(
            0, 256, (b, *canvas, 3), np.uint8
        ),
        'img_hw': np.asarray([[800.0, 1333.0]] * b, np.float32),
    }
    batch = jax.device_put(batch, device)

    def run(params, stats, batch):
        batch = dict(batch)
        batch['images'] = DET.ingest_images(batch['images'], jnp.bfloat16)
        out = DET.simple_test(
            params, stats, batch, config=config, level_anchors=anchors
        )
        # the evaluator's packed single-leaf fetch (dp/evaluator._fn):
        # one tunnel round trip per batch instead of one per leaf
        res = {'packed': jnp.concatenate([
            jnp.asarray(out['dets'], jnp.float32),
            jnp.asarray(out['labels'], jnp.float32)[..., None],
            jnp.asarray(out['valid'], jnp.float32)[..., None],
        ], -1)}
        if out.get('masks') is not None:  # LVIS: fp16 mask stream
            res['masks'] = out['masks'].astype(jnp.float16)
        return res

    fn = jax.jit(run)

    def sync(out):
        return jax.tree.map(np.asarray, out)

    t0 = time.perf_counter()
    sync(fn(params, stats, batch))  # compile
    compile_s = time.perf_counter() - t0
    # Warm UNTIMED half-window: one warm dispatch is not enough to
    # stabilize the first timed window (r4 BENCH runs opened 20% cold:
    # [34.7, 43.5, 43.4]; the r5 LVIS line opened [10.6, 13.9, 13.7]) —
    # the tunnel + device need a few back-to-back dispatches to ramp.
    pending = fn(params, stats, batch)
    for _ in range(max(2, n // 2 - 1)):
        nxt = fn(params, stats, batch)
        sync(pending)
        pending = nxt
    sync(pending)

    def timed_run() -> float:
        # dispatch-then-fetch-previous, one in flight (the evaluator's
        # production overlap shape)
        t0 = time.perf_counter()
        pending = fn(params, stats, batch)
        for _ in range(n - 1):
            nxt = fn(params, stats, batch)
            sync(pending)
            pending = nxt
        sync(pending)
        return n * b / (time.perf_counter() - t0)

    runs = [round(timed_run(), 3) for _ in range(windows)]
    name = 'dp_lvis_inference' if lvis else 'dp_inference'
    desc = ('C=1203 calibrated ensemble + single-chunk class-parallel NMS '
            '+ mask head' if lvis else
            'calibrated ensemble + class-parallel multiclass NMS')
    return {
        'metric': f'{name}_images_per_sec_per_chip',
        'value': max(runs),
        'unit': f'images/sec/chip (simple_test, batch {b}, '
                f'{canvas[0]}x{canvas[1]}, bf16, {desc})',
        'runs': runs,
        'compile_s': round(compile_s, 1),
    }


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    print(json.dumps(measure(b, lvis='--lvis' in sys.argv)), flush=True)


if __name__ == '__main__':
    main()
