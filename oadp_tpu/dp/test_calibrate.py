"""Post-hoc ensemble calibration trial:
``python -m oadp_tpu.dp.test_calibrate <name> <config> <dump_root>
[--params '{...}']`` (reference ``oadp/dp/test_nni.py``).

Re-scores DUMP'd per-image logit records with 9 tunable scalars
(base/novel scaler+gamma for bbox & object heads, objectness gamma),
runs multiclass NMS, and evaluates ``COCO_{num_bases}_bbox_mAP_50`` —
the metric the reference reports to NNI (``:162-163``).

TPU redesign: records are padded to a static proposal count and the
rescore+NMS runs as one jitted function per batch; the search driver
(``tools/calibrate_sweep.py``) calls :func:`run_trial` repeatedly
without reloading records.
"""

__all__ = ['DEFAULT_PARAMS', 'rescore', 'run_trial', 'main']

import argparse
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Globals, coco, lvis
from ..utils import Config, DictAction, PthAccessLayer, logger
from .coco_eval import CocoEvaluator, ov_coco_summary
from .datasets import CocoDetDataset

# reference defaults reproduce lambda = (2/3, 1/3) (test_nni.py:179-189)
DEFAULT_PARAMS = dict(
    bbox_base_scaler=1.0,
    bbox_novel_scaler=1.0,
    bbox_base_gamma=2 / 3,
    bbox_novel_gamma=1 / 3,
    object_base_scaler=1.0,
    object_novel_scaler=1.0,
    object_base_gamma=1 / 3,
    object_novel_gamma=2 / 3,
    objectness_gamma=0.0,
)


def _classify(scores, base_scaler, novel_scaler, base_gamma, novel_gamma,
              num_bases, num_all):
    k = jnp.arange(scores.shape[-1])
    is_base = k < num_bases
    is_novel = (k >= num_bases) & (k < num_all)
    scaler = jnp.where(is_base, base_scaler,
                       jnp.where(is_novel, novel_scaler, 1.0))
    scores = scores * scaler
    scores = jax.nn.softmax(scores, axis=-1)
    gamma = jnp.where(is_base, base_gamma,
                      jnp.where(is_novel, novel_gamma, 1.0))
    return scores ** gamma


@functools.partial(
    jax.jit, static_argnames=('num_bases', 'num_all', 'max_per_img')
)
def rescore(
    bboxes,  # (B, N, 4)
    bbox_logits,  # (B, N, K+1)
    object_logits,  # (B, N, K+1)
    objectness,  # (B, N)
    valid,  # (B, N)
    params,  # (9,) float32 in DEFAULT_PARAMS key order
    num_bases: int,
    num_all: int,
    max_per_img: int = 300,
    score_thr: float = 0.0,
    iou_threshold: float = 0.5,
):
    from ..ops.nms import multiclass_nms

    (bb_s, bn_s, bb_g, bn_g, ob_s, on_s, ob_g, on_g, obj_g) = params

    def one(bx, bl, ol, on, ok):
        bbox_scores = _classify(
            bl.astype(jnp.float32), bb_s, bn_s, bb_g, bn_g,
            num_bases, num_all,
        )
        object_scores = _classify(
            ol.astype(jnp.float32), ob_s, on_s, ob_g, on_g,
            num_bases, num_all,
        )
        o = jnp.clip(on.astype(jnp.float32), 1e-12, None) ** obj_g
        ensemble = bbox_scores * object_scores * o[:, None]
        ensemble = jnp.where(ok[:, None], ensemble, 0.0)
        return multiclass_nms(
            bx.astype(jnp.float32), ensemble,
            score_thr=score_thr, iou_threshold=iou_threshold,
            max_per_img=max_per_img, num_classes=num_all,
        )

    return jax.vmap(one)(bboxes, bbox_logits, object_logits, objectness,
                         valid)


class CalibrationRunner:
    """Loads all DUMP records once; evaluates many parameter settings.

    Memory model: records are held as dense host arrays of
    ``m x max_proposals x (num_all + 1)`` fp32 — ~2.6 GB for the OV-COCO
    val split (4952 images, C=65), which is the ONLY dataset the
    reference ever sweeps (``oadp/dp/test_nni.py`` reports
    ``COCO_48_bbox_mAP_50``). OV-LVIS-scale dumps (~20k images, C=1203)
    would need ~100 GB, so :meth:`__init__` fails fast when the dense
    buffers would exceed ``memory_budget_gb`` (default 16, override via
    the kwarg or ``OADP_CALIBRATE_MEM_GB``) instead of OOM-killing the
    host mid-load; a sweep at that scale needs a streamed/sharded
    re-scorer, which the reference does not have either.
    """

    def __init__(
        self,
        config: Config,
        dump_root: str,
        batch_size: int = 32,
        max_proposals: int = 1000,
        memory_budget_gb: float | None = None,
    ) -> None:
        categories = {'coco': coco, 'lvis': lvis}[config.categories]
        Globals.categories = categories
        self.categories = categories
        val_cfg = config.validator.dataloader.dataset
        self.dataset = CocoDetDataset(
            val_cfg.ann_file, val_cfg.img_prefix, categories,
            test_mode=True,
        )
        self.batch_size = batch_size
        layer = PthAccessLayer(dump_root)
        keys = [
            f'{img["id"]:012d}' for img in self.dataset.images
            if f'{img["id"]:012d}' in layer
        ]
        if not keys:
            raise SystemExit(f'no DUMP records under {dump_root}')
        logger.info('loading %d DUMP records', len(keys))
        n = max_proposals
        k1 = categories.num_all + 1
        m = len(keys)
        if memory_budget_gb is None:
            import os
            memory_budget_gb = float(
                os.environ.get('OADP_CALIBRATE_MEM_GB', '16')
            )
        # bboxes(4) + 2 logit planes(k1 each) + objectness(1), fp32
        need_gb = m * n * (2 * k1 + 5) * 4 / 1e9
        if need_gb > memory_budget_gb:
            raise SystemExit(
                f'calibration would hold {need_gb:.1f} GB of dense '
                f'record arrays ({m} images x {n} proposals x '
                f'C+1={k1}) — over the {memory_budget_gb:.0f} GB budget.'
                ' The reference only ever sweeps OV-COCO val (~2.6 GB);'
                ' for larger dumps raise OADP_CALIBRATE_MEM_GB, pass a'
                ' smaller max_proposals, or sweep a record subset.'
            )
        self.image_ids = [int(k) for k in keys]
        self.bboxes = np.zeros((m, n, 4), np.float32)
        self.bbox_logits = np.full((m, n, k1), -1e4, np.float32)
        self.object_logits = np.full((m, n, k1), -1e4, np.float32)
        self.objectness = np.zeros((m, n), np.float32)
        self.valid = np.zeros((m, n), bool)
        for i, key in enumerate(keys):
            rec = layer[key]
            c = min(len(np.asarray(rec['bboxes'])), n)
            self.bboxes[i, :c] = np.asarray(rec['bboxes'], np.float32)[:c]
            self.bbox_logits[i, :c] = np.nan_to_num(
                np.asarray(rec['bbox_logits'], np.float32)[:c],
                neginf=-1e4,
            )
            self.object_logits[i, :c] = np.nan_to_num(
                np.asarray(rec['object_logits'], np.float32)[:c],
                neginf=-1e4,
            )
            self.objectness[i, :c] = np.asarray(
                rec['objectness'], np.float32
            ).reshape(-1)[:c]
            self.valid[i, :c] = True
        rcnn = config.get('model', Config()).get('test_cfg', Config())
        self.max_per_img = int(rcnn.get('max_per_img', 300))
        self.score_thr = float(rcnn.get('score_thr', 0.0))
        self.iou = float(rcnn.get('nms_iou', 0.5))

    def run_trial(self, params: dict[str, float]) -> dict[str, float]:
        p = jnp.asarray(
            [params[k] for k in DEFAULT_PARAMS], jnp.float32
        )
        detections = []
        m = len(self.image_ids)
        bs = self.batch_size
        for start in range(0, m, bs):
            stop = min(start + bs, m)
            sl = slice(start, stop)
            pad = bs - (stop - start)

            def pad_to(x):
                if pad:
                    return np.concatenate(
                        [x[sl], np.repeat(x[stop - 1:stop], pad, 0)]
                    )
                return x[sl]

            dets, labels, _rows, valid = rescore(
                pad_to(self.bboxes), pad_to(self.bbox_logits),
                pad_to(self.object_logits), pad_to(self.objectness),
                pad_to(self.valid), p,
                num_bases=self.categories.num_bases,
                num_all=self.categories.num_all,
                max_per_img=self.max_per_img,
                score_thr=self.score_thr,
                iou_threshold=self.iou,
            )
            dets = np.asarray(dets)
            labels = np.asarray(labels)
            valid = np.asarray(valid)
            for i in range(stop - start):
                img_id = self.image_ids[start + i]
                for j in np.nonzero(valid[i])[0]:
                    x0, y0, x1, y1 = dets[i, j, :4]
                    detections.append(dict(
                        image_id=img_id,
                        category_id=self.dataset.cat_ids[
                            int(labels[i, j])
                        ],
                        bbox=[float(x0), float(y0),
                              float(x1 - x0), float(y1 - y0)],
                        score=float(dets[i, j, 4]),
                    ))
        evaluator = CocoEvaluator(
            self.dataset.dataset, self.dataset.cat_ids,
            max_dets=(100, 300, 1000),
        )
        evaluator.evaluate(detections)
        return ov_coco_summary(
            evaluator, self.categories.num_bases,
            self.categories.num_novels,
        )


def run_trial(
    config: Config, dump_root: str, params: dict[str, float]
) -> dict[str, float]:
    return CalibrationRunner(config, dump_root).run_trial(params)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('name')
    parser.add_argument('config', type=Config.load)
    parser.add_argument('root')
    parser.add_argument('--params', type=str, default='')
    parser.add_argument('--override', action=DictAction, nargs='+')
    args = parser.parse_args(argv)
    config: Config = args.config
    if args.override:
        config.override(args.override)
    from ..utils import maybe_initialize_distributed
    maybe_initialize_distributed()  # reference: oadp/dp/test_nni.py:198-200

    params = dict(DEFAULT_PARAMS)
    try:  # optional NNI integration (reference uses nni trials)
        import nni
        nni_params = nni.get_next_parameter()
        if nni_params:
            params.update(nni_params)
    except ImportError:
        nni = None
    if args.params:
        params.update(json.loads(args.params))

    metrics = run_trial(config, args.root, params)
    key = f'COCO_{Globals.categories.num_bases}_bbox_mAP_50'
    result = float(metrics.get(key, -1.0))
    logger.info('trial %s: %s = %s', params, key, result)
    print(json.dumps({'metric': key, 'value': result, 'params': params}))
    if nni is not None:
        nni.report_final_result(result)


if __name__ == '__main__':
    main()
