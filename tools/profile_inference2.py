"""Differential profile: simple_test minus the final multiclass NMS,
and the NMS alone on the REAL in-program boxes/probs. Isolates where
the ~300 ms gap between the staged sum (46 ms) and the full program
(349 ms) lived (round 4: the serial blocked NMS degenerating on flat
score distributions — since replaced by the class-parallel form).

NOTE: ``prenms`` below re-derives simple_test's calibrated-ensemble
math inline because the differential method needs to STOP just before
the NMS — a jitted simple_test can't be sliced. It mirrors
``models/detector.py:simple_test`` as of round 4; if the ensemble
changes there, update this copy (the FULL-program line is always
authoritative).
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.profile_inference import setup, timeit, tsum  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from oadp_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from oadp_tpu.models import detector as DET
    from oadp_tpu.models import rpn as RPN
    from oadp_tpu.models.heads import convfc_forward
    from oadp_tpu.models.detector import _lambda, decode_deltas, clip_boxes
    from oadp_tpu.ops.nms import multiclass_nms

    b = 2
    canvas = (832, 1344)
    config, params, stats, anchors, images_u8, img_hw, device = setup(
        b, canvas
    )

    def prenms(p, s, u8, hw):
        images = DET.ingest_images(u8, jnp.bfloat16)
        pyramid, _ = DET._extract(p, s, images, config, False)
        scores, deltas = RPN.rpn_forward(p['rpn'], pyramid)
        proposals, prop_scores, prop_valid = RPN.rpn_proposals(
            scores, deltas, anchors, hw,
            nms_pre=config.rpn_test_nms_pre,
            max_per_img=config.rpn_test_max,
        )
        bb, n = proposals.shape[:2]
        roi_feats = DET._roi_feats(pyramid, proposals)
        flat = roi_feats.reshape(bb * n, *roi_feats.shape[2:])
        bbox_logits, reg, _, _ = convfc_forward(
            p['bbox_head'], s['bbox_head'], flat, config.bbox_head, False
        )
        object_logits, _, _, _ = convfc_forward(
            p['object_head'], s['object_head'], flat,
            config.object_head, False,
        )
        lam = jnp.asarray(_lambda(config))
        bs = jax.nn.softmax(bbox_logits.astype(jnp.float32), -1) ** lam
        os_ = jax.nn.softmax(
            object_logits.astype(jnp.float32), -1
        ) ** (1 - lam)
        cls_score = bs * os_
        cls_score = cls_score.at[:, -1].set(1 - cls_score[:, :-1].sum(-1))
        probs = cls_score / jnp.clip(
            cls_score.sum(-1, keepdims=True), 1e-12
        )
        probs = probs.reshape(bb, n, -1)
        boxes = decode_deltas(
            proposals.reshape(-1, 4), reg, stds=config.bbox_reg_stds
        ).reshape(bb, n, 4)
        boxes = jax.vmap(clip_boxes)(boxes, hw)
        return boxes, probs, prop_valid

    def f_prenms(p, s, u8, hw):
        return tsum(prenms(p, s, u8, hw))

    timeit('pre-NMS everything', f_prenms, params, stats, images_u8,
           img_hw)

    # fetch the REAL boxes/probs once, re-upload resident, time NMS alone
    boxes, probs, prop_valid = jax.jit(prenms)(
        params, stats, images_u8, img_hw
    )
    boxes, probs, prop_valid = jax.device_put(
        jax.tree.map(np.asarray, (boxes, probs, prop_valid)), device
    )

    def f_nms_real(bx, pr, pv):
        def one(bb_, pp_, vv_):
            pp_ = jnp.where(vv_[:, None], pp_, 0.0)
            return multiclass_nms(
                bb_, pp_, score_thr=config.rcnn_score_thr,
                iou_threshold=config.rcnn_nms_iou,
                max_per_img=config.rcnn_max_per_img,
                num_classes=config.num_all,
            )
        return tsum(jax.vmap(one)(bx, pr, pv))

    timeit('multiclass_nms on REAL data', f_nms_real, boxes, probs,
           prop_valid)

    def f_full(p, s, u8, hw):
        images = DET.ingest_images(u8, jnp.bfloat16)
        out = DET.simple_test(
            p, s, dict(images=images, img_hw=hw),
            config=config, level_anchors=anchors,
        )
        return tsum(out)

    timeit('FULL simple_test', f_full, params, stats, images_u8, img_hw)


if __name__ == '__main__':
    main()
