"""Stage profile of DP inference (``models.detector.simple_test``) on
the real chip: backbone+FPN, RPN forward, RPN proposals (NMS), RoIAlign,
towers, multiclass NMS, and the full program. Sum-reduced outputs (the
tunnel poisons timings on big fetches — CLAUDE.md); resident inputs.

Usage: ``python tools/profile_inference.py [batch]``
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def tsum(tree):
    """Sum-reduce every numeric leaf to ONE scalar — fetching real
    outputs over the tunnel poisons timings (CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    return sum(
        jnp.sum(x.astype(jnp.float32))
        for x in jax.tree.leaves(tree)
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.number)
    )


def timeit(label, fn, *args, n=6):
    import jax

    f = jax.jit(fn)
    np.asarray(f(*args))  # compile
    np.asarray(f(*args))  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f'{label:34s} {dt:8.2f} ms/batch', flush=True)
    return dt


def setup(b: int, canvas=(832, 1344)):
    """Shared scaffold: detector params/stats on device (init on CPU —
    per-op dispatch through the tunnel is ~1 s), anchors, resident
    synthetic inputs. Used by profile_inference2.py too."""
    import jax
    import jax.numpy as jnp

    from oadp_tpu.dp.builder import canvas_anchors
    from oadp_tpu.dp.synthetic import make_embeddings
    from oadp_tpu.models import detector as DET

    config = DET.DetectorConfig.build(48, 65, backbone_style='caffe')
    emb = make_embeddings(65, 512)
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        params, stats = DET.init_detector(
            jax.random.key(0), config, jnp.asarray(emb)
        )
    device = jax.local_devices()[0]
    params = jax.device_put(params, device)
    stats = jax.device_put(stats, device)
    anchors = canvas_anchors(config, canvas)
    rng = np.random.default_rng(0)
    images_u8 = rng.integers(0, 256, (b, *canvas, 3), np.uint8)
    img_hw = np.asarray([[800.0, 1333.0]] * b, np.float32)
    images_u8, img_hw = jax.device_put((images_u8, img_hw), device)
    return config, params, stats, anchors, images_u8, img_hw, device


def main() -> None:
    import jax
    import jax.numpy as jnp

    from oadp_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from oadp_tpu.models import detector as DET
    from oadp_tpu.models import rpn as RPN
    from oadp_tpu.models.heads import convfc_forward
    from oadp_tpu.ops.nms import multiclass_nms
    from oadp_tpu.ops.roi_align import roi_align_fpn

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    canvas = (832, 1344)
    config, params, stats, anchors, images_u8, img_hw, device = setup(
        b, canvas
    )
    rng = np.random.default_rng(0)

    def f_ingest(u8):
        return tsum(DET.ingest_images(u8, jnp.bfloat16))

    def f_extract(p, s, u8):
        images = DET.ingest_images(u8, jnp.bfloat16)
        pyr, _ = DET._extract(p, s, images, config, False)
        return tsum(pyr)

    def f_rpnfwd(p, s, u8):
        images = DET.ingest_images(u8, jnp.bfloat16)
        pyr, _ = DET._extract(p, s, images, config, False)
        return tsum(RPN.rpn_forward(p['rpn'], pyr))

    def f_props(p, s, u8, hw):
        images = DET.ingest_images(u8, jnp.bfloat16)
        pyr, _ = DET._extract(p, s, images, config, False)
        scores, deltas = RPN.rpn_forward(p['rpn'], pyr)
        return tsum(RPN.rpn_proposals(
            scores, deltas, anchors, hw,
            nms_pre=config.rpn_test_nms_pre,
            max_per_img=config.rpn_test_max,
        ))

    def f_roi(p, s, u8, hw):
        images = DET.ingest_images(u8, jnp.bfloat16)
        pyr, _ = DET._extract(p, s, images, config, False)
        scores, deltas = RPN.rpn_forward(p['rpn'], pyr)
        proposals, _, _ = RPN.rpn_proposals(
            scores, deltas, anchors, hw,
            nms_pre=config.rpn_test_nms_pre,
            max_per_img=config.rpn_test_max,
        )
        return tsum(DET._roi_feats(pyr, proposals))

    def f_towers(p, s, u8, hw):
        images = DET.ingest_images(u8, jnp.bfloat16)
        pyr, _ = DET._extract(p, s, images, config, False)
        scores, deltas = RPN.rpn_forward(p['rpn'], pyr)
        proposals, _, _ = RPN.rpn_proposals(
            scores, deltas, anchors, hw,
            nms_pre=config.rpn_test_nms_pre,
            max_per_img=config.rpn_test_max,
        )
        rf = DET._roi_feats(pyr, proposals)
        bn = rf.shape[0] * rf.shape[1]
        flat = rf.reshape(bn, *rf.shape[2:])
        bl, reg, _, _ = convfc_forward(
            p['bbox_head'], s['bbox_head'], flat, config.bbox_head, False
        )
        ol, _, _, _ = convfc_forward(
            p['object_head'], s['object_head'], flat,
            config.object_head, False,
        )
        return tsum((bl, reg, ol))

    def f_full(p, s, u8, hw):
        images = DET.ingest_images(u8, jnp.bfloat16)
        out = DET.simple_test(
            p, s, dict(images=images, img_hw=hw),
            config=config, level_anchors=anchors,
        )
        return tsum(out)

    # isolated multiclass NMS at the production candidate geometry
    n = config.rpn_test_max
    boxes1 = jnp.asarray(
        np.concatenate([
            rng.uniform(0, 700, (b, n, 2)),
            rng.uniform(60, 800, (b, n, 2)),
        ], -1).astype(np.float32)
    )
    boxes1 = boxes1.at[..., 2:].set(
        boxes1[..., :2] + jnp.abs(boxes1[..., 2:] - boxes1[..., :2]) + 1
    )
    probs1 = jax.nn.softmax(
        jnp.asarray(rng.normal(0, 2, (b, n, 66)).astype(np.float32)), -1
    )
    boxes1, probs1 = jax.device_put((boxes1, probs1), device)

    def f_mnms(bx, pr):
        def one(bb, pp):
            return multiclass_nms(
                bb, pp, score_thr=config.rcnn_score_thr,
                iou_threshold=config.rcnn_nms_iou,
                max_per_img=config.rcnn_max_per_img,
                num_classes=config.num_all,
            )
        return tsum(jax.vmap(one)(bx, pr))

    timeit('ingest', f_ingest, images_u8)
    timeit('ingest+extract(backbone+FPN)', f_extract, params, stats,
           images_u8)
    timeit('+rpn_forward', f_rpnfwd, params, stats, images_u8)
    timeit('+rpn_proposals(NMS)', f_props, params, stats, images_u8,
           img_hw)
    timeit('+roi_align(1000)', f_roi, params, stats, images_u8, img_hw)
    timeit('+towers(bbox+object)', f_towers, params, stats, images_u8,
           img_hw)
    timeit('multiclass_nms alone (synth)', f_mnms, boxes1, probs1)
    timeit('FULL simple_test', f_full, params, stats, images_u8, img_hw)


if __name__ == '__main__':
    main()
