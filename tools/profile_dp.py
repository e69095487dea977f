"""Ablation profile of the DP train step on the real chip.

Times the step's stages separately (sum-reduced outputs; ~3 ms
dispatch overhead per call — see CLAUDE.md) to find where the
~145 ms/step goes.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from oadp_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from oadp_tpu.dp.builder import canvas_anchors
    from oadp_tpu.dp.synthetic import make_embeddings, make_train_batch
    from oadp_tpu.models import detector as DET
    from oadp_tpu.models import rpn as RPN

    b, canvas = 2, (832, 1344)
    emb_dim = 512
    config = DET.DetectorConfig.build(48, 65, backbone_style='caffe')
    emb = make_embeddings(65, emb_dim)
    with jax.default_device(jax.devices('cpu')[0]):
        params, stats = DET.init_detector(
            jax.random.key(0), config, jnp.asarray(emb)
        )
    device = jax.devices()[0]
    params = jax.device_put(params, device)
    stats = jax.device_put(stats, device)
    anchors = canvas_anchors(config, canvas)

    batch = make_train_batch(
        b, canvas, num_bases=48, num_all=65, emb_dim=emb_dim,
        images_dtype=jnp.bfloat16,
    )
    batch = {k2: jax.device_put(v, device) for k2, v in batch.items()}
    key = jax.random.key(0)

    def timeit(label, fn, *args, n=6):
        out = fn(*args)
        np.asarray(out)
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / n
        print(f'{label:42s} {dt * 1e3:9.2f} ms')
        return dt

    def tsum(tree):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(tree))

    # 1. backbone + FPN forward
    @jax.jit
    def f_extract(p, s):
        pyr, ns = DET._extract(p, s, batch['images'], config, True)
        return tsum(pyr)

    timeit('backbone+FPN fwd', f_extract, params, stats)

    # 2. + RPN head forward
    @jax.jit
    def f_rpn(p, s):
        pyr, ns = DET._extract(p, s, batch['images'], config, True)
        sc, dl = RPN.rpn_forward(p['rpn'], pyr)
        return tsum(pyr) + tsum(sc) + tsum(dl)

    timeit('+ RPN head fwd', f_rpn, params, stats)

    # 3. + rpn loss + proposals (assigner + NMS)
    @jax.jit
    def f_props(p, s):
        pyr, ns = DET._extract(p, s, batch['images'], config, True)
        anc = jnp.concatenate(anchors)
        sc, dl = RPN.rpn_forward(p['rpn'], pyr)
        losses = RPN.rpn_loss(
            key, sc, dl, anc, batch['gt_boxes'], batch['gt_valid'],
            batch['img_hw'], config.rpn_samples, config.rpn_pos_fraction,
        )
        props, _, pv = RPN.rpn_proposals(
            sc, dl, anchors, batch['img_hw'],
            nms_pre=config.rpn_train_nms_pre,
            max_per_img=config.rpn_train_max,
        )
        return tsum(losses) + jnp.sum(props) + tsum(pyr)

    timeit('+ RPN loss + proposals (NMS)', f_props, params, stats)

    # --- isolated RoI-stage timings on a RESIDENT pyramid -------------
    from oadp_tpu.models import heads as HEADS

    pyr_fn = jax.jit(
        lambda p, s: DET._extract(p, s, batch['images'], config, True)[0]
    )
    pyramid = pyr_fn(params, stats)
    np.asarray(pyramid[0][:1, :1, :1, :4])  # sync

    r = config.rcnn_samples
    o, kk = 256, 64  # production object/block roi padding (synthetic.py)
    n_rois = r + o + kk
    rng = np.random.default_rng(0)
    x0 = rng.uniform(0, 1200, (b, n_rois))
    y0 = rng.uniform(0, 700, (b, n_rois))
    w = rng.uniform(8, 400, (b, n_rois))
    rois = np.stack(
        [x0, y0, np.minimum(x0 + w, 1344), np.minimum(y0 + w, 832)], -1
    ).astype(np.float32)
    rois = jax.device_put(rois, device)

    @jax.jit
    def f_align(pyr, rr):
        return tsum(DET._roi_feats(pyr, rr))

    timeit(f'RoIAlign packed ({n_rois} rois/img)', f_align, pyramid, rois)

    @jax.jit
    def f_align_grad(pyr, rr):
        def loss_fn(py):
            return tsum(DET._roi_feats(py, rr))

        total, grads = jax.value_and_grad(loss_fn)(pyr)
        return total + tsum(grads)

    timeit('RoIAlign fwd+bwd (scatter into pyramid)', f_align_grad,
           pyramid, rois)

    packed = jax.jit(DET._roi_feats)(pyramid, rois)
    np.asarray(packed[:1, :1, :1, :1, :4])
    flat_bbox = jax.jit(
        lambda f: f[:, :r].reshape(b * r, *f.shape[2:])
    )(packed)
    flat_obj = jax.jit(
        lambda f: f[:, r:r + o].reshape(b * o, *f.shape[2:])
    )(packed)
    ones_bbox = jax.device_put(np.ones(b * r, bool), device)
    ones_obj = jax.device_put(np.ones(b * o, bool), device)

    @jax.jit
    def f_bbox_tower(p, s, f, m):
        lg, rg, pj, _ = HEADS.convfc_forward(
            p['bbox_head'], s['bbox_head'], f, config.bbox_head, True,
            valid=m,
        )
        out = tsum(lg) + tsum(pj)
        return out + (tsum(rg) if rg is not None else 0.0)

    timeit('bbox tower fwd (1024 rois)', f_bbox_tower,
           params, stats, flat_bbox, ones_bbox)

    @jax.jit
    def f_obj_tower(p, s, f, m):
        lg, rg, pj, _ = HEADS.convfc_forward(
            p['object_head'], s['object_head'], f, config.object_head,
            True, valid=m,
        )
        return tsum(lg) + tsum(pj)

    timeit('object tower fwd (512 rois)', f_obj_tower,
           params, stats, flat_obj, ones_obj)

    @jax.jit
    def f_bbox_tower_grad(p, s, f, m):
        def loss_fn(pp):
            lg, rg, pj, _ = HEADS.convfc_forward(
                pp['bbox_head'], s['bbox_head'], f, config.bbox_head,
                True, valid=m,
            )
            out = tsum(lg) + tsum(pj)
            return out + (tsum(rg) if rg is not None else 0.0)

        total, grads = jax.value_and_grad(loss_fn)(p)
        return total + tsum(grads['bbox_head'])

    timeit('bbox tower fwd+bwd (1024 rois)', f_bbox_tower_grad,
           params, stats, flat_bbox, ones_bbox)

    # RPN pieces on resident scores/deltas
    sd_fn = jax.jit(
        lambda p, pyr: RPN.rpn_forward(p['rpn'], pyr)
    )
    scores, deltas = sd_fn(params, pyramid)
    np.asarray(scores[0][:1, :1])
    anc_list = [jax.device_put(a, device) for a in anchors]
    anc_cat = jax.device_put(np.concatenate(anchors), device)

    @jax.jit
    def f_rpn_loss(sc, dl):
        return tsum(RPN.rpn_loss(
            key, list(sc), list(dl), anc_cat,
            batch['gt_boxes'], batch['gt_valid'], batch['img_hw'],
            config.rpn_samples, config.rpn_pos_fraction,
        ))

    timeit('rpn_loss alone', f_rpn_loss, scores, deltas)

    @jax.jit
    def f_rpn_loss_grad(sc, dl):
        def loss_fn(args):
            sc2, dl2 = args
            return tsum(RPN.rpn_loss(
                key, list(sc2), list(dl2), anc_cat,
                batch['gt_boxes'], batch['gt_valid'], batch['img_hw'],
                config.rpn_samples, config.rpn_pos_fraction,
            ))

        total, grads = jax.value_and_grad(loss_fn)((scores, deltas))
        return total + tsum(grads)

    timeit('rpn_loss fwd+bwd', f_rpn_loss_grad, scores, deltas)

    @jax.jit
    def f_rpn_props(sc, dl):
        props, _, pv = RPN.rpn_proposals(
            list(sc), list(dl), anc_list, batch['img_hw'],
            nms_pre=config.rpn_train_nms_pre,
            max_per_img=config.rpn_train_max,
        )
        return jnp.sum(props) + jnp.sum(pv)

    timeit('rpn_proposals alone (train NMS)', f_rpn_props, scores, deltas)

    # 4. full forward_train (losses only)
    @jax.jit
    def f_full(p, s):
        losses, ns = DET.forward_train(
            p, s, batch, config, anchors, jnp.asarray(500), key
        )
        return tsum(losses)

    timeit('full forward_train', f_full, params, stats)

    # 5. value_and_grad of the full loss
    @jax.jit
    def f_grad(p, s):
        def loss_fn(pp):
            losses, ns = DET.forward_train(
                pp, s, batch, config, anchors, jnp.asarray(500), key
            )
            return sum(v for k2, v in losses.items()
                       if k2.startswith('loss')), ns

        (total, ns), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p)
        return total + tsum(grads)

    timeit('fwd+bwd (value_and_grad)', f_grad, params, stats)

    # 6. backbone-only fwd+bwd (conv ceiling)
    @jax.jit
    def f_bb_grad(p, s):
        def loss_fn(pp):
            pyr, ns = DET._extract(pp, s, batch['images'], config, True)
            return tsum(pyr)

        total, grads = jax.value_and_grad(loss_fn)(p)
        return total + tsum(grads)

    timeit('backbone+FPN fwd+bwd', f_bb_grad, params, stats)


if __name__ == '__main__':
    main()
