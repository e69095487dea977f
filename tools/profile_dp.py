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
