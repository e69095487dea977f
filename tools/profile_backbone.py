"""Itemize the backbone+FPN step and A/B the eval-BN fold.

The DP profiler shows backbone+FPN fwd = 12.4 ms / fwd+bwd = 37.3 ms
(batch 2, 832x1344, bf16) — ~34 TF/s against the conv FLOP count, well
under the 167 TF/s GEMM rate. Candidate overheads: the 53 eval-mode
BN affine passes (if XLA does not fuse them into the conv epilogue),
and the C_in=3 stem conv (padded to 8 lanes).

norm_eval BN is exactly a per-channel affine of the conv output, so it
can be folded into the conv weights INSIDE jit:
    w' = w * (gamma * rsqrt(var+eps)),  b' = beta - mean * gamma * inv
Gradients wrt gamma/beta flow through the fold unchanged (autodiff),
so the fold is valid for training too (layers 2-4 affine is trainable,
reference ``configs/dp/models/faster_rcnn_r50_fpn.py:9-10``).
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

    from oadp_tpu.models import detector as DET
    from oadp_tpu.models import resnet as RN
    from oadp_tpu.models.layers import BN_EPS, conv, max_pool
    from oadp_tpu.dp.synthetic import make_embeddings, make_train_batch

    b, canvas = 2, (832, 1344)
    config = DET.DetectorConfig.build(48, 65, backbone_style='caffe')
    emb = make_embeddings(65, 512)
    with jax.default_device(jax.devices('cpu')[0]):
        params, stats = DET.init_detector(
            jax.random.key(0), config, jnp.asarray(emb)
        )
    device = jax.devices()[0]
    params = jax.device_put(params, device)
    stats = jax.device_put(stats, device)
    batch = make_train_batch(
        b, canvas, num_bases=48, num_all=65, emb_dim=512,
        images_dtype=jnp.bfloat16,
    )
    images = jax.device_put(batch['images'], device)

    def timeit(label, fn, *args, n=6):
        out = fn(*args)
        np.asarray(out)
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / n
        print(f'{label:46s} {dt * 1e3:9.2f} ms')
        return dt

    def tsum(tree):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(tree))

    bb_cfg = config.backbone

    # --- current forms --------------------------------------------------
    @jax.jit
    def f_resnet(p, s):
        outs, _ = RN.resnet_forward(p['backbone'], s['backbone'],
                                    images, bb_cfg, True)
        return tsum(outs)

    timeit('resnet fwd (current, eval BN passes)', f_resnet, params, stats)

    @jax.jit
    def f_resnet_grad(p, s):
        def loss_fn(pp):
            outs, _ = RN.resnet_forward(pp['backbone'], s['backbone'],
                                        images, bb_cfg, True)
            return tsum(outs)

        total, grads = jax.value_and_grad(loss_fn)(p)
        return total + tsum(grads['backbone'])

    timeit('resnet fwd+bwd (current)', f_resnet_grad, params, stats)

    # --- folded form ----------------------------------------------------
    def fold(cp, bp, bs):
        """conv params + eval-BN params/stats -> folded conv params."""
        inv = jax.lax.rsqrt(bs['var'] + BN_EPS) * bp['scale']
        w = cp['w'] * inv.astype(cp['w'].dtype)
        bias = bp['bias'] - bs['mean'] * inv
        return w, bias

    def conv_bn(x, cp, bp, bs, stride=1, padding='SAME'):
        w, bias = fold(cp, bp, bs)
        out = conv(x, {'w': w}, stride=stride, padding=padding)
        return out + bias.astype(out.dtype)

    def bottleneck_folded(x, p, s, stride, style):
        s1, s2 = (stride, 1) if style == 'caffe' else (1, stride)
        out = jax.nn.relu(conv_bn(x, p['conv1'], p['bn1'], s['bn1'],
                                  stride=s1, padding=0))
        out = jax.nn.relu(conv_bn(out, p['conv2'], p['bn2'], s['bn2'],
                                  stride=s2, padding=1))
        out = conv_bn(out, p['conv3'], p['bn3'], s['bn3'], padding=0)
        if 'downsample' in p:
            identity = conv_bn(
                x, {'w': p['downsample']['conv']['w']},
                p['downsample']['bn'], s['downsample']['bn'],
                stride=stride, padding=0,
            )
        else:
            identity = x
        return jax.nn.relu(out + identity)

    def resnet_folded(p, s):
        stem_p = jax.tree.map(jax.lax.stop_gradient, p['stem'])
        x = conv_bn(images, stem_p['conv'], stem_p['bn'],
                    s['stem']['bn'], stride=2, padding=3)
        x = jax.nn.relu(x)
        x = max_pool(x, 3, 2, 1)
        outs = []
        for i in range(4):
            name = f'layer{i + 1}'
            stage_p = p[name]
            if bb_cfg.frozen_stages >= i + 1:
                stage_p = jax.tree.map(jax.lax.stop_gradient, stage_p)
            stride = 1 if i == 0 else 2
            for bi, (bp, bs) in enumerate(zip(stage_p, s[name])):
                x = bottleneck_folded(
                    x, bp, bs, stride if bi == 0 else 1, bb_cfg.style
                )
            outs.append(x)
        return outs

    @jax.jit
    def f_folded(p, s):
        return tsum(resnet_folded(p['backbone'], s['backbone']))

    timeit('resnet fwd (BN folded into conv)', f_folded, params, stats)

    @jax.jit
    def f_folded_grad(p, s):
        def loss_fn(pp):
            return tsum(resnet_folded(pp['backbone'], s['backbone']))

        total, grads = jax.value_and_grad(loss_fn)(p)
        return total + tsum(grads['backbone'])

    timeit('resnet fwd+bwd (BN folded)', f_folded_grad, params, stats)

    # --- itemization ----------------------------------------------------
    @jax.jit
    def f_stem(p, s):
        bp = p['backbone']['stem']
        x = conv(images, bp['conv'], stride=2, padding=3)
        return jnp.sum(x.astype(jnp.float32))

    timeit('stem conv alone (C_in=3, 7x7 s2)', f_stem, params, stats)

    feats_fn = jax.jit(lambda p, s: RN.resnet_forward(
        p['backbone'], s['backbone'], images, bb_cfg, True)[0])
    feats = feats_fn(params, stats)
    np.asarray(feats[0][:1, :1, :1, :4])

    from oadp_tpu.models import fpn as FPN

    @jax.jit
    def f_fpn(p, s, ff):
        outs, _ = FPN.fpn_forward(p['fpn'], s['fpn'], list(ff), train=True)
        return tsum(outs)

    timeit('FPN alone fwd (resident C2-C5)', f_fpn, params, stats, feats)

    @jax.jit
    def f_fpn_grad(p, s, ff):
        def loss_fn(pp):
            outs, _ = FPN.fpn_forward(
                pp['fpn'], s['fpn'], list(ff), train=True
            )
            return tsum(outs)

        total, grads = jax.value_and_grad(loss_fn)(p)
        return total + tsum(grads['fpn'])

    timeit('FPN alone fwd+bwd', f_fpn_grad, params, stats, feats)


if __name__ == '__main__':
    main()
