"""Synthetic training fixtures for benchmarks and dry runs.

ONE copy of the detector's train-batch schema and the production
train-step recipe (loss sum + torch-SGD update, reference schedule
context ``configs/dp/schedules/40k.py``), shared by ``bench.py``,
``tools/profile_dp.py`` and ``__graft_entry__.dryrun_multichip`` so the
three can't drift from each other or from ``dp/trainer``.
"""

__all__ = ['make_embeddings', 'make_train_batch', 'make_train_step']

from typing import Any

import numpy as np


def make_embeddings(num_all: int, emb_dim: int, seed: int = 0) -> np.ndarray:
    """Row-normalized random classifier embeddings."""
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((num_all, emb_dim)).astype(np.float32)
    return emb / np.linalg.norm(emb, axis=-1, keepdims=True)


def make_train_batch(
    b: int,
    canvas: tuple,  # (H, W)
    num_bases: int,
    num_all: int,
    emb_dim: int,
    n_gt: int = 32,
    n_blocks: int = 64,
    n_objects: int = 256,
    n_gt_valid: int | None = None,
    seed: int = 0,
    images_dtype=np.float32,
) -> dict[str, Any]:
    """A full OADP training batch (images + GT + the three OAKE feature
    branches) with the exact key schema ``models.detector.forward_train``
    consumes."""
    rng = np.random.default_rng(seed)
    h, w = canvas
    lim = 0.7 * min(h, w)

    def boxes(n, lo, hi):
        xy = rng.uniform(0, lim, (b, n, 2))
        wh = rng.uniform(lo, min(hi, min(h, w) - lo), (b, n, 2))
        return np.concatenate([xy, xy + wh], -1).astype(np.float32)

    gt_valid = np.ones((b, n_gt), bool)
    if n_gt_valid is not None:
        gt_valid[:, n_gt_valid:] = False
    return {
        'images': rng.standard_normal(
            (b, h, w, 3)
        ).astype(np.float32).astype(images_dtype),
        'img_hw': np.asarray([[h, w]] * b, np.float32),
        'gt_boxes': boxes(n_gt, 16, 200),
        'gt_labels': rng.integers(0, num_bases, (b, n_gt)).astype(
            np.int32),
        'gt_valid': gt_valid,
        'clip_global': rng.standard_normal((b, emb_dim)).astype(
            np.float32),
        'block_boxes': boxes(n_blocks, 64, 300),
        'block_labels': rng.random((b, n_blocks, num_all)) > 0.9,
        'clip_blocks': rng.standard_normal(
            (b, n_blocks, emb_dim)).astype(np.float32),
        'block_valid': np.ones((b, n_blocks), bool),
        'object_boxes': boxes(n_objects, 16, 200),
        'clip_objects': rng.standard_normal(
            (b, n_objects, emb_dim)).astype(np.float32),
        'object_valid': np.ones((b, n_objects), bool),
    }


def make_train_step(
    config,
    anchors,
    lr_mults,
    trainable,
    base_lr: float = 0.02,
    milestones: tuple = (30000,),
    n_dev: int = 1,
):
    """The production train step: all losses + torch-SGD update.

    ``n_dev`` applies the trainer's ``loss_clip_global / n_dev`` DDP
    parity scaling (see ``dp/trainer``: the reference's summed global
    distill loss is effectively divided by the world size by DDP's
    mean all-reduce).
    """
    import jax

    from ..models import detector as DET
    from .trainer import lr_at, sgd_update

    def train_step(params, stats, bufs, batch, step, key):
        def loss_fn(p):
            losses, new_stats = DET.forward_train(
                p, stats, batch, config, anchors, step, key
            )
            if n_dev > 1 and 'loss_clip_global' in losses:
                losses['loss_clip_global'] = (
                    losses['loss_clip_global'] / n_dev
                )
            total = sum(
                v for k, v in losses.items() if k.startswith('loss')
            )
            return total, new_stats

        (total, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        lr = lr_at(step, base_lr, milestones)
        params, bufs = sgd_update(
            params, grads, bufs, lr, lr_mults, trainable=trainable
        )
        return params, new_stats, bufs, total

    return train_step
