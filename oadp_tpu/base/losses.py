"""Loss functions for the DP stage (jnp, mask-aware).

Reimplements the reference's loss zoo:

* :func:`asymmetric_loss` — ASL multi-label focal loss
  (``oadp/base/losses.py:11-65``; gamma_neg=4, gamma_pos=0/1, clip .05,
  forced fp32);
* :func:`rkd_loss` — relational KD, MSE between Gram matrices
  (``oadp/base/losses.py:68-108``);
* :func:`l1_loss` / :func:`mse_loss` — todd L1/MSELoss equivalents with
  row-mask support (the reference concatenates variable-length tensors;
  here padded rows are masked);
* :func:`warmup_weight` — todd ``WarmupScheduler``: linear 0 → gain
  over ``end`` steps (``configs/dp/models/*.py`` loss weights);
* :func:`binary_cross_entropy` / :func:`softmax_cross_entropy` — mmdet
  ``CrossEntropyLoss`` with ``use_sigmoid`` True/False;
* :func:`multilabel_topk_recall` — sklearn-macro-recall equivalent
  in-graph (``oadp/dp/utils.py:13-44``).

Every loss keeps fp32 accumulation regardless of activation dtype.
"""

__all__ = [
    'asymmetric_loss',
    'rkd_loss',
    'l1_loss',
    'mse_loss',
    'warmup_weight',
    'binary_cross_entropy',
    'softmax_cross_entropy',
    'smooth_l1_loss',
    'multilabel_topk_recall',
]

import jax
import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    if mask is None:
        return x.mean()
    mask = jnp.broadcast_to(
        mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)), x.shape
    ).astype(x.dtype)
    return (x * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def asymmetric_loss(
    probs: jnp.ndarray,  # (N, K) probabilities (already sigmoided)
    targets: jnp.ndarray,  # (N, K) bool
    mask: jnp.ndarray | None = None,  # (N,) valid rows
    gamma_neg: float = 4.0,
    gamma_pos: float = 0.0,
    clip: float = 0.05,
    eps: float = 1e-8,
) -> jnp.ndarray:
    x = probs.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    comp_x = 1.0 - x
    if clip > 0:
        comp_x = jnp.clip(comp_x + clip, None, 1.0)
    loss = y * jnp.log(jnp.clip(x, eps, None)) + (1 - y) * jnp.log(
        jnp.clip(comp_x, eps, None)
    )
    if gamma_neg > 0 or gamma_pos > 0:
        pt = jax.lax.stop_gradient(x * y + comp_x * (1 - y))
        gamma = gamma_pos * y + gamma_neg * (1 - y)
        loss = loss * jax.lax.stop_gradient((1 - pt) ** gamma)
    return _masked_mean(-loss, mask)


def rkd_loss(
    preds: jnp.ndarray,  # (N, C)
    targets: jnp.ndarray,  # (N, D)
    mask: jnp.ndarray | None = None,  # (N,)
) -> jnp.ndarray:
    """MSE between Gram matrices; padded rows contribute zero and the
    mean is over valid pairs."""
    p = preds.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)[:, None]
        p = p * m
        t = t * m
    pr = p @ p.T
    tr = t @ t.T
    sq = jnp.square(pr - tr)
    if mask is None:
        return sq.mean()
    m = mask.astype(jnp.float32)
    pair = m[:, None] * m[None, :]
    return (sq * pair).sum() / jnp.maximum(pair.sum(), 1.0)


def l1_loss(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    return _masked_mean(
        jnp.abs(preds.astype(jnp.float32) - targets.astype(jnp.float32)),
        mask,
    )


def mse_loss(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    reduction: str = 'mean',
) -> jnp.ndarray:
    sq = jnp.square(preds.astype(jnp.float32) - targets.astype(jnp.float32))
    if reduction == 'sum':
        if mask is not None:
            sq = sq * mask.reshape(
                mask.shape + (1,) * (sq.ndim - mask.ndim)
            ).astype(sq.dtype)
        return sq.sum()
    return _masked_mean(sq, mask)


def warmup_weight(step: jnp.ndarray, gain: float, end: int) -> jnp.ndarray:
    """todd ``WarmupScheduler``: ``gain * min(step / end, 1)``."""
    return gain * jnp.clip(step.astype(jnp.float32) / end, None, 1.0)


def binary_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,  # same shape, float 0/1
    weights: jnp.ndarray | None = None,
    avg_factor: jnp.ndarray | float | None = None,
) -> jnp.ndarray:
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    loss = jnp.clip(x, 0, None) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if weights is not None:
        loss = loss * weights.astype(jnp.float32)
    total = loss.sum()
    if avg_factor is None:
        return total / loss.size
    return total / jnp.maximum(avg_factor, 1.0)


def softmax_cross_entropy(
    logits: jnp.ndarray,  # (N, K)
    labels: jnp.ndarray,  # (N,) int
    weights: jnp.ndarray | None = None,  # (N,)
    avg_factor: jnp.ndarray | float | None = None,
) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weights is not None:
        loss = loss * weights.astype(jnp.float32)
    total = loss.sum()
    if avg_factor is None:
        return total / loss.size
    return total / jnp.maximum(avg_factor, 1.0)


def smooth_l1_loss(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    beta: float = 1.0,
    weights: jnp.ndarray | None = None,
    avg_factor: jnp.ndarray | float | None = None,
) -> jnp.ndarray:
    diff = jnp.abs(preds.astype(jnp.float32) - targets.astype(jnp.float32))
    loss = jnp.where(
        diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta
    )
    if weights is not None:
        loss = loss * weights.astype(jnp.float32)
    total = loss.sum()
    if avg_factor is None:
        return total / loss.size
    return total / jnp.maximum(avg_factor, 1.0)


def multilabel_topk_recall(
    logits: jnp.ndarray,  # (N, K)
    targets: jnp.ndarray,  # (N, K) bool
    k: int,
    mask: jnp.ndarray | None = None,  # (N,)
) -> jnp.ndarray:
    """Macro recall over classes with >= 1 positive, x100 (matches
    sklearn ``recall_score(average='macro')`` as used at reference
    ``oadp/dp/utils.py:13-44``). Metric only — not differentiated."""
    y = targets.astype(bool)
    if mask is not None:
        y = y & mask[:, None]
        logits = jnp.where(mask[:, None], logits, -jnp.inf)
    k = min(k, logits.shape[-1])
    thresh = jax.lax.top_k(logits, k)[0][:, -1:]
    preds = logits >= thresh
    tp = (preds & y).sum(0).astype(jnp.float32)
    pos = y.sum(0).astype(jnp.float32)
    present = pos > 0
    recall = jnp.where(present, tp / jnp.maximum(pos, 1.0), 0.0)
    n_present = jnp.maximum(present.sum(), 1)
    return recall.sum() / n_present * 100.0
