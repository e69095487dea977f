"""Direct oracle tests for the DP loss zoo (VERDICT r4 item 2).

Every function in ``oadp_tpu/base/losses.py`` is checked against an
INDEPENDENT transcription of the reference formula:

* ``asymmetric_loss``  vs a torch transcription of reference
  ``oadp/base/losses.py:29-65`` (asymmetric clip ``(1-x+0.05).clamp(1)``,
  *detached* one-sided focal weights, gamma_neg=4 / gamma_pos=0 as the
  production configs set them) — values AND gradients;
* ``rkd_loss``          vs a torch Gram-matrix MSE
  (``oadp/base/losses.py:68-108``);
* ``multilabel_topk_recall`` vs real ``sklearn.metrics.recall_score``
  macro recall over top-k scatter predictions
  (``oadp/dp/utils.py:13-44``);
* ``warmup_weight``     vs todd ``WarmupScheduler`` semantics (linear
  0 -> gain over ``end`` steps, then flat);
* ``l1/mse/bce/softmax-ce/smooth-l1`` vs torch.nn.functional with
  mmdet's ``weight``/``avg_factor`` reduction semantics.

Masked variants are pinned two ways: mask==all-ones must equal the
unmasked oracle, and a partial mask must equal the oracle run on the
valid-row subset (the padded-row contract the detector relies on).
"""

import numpy as np
import pytest
import sklearn.metrics
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from oadp_tpu.base import losses as L


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# Oracles (independent transcriptions — torch/numpy/sklearn, no jax)
# ---------------------------------------------------------------------------


def torch_asymmetric_loss(x, y, gamma_neg=4.0, gamma_pos=0.0, clip=0.05,
                          eps=1e-8):
    """Reference oadp/base/losses.py:29-65 transcribed to plain torch."""
    y = y.float()
    comp_x = 1 - x
    if clip > 0:
        comp_x = (comp_x + clip).clamp(max=1)
    loss = y * torch.log(x.clamp(min=eps)) \
        + (1 - y) * torch.log(comp_x.clamp(min=eps))
    if gamma_neg > 0 or gamma_pos > 0:
        with torch.no_grad():  # the reference detaches the focal weight
            pt = x * y + comp_x * (1 - y)
            gamma = gamma_pos * y + gamma_neg * (1 - y)
            w = torch.pow(1 - pt, gamma)
        loss = loss * w
    return (-loss).mean()


def torch_rkd_loss(p, t):
    """Reference oadp/base/losses.py:68-108: MSE between Gram matrices."""
    pr = torch.einsum('mc,nc->mn', p, p)
    tr = torch.einsum('mc,nc->mn', t, t)
    return F.mse_loss(pr, tr)


def sklearn_topk_recall(logits, targets, k):
    """Reference oadp/dp/utils.py:13-44: top-k scatter -> sklearn macro
    recall over labels present at least once, x100."""
    idx = np.argsort(-logits, axis=1, kind='stable')[:, :k]
    preds = np.zeros_like(targets, dtype=np.int64)
    np.put_along_axis(preds, idx, 1, axis=1)
    labels = np.where(targets.sum(0) > 0)[0]
    return sklearn.metrics.recall_score(
        targets.astype(np.int64), preds, labels=labels,
        average='macro', zero_division=0,
    ) * 100.0


# ---------------------------------------------------------------------------
# asymmetric_loss
# ---------------------------------------------------------------------------


@pytest.mark.parametrize('gamma_neg,gamma_pos,clip', [
    (4.0, 0.0, 0.05),   # production (configs/dp/models/{block,global_}.py)
    (4.0, 1.0, 0.05),   # reference class defaults
    (0.0, 0.0, 0.05),   # plain clipped BCE branch
    (4.0, 0.0, 0.0),    # no asymmetric clipping
])
def test_asymmetric_loss_value_matches_torch(gamma_neg, gamma_pos, clip):
    rng = _rng(1)
    # spread probabilities across the interesting ranges, incl. inside
    # the clip region (<0.05) and near 1 where log(comp_x) clamps
    x = rng.uniform(1e-4, 1 - 1e-4, (32, 65)).astype(np.float32)
    y = rng.random((32, 65)) < 0.1
    got = L.asymmetric_loss(
        jnp.asarray(x), jnp.asarray(y),
        gamma_neg=gamma_neg, gamma_pos=gamma_pos, clip=clip,
    )
    want = torch_asymmetric_loss(
        torch.from_numpy(x), torch.from_numpy(y),
        gamma_neg=gamma_neg, gamma_pos=gamma_pos, clip=clip,
    )
    np.testing.assert_allclose(
        float(got), float(want), rtol=1e-5, atol=1e-6
    )


def test_asymmetric_loss_gradient_matches_torch():
    """Gradient through the DETACHED focal weight: d/dx must treat the
    one-sided weight as a constant (reference wraps it in no_grad)."""
    rng = _rng(2)
    x = rng.uniform(0.01, 0.99, (16, 20)).astype(np.float32)
    y = rng.random((16, 20)) < 0.15

    g_jax = jax.grad(
        lambda p: L.asymmetric_loss(p, jnp.asarray(y),
                                    gamma_neg=4.0, gamma_pos=0.0)
    )(jnp.asarray(x))

    xt = torch.from_numpy(x).requires_grad_(True)
    torch_asymmetric_loss(xt, torch.from_numpy(y),
                          gamma_neg=4.0, gamma_pos=0.0).backward()
    np.testing.assert_allclose(
        np.asarray(g_jax), xt.grad.numpy(), rtol=1e-4, atol=1e-6
    )


def test_asymmetric_loss_gradient_differs_if_not_detached():
    """Control: an UNdetached focal weight yields a different gradient on
    the same inputs — i.e. the detach test above has teeth."""
    rng = _rng(3)
    x = rng.uniform(0.1, 0.9, (8, 12)).astype(np.float32)
    y = rng.random((8, 12)) < 0.3

    g_detached = jax.grad(
        lambda p: L.asymmetric_loss(p, jnp.asarray(y), gamma_neg=4.0)
    )(jnp.asarray(x))

    xt = torch.from_numpy(x).requires_grad_(True)
    # same formula WITHOUT no_grad around the weight
    comp_x = (1 - xt + 0.05).clamp(max=1)
    yt = torch.from_numpy(y).float()
    loss = yt * torch.log(xt.clamp(min=1e-8)) \
        + (1 - yt) * torch.log(comp_x.clamp(min=1e-8))
    pt = xt * yt + comp_x * (1 - yt)
    w = torch.pow(1 - pt, 4.0 * (1 - yt))
    (-(loss * w)).mean().backward()
    assert not np.allclose(
        np.asarray(g_detached), xt.grad.numpy(), rtol=1e-3, atol=1e-5
    )


def test_asymmetric_loss_mask_semantics():
    rng = _rng(4)
    x = rng.uniform(1e-3, 1 - 1e-3, (24, 17)).astype(np.float32)
    y = rng.random((24, 17)) < 0.2
    mask = rng.random(24) < 0.6
    assert mask.any() and not mask.all()

    # all-ones mask == unmasked oracle
    full = L.asymmetric_loss(jnp.asarray(x), jnp.asarray(y),
                             jnp.ones(24, bool))
    np.testing.assert_allclose(
        float(full),
        float(torch_asymmetric_loss(torch.from_numpy(x),
                                    torch.from_numpy(y))),
        rtol=1e-5, atol=1e-6,
    )
    # partial mask == oracle on the valid-row subset
    got = L.asymmetric_loss(jnp.asarray(x), jnp.asarray(y),
                            jnp.asarray(mask))
    want = torch_asymmetric_loss(torch.from_numpy(x[mask]),
                                 torch.from_numpy(y[mask]))
    np.testing.assert_allclose(float(got), float(want),
                               rtol=1e-5, atol=1e-6)
    # padded-row values must not influence the loss at all
    x2 = x.copy()
    x2[~mask] = rng.uniform(1e-3, 1 - 1e-3, ((~mask).sum(), 17))
    got2 = L.asymmetric_loss(jnp.asarray(x2), jnp.asarray(y),
                             jnp.asarray(mask))
    np.testing.assert_allclose(float(got2), float(got), rtol=1e-6)


# ---------------------------------------------------------------------------
# rkd_loss
# ---------------------------------------------------------------------------


def test_rkd_loss_matches_torch():
    rng = _rng(5)
    p = rng.standard_normal((40, 256)).astype(np.float32)
    t = rng.standard_normal((40, 512)).astype(np.float32)
    got = L.rkd_loss(jnp.asarray(p), jnp.asarray(t))
    want = torch_rkd_loss(torch.from_numpy(p), torch.from_numpy(t))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_rkd_loss_mask_equals_subset_oracle():
    rng = _rng(6)
    p = rng.standard_normal((32, 64)).astype(np.float32)
    t = rng.standard_normal((32, 96)).astype(np.float32)
    mask = rng.random(32) < 0.5
    assert 2 <= mask.sum() < 32
    got = L.rkd_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(mask))
    want = torch_rkd_loss(torch.from_numpy(p[mask]),
                          torch.from_numpy(t[mask]))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)
    # all-ones mask == unmasked
    full = L.rkd_loss(jnp.asarray(p), jnp.asarray(t),
                      jnp.ones(32, bool))
    np.testing.assert_allclose(
        float(full), float(L.rkd_loss(jnp.asarray(p), jnp.asarray(t))),
        rtol=1e-6,
    )


def test_rkd_loss_gradient_matches_torch():
    rng = _rng(7)
    p = rng.standard_normal((16, 32)).astype(np.float32)
    t = rng.standard_normal((16, 32)).astype(np.float32)
    g = jax.grad(lambda a: L.rkd_loss(a, jnp.asarray(t)))(jnp.asarray(p))
    pt = torch.from_numpy(p).requires_grad_(True)
    torch_rkd_loss(pt, torch.from_numpy(t)).backward()
    np.testing.assert_allclose(np.asarray(g), pt.grad.numpy(),
                               rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# multilabel_topk_recall
# ---------------------------------------------------------------------------


@pytest.mark.parametrize('k', [5, 20])
def test_topk_recall_matches_sklearn(k):
    rng = _rng(8)
    logits = rng.standard_normal((48, 65)).astype(np.float32)
    targets = rng.random((48, 65)) < 0.08
    targets[:, 60:] = False  # some classes never positive
    got = L.multilabel_topk_recall(
        jnp.asarray(logits), jnp.asarray(targets), k
    )
    want = sklearn_topk_recall(logits, targets, k)
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-4)


def test_topk_recall_mask_equals_subset():
    rng = _rng(9)
    logits = rng.standard_normal((32, 40)).astype(np.float32)
    targets = rng.random((32, 40)) < 0.1
    mask = rng.random(32) < 0.7
    assert mask.any() and not mask.all()
    got = L.multilabel_topk_recall(
        jnp.asarray(logits), jnp.asarray(targets), 5, jnp.asarray(mask)
    )
    want = sklearn_topk_recall(logits[mask], targets[mask], 5)
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-4)


def test_topk_recall_perfect_and_zero():
    # logits exactly ranking the positives first -> 100
    targets = np.zeros((4, 10), bool)
    targets[np.arange(4), np.arange(4)] = True
    logits = np.where(targets, 5.0, -5.0).astype(np.float32)
    assert float(L.multilabel_topk_recall(
        jnp.asarray(logits), jnp.asarray(targets), 1
    )) == pytest.approx(100.0)
    # positives ranked dead last -> 0
    assert float(L.multilabel_topk_recall(
        jnp.asarray(-logits), jnp.asarray(targets), 1
    )) == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# warmup_weight (todd WarmupScheduler: linear 0 -> gain over `end`)
# ---------------------------------------------------------------------------


def test_warmup_weight_schedule():
    gain, end = 256.0, 200
    for step, want in [(0, 0.0), (50, 64.0), (100, 128.0),
                       (200, 256.0), (1000, 256.0)]:
        got = L.warmup_weight(jnp.asarray(step), gain, end)
        assert float(got) == pytest.approx(want), step


# ---------------------------------------------------------------------------
# l1 / mse (todd L1Loss / MSELoss with padded-row masks)
# ---------------------------------------------------------------------------


def test_l1_and_mse_match_torch():
    rng = _rng(10)
    p = rng.standard_normal((20, 512)).astype(np.float32)
    t = rng.standard_normal((20, 512)).astype(np.float32)
    mask = rng.random(20) < 0.5
    assert mask.any() and not mask.all()
    np.testing.assert_allclose(
        float(L.l1_loss(jnp.asarray(p), jnp.asarray(t))),
        float(F.l1_loss(torch.from_numpy(p), torch.from_numpy(t))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(L.l1_loss(jnp.asarray(p), jnp.asarray(t),
                        jnp.asarray(mask))),
        float(F.l1_loss(torch.from_numpy(p[mask]),
                        torch.from_numpy(t[mask]))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(L.mse_loss(jnp.asarray(p), jnp.asarray(t),
                         jnp.asarray(mask))),
        float(F.mse_loss(torch.from_numpy(p[mask]),
                         torch.from_numpy(t[mask]))),
        rtol=1e-5,
    )
    # reduction='sum' (the clip_global branch, gain 0.5 sum-reduced)
    np.testing.assert_allclose(
        float(L.mse_loss(jnp.asarray(p), jnp.asarray(t),
                         reduction='sum')),
        float(F.mse_loss(torch.from_numpy(p), torch.from_numpy(t),
                         reduction='sum')),
        rtol=1e-5,
    )


# ---------------------------------------------------------------------------
# cross entropies + smooth l1 (mmdet CrossEntropyLoss / SmoothL1Loss
# weight + avg_factor semantics)
# ---------------------------------------------------------------------------


def test_binary_cross_entropy_matches_torch():
    rng = _rng(11)
    x = rng.standard_normal((64, 1)).astype(np.float32) * 3
    y = (rng.random((64, 1)) < 0.5).astype(np.float32)
    w = (rng.random((64, 1)) < 0.8).astype(np.float32)
    avg = float(w.sum())
    got = L.binary_cross_entropy(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), avg
    )
    want = (F.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(y), reduction='none'
    ) * torch.from_numpy(w)).sum() / avg
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_softmax_cross_entropy_matches_torch():
    rng = _rng(12)
    x = rng.standard_normal((32, 66)).astype(np.float32)
    y = rng.integers(0, 66, 32)
    w = (rng.random(32) < 0.75).astype(np.float32)
    avg = float(w.sum())
    got = L.softmax_cross_entropy(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), avg
    )
    want = (F.cross_entropy(
        torch.from_numpy(x), torch.from_numpy(y), reduction='none'
    ) * torch.from_numpy(w)).sum() / avg
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_smooth_l1_matches_torch():
    rng = _rng(13)
    p = rng.standard_normal((40, 4)).astype(np.float32)
    t = rng.standard_normal((40, 4)).astype(np.float32)
    w = (rng.random((40, 4)) < 0.6).astype(np.float32)
    avg = 21.0
    for beta in (1.0, 1.0 / 9.0):
        got = L.smooth_l1_loss(
            jnp.asarray(p), jnp.asarray(t), beta, jnp.asarray(w), avg
        )
        want = (F.smooth_l1_loss(
            torch.from_numpy(p), torch.from_numpy(t),
            reduction='none', beta=beta,
        ) * torch.from_numpy(w)).sum() / avg
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
