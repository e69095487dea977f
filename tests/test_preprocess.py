"""PIL-bit-faithfulness of the fused TPU preprocessing (SURVEY.md §7.3)."""

import numpy as np
import PIL.Image
import pytest

from oadp_tpu.ops import preprocess as pp


def _pil_clip_transform(img: PIL.Image.Image, crop_box, out=224):
    """Oracle: PIL crop → torchvision Resize(shorter=out) → CenterCrop."""
    if crop_box is not None:
        img = img.crop(crop_box)
    w, h = img.size
    if w <= h:
        ow, oh = out, int(out * h / w)
    else:
        ow, oh = int(out * w / h), out
    if (ow, oh) != (w, h):
        img = img.resize((ow, oh), PIL.Image.BICUBIC)
    left = int(round((ow - out) / 2.0))
    top = int(round((oh - out) / 2.0))
    img = img.crop((left, top, left + out, top + out))
    return np.asarray(img, np.float32)


def _run_ours(image_np, crop_box, pad=768):
    h, w = image_np.shape[:2]
    wx, wy = pp.clip_transform_matrices(w, h, crop_box, pad, pad)
    padded = np.zeros((pad, pad, 3), np.float32)
    padded[:h, :w] = image_np
    return np.asarray(pp.apply_resize_pair(padded, wx, wy))


@pytest.fixture(scope='module')
def image():
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (353, 468, 3), np.uint8)


def _assert_match(ours, expected, exact_frac=0.999):
    diff = np.abs(ours - expected)
    assert diff.max() <= 1.0, f'max diff {diff.max()}'
    assert (diff == 0).mean() > exact_frac, f'exact {(diff == 0).mean()}'


def test_whole_image(image):
    pil = PIL.Image.fromarray(image)
    expected = _pil_clip_transform(pil, None)
    ours = _run_ours(image.astype(np.float32), None)
    _assert_match(ours, expected)


@pytest.mark.parametrize(
    'crop_box',
    [
        (10.3, 20.7, 210.5, 220.9),  # in-bounds, fractional, ~square
        (-30.0, -15.5, 250.0, 264.5),  # out-of-bounds (PIL zero-pads)
        (100.5, 50.5, 400.5, 350.5),  # .5 coords (banker's rounding)
        (300.0, 100.0, 468.0, 268.0),  # touches right edge
        (5.0, 5.0, 37.0, 37.0),  # small crop, upscale to 224
    ],
)
def test_crop_variants(image, crop_box):
    pil = PIL.Image.fromarray(image)
    expected = _pil_clip_transform(pil, crop_box)
    ours = _run_ours(image.astype(np.float32), crop_box)
    _assert_match(ours, expected)


def test_plain_resize_pyramid_level(image):
    """The blocks pyramid downscale (reference blocks.py:72-76)."""
    pil = PIL.Image.fromarray(image)
    w, h = pil.size
    w2, h2 = int(w / 1.5), int(h / 1.5)
    expected = np.asarray(pil.resize((w2, h2)), np.float32)

    pad = 512
    wx, wy = pp.plain_resize_matrices(w, h, w2, h2, pad, pad)
    padded = np.zeros((pad, pad, 3), np.float32)
    padded[:h, :w] = image
    ours = np.asarray(pp.apply_resize_pair(padded, wx, wy))
    _assert_match(ours[:h2, :w2], expected)


def test_batched_crops(image):
    """Several crops in one device call (static-shape batching)."""
    boxes = [(10.0, 10.0, 150.0, 150.0), (200.0, 100.0, 460.0, 340.0)]
    pad = 512
    h, w = image.shape[:2]
    wxs = np.stack([
        pp.clip_transform_matrices(w, h, b, pad, pad)[0] for b in boxes
    ])
    wys = np.stack([
        pp.clip_transform_matrices(w, h, b, pad, pad)[1] for b in boxes
    ])
    padded = np.zeros((pad, pad, 3), np.float32)
    padded[:h, :w] = image
    ours = np.asarray(pp.apply_resize_pair(padded, wxs, wys))
    pil = PIL.Image.fromarray(image)
    for i, b in enumerate(boxes):
        _assert_match(ours[i], _pil_clip_transform(pil, b))


def test_normalize():
    import jax.numpy as jnp
    x = jnp.full((2, 2, 3), 255.0)
    out = np.asarray(pp.normalize_clip(x))
    expected = (1.0 - np.asarray(pp._MEAN) / 255) / (
        np.asarray(pp._STD) / 255
    ) * np.ones((2, 2, 3))
    np.testing.assert_allclose(out, expected, rtol=1e-5)


@pytest.mark.parametrize(
    'crop_box',
    [
        None,  # whole image
        (10.3, 20.7, 210.5, 220.9),
        (-30.0, -15.5, 250.0, 264.5),  # out-of-bounds zero-fill
        (100.5, 50.5, 400.5, 350.5),
        (5.0, 5.0, 37.0, 37.0),
        (3.0, 5.0, 227.0, 229.0),  # identity resize (224x224 crop)
    ],
)
def test_compact_coeffs_match_dense(image, crop_box):
    """Compact (taps, starts) coefficients expand to the exact dense
    matrices, so the device matmul is bit-identical to the dense path
    (modulo out-of-image columns, which read zero-padded pixels)."""
    import jax.numpy as jnp

    pad = 512
    h, w = image.shape[:2]
    wx_d, wy_d = pp.clip_transform_matrices(w, h, crop_box, pad, pad)
    k = pp.coeff_ksize(np.sqrt(8.0) * pad)
    xw, xs, yw, ys = pp.clip_transform_coeffs(w, h, crop_box, k)
    wx_c = np.array(pp.expand_coeffs(jnp.asarray(xw), jnp.asarray(xs), pad))
    wy_c = np.array(pp.expand_coeffs(jnp.asarray(yw), jnp.asarray(ys), pad))
    wx_c[:, w:] = 0  # dense path masks out-of-image columns explicitly
    wy_c[:, h:] = 0
    np.testing.assert_array_equal(wx_c, wx_d)
    np.testing.assert_array_equal(wy_c, wy_d)


def test_apply_resize_coeffs_vs_pil(image):
    """End-to-end compact path matches the PIL oracle."""
    pad = 512
    h, w = image.shape[:2]
    boxes = [(10.0, 10.0, 150.0, 150.0), (200.0, 100.0, 460.0, 340.0)]
    k = 13
    xw = np.stack([
        pp.clip_transform_coeffs(w, h, b, k)[0] for b in boxes
    ])
    xs = np.stack([
        pp.clip_transform_coeffs(w, h, b, k)[1] for b in boxes
    ])
    yw = np.stack([
        pp.clip_transform_coeffs(w, h, b, k)[2] for b in boxes
    ])
    ys = np.stack([
        pp.clip_transform_coeffs(w, h, b, k)[3] for b in boxes
    ])
    padded = np.zeros((pad, pad, 3), np.float32)
    padded[:h, :w] = image
    ours = np.asarray(pp.apply_resize_coeffs(padded, xw, xs, yw, ys))
    pil = PIL.Image.fromarray(image)
    for i, b in enumerate(boxes):
        _assert_match(ours[i], _pil_clip_transform(pil, b))


def test_device_coeffs_match_host(image):
    """On-device f32 coefficient construction agrees with the exact
    host (float64) path: identical windows except rare trunc-boundary
    ties, pixel output within one uint8 step."""
    import jax.numpy as jnp

    h, w = image.shape[:2]
    pad = 512
    K = 13
    rng = np.random.RandomState(1)
    sides = rng.uniform(8, 400, 64)
    x0 = rng.uniform(-30, w - 8, 64)
    y0 = rng.uniform(-30, h - 8, 64)
    boxes = np.stack([x0, y0, x0 + sides, y0 + sides * 1.01], -1)
    boxes = boxes[[
        i for i in range(64)
        if pp.coeff_ksize(max(sides[i], sides[i] * 1.01)) <= K
    ]]
    meta = pp.clip_transform_meta(w, h, boxes)
    dwx, dxs, dwy, dys = [
        np.asarray(a) for a in pp.device_coeffs(jnp.asarray(meta), K)
    ]
    padded = np.zeros((pad, pad, 3), np.float32)
    padded[:h, :w] = image
    worst = 0.0
    for i, b in enumerate(boxes):
        hx, hxs, hy, hys = pp.clip_transform_coeffs(w, h, tuple(b), K)
        exact = np.asarray(pp.apply_resize_coeffs(
            padded, hx[None], hxs[None], hy[None], hys[None]
        ))
        dev = np.asarray(pp.apply_resize_coeffs(
            padded, dwx[i][None], dxs[i][None], dwy[i][None], dys[i][None]
        ))
        worst = max(worst, np.abs(exact - dev).max())
        assert (exact == dev).mean() > 0.999
    assert worst <= 1.0


def test_device_grid_mask_matches_host():
    """On-device ViT-grid background masks vs the host implementation
    (ops/boxes.grid_mask)."""
    import jax.numpy as jnp
    from oadp_tpu.ops import boxes as B

    rng = np.random.RandomState(5)
    n, grid = 32, 14
    crops = np.zeros((n, 4))
    crops[:, 2] = rng.uniform(10, 300, n)
    crops[:, 3] = rng.uniform(10, 300, n)
    fg = np.stack([
        rng.uniform(0, 50, n), rng.uniform(0, 50, n),
        rng.uniform(60, 280, n), rng.uniform(60, 280, n),
    ], -1)
    host = B.grid_mask(fg, crops, grid)
    dev = np.asarray(pp.device_grid_mask(
        jnp.asarray(fg, jnp.float32),
        jnp.asarray(crops[:, 2:4], jnp.float32),
        grid,
    ))
    np.testing.assert_array_equal(dev, host)


def test_bf16_fast_path_deviation_bound(image):
    """The single-pass bf16 resize (compute_dtype=bfloat16 — the TPU
    production path for bf16 encoders) must stay within 2 pixel values
    of the PIL-bit-faithful fp32 path: pixel integers are exact in
    bf16 and per-pass round_u8 re-integerizes, so the only error is the
    ~0.4% bf16 rounding of resample weights (<=1 per pass)."""
    import jax.numpy as jnp

    h, w = image.shape[:2]
    pad = 640
    rng = np.random.RandomState(3)
    n = 16
    sides = rng.uniform(24, 300, n)
    x0 = rng.uniform(0, w - 24, n)
    y0 = rng.uniform(0, h - 24, n)
    boxes = np.stack([x0, y0, x0 + sides, y0 + sides], -1)
    meta = pp.clip_transform_meta(w, h, boxes)
    K = 13
    wx_w, wx_s, wy_w, wy_s = [
        np.asarray(a) for a in pp.device_coeffs(jnp.asarray(meta), K)
    ]
    padded = np.zeros((pad, pad, 3), np.float32)
    padded[:h, :w] = image

    exact = np.asarray(pp.apply_resize_coeffs(
        padded, wx_w, wx_s, wy_w, wy_s
    ))
    fast = np.asarray(pp.apply_resize_coeffs(
        padded, wx_w, wx_s, wy_w, wy_s, compute_dtype=jnp.bfloat16
    ))
    diff = np.abs(exact - fast)
    assert diff.max() <= 2.0, diff.max()
    # measured ~83% bit-exact; the rest are +-1/2 rounding-tie flips,
    # the same scale as PIL's own per-pass uint8 quantization
    assert (diff == 0).mean() > 0.75, (diff == 0).mean()
    assert (diff <= 1.0).mean() > 0.99, (diff <= 1.0).mean()
