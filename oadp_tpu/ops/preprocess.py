"""CLIP preprocessing fused into the XLA graph, bit-faithful to PIL.

The reference preprocesses on the host with PIL + torchvision
(``clip`` fork's transform; crops at ``oadp/oake/objects.py:116-127``,
pyramid at ``oadp/oake/blocks.py:54-77``) — a per-proposal Python hot
loop (SURVEY.md §3.1). Here the host only computes tiny per-crop
*resample weight matrices*; the pixel work (crop → bicubic resize →
center-crop → normalize) runs on the TPU as two MXU matmuls per crop.

Faithfulness: PIL resizes 8-bit images in two passes (horizontal then
vertical), quantizes weights to 22-bit fixed point, and rounds each pass
back to uint8 (``clip8`` in Pillow's Resample.c). We replicate:

* bicubic kernel with a = -0.5, support 2, antialias scaling;
* window clipping to the *crop* bounds with renormalization, while taps
  outside the *image* contribute zeros (PIL crop zero-pads);
* weight quantization to ``round(w * 2**22) / 2**22``;
* per-pass ``clip(floor(x + 0.5), 0, 255)`` rounding;
* PIL ``crop`` box rounding (Python banker's rounding per coordinate);
* torchvision ``Resize(shorter=n)`` (``int()`` truncation for the long
  side) and ``CenterCrop`` offsets (banker's rounding).

All weight matrices are padded to a static image size so XLA compiles
one program regardless of crop geometry.
"""

__all__ = [
    'PRECISION_BITS',
    'resample_coeffs',
    'resize_matrix',
    'clip_transform_matrices',
    'clip_transform_coeffs',
    'clip_transform_meta',
    'device_coeffs',
    'device_grid_mask',
    'coeff_ksize',
    'plain_resize_matrices',
    'apply_resize_pair',
    'expand_coeffs',
    'apply_resize_coeffs',
    'normalize_clip',
    'round_u8',
]

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIP_MEAN, CLIP_STD

PRECISION_BITS = 22  # Pillow: 32 - 8 - 2


def _bicubic(x: np.ndarray) -> np.ndarray:
    """Pillow's bicubic filter (a = -0.5, support 2)."""
    a = -0.5
    ax = np.abs(x)
    out = np.where(
        ax < 1,
        ((a + 2) * ax - (a + 3)) * ax * ax + 1,
        np.where(
            ax < 2,
            (((ax - 5) * ax + 8) * ax - 4) * a,
            0.0,
        ),
    )
    return out


def resample_coeffs(
    in_size: float,
    in0: float,
    in1: float,
    out_size: int,
    quantize: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-pixel resample windows, exactly as Pillow computes them.

    Mirrors ``precompute_coeffs`` in Pillow's Resample.c for the bicubic
    filter. Returns ``(xmin, weights)`` where ``xmin`` is ``(out,)`` int
    window starts (in crop coordinates) and ``weights`` is
    ``(out, max_taps)`` with zero padding.
    """
    support0 = 2.0
    scale = (in1 - in0) / out_size
    filterscale = max(scale, 1.0)
    support = support0 * filterscale
    ksize = int(math.ceil(support)) * 2 + 1

    xx = np.arange(out_size)
    center = in0 + (xx + 0.5) * scale
    xmin = np.clip((center - support + 0.5).astype(np.int64), 0, None)
    xmax = np.minimum(
        (center + support + 0.5).astype(np.int64), int(in_size)
    ) - xmin

    taps = np.arange(ksize)
    # (out, ksize) tap positions relative to window start
    pos = (taps[None] + xmin[:, None] - center[:, None] + 0.5) / filterscale
    w = _bicubic(pos)
    w[taps[None] >= xmax[:, None]] = 0.0
    ww = w.sum(-1, keepdims=True)
    ww[ww == 0] = 1.0
    w = w / ww
    if quantize:
        half = 0.5 * np.sign(w)
        w = np.trunc(w * (1 << PRECISION_BITS) + half) / (1 << PRECISION_BITS)
    return xmin, w


def resize_matrix(
    image_size: int,
    crop0: float,
    crop1: float,
    out_size: int,
    pad_size: int,
    quantize: bool = True,
) -> np.ndarray:
    """Dense ``(out_size, pad_size)`` resample matrix in *image* pixel space.

    ``crop0:crop1`` is the (already-rounded, possibly out-of-bounds) crop
    window along this axis; taps outside the image are dropped, which is
    exactly PIL's zero-fill crop followed by resize.
    """
    in_size = crop1 - crop0
    xmin, w = resample_coeffs(in_size, 0.0, float(in_size), out_size, quantize)
    out = np.zeros((out_size, pad_size), np.float32)
    n_taps = w.shape[1]
    rows = np.repeat(np.arange(out_size), n_taps)
    cols = (xmin[:, None] + np.arange(n_taps)[None]).ravel() + int(crop0)
    vals = w.ravel()
    ok = (cols >= 0) & (cols < image_size) & (vals != 0)
    out[rows[ok], cols[ok]] = vals[ok].astype(np.float32)
    return out


def _round_half_even(x: float) -> int:
    return int(round(x))


def clip_transform_matrices(
    image_w: int,
    image_h: int,
    crop_box: tuple[float, float, float, float] | None,
    pad_w: int,
    pad_h: int,
    out: int = 224,
) -> tuple[np.ndarray, np.ndarray]:
    """Weights for CLIP preprocess: crop → Resize(shorter=out) → CenterCrop.

    Returns ``(Wx, Wy)`` of shapes ``(out, pad_w)`` / ``(out, pad_h)``.
    """
    if crop_box is None:
        x0, y0, x1, y1 = 0, 0, image_w, image_h
    else:
        x0, y0, x1, y1 = (_round_half_even(v) for v in crop_box)
    cw, ch = x1 - x0, y1 - y0
    if cw <= 0 or ch <= 0:
        raise ValueError(f'empty crop {crop_box}')

    # torchvision Resize(shorter_side=out)
    if cw <= ch:
        ow, oh = out, int(out * ch / cw)
    else:
        ow, oh = int(out * cw / ch), out
    # PIL skips resampling entirely when the size is unchanged
    identity = (ow, oh) == (cw, ch)

    # torchvision CenterCrop(out)
    left = _round_half_even((ow - out) / 2.0)
    top = _round_half_even((oh - out) / 2.0)

    if identity:
        wx = np.zeros((out, pad_w), np.float32)
        cols = np.arange(out) + x0 + left
        ok = (cols >= 0) & (cols < image_w)
        wx[np.arange(out)[ok], cols[ok]] = 1.0
        wy = np.zeros((out, pad_h), np.float32)
        rows_idx = np.arange(out) + y0 + top
        ok = (rows_idx >= 0) & (rows_idx < image_h)
        wy[np.arange(out)[ok], rows_idx[ok]] = 1.0
        return wx, wy

    wx = resize_matrix(image_w, x0, x1, ow, pad_w)[left:left + out]
    wy = resize_matrix(image_h, y0, y1, oh, pad_h)[top:top + out]
    return wx, wy


def coeff_ksize(max_crop_side: float, out: int = 224) -> int:
    """Max taps per output pixel for crops up to ``max_crop_side``
    (bicubic support 2, antialias): ``2 * ceil(2 * scale) + 1``."""
    scale = max(max_crop_side / out, 1.0)
    return 2 * int(math.ceil(2.0 * scale)) + 1


def clip_transform_coeffs(
    image_w: int,
    image_h: int,
    crop_box: tuple[float, float, float, float] | None,
    k_pad: int | None = None,
    out: int = 224,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Compact form of :func:`clip_transform_matrices`.

    Returns ``(wx_w, wx_start, wy_w, wy_start)`` where ``w*_w`` is
    ``(out, k_pad)`` float32 tap weights and ``w*_start`` is ``(out,)``
    int32 *absolute* image-column/row indices of the first tap (may be
    negative or exceed the image — the device expansion drops negative
    columns and out-of-image columns read zero-padded pixels, which is
    exactly PIL's zero-fill crop). The dense matrices are recovered by
    :func:`expand_coeffs`; the expansion is bit-exact, so device results
    match the dense path. Host→device traffic per 512-crop batch drops
    from ~590 MB of dense matrices to a few MB.
    """
    if crop_box is None:
        x0, y0, x1, y1 = 0, 0, image_w, image_h
    else:
        x0, y0, x1, y1 = (_round_half_even(v) for v in crop_box)
    cw, ch = x1 - x0, y1 - y0
    if cw <= 0 or ch <= 0:
        raise ValueError(f'empty crop {crop_box}')

    if cw <= ch:
        ow, oh = out, int(out * ch / cw)
    else:
        ow, oh = int(out * cw / ch), out
    identity = (ow, oh) == (cw, ch)
    left = _round_half_even((ow - out) / 2.0)
    top = _round_half_even((oh - out) / 2.0)

    def axis(crop0, crop1, n_out, offset):
        size = crop1 - crop0
        if identity:
            # PIL skips resampling: one tap of weight 1 per output.
            # Out-of-image-right taps read padded zeros and negative
            # starts never match a column on device — both are PIL's
            # zero-fill crop semantics.
            starts = np.arange(out, dtype=np.int64) + crop0 + offset
            w = np.ones((out, 1), np.float32)
        else:
            xmin, w = resample_coeffs(size, 0.0, float(size), n_out)
            xmin = xmin[offset:offset + out]
            w = w[offset:offset + out].astype(np.float32)
            starts = xmin + crop0
        if k_pad is not None:
            assert w.shape[1] <= k_pad, (w.shape, k_pad)
            w_pad = np.zeros((out, k_pad), np.float32)
            w_pad[:, :w.shape[1]] = w
            w = w_pad
        return w, starts.astype(np.int32)

    wx_w, wx_start = axis(x0, x1, ow, left)
    wy_w, wy_start = axis(y0, y1, oh, top)
    return wx_w, wx_start, wy_w, wy_start


def clip_transform_meta(
    image_w: int,
    image_h: int,
    boxes: np.ndarray,  # (B, 4) crop boxes (float)
    out: int = 224,
) -> np.ndarray:
    """Per-crop scalar metadata for on-device coefficient construction.

    The only non-device-friendly parts of the CLIP preprocess are a
    handful of Python-float roundings (banker's rounding of the crop
    box, torchvision's ``int()`` size truncation, center-crop offsets).
    They are computed here, vectorized, in float64 — everything heavy
    (tap weights, dense expansion, resampling) happens on device from
    these 9 numbers per crop.

    Returns ``(B, 9)`` float32: ``x0, y0, cw, ch, ow, oh, left, top,
    identity``.
    """
    boxes = np.asarray(boxes, np.float64)
    rounded = np.vectorize(_round_half_even)(boxes).astype(np.float64)
    x0, y0, x1, y1 = rounded.T
    cw, ch = x1 - x0, y1 - y0
    landscape = cw > ch
    ow = np.where(landscape, np.floor(out * cw / ch), float(out))
    oh = np.where(landscape, float(out), np.floor(out * ch / cw))
    identity = (ow == cw) & (oh == ch)
    left = np.vectorize(_round_half_even)((ow - out) / 2.0)
    top = np.vectorize(_round_half_even)((oh - out) / 2.0)
    return np.stack(
        [x0, y0, cw, ch, ow, oh, left, top, identity.astype(np.float64)],
        axis=-1,
    ).astype(np.float32)


def _bicubic_jnp(x):
    a = -0.5
    ax = jnp.abs(x)
    return jnp.where(
        ax < 1,
        ((a + 2) * ax - (a + 3)) * ax * ax + 1,
        jnp.where(ax < 2, (((ax - 5) * ax + 8) * ax - 4) * a, 0.0),
    )


def device_coeffs(
    meta: jax.Array,  # (B, 9) from clip_transform_meta
    k_pad: int,
    out: int = 224,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """On-device resample coefficients: ``(wx_w, wx_start, wy_w,
    wy_start)`` of shapes ``(B, out, K)`` / ``(B, out)``.

    Float32 re-derivation of Pillow's ``precompute_coeffs`` (the host
    builders compute the same thing in float64; the fp32 weights agree
    to ~1e-6, i.e. within the 2^-22 quantization step for all but
    boundary-tied taps — validated in tests). Replaces per-crop host
    Python work and ~20 MB/batch of coefficient shipping with 36 bytes
    per crop.
    """
    x0, y0, cw, ch, ow, oh, left, top, identity = [
        meta[:, i] for i in range(9)
    ]

    def axis(crop0, size, n_out, offset):
        o = jnp.arange(out, dtype=jnp.float32)[None, :]  # (1, out)
        scale = (size / n_out)[:, None]  # (B, 1)
        filterscale = jnp.maximum(scale, 1.0)
        support = 2.0 * filterscale
        # multiply-then-divide: (o+offset+0.5)*size is exactly
        # representable in f32, so exact-tie centers (the trunc
        # boundaries below) stay exact like the host's float64 path
        center = ((o + offset[:, None] + 0.5) * size[:, None]) / (
            n_out[:, None]
        )
        xmin = jnp.clip(
            jnp.trunc(center - support + 0.5), 0.0, None
        )  # (B, out)
        xend = jnp.minimum(
            jnp.trunc(center + support + 0.5), size[:, None]
        )
        taps = jnp.arange(k_pad, dtype=jnp.float32)[None, None, :]
        pos = (taps + xmin[..., None] - center[..., None] + 0.5) / (
            filterscale[..., None]
        )
        w = _bicubic_jnp(pos)
        w = jnp.where(taps < (xend - xmin)[..., None], w, 0.0)
        ww = w.sum(-1, keepdims=True)
        w = w / jnp.where(ww == 0, 1.0, ww)
        q = 1 << PRECISION_BITS
        w = jnp.trunc(w * q + 0.5 * jnp.sign(w)) / q
        starts = (xmin + crop0[:, None]).astype(jnp.int32)
        # identity crops: single unit tap per output pixel
        ident = identity[:, None].astype(bool)
        id_starts = (
            crop0[:, None] + offset[:, None] + o
        ).astype(jnp.int32)
        id_w = jnp.zeros_like(w).at[..., 0].set(1.0)
        w = jnp.where(ident[..., None], id_w, w)
        starts = jnp.where(ident, id_starts, starts)
        return w, starts

    wx_w, wx_s = axis(x0, cw, ow, left)
    wy_w, wy_s = axis(y0, ch, oh, top)
    return wx_w, wx_s, wy_w, wy_s


def device_grid_mask(
    foregrounds: jax.Array,  # (B, 4) proposal boxes in crop coords
    crop_wh: jax.Array,  # (B, 2) crop sizes (cw, ch as floats)
    grid: int,
) -> jax.Array:
    """On-device version of ``ops.boxes.grid_mask`` (reference
    ``oadp/oake/objects.py:129-155``): 1 = background on the ViT patch
    grid, computed with the same ceil/arange/floor semantics."""
    idx = jnp.arange(grid, dtype=jnp.float32)[None, :]
    cw = jnp.ceil(crop_wh[:, 0:1] - 1e-9)
    ch = jnp.ceil(crop_wh[:, 1:2] - 1e-9)
    xs = jnp.floor(idx * cw / grid)
    ys = jnp.floor(idx * ch / grid)
    fx = (foregrounds[:, 0:1] <= xs) & (xs <= foregrounds[:, 2:3])
    fy = (foregrounds[:, 1:2] <= ys) & (ys <= foregrounds[:, 3:4])
    fg = fy[:, :, None] & fx[:, None, :]
    return (~fg).astype(jnp.float32)


def plain_resize_matrices(
    image_w: int,
    image_h: int,
    out_w: int,
    out_h: int,
    pad_w: int,
    pad_h: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Weights for plain ``PIL.Image.resize((out_w, out_h))`` (pyramid levels,
    reference ``oadp/oake/blocks.py:72-76``)."""
    wx = resize_matrix(image_w, 0, image_w, out_w, pad_w)
    wy = resize_matrix(image_h, 0, image_h, out_h, pad_h)
    return wx, wy


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------


def round_u8(x: jax.Array) -> jax.Array:
    """Pillow ``clip8``: round-half-up then clamp to [0, 255]."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def _resize_one(
    image: jax.Array,  # (PH, PW, 3) float32 in [0, 255]
    wx: jax.Array,  # (OW, PW)
    wy: jax.Array,  # (OH, PH)
    skip_round: bool,
    compute_dtype=None,
) -> jax.Array:
    if compute_dtype is not None:
        # Fast path for low-precision encoders: pixel values are exact
        # in bf16 (integers <= 255) and the per-pass round_u8 keeps them
        # integral, so the only inexactness is the ~0.4% rounding of the
        # resample weights — the same order as PIL's own per-pass uint8
        # rounding, and far below the encoder's bf16 activation noise.
        # Single-pass MXU matmuls with fp32 accumulation instead of the
        # multi-pass fp32 emulation of Precision.HIGHEST.
        wx = wx.astype(compute_dtype)
        wy = wy.astype(compute_dtype)
        t = jnp.einsum(
            'ow,hwc->hoc', wx, image.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        if not skip_round:
            t = round_u8(t)
        out = jnp.einsum(
            'eh,hoc->eoc', wy, t.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        if not skip_round:
            out = round_u8(out)
        return out
    hi = jax.lax.Precision.HIGHEST
    # Horizontal pass: contract over image columns.
    t = jnp.einsum('ow,hwc->hoc', wx, image, precision=hi)
    if not skip_round:
        t = round_u8(t)
    # Vertical pass: contract over image rows.
    out = jnp.einsum('eh,hoc->eoc', wy, t, precision=hi)
    if not skip_round:
        out = round_u8(out)
    return out


@functools.partial(
    jax.jit, static_argnames=('skip_round', 'compute_dtype')
)
def apply_resize_pair(
    image: jax.Array,
    wx: jax.Array,
    wy: jax.Array,
    skip_round: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Two-pass PIL resize on device (weights from the builders above).

    Supported layouts:

    * ``image (PH,PW,3)``, ``wx (OW,PW)``        → ``(OH,OW,3)``
    * ``image (PH,PW,3)``, ``wx (B,OW,PW)``      → ``(B,OH,OW,3)``
      (one image, many crops — the objects pipeline)
    * ``image (B,PH,PW,3)``, ``wx (B,OW,PW)``    → ``(B,OH,OW,3)``
      (paired batches — the globals pipeline)

    Values are rounded to uint8 range per pass like PIL's 8-bit path
    (unless ``skip_round``). ``compute_dtype`` (e.g. ``jnp.bfloat16``)
    selects the single-pass MXU fast path for low-precision encoders —
    see :func:`_resize_one`.
    """
    fn = functools.partial(
        _resize_one, skip_round=skip_round, compute_dtype=compute_dtype
    )
    if image.ndim == 3 and wx.ndim == 2:
        return fn(image, wx, wy)
    if image.ndim == 3 and wx.ndim == 3:
        return jax.vmap(fn, in_axes=(None, 0, 0))(image, wx, wy)
    if image.ndim == 4 and wx.ndim == 3:
        return jax.vmap(fn)(image, wx, wy)
    raise ValueError(f'bad ranks: image {image.ndim}, wx {wx.ndim}')


def expand_coeffs(
    weights: jax.Array,  # (..., O, K) tap weights
    starts: jax.Array,  # (..., O) int32 absolute first-tap indices
    pad: int,
) -> jax.Array:
    """Expand compact resample coefficients to dense ``(..., O, pad)``
    matrices on device. Tap ``k`` of output ``o`` lands on column
    ``starts[o] + k``; negative columns are dropped (zero-fill crop).
    The expansion is exact (weights are placed, not recomputed), so the
    downstream matmul is bit-identical to the dense host path.
    """
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * (starts.ndim - 1) + (1, pad), starts.ndim
    )
    out = jnp.zeros(weights.shape[:-1] + (pad,), weights.dtype)
    for k in range(weights.shape[-1]):  # static unroll; VPU-only work
        out = out + weights[..., k:k + 1] * (
            cols == (starts + k)[..., None]
        )
    return out


def apply_resize_coeffs(
    image: jax.Array,
    wx_w: jax.Array,  # (B, O, K) or (O, K)
    wx_start: jax.Array,  # (B, O) or (O,)
    wy_w: jax.Array,
    wy_start: jax.Array,
    skip_round: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """:func:`apply_resize_pair` from compact per-crop coefficients.

    ``image`` is ``(PH, PW, 3)`` (one image, many crops) or
    ``(B, PH, PW, 3)`` paired with batched coefficients.
    """
    pad_h, pad_w = image.shape[-3], image.shape[-2]
    if compute_dtype is not None:
        # expand in the compute dtype: halves the write+read traffic of
        # the dense (B, 224, pad) matrices, the dominant preprocess cost
        wx_w = wx_w.astype(compute_dtype)
        wy_w = wy_w.astype(compute_dtype)
    wx = expand_coeffs(wx_w, wx_start, pad_w)
    wy = expand_coeffs(wy_w, wy_start, pad_h)
    return apply_resize_pair(
        image, wx, wy, skip_round=skip_round, compute_dtype=compute_dtype
    )


_MEAN = np.asarray(CLIP_MEAN, np.float32) * 255.0
_STD = np.asarray(CLIP_STD, np.float32) * 255.0


def normalize_clip(pixels: jax.Array, dtype=jnp.float32) -> jax.Array:
    """``ToTensor`` + CLIP ``Normalize`` on [0,255] pixel values."""
    return ((pixels - _MEAN) / _STD).astype(dtype)
