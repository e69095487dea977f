"""Jitted device programs for the three OAKE pipelines.

Each pipeline is ONE XLA program per fixed shape: preprocessing
(crop/resize/normalize as MXU matmuls, see ``ops/preprocess.py``) fused
with the CLIP encoder forward. The reference instead runs PIL on the
host per crop and the encoder per image (SURVEY.md §3.1 hot loops).

All shapes are static: images are padded to ``(pad_h, pad_w)``, crop
batches to fixed sizes, block plans to ``max_blocks`` — so each pipeline
compiles exactly once.
"""

__all__ = ['ClipModel', 'load_clip', 'OakeSteps']

import dataclasses
import functools
import pathlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models import clip as C
from ..ops import preprocess as P
from ..utils import logger


@dataclasses.dataclass
class ClipModel:
    params: Any
    config: C.ViTConfig
    surgery_params: Any
    surgery_config: C.ViTConfig

    @property
    def grid(self) -> int:
        """ViT patch grid of the surgery model (mask resolution),
        reference ``oadp/oake/objects.py:281``."""
        return self.surgery_config.grid


def load_clip(
    checkpoint: str | None = 'pretrained/clip/ViT-B-32.pt',
    dtype: str = 'float32',
    upsample: int = 2,
    vit: dict | None = None,
) -> ClipModel:
    """Load CLIP ViT-B/32 weights (OpenAI state dict or TorchScript
    archive) and build stock + surgery parameter sets.

    Missing checkpoint → random init with a warning (DRY_RUN smoke runs
    and tests don't need pretrained weights). ``vit`` overrides the
    encoder geometry (tests use scaled-down widths).
    """
    config = C.ViTConfig(**(vit or {}))
    jdtype = jnp.bfloat16 if dtype == 'bfloat16' else jnp.float32
    state = None
    if checkpoint and pathlib.Path(checkpoint).exists():
        state = _load_torch_checkpoint(checkpoint)
    # Initialization/conversion happens on the CPU backend: it is many
    # tiny ops, and dispatching them one-by-one to a (possibly remote)
    # accelerator is pathologically slow. One device_put at the end.
    # local_devices, not devices: in a multi-process job global device 0
    # belongs to rank 0 and is non-addressable elsewhere (each OAKE rank
    # owns its encoder copy — zero-collective index-space sharding)
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        if state is not None:
            params, _ = C.convert_torch_state_dict(state)
        else:
            if checkpoint:
                logger.warning(
                    'CLIP checkpoint %s not found; using random weights',
                    checkpoint,
                )
            params = C.init_vit_params(jax.random.key(0), config)

        surgery_params, surgery_config = C.upsample_vit_params(
            params, config, upsample
        )
        cast = functools.partial(
            jax.tree.map, lambda x: jnp.asarray(x, jdtype)
        )
        params, surgery_params = cast(params), cast(surgery_params)
    params, surgery_params = jax.device_put(
        (params, surgery_params), jax.local_devices()[0]
    )
    return ClipModel(params, config, surgery_params, surgery_config)


def _load_torch_checkpoint(path: str) -> dict[str, np.ndarray] | None:
    import torch
    try:
        state = torch.load(path, map_location='cpu', weights_only=False)
        if hasattr(state, 'state_dict'):
            state = state.state_dict()
    except Exception:
        try:
            state = torch.jit.load(path, map_location='cpu').state_dict()
        except Exception:
            logger.exception('failed to load CLIP checkpoint %s', path)
            return None
    return {
        k: v.float().numpy()
        for k, v in state.items()
        if hasattr(v, 'numpy')
    }


def _l2_normalize(x: jax.Array) -> jax.Array:
    """fp32 normalize → fp16 output — the reference's
    ``F.normalize(e).half()`` (``oadp/oake/objects.py:330``), and half
    the host-fetch bytes over the (possibly tunneled) transport."""
    x = x.astype(jnp.float32)
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x.astype(jnp.float16)


class OakeSteps:
    """Compiled step functions, parameterized by static pad sizes.

    Params are passed to the jitted functions as *runtime arguments*
    (never closed over): closing over them would bake ~350 MB of
    weights into the HLO as constants — bloating compilation and
    breaking remote-compile transports with payload limits.
    """

    def __init__(self, model: ClipModel, pad_w: int = 640, pad_h: int = 640):
        self.model = model
        self.pad_w = pad_w
        self.pad_h = pad_h
        dtype = jax.tree.leaves(model.params)[0].dtype
        self._dtype = dtype
        self._globals = jax.jit(
            functools.partial(
                _globals_fn, config=model.config, dtype=dtype
            ),
            static_argnames=('k_pad',),
        )
        self._blocks = jax.jit(
            functools.partial(_blocks_fn, config=model.config, dtype=dtype)
        )
        self._objects = jax.jit(
            functools.partial(
                _objects_fn, config=model.surgery_config, dtype=dtype
            ),
            static_argnames=('k_pad',),
        )
        self._objects_multi = jax.jit(
            functools.partial(
                _objects_multi_fn, config=model.surgery_config, dtype=dtype
            ),
            static_argnames=('k_pad',),
        )
        self._objects_packed = jax.jit(
            functools.partial(
                _objects_packed_fn,
                config=model.surgery_config, dtype=dtype,
                pad_h=pad_h, pad_w=pad_w,
            ),
            static_argnames=('crop_rows', 'k_pad'),
        )

    def globals_step(
        self,
        images,  # (B, PH, PW, 3) uint8, or a list of (PH, PW, 3)
        meta: jax.Array,  # (B, 9) per-image scalars
        k_pad: int,  # static tap count
    ) -> jax.Array:
        return self._globals(
            self.model.params, images, meta, k_pad=k_pad
        )

    def blocks_step(
        self,
        images,  # (B, PH, PW, 3) uint8, or a list of (PH, PW, 3)
        level_wx,  # (B, L, PW, PW) level k -> k+1 horizontal, or list
        level_wy,  # (B, L, PH, PH), or list
        whole_wx,  # (B, 224, PW), or list
        whole_wy,  # (B, 224, PH), or list
        coords,  # (T, 4) int32: (image, level, y, x) — flat over batch
    ) -> jax.Array:
        """→ ``(B + T, output_dim)`` fp16 embeddings: the B whole-image
        rows first, then the T flat block rows.

        Every per-item argument may be a LIST of per-image arrays: jit
        treats fixed-length lists as pytrees and the stack happens
        inside the compiled program — one dispatch per batch instead of
        one eager ``jnp.stack`` dispatch per argument (~3 ms each over
        the remote-dispatch transport).

        The block coordinates are FLAT across the batch and bucketed
        (``T`` static per bucket): padding each image to ``max_blocks``
        would make the ViT encode ~2x the real crop count (48 padded vs
        ~28 real blocks at 640x480), and the encoder is the dominant
        term of the program."""
        return self._blocks(
            self.model.params,
            images, level_wx, level_wy, whole_wx, whole_wy, coords,
        )

    def objects_step(
        self,
        image: jax.Array,  # (PH, PW, 3) uint8
        meta: jax.Array,  # (B, 9) per-crop scalars (clip_transform_meta)
        masks: jax.Array,  # (B, grid, grid) 1 = background
        k_pad: int,  # static tap count (bucketed)
    ) -> jax.Array:
        return self._objects(
            self.model.surgery_params, image, meta, masks, k_pad=k_pad
        )

    def objects_multi_step(
        self,
        images,  # list of (PH, PW, 3) uint8 source images
        img_idx,  # (G,) int32: source image of each chunk
        metas,  # list of G (B, 9) per-crop scalar arrays
        masks,  # list of G (B, grid, grid) uint8 masks
        k_pad: int,  # static tap count (shared by the group)
    ) -> jax.Array:
        """→ ``(G * B, output_dim)`` fp16 embeddings, chunk-major.

        Crop chunks from SEVERAL source images in one dispatch: the
        objects program is ~hundreds of ms of device time but each
        dispatch+fetch is a full transport round trip on a tunneled
        backend, so batching images per dispatch halves the per-image
        round-trip tax (the device work is identical — the encoder just
        sees ``G * B`` crops instead of ``B`` twice). Per-item arrays
        arrive as LISTS and are stacked inside the program (one dispatch
        per batch, see :meth:`blocks_step`)."""
        return self._objects_multi(
            self.model.surgery_params, images, img_idx, metas, masks,
            k_pad=k_pad,
        )

    def packed_chunk_size(self, crop_rows: int) -> int:
        """Byte length of one packed chunk buffer (see
        :meth:`objects_packed_step`)."""
        g = self.model.grid
        return (
            self.pad_h * self.pad_w * 3
            + crop_rows * g * g
            + crop_rows * 9 * 4
        )

    def objects_packed_step(
        self,
        bufs,  # (G, packed_chunk_size(B)) uint8 host array (or list)
        crop_rows: int,  # static B: crop rows per chunk
        k_pad: int,  # static tap count (shared by the group)
    ) -> jax.Array:
        """→ ``(G * B, output_dim)`` fp16 embeddings, chunk-major.

        Like :meth:`objects_multi_step`, but each chunk's inputs travel
        as ONE flat uint8 buffer ``[image bytes | mask bytes |
        meta-float32 bytes]`` built by ``ObjectsPipeline.prepare``, and
        the group's buffers arrive host-stacked so the whole batch is a
        single transfer riding the dispatch. On a tunneled backend every
        transport operation is a serialized round trip (~25-60 ms
        regardless of size), so this pays exactly 2 round trips per
        group (dispatch+upload, fetch) instead of ~9. On-device unpack
        is reshape + bitcast (free)."""
        return self._objects_packed(
            self.model.surgery_params, bufs,
            crop_rows=crop_rows, k_pad=k_pad,
        )


def _compute_dtype(dtype):
    """Resize fast-path dtype: bf16 encoders take the single-pass MXU
    resize (pixel integers are exact in bf16; the ~0.4% weight rounding
    is below the encoder's own activation noise); fp32 encoders keep the
    PIL-bit-faithful fp32 path."""
    return jnp.bfloat16 if dtype == jnp.bfloat16 else None


def _stacked(x):
    """Accept a (possibly list-valued) batch argument: lists arrive as
    jit pytrees and are stacked INSIDE the compiled program."""
    return jnp.stack(x) if isinstance(x, (list, tuple)) else x


def _globals_fn(params, images, meta, *, config, dtype, k_pad):
    images = _stacked(images)
    wx_w, wx_s, wy_w, wy_s = P.device_coeffs(meta, k_pad)
    crops = P.apply_resize_coeffs(
        images.astype(jnp.float32), wx_w, wx_s, wy_w, wy_s,
        compute_dtype=_compute_dtype(dtype),
    )
    crops = P.normalize_clip(crops, dtype)
    emb = C.image_encoder(params, crops, config)
    return _l2_normalize(emb)


def _blocks_fn(
    params, images, level_wx, level_wy, whole_wx, whole_wy, coords,
    *, config, dtype,
):
    """Batched across images: every per-image input carries a leading
    ``B`` dim (the per-size pyramid matrices are per-ITEM inputs, so one
    compiled program serves arbitrary size mixes). Batching amortizes
    the per-dispatch round trip — the blocks program is tiny (~25 crops
    of 50 tokens) and was dispatch-bound one image at a time.

    ``coords`` is the FLAT ``(T, 4)`` block list (image, level, y, x)
    across the whole batch, bucketed by the caller: the ViT batch is
    ``B`` whole images + exactly ``T`` blocks, not ``B * max_blocks``
    padded rows. Returns ``(B + T, output_dim)``, wholes first."""

    images, level_wx, level_wy, whole_wx, whole_wy = (
        _stacked(a)
        for a in (images, level_wx, level_wy, whole_wx, whole_wy)
    )
    cdt = _compute_dtype(dtype)

    def levels_one(image, lwx, lwy, wwx, wwy):
        imgf = image.astype(jnp.float32)

        def scan_body(img, ws):
            nxt = P.apply_resize_pair(
                img, ws[0], ws[1], compute_dtype=cdt
            )
            # store the level as uint8: every level is round_u8-ed to
            # exact integers in [0, 255], so the cast is LOSSLESS — and
            # the stacked levels buffer is the program's largest tensor
            # (fp32 form: 8.3 GB written + block-gathered per 24-image
            # batch; uint8 is 4x less HBM traffic). The fp32 carry keeps
            # the level->level resize chain bit-identical.
            return nxt, nxt.astype(jnp.uint8)

        _, pyramid = jax.lax.scan(scan_body, imgf, (lwx, lwy))
        levels = jnp.concatenate(
            [image.astype(jnp.uint8)[None], pyramid], axis=0
        )
        whole = P.apply_resize_pair(imgf, wwx, wwy, compute_dtype=cdt)
        return levels, whole

    levels, wholes = jax.vmap(levels_one)(
        images, level_wx, level_wy, whole_wx, whole_wy
    )  # (B, 1 + L, PH, PW, 3) uint8, (B, 224, 224, 3)

    def slice_block(c):
        return jax.lax.dynamic_slice(
            levels, (c[0], c[1], c[2], c[3], 0), (1, 1, 224, 224, 3)
        )[0, 0]

    blocks = jax.vmap(slice_block)(coords)  # (T, 224, 224, 3) uint8
    crops = jnp.concatenate([wholes, blocks.astype(wholes.dtype)], axis=0)
    crops = P.normalize_clip(crops, dtype)
    emb = C.image_encoder(params, crops, config)
    return _l2_normalize(emb)


def _objects_fn(params, image, meta, masks, *, config, dtype, k_pad):
    # The host ships 9 scalars per crop; tap weights, window starts and
    # the dense resample matrices are all derived on device
    # (``ops/preprocess.device_coeffs``) — no per-crop host Python work
    # and no coefficient shipping on the hot path.
    wx_w, wx_start, wy_w, wy_start = P.device_coeffs(meta, k_pad)
    crops = P.apply_resize_coeffs(
        image.astype(jnp.float32), wx_w, wx_start, wy_w, wy_start,
        compute_dtype=_compute_dtype(dtype),
    )
    crops = P.normalize_clip(crops, dtype)
    emb = C.image_encoder_surgery(params, crops, masks, config)
    return _l2_normalize(emb)


def _objects_multi_fn(
    params, images, img_idx, metas, masks, *, config, dtype, k_pad
):
    """Several images' crop chunks in ONE program (see
    :meth:`OakeSteps.objects_multi_step`): per-chunk preprocessing is
    vmapped over the chunk axis against each chunk's own source image,
    then the surgery encoder runs once over the flattened crops —
    numerically identical to G single-image dispatches."""
    images = _stacked(images)  # (I, PH, PW, 3)
    metas = _stacked(metas)  # (G, B, 9)
    masks = _stacked(masks)  # (G, B, g, g)
    src = jnp.take(images, img_idx, axis=0)  # (G, PH, PW, 3)
    cdt = _compute_dtype(dtype)

    def prep_one(image, meta):
        wx_w, wx_start, wy_w, wy_start = P.device_coeffs(meta, k_pad)
        return P.apply_resize_coeffs(
            image.astype(jnp.float32), wx_w, wx_start, wy_w, wy_start,
            compute_dtype=cdt,
        )

    crops = jax.vmap(prep_one)(src, metas)  # (G, B, 224, 224, 3)
    g, b = crops.shape[:2]
    crops = P.normalize_clip(crops, dtype).reshape(
        g * b, *crops.shape[2:]
    )
    emb = C.image_encoder_surgery(
        params, crops, masks.reshape(g * b, *masks.shape[2:]), config
    )
    return _l2_normalize(emb)


def _objects_packed_fn(
    params, bufs, *, config, dtype, pad_h, pad_w, crop_rows, k_pad
):
    """Packed-buffer variant of :func:`_objects_multi_fn` (see
    :meth:`OakeSteps.objects_packed_step`): each chunk arrives as one
    flat uint8 buffer ``[image | masks | meta]``; the unpack is
    reshape + ``bitcast_convert_type`` — zero-copy on device."""
    buf = _stacked(bufs)  # (G, L) uint8
    g = buf.shape[0]
    grid = config.grid
    n_img = pad_h * pad_w * 3
    n_mask = crop_rows * grid * grid
    images = buf[:, :n_img].reshape(g, pad_h, pad_w, 3)
    masks = buf[:, n_img:n_img + n_mask].reshape(
        g, crop_rows, grid, grid
    )
    metas = jax.lax.bitcast_convert_type(
        buf[:, n_img + n_mask:].reshape(g, crop_rows, 9, 4), jnp.float32
    )  # (G, B, 9)
    cdt = _compute_dtype(dtype)

    def prep_one(image, meta):
        wx_w, wx_start, wy_w, wy_start = P.device_coeffs(meta, k_pad)
        return P.apply_resize_coeffs(
            image.astype(jnp.float32), wx_w, wx_start, wy_w, wy_start,
            compute_dtype=cdt,
        )

    crops = jax.vmap(prep_one)(images, metas)  # (G, B, 224, 224, 3)
    crops = P.normalize_clip(crops, dtype).reshape(
        g * crop_rows, *crops.shape[2:]
    )
    emb = C.image_encoder_surgery(
        params, crops, masks.reshape(g * crop_rows, grid, grid), config
    )
    return _l2_normalize(emb)
