"""Full-geometry (ViT-B/32) fp32 CLIP parity with random weights.

The scaled-down parity suite (``test_clip_parity.py``) cannot catch
geometry-dependent bugs: positional-embedding interpolation 7→14,
half-stride conv at patch 32 (padding 15), mask handling at grid 14
(197 tokens), and the preprocess→embedding chain at the real 224px
resolution. This file pins them at the production geometry — stock 224
(50 tokens) and 2×-surgery (197 tokens), reference
``oadp/oake/objects.py:285-338`` — against the torch oracle.
"""

import numpy as np
import PIL.Image
import pytest

from oadp_tpu.models import clip as jclip

torch = pytest.importorskip('torch')


def _cosine(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    return float(cos.min())


@pytest.fixture(scope='module')
def vitb32():
    from tests.oracles import clip_torch

    torch.manual_seed(0)
    visual = clip_torch.VisionTransformer(
        input_resolution=224, patch_size=32, width=768, layers=12,
        heads=12, output_dim=512,
    ).eval()
    state = clip_torch.state_dict_openai_style(visual)
    vit_params, _ = jclip.convert_torch_state_dict(state)
    config = jclip.ViTConfig()  # the default IS ViT-B/32
    return visual, vit_params, config


def test_stock_fullsize_parity(vitb32):
    """224px stock encoder: 50 tokens, grid 7."""
    visual, vit_params, config = vitb32
    rng = np.random.RandomState(1)
    images = rng.randn(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        expected = visual(
            torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    actual = np.asarray(jclip.image_encoder(vit_params, images, config))
    assert _cosine(actual, expected) > 0.999
    np.testing.assert_allclose(actual, expected, atol=2e-3, rtol=1e-2)


def test_surgery_fullsize_parity(vitb32):
    """2×-surgery encoder: PE 7→14 bicubic, stride 16, padding 15,
    197 tokens, masked attention pooling at grid 14."""
    import torch.nn.functional as F

    visual, vit_params, config = vitb32
    up_params, up_config = jclip.upsample_vit_params(vit_params, config)
    assert up_config.grid == 14
    assert up_params['positional_embedding'].shape[0] == 197

    rng = np.random.RandomState(2)
    images = rng.randn(2, 224, 224, 3).astype(np.float32)
    masks = (rng.rand(2, 14, 14) > 0.5).astype(np.float32)

    pe = visual.positional_embedding.data
    patch_pe = pe[1:].reshape(7, 7, -1).permute(2, 0, 1)[None]
    patch_pe = F.interpolate(
        patch_pe, size=(14, 14), mode='bicubic', align_corners=False
    )
    new_pe = torch.cat(
        [pe[:1], patch_pe[0].permute(1, 2, 0).reshape(196, -1)]
    )
    np.testing.assert_allclose(
        np.asarray(up_params['positional_embedding']),
        new_pe.detach().numpy(), atol=1e-4, rtol=1e-4,
    )
    visual.positional_embedding = torch.nn.Parameter(new_pe)
    visual.conv1.stride = (16, 16)
    visual.conv1.padding = ((32 - 1) // 2,) * 2

    with torch.no_grad():
        expected = visual.masked_forward(
            torch.from_numpy(images.transpose(0, 3, 1, 2)),
            torch.from_numpy(masks),
        ).numpy()
    actual = np.asarray(
        jclip.image_encoder_surgery(up_params, images, masks, up_config)
    )
    assert _cosine(actual, expected) > 0.999
    np.testing.assert_allclose(actual, expected, atol=2e-3, rtol=1e-2)


def test_objects_chain_fullsize_parity(vitb32):
    """The production OAKE-objects chain at full geometry: proposals →
    ADAPTIVE expansion → on-device crop/resize/normalize (device-built
    coefficients) → grid-14 background masks → surgery encoder → L2
    norm, vs the reference recipe (PIL crop+resize, torch masked
    forward; ``oadp/oake/objects.py:316-338``)."""
    import jax.numpy as jnp
    import torch.nn.functional as F

    from oadp_tpu.ops import boxes as B
    from oadp_tpu.ops import preprocess as P

    visual, vit_params, config = vitb32
    up_params, up_config = jclip.upsample_vit_params(vit_params, config)
    # (surgery already applied to `visual` by the previous test? no —
    # fixtures are module-scoped but `visual` mutations in
    # test_surgery_fullsize_parity persist; re-apply deterministically)
    if visual.positional_embedding.shape[0] != 197:
        pe = visual.positional_embedding.data
        patch_pe = pe[1:].reshape(7, 7, -1).permute(2, 0, 1)[None]
        patch_pe = F.interpolate(
            patch_pe, size=(14, 14), mode='bicubic', align_corners=False
        )
        visual.positional_embedding = torch.nn.Parameter(
            torch.cat([pe[:1], patch_pe[0].permute(1, 2, 0).reshape(196, -1)])
        )
        visual.conv1.stride = (16, 16)
        visual.conv1.padding = ((32 - 1) // 2,) * 2

    rng = np.random.RandomState(3)
    image = rng.randint(0, 256, (353, 468, 3), np.uint8)
    h, w = image.shape[:2]
    proposals = np.array([
        [30.0, 40.0, 120.5, 150.3],
        [200.2, 80.9, 380.0, 300.0],
        [5.0, 5.0, 60.0, 45.0],
    ], np.float32)

    crops = B.expand_boxes(proposals, w, h, 'ADAPTIVE')
    foregrounds = proposals - np.concatenate(
        [crops[:, :2], crops[:, :2]], axis=-1
    )
    grid = up_config.grid
    masks = B.grid_mask(foregrounds, crops, grid)

    # --- oracle: PIL crop → resize 224 bicubic → CLIP normalize →
    #     reference grid mask → torch surgery masked forward
    pil = PIL.Image.fromarray(image)
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    oracle_embs = []
    for i in range(len(crops)):
        obj = pil.crop(tuple(crops[i]))
        ow, oh = obj.size
        if ow <= oh:
            rw, rh = 224, int(224 * oh / ow)
        else:
            rw, rh = int(224 * ow / oh), 224
        if (rw, rh) != (ow, oh):
            obj = obj.resize((rw, rh), PIL.Image.BICUBIC)
        left = int(round((rw - 224) / 2.0))
        top = int(round((rh - 224) / 2.0))
        obj = obj.crop((left, top, left + 224, top + 224))
        arr = (np.asarray(obj, np.float32) / 255.0 - mean) / std
        # reference _mask (objects.py:129-155)
        x = torch.arange(int(np.ceil(crops[i, 2] - crops[i, 0] - 1e-9)))
        y = torch.arange(int(np.ceil(crops[i, 3] - crops[i, 1] - 1e-9)))
        wm = (foregrounds[i, 0] <= x) & (x <= foregrounds[i, 2])
        hm = (foregrounds[i, 1] <= y) & (y <= foregrounds[i, 3])
        m = ~(wm[None, :] & hm[:, None])
        m = F.interpolate(
            m[None, None].float(), size=(grid, grid), mode='nearest'
        )[0, 0]
        np.testing.assert_array_equal(m.numpy(), masks[i])
        with torch.no_grad():
            e = visual.masked_forward(
                torch.from_numpy(arr.transpose(2, 0, 1))[None],
                m[None],
            )
        oracle_embs.append(F.normalize(e).numpy()[0])
    oracle_embs = np.stack(oracle_embs)

    # --- ours: padded image + 9 scalars per crop, everything else on
    #     device (the production objects_step math)
    pad = 512
    padded = np.zeros((pad, pad, 3), np.uint8)
    padded[:h, :w] = image
    meta = P.clip_transform_meta(w, h, crops)
    wx_w, wx_s, wy_w, wy_s = P.device_coeffs(jnp.asarray(meta), 13)
    dev_crops = P.apply_resize_coeffs(
        jnp.asarray(padded, jnp.float32), wx_w, wx_s, wy_w, wy_s
    )
    dev_crops = P.normalize_clip(dev_crops, jnp.float32)
    emb = jclip.image_encoder_surgery(
        up_params, dev_crops, jnp.asarray(masks), up_config
    )
    emb = np.asarray(emb)
    emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)

    assert _cosine(emb, oracle_embs) > 0.999
