"""fp32 parity of the JAX CLIP against the torch oracle (SURVEY.md §7.2).

Uses a scaled-down geometry so CPU tests stay fast; the math is
dimension-independent.
"""

import numpy as np
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
def small_models():
    from tests.oracles import clip_torch
    torch.manual_seed(0)
    visual = clip_torch.VisionTransformer(
        input_resolution=64, patch_size=16, width=96, layers=3, heads=4,
        output_dim=32,
    ).eval()
    text = clip_torch.TextTransformer(
        context_length=20, vocab_size=100, width=64, layers=2, heads=4,
        output_dim=32,
    ).eval()
    state = clip_torch.state_dict_openai_style(visual, text)
    vit_params, text_params = jclip.convert_torch_state_dict(state)
    vit_config = jclip.ViTConfig(
        image_size=64, patch_size=16, stride=16, width=96, layers=3,
        heads=4, output_dim=32,
    )
    text_config = jclip.TextConfig(
        context_length=20, vocab_size=100, width=64, layers=2, heads=4,
        output_dim=32,
    )
    return visual, text, vit_params, text_params, vit_config, text_config


def test_image_encoder_parity(small_models):
    visual, _, vit_params, _, config, _ = small_models
    rng = np.random.RandomState(1)
    images = rng.randn(2, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        expected = visual(
            torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    actual = np.asarray(jclip.image_encoder(vit_params, images, config))

    assert _cosine(actual, expected) > 0.99999
    np.testing.assert_allclose(actual, expected, atol=2e-4, rtol=1e-3)


def test_surgery_parity(small_models):
    visual, _, vit_params, _, config, _ = small_models
    # 2x surgery: stride 8, grid 8 on 64px input
    up_params, up_config = jclip.upsample_vit_params(vit_params, config)
    assert up_config.grid == 8

    rng = np.random.RandomState(2)
    images = rng.randn(2, 64, 64, 3).astype(np.float32)
    masks = (rng.rand(2, 8, 8) > 0.5).astype(np.float32)

    # Oracle: surgery on the torch model (reference objects.py:293-301)
    import torch.nn.functional as F
    grid = 4
    pe = visual.positional_embedding.data
    patch_pe = pe[1:].reshape(grid, grid, -1).permute(2, 0, 1)[None]
    patch_pe = F.interpolate(
        patch_pe, size=(8, 8), mode='bicubic', align_corners=False
    )
    new_pe = torch.cat(
        [pe[:1], patch_pe[0].permute(1, 2, 0).reshape(64, -1)]
    )
    visual.positional_embedding = torch.nn.Parameter(new_pe)
    visual.conv1.stride = (8, 8)
    visual.conv1.padding = ((16 - 1) // 2,) * 2

    with torch.no_grad():
        expected = visual.masked_forward(
            torch.from_numpy(images.transpose(0, 3, 1, 2)),
            torch.from_numpy(masks),
        ).numpy()

    # Our host-side torch-style bicubic must reproduce F.interpolate
    np.testing.assert_allclose(
        np.asarray(up_params['positional_embedding']),
        new_pe.detach().numpy(),
        atol=1e-5,
        rtol=1e-5,
    )
    actual = np.asarray(
        jclip.image_encoder_surgery(up_params, images, masks, up_config)
    )

    assert _cosine(actual, expected) > 0.99999
    np.testing.assert_allclose(actual, expected, atol=5e-4, rtol=1e-3)


def test_fused_wiring_matches_jnp_paths(small_models):
    """The TPU-only fused branches — ``_block_fused`` in the stock
    encoder and the ``use_fused_surgery`` residual/MLP sequencing in
    the surgery encoder — executed here via the Pallas interpreter,
    must match the default jnp paths. Guards the on-chip wiring
    (misplaced residuals etc.) that CPU tests otherwise never run.
    """
    _, _, vit_params, _, config, _ = small_models
    rng = np.random.RandomState(7)
    images = rng.randn(2, 64, 64, 3).astype(np.float32)

    plain = np.asarray(jclip.image_encoder(vit_params, images, config))
    fused = np.asarray(
        jclip.image_encoder(
            vit_params, images, config, interpret_fused=True
        )
    )
    np.testing.assert_allclose(fused, plain, atol=2e-4, rtol=1e-3)

    up_params, up_config = jclip.upsample_vit_params(vit_params, config)
    masks = (rng.rand(2, 8, 8) > 0.5).astype(np.float32)
    plain_s = np.asarray(
        jclip.image_encoder_surgery(up_params, images, masks, up_config)
    )
    fused_s = np.asarray(
        jclip.image_encoder_surgery(
            up_params, images, masks, up_config, interpret_fused=True
        )
    )
    np.testing.assert_allclose(fused_s, plain_s, atol=2e-4, rtol=1e-3)


def test_surgery_mask_matters(small_models):
    visual, _, vit_params, _, config, _ = small_models
    up_params, up_config = jclip.upsample_vit_params(vit_params, config)
    rng = np.random.RandomState(3)
    images = rng.randn(1, 64, 64, 3).astype(np.float32)
    all_fg = np.zeros((1, 8, 8), np.float32)
    half_bg = np.zeros((1, 8, 8), np.float32)
    half_bg[:, :, 4:] = 1.0
    e1 = jclip.image_encoder_surgery(up_params, images, all_fg, up_config)
    e2 = jclip.image_encoder_surgery(up_params, images, half_bg, up_config)
    assert np.abs(np.asarray(e1) - np.asarray(e2)).max() > 1e-3


def test_text_encoder_parity(small_models):
    _, text, _, text_params, _, text_config = small_models
    rng = np.random.RandomState(4)
    tokens = rng.randint(1, 90, size=(3, 20))
    # EOT = highest id, placed mid-sequence (argmax semantics)
    tokens[:, 7] = 99
    with torch.no_grad():
        expected = text(torch.from_numpy(tokens)).numpy()
    actual = np.asarray(
        jclip.text_encoder(text_params, tokens, text_config)
    )
    assert _cosine(actual, expected) > 0.99999
    np.testing.assert_allclose(actual, expected, atol=2e-4, rtol=1e-3)


def test_init_shapes_match_converted(small_models):
    import jax
    _, _, vit_params, text_params, config, text_config = small_models
    init_v = jclip.init_vit_params(jax.random.key(0), config)
    init_t = jclip.init_text_params(jax.random.key(0), text_config)
    for init, conv in ((init_v, vit_params), (init_t, text_params)):
        js = jax.tree.map(lambda x: x.shape, init)
        cs = jax.tree.map(lambda x: x.shape, conv)
        assert js == cs
