"""TorchScript-archive checkpoint interop.

The real ``ViT-B-32.pt`` the reference loads (``clip.load_default``,
``oadp/oake/globals.py:47``) is a TorchScript zip archive, not an eager
state dict — ``torch.load`` refuses it and
``oake.encoders._load_torch_checkpoint`` falls back to
``torch.jit.load(...).state_dict()``. These tests exercise that branch
with a miniature scripted module whose state dict has the OpenAI CLIP
key layout, asserting parity with the eager-state-dict path all the way
through ``convert_torch_state_dict``.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')


class _Holder(torch.nn.Module):
    """Parameter container giving a state dict arbitrary dotted keys."""

    def forward(self) -> int:
        return 0


def _module_from_state(state: dict) -> torch.nn.Module:
    root = _Holder()
    for name, tensor in state.items():
        parts = name.split('.')
        mod = root
        for p in parts[:-1]:
            if not hasattr(mod, p):
                mod.add_module(p, _Holder())
            mod = getattr(mod, p)
        mod.register_parameter(
            parts[-1], torch.nn.Parameter(tensor.clone())
        )
    return root


@pytest.fixture(scope='module')
def archive(tmp_path_factory):
    from tests.oracles import clip_torch

    torch.manual_seed(3)
    visual = clip_torch.VisionTransformer(
        input_resolution=64, patch_size=16, output_dim=16,
        width=24, layers=2, heads=2,
    )
    text = clip_torch.TextTransformer(
        context_length=12, vocab_size=64, width=16, layers=1, heads=2,
        output_dim=16,
    )
    state = clip_torch.state_dict_openai_style(visual, text, numpy=False)
    path = tmp_path_factory.mktemp('ts') / 'mini_clip.pt'
    torch.jit.save(torch.jit.script(_module_from_state(state)), path)
    eager_path = path.with_name('mini_clip_eager.pt')
    torch.save(state, eager_path)
    return path, eager_path, state


def test_torch_load_refuses_archive(archive):
    """Precondition for the fallback: a TorchScript zip really does fail
    the eager ``torch.load`` branch (else the test wouldn't cover the
    archive path at all)."""
    path, _, _ = archive
    loaded = torch.load(str(path), map_location='cpu', weights_only=False)
    # Some torch versions raise, others return a ScriptModule-ish object
    # without .numpy()-able items; either way the eager branch must not
    # yield a usable mapping of tensors — _load_torch_checkpoint's
    # hasattr(state, 'state_dict') unwrap handles the latter.
    assert not isinstance(loaded, dict)


def test_archive_state_dict_roundtrip(archive):
    from oadp_tpu.oake.encoders import _load_torch_checkpoint

    path, _, state = archive
    back = _load_torch_checkpoint(str(path))
    assert back is not None
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k].numpy())


def test_archive_matches_eager_through_conversion(archive):
    """The full ``load -> convert_torch_state_dict`` chain produces the
    SAME parameter trees from the archive as from the eager dict."""
    import jax

    from oadp_tpu.models import clip as C
    from oadp_tpu.oake.encoders import _load_torch_checkpoint

    path, eager_path, _ = archive
    p_arc, t_arc = C.convert_torch_state_dict(
        _load_torch_checkpoint(str(path))
    )
    p_eag, t_eag = C.convert_torch_state_dict(
        _load_torch_checkpoint(str(eager_path))
    )
    for tree_a, tree_b in ((p_arc, p_eag), (t_arc, t_eag)):
        leaves_a = jax.tree.leaves(tree_a)
        leaves_b = jax.tree.leaves(tree_b)
        assert len(leaves_a) == len(leaves_b) and leaves_a
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
