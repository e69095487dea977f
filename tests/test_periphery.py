"""Periphery: BPE tokenizer, prompt builders, build_annotations."""

import gzip
import json

import numpy as np
import pytest

from oadp_tpu.models.tokenizer import SimpleTokenizer, tokenize


@pytest.fixture(scope='module')
def tiny_tokenizer(tmp_path_factory):
    """Miniature merges file: enough BPE to merge 'ca t' and 'cat</w>'."""
    root = tmp_path_factory.mktemp('bpe')
    merges = [
        'version-marker',
        'c a',
        'ca t</w>',
        'd o',
        'do g</w>',
        'p h',
        'ph o',
        'pho t',
        'phot o</w>',
    ]
    path = root / 'bpe.txt.gz'
    with gzip.open(path, 'wt') as f:
        f.write('\n'.join(merges) + '\n')
    return SimpleTokenizer(path)


def test_bpe_merges_applied(tiny_tokenizer):
    tok = tiny_tokenizer
    ids = tok.encode('cat')
    assert [tok.decoder[i] for i in ids] == ['cat</w>']
    ids = tok.encode('dog cat')
    assert [tok.decoder[i] for i in ids] == ['dog</w>', 'cat</w>']


def test_unmerged_falls_back_to_bytes(tiny_tokenizer):
    tok = tiny_tokenizer
    ids = tok.encode('xyz')
    pieces = [tok.decoder[i] for i in ids]
    assert pieces == ['x', 'y', 'z</w>']


def test_tokenize_matrix(tiny_tokenizer):
    tok = tiny_tokenizer
    out = tokenize(['cat', 'dog dog'], tok, context_length=8)
    assert out.shape == (2, 8)
    assert (out[:, 0] == tok.sot).all()
    assert out[0, 2] == tok.eot
    assert out[0, 3:].sum() == 0  # zero padded
    assert out[1, 3] == tok.eot


def test_tokenize_truncation(tiny_tokenizer):
    tok = tiny_tokenizer
    out = tokenize(['cat ' * 50], tok, context_length=8, truncate=True)
    assert out.shape == (1, 8)
    assert out[0, -1] == tok.eot
    with pytest.raises(ValueError):
        tokenize(['cat ' * 50], tok, context_length=8, truncate=False)


def test_case_and_whitespace_cleaning(tiny_tokenizer):
    tok = tiny_tokenizer
    assert tok.encode('  CAT \n dog ') == tok.encode('cat dog')


def test_vild_prompt_builder_mean_of_normalized(tiny_tokenizer):
    import jax
    from oadp_tpu.models import clip as C
    from oadp_tpu.prompts.vild import build_vild_prompts

    config = C.TextConfig(
        context_length=16, vocab_size=len(tiny_tokenizer.encoder),
        width=32, layers=2, heads=2, output_dim=16,
    )
    params = C.init_text_params(jax.random.key(0), config)
    names = ['cat', 'dog']
    emb = build_vild_prompts(
        params, tiny_tokenizer, names, config, batch_size=2,
        prompts=['a photo of a {}', 'This is a {}'],
    )
    assert emb.shape == (2, 16)
    # mean of unit vectors: norm <= 1, and > 0
    norms = np.linalg.norm(emb, axis=-1)
    assert (norms <= 1.0 + 1e-5).all() and (norms > 0.1).all()


def test_build_annotations(tmp_path):
    from oadp_tpu.base import coco
    from oadp_tpu.build_annotations import COCOBuilder

    names = coco.all_
    # ann file with shuffled original ids
    cats = [
        dict(id=100 + i, name=name) for i, name in enumerate(names)
    ]
    anns = [
        dict(id=1, image_id=1, category_id=100 + names.index(names[0]),
             bbox=[0, 0, 10, 10], area=100, iscrowd=0),
        # a novel-category annotation (index >= num_bases)
        dict(id=2, image_id=2,
             category_id=100 + coco.num_bases,
             bbox=[0, 0, 10, 10], area=100, iscrowd=0),
    ]
    data = dict(
        images=[dict(id=1), dict(id=2), dict(id=3)],
        annotations=anns,
        categories=cats,
    )
    (tmp_path / 'instances_val2017.json').write_text(json.dumps(data))
    COCOBuilder(str(tmp_path)).build('instances_val2017.json', min=True)

    full = json.loads((tmp_path / 'instances_val2017.65.json').read_text())
    assert [c['id'] for c in full['categories']] == list(range(65))
    assert full['annotations'][0]['category_id'] == 0
    assert full['annotations'][1]['category_id'] == coco.num_bases

    base = json.loads((tmp_path / 'instances_val2017.48.json').read_text())
    assert len(base['annotations']) == 1  # novel ann filtered

    minimal = json.loads(
        (tmp_path / 'instances_val2017.65.min.json').read_text()
    )
    assert [i['id'] for i in minimal['images']] == [1, 2]  # img 3 empty


def test_maybe_initialize_distributed_gated(monkeypatch):
    """The jax.distributed init (reference NCCL init,
    oadp/dp/train.py:61-63) is opt-in via OADP_DISTRIBUTED and
    idempotent; single-process dev setups never touch it."""
    from oadp_tpu.utils import dist

    calls = []
    monkeypatch.setattr(dist, '_initialized', False)
    monkeypatch.delenv('OADP_DISTRIBUTED', raising=False)
    assert dist.maybe_initialize_distributed() is False

    import jax
    monkeypatch.setenv('OADP_DISTRIBUTED', '1')
    monkeypatch.setattr(
        jax.distributed, 'initialize', lambda: calls.append(1)
    )
    assert dist.maybe_initialize_distributed() is True
    assert dist.maybe_initialize_distributed() is True  # idempotent
    assert calls == [1]


def test_detpro_repackager(tmp_path):
    """``prompts.detpro`` repackages DetPro's LVIS row matrix with
    annotation-spelling names in original category-id order (reference
    ``oadp/prompts/detpro.py``), torch-loadable like every prompt
    file."""
    import numpy as np

    from oadp_tpu.prompts import detpro
    from oadp_tpu.utils import save_pth

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((4, 8)).astype(np.float32)
    save_pth(emb, tmp_path / 'iou_neg5_ens.pth')
    cats = [  # deliberately unsorted ids; names keep annotation spelling
        dict(id=3, name='stero_equipment'),
        dict(id=1, name='aerosol_can'),
        dict(id=4, name='zucchini'),
        dict(id=2, name='air_conditioner'),
    ]
    (tmp_path / 'lvis_val.json').write_text(
        json.dumps(dict(categories=cats))
    )
    out = tmp_path / 'prompts' / 'detpro_lvis.pth'
    detpro.main([
        '--embeddings', str(tmp_path / 'iou_neg5_ens.pth'),
        '--ann-file', str(tmp_path / 'lvis_val.json'),
        '--output', str(out),
    ])
    import torch
    pack = torch.load(str(out), weights_only=False)
    assert pack['names'] == [
        'aerosol_can', 'air_conditioner', 'stero_equipment', 'zucchini'
    ]
    np.testing.assert_array_equal(np.asarray(pack['embeddings']), emb)


def test_detpro_row_count_mismatch(tmp_path):
    """A category/row count mismatch must fail loudly, not silently
    misalign every class embedding."""
    import numpy as np
    import pytest as _pytest

    from oadp_tpu.prompts import detpro
    from oadp_tpu.utils import save_pth

    save_pth(np.zeros((3, 8), np.float32), tmp_path / 'e.pth')
    (tmp_path / 'ann.json').write_text(json.dumps(dict(categories=[
        dict(id=1, name='a'), dict(id=2, name='b')
    ])))
    with _pytest.raises(AssertionError):
        detpro.main([
            '--embeddings', str(tmp_path / 'e.pth'),
            '--ann-file', str(tmp_path / 'ann.json'),
            '--output', str(tmp_path / 'out.pth'),
        ])
