"""End-to-end OAKE pipelines on synthetic COCO data, validated feature-
by-feature against a torch+PIL oracle that replicates the reference's
host pipelines (/root/reference/oadp/oake/*.py). This is the golden-file
parity test demanded by SURVEY.md §4.
"""

import pickle

import numpy as np
import PIL.Image
import pytest

torch = pytest.importorskip('torch')

VIT = dict(width=64, layers=2, heads=2, output_dim=32)
PAD = 320


def _cos(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(((a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )).min())


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    from tests.oracles import clip_torch
    from tests.synthetic_data import make_synthetic_coco

    root = tmp_path_factory.mktemp('oake')
    data = make_synthetic_coco(root, n_images=4, n_proposals=12)

    torch.manual_seed(7)
    visual = clip_torch.VisionTransformer(
        input_resolution=224, patch_size=32, output_dim=VIT['output_dim'],
        width=VIT['width'], layers=VIT['layers'], heads=VIT['heads'],
    ).eval()
    ckpt = root / 'clip.pt'
    torch.save(
        clip_torch.state_dict_openai_style(visual, numpy=False), ckpt
    )

    cfg_text = f"""
val = dict(
    dataloader=dict(
        dataset=dict(
            root={str(root / 'coco' / 'val2017')!r},
            annFile={data['ann_file']!r},
            output_dir={str(root / 'out')!r},
            proposal_file={data['proposal_file']!r},
            proposal_sorted=True,
        ),
    ),
)
model = dict(
    checkpoint={str(ckpt)!r},
    dtype='float32',
    max_image_size={PAD},
    vit={VIT!r},
)
log = dict(interval=10)
batch_size = 4
mini_batch_size = 16
"""
    cfg_path = root / 'cfg.py'
    cfg_path.write_text(cfg_text)
    return dict(
        root=root, data=data, visual=visual, cfg_path=cfg_path, ckpt=ckpt
    )


def _transform_tensor(img: PIL.Image.Image, crop_box=None):
    """Reference CLIP preprocess via PIL (oracle)."""
    from oadp_tpu.models.clip import CLIP_MEAN, CLIP_STD
    from tests.test_preprocess import _pil_clip_transform
    arr = _pil_clip_transform(img, crop_box) / 255.0
    arr = (arr - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    return torch.from_numpy(
        arr.transpose(2, 0, 1)[None].astype(np.float32)
    )


def _load_out(setup, sub, id_):
    from oadp_tpu.utils import load_pth
    return load_pth(setup['root'] / 'out' / sub / f'{id_:012d}.pth')


def _run(setup, module, out_sub, extra=()):
    import oadp_tpu.oake.blocks
    import oadp_tpu.oake.globals
    import oadp_tpu.oake.objects
    mod = {
        'globals': oadp_tpu.oake.globals,
        'blocks': oadp_tpu.oake.blocks,
        'objects': oadp_tpu.oake.objects,
    }[module]
    out_dir = str(setup['root'] / 'out' / out_sub)
    argv = [
        f'test_{module}',
        str(setup['cfg_path']),
        '--override',
        f'.val.dataloader.dataset.output_dir:{out_dir!r}',
        *extra,
    ]
    return mod.main(argv)


# ---------------------------------------------------------------------------


def test_globals_e2e(setup):
    _run(setup, 'globals', 'globals')
    img_dir = setup['root'] / 'coco' / 'val2017'
    for id_ in setup['data']['ids']:
        saved = _load_out(setup, 'globals', id_)
        assert saved.shape == (VIT['output_dim'],)
        assert saved.dtype == np.float16
        with PIL.Image.open(img_dir / f'{id_:012d}.jpg') as img:
            x = _transform_tensor(img.convert('RGB'))
        with torch.no_grad():
            expected = setup['visual'](x)[0]
            expected = expected / expected.norm()
        assert _cos(saved, expected.numpy()) > 0.9999


def test_globals_resume(setup):
    out = setup['root'] / 'out' / 'globals'
    before = {p.name: p.stat().st_mtime_ns for p in out.glob('*.pth')}
    assert before
    _run(setup, 'globals', 'globals')  # second run must skip everything
    after = {p.name: p.stat().st_mtime_ns for p in out.glob('*.pth')}
    assert before == after


def test_blocks_e2e(setup):
    from oadp_tpu.oake.partitions import first_block_bbox
    _run(setup, 'blocks', 'blocks')
    img_dir = setup['root'] / 'coco' / 'val2017'
    visual = setup['visual']
    for id_ in setup['data']['ids']:
        saved = _load_out(setup, 'blocks', id_)
        with PIL.Image.open(img_dir / f'{id_:012d}.jpg') as img:
            img = img.convert('RGB')
            # oracle: reference blocks._preprocess (blocks.py:89-109)
            tensors = [_transform_tensor(img)]
            bboxes = [first_block_bbox(*img.size)]
            image, scale = img, 1.0
            while True:
                w, h = image.size
                from oadp_tpu.oake.partitions import _partition
                xs = _partition(w, 224, 112)
                ys = _partition(h, 224, 112)
                if not xs or not ys:
                    break
                for x in xs:
                    for y in ys:
                        block = image.crop((x, y, x + 224, y + 224))
                        tensors.append(_transform_tensor(block))
                        bboxes.append((
                            x * scale, y * scale,
                            x * scale + 224 * scale,
                            y * scale + 224 * scale,
                        ))
                image = image.resize((int(w / 1.5), int(h / 1.5)))
                scale *= 1.5
        with torch.no_grad():
            expected = visual(torch.cat(tensors))
            expected = torch.nn.functional.normalize(expected).numpy()
        assert saved['embeddings'].shape == expected.shape
        np.testing.assert_allclose(
            saved['bboxes'], np.asarray(bboxes, np.float16), rtol=1e-3
        )
        assert _cos(saved['embeddings'], expected) > 0.9999


def test_objects_e2e(setup):
    import torch.nn.functional as F

    from oadp_tpu.ops import boxes as B
    from tests.test_boxes import _oracle_mask
    _run(setup, 'objects', 'objects')

    # surgery the oracle model like the reference (objects.py:285-301)
    visual = setup['visual']
    pe = visual.positional_embedding.data
    patch_pe = pe[1:].reshape(7, 7, -1).permute(2, 0, 1)[None]
    patch_pe = F.interpolate(
        patch_pe, size=(14, 14), mode='bicubic', align_corners=False
    )
    visual.positional_embedding = torch.nn.Parameter(
        torch.cat([pe[:1], patch_pe[0].permute(1, 2, 0).reshape(196, -1)])
    )
    visual.conv1.stride = (16, 16)
    visual.conv1.padding = (15, 15)

    with open(setup['data']['proposal_file'], 'rb') as f:
        proposals_list = pickle.load(f)
    by_id = dict(zip(sorted(setup['data']['ids']), proposals_list))
    img_dir = setup['root'] / 'coco' / 'val2017'

    for id_ in setup['data']['ids']:
        saved = _load_out(setup, 'objects', id_)
        raw = by_id[id_]
        props, objn = raw[:, :4], raw[:, 4:5]
        keep = B.filter_min_wh(props, 4, 4)
        props, objn = props[keep], objn[keep]
        with PIL.Image.open(img_dir / f'{id_:012d}.jpg') as img:
            img = img.convert('RGB')
            crops = B.expand_boxes(props, *img.size, 'ADAPTIVE')
            tensors, masks = [], []
            for p, c in zip(props, crops):
                tensors.append(_transform_tensor(img, tuple(c)))
                fg = p - np.concatenate([c[:2], c[:2]])
                masks.append(_oracle_mask(tuple(fg), tuple(c), 14))
        with torch.no_grad():
            expected = visual.masked_forward(
                torch.cat(tensors),
                torch.from_numpy(np.stack(masks)),
            )
            expected = F.normalize(expected).numpy()
        np.testing.assert_allclose(
            saved['bboxes'], props.astype(np.float16), rtol=1e-3
        )
        np.testing.assert_allclose(
            saved['objectness'], objn.astype(np.float16), rtol=1e-3
        )
        assert saved['embeddings'].shape == expected.shape
        assert _cos(saved['embeddings'], expected) > 0.9999


def test_objects_dry_run(setup, monkeypatch):
    monkeypatch.setenv('DRY_RUN', '1')
    _run(setup, 'objects', 'objects_dry')
    out = setup['root'] / 'out' / 'objects_dry'
    files = list(out.glob('*.pth'))
    assert len(files) == 3  # datasets truncate to 3 images
    from oadp_tpu.utils import load_pth
    for f in files:
        assert load_pth(f)['embeddings'].shape[0] <= 5  # 5-proposal cap


def test_globals_auto_fix(setup):
    """auto_fix probes existing outputs and regenerates corrupt ones
    (reference oadp/oake/base.py:45-52)."""
    out = setup['root'] / 'out' / 'globals'
    files = sorted(out.glob('*.pth'))
    assert files
    good = files[0].read_bytes()
    files[0].write_bytes(b'corrupt!')
    intact_before = files[1].stat().st_mtime_ns
    _run(
        setup, 'globals', 'globals',
        extra=['.val.dataloader.dataset.auto_fix:True'],
    )
    # corrupt file regenerated, content equivalent to the original
    regenerated = torch.load(files[0], weights_only=False)
    original = pickle_roundtrip = torch.load(
        __import__('io').BytesIO(good), weights_only=False
    )
    assert _cos(np.asarray(regenerated), np.asarray(original)) > 0.9999
    # intact file untouched
    assert files[1].stat().st_mtime_ns == intact_before


def test_objects_multi_step_matches_single():
    """``objects_multi_step`` (several images' chunks in one dispatch)
    must be numerically identical to per-image ``objects_step`` calls,
    including mixed chunk->image assignment and group offsets."""
    import jax.numpy as jnp

    from oadp_tpu.oake.encoders import OakeSteps, load_clip
    from oadp_tpu.ops import preprocess as P

    model = load_clip(None, 'float32', vit=VIT)
    steps = OakeSteps(model, 128, 128)
    rng = np.random.default_rng(3)
    imgs = [
        rng.integers(0, 256, (128, 128, 3), np.uint8) for _ in range(2)
    ]
    g = model.grid

    def mk(n):
        sides = rng.uniform(16, 100, n)
        x0 = rng.uniform(0, 28, n)
        y0 = rng.uniform(0, 28, n)
        boxes = np.stack(
            [x0, y0, np.minimum(x0 + sides, 128),
             np.minimum(y0 + sides, 128)], -1,
        )
        meta = P.clip_transform_meta(128, 128, boxes).astype(np.float32)
        masks = (rng.random((n, g, g)) > 0.5).astype(np.uint8)
        return meta, masks

    chunks = [mk(8) for _ in range(3)]
    # chunks 0 and 2 come from image 0, chunk 1 from image 1
    img_idx = np.asarray([0, 1, 0], np.int32)
    singles = [
        np.asarray(steps.objects_step(
            jnp.asarray(imgs[i]), meta, masks, 13,
        ))
        for i, (meta, masks) in zip(img_idx, chunks)
    ]
    multi = np.asarray(steps.objects_multi_step(
        [jnp.asarray(im) for im in imgs],
        img_idx,
        [c[0] for c in chunks],
        [c[1] for c in chunks],
        13,
    ))
    for i, single in enumerate(singles):
        np.testing.assert_allclose(
            multi[i * 8:(i + 1) * 8], single, atol=2e-5, rtol=1e-4,
        )

    # the packed-buffer production path (one flat uint8 upload per
    # chunk: [image | masks | meta bytes], unpacked on device) must
    # match both
    bufs = [
        jnp.asarray(np.concatenate([
            imgs[i].reshape(-1),
            masks.reshape(-1),
            meta.view(np.uint8).reshape(-1),
        ]))
        for i, (meta, masks) in zip(img_idx, chunks)
    ]
    assert bufs[0].shape[0] == steps.packed_chunk_size(8)
    packed = np.asarray(steps.objects_packed_step(bufs, 8, 13))
    np.testing.assert_allclose(packed, multi, atol=2e-5, rtol=1e-4)
