"""Corrupt OAKE feature files must fail training LOUDLY.

The OAKE side has ``auto_fix`` (write-side integrity repair, reference
``oadp/oake/base.py:45-52``); the DP side consumes those files years
later via ``LoadClipFeatures``. A truncated ``.pth`` hit mid-train must
raise an actionable error that propagates out of the loader thread —
not silently end the epoch early.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')


@pytest.fixture()
def stores(tmp_path):
    from oadp_tpu.utils import save_pth

    key = '000000000007'
    for kind in ('globals', 'blocks', 'objects'):
        (tmp_path / kind).mkdir()
    save_pth(
        np.ones(8, np.float16), tmp_path / 'globals' / f'{key}.pth'
    )
    save_pth(
        {
            'embeddings': np.ones((3, 8), np.float16),
            'bboxes': np.asarray(
                [[0, 0, 64, 64]] * 3, np.float16
            ),
        },
        tmp_path / 'blocks' / f'{key}.pth',
    )
    save_pth(
        {
            'embeddings': np.ones((5, 8), np.float16),
            'bboxes': np.asarray(
                [[0, 0, 32, 32]] * 5, np.float16
            ),
            'objectness': np.ones(5, np.float16),
        },
        tmp_path / 'objects' / f'{key}.pth',
    )
    return tmp_path, key


def _sample(key):
    return {
        'image_id': int(key),
        'bbox_fields': [],
        'gt_boxes': np.asarray([[0.0, 0.0, 30.0, 30.0]], np.float32),
        'gt_labels': np.asarray([1], np.int64),
    }


def test_intact_stores_load(stores):
    from oadp_tpu.base import coco
    from oadp_tpu.dp.datasets import LoadClipFeatures

    root, key = stores
    op = LoadClipFeatures(
        globals_=str(root / 'globals'),
        blocks=str(root / 'blocks'),
        objects=str(root / 'objects'),
    )
    out = op(_sample(key), coco)
    assert out['clip_global'].shape == (8,)
    assert out['clip_objects'].shape[1] == 8


def test_truncated_feature_raises_actionable_error(stores):
    from oadp_tpu.base import coco
    from oadp_tpu.dp.datasets import (
        CorruptFeatureError,
        LoadClipFeatures,
    )

    root, key = stores
    path = root / 'objects' / f'{key}.pth'
    path.write_bytes(path.read_bytes()[: path.stat().st_size // 2])
    op = LoadClipFeatures(
        globals_=str(root / 'globals'),
        blocks=str(root / 'blocks'),
        objects=str(root / 'objects'),
    )
    with pytest.raises(CorruptFeatureError) as exc:
        op(_sample(key), coco)
    msg = str(exc.value)
    assert key in msg and 'auto_fix' in msg and 'objects' in msg


def test_missing_feature_still_filenotfound(stores):
    """A MISSING file is a config/path problem and keeps its normal
    exception type (resume/skip logic may rely on it) — only unreadable
    EXISTING files map to CorruptFeatureError."""
    from oadp_tpu.base import coco
    from oadp_tpu.dp.datasets import LoadClipFeatures

    root, key = stores
    (root / 'blocks' / f'{key}.pth').unlink()
    op = LoadClipFeatures(blocks=str(root / 'blocks'))
    with pytest.raises(FileNotFoundError):
        op(_sample(key), coco)


def test_loader_propagates_worker_error():
    """The prefetch thread must re-raise into the consuming loop: a
    swallowed error would silently truncate the epoch."""
    from oadp_tpu.dp.datasets import CorruptFeatureError, Loader

    class _DS:
        def __len__(self):
            return 4

        def aspect_group(self, i):
            return 0

        def __getitem__(self, i):
            return {'i': i}

    def transform(sample, salt=None):
        raise CorruptFeatureError('corrupt feature: rerun auto_fix')

    loader = Loader(
        _DS(), lambda samples: {'n': len(samples)}, 2, transform,
        shuffle=False, workers=1,
    )
    with pytest.raises(CorruptFeatureError):
        list(loader.epoch(0))
