"""pack_batch/unpack_batch round trip: the single-transfer batch layout
(``dp/datasets.py``) must be bit-exact through the jitted unpack for
every dtype the builder emits (uint8 canvases, fp32 fields, int32
labels, bool masks)."""

import jax
import numpy as np
import pytest

from oadp_tpu.dp.datasets import (
    BatchBuilder,
    batch_canvas,
    pack_batch,
    unpack_batch,
)


def _batch(b=2, h=64, w=96):
    rng = np.random.default_rng(0)
    return {
        'images': rng.integers(0, 255, (b, h, w, 3)).astype(np.uint8),
        'img_hw': rng.random((b, 2)).astype(np.float32) * 64,
        'gt_boxes': rng.random((b, 7, 4)).astype(np.float32) * 64,
        'gt_labels': rng.integers(0, 5, (b, 7)).astype(np.int32),
        'gt_valid': rng.random((b, 7)) > 0.5,
        'clip_objects': rng.standard_normal((b, 9, 16)).astype(
            np.float32
        ),
        'image_ids': np.asarray([3, 4]),
        'scale_factor': rng.random((b, 4)).astype(np.float32),
    }


def test_pack_round_trip_bit_exact():
    batch = _batch()
    packed = pack_batch(batch)
    assert packed['packed'].dtype == np.uint8
    assert packed['packed'].shape[0] == 2
    # host-side keys pass through untouched
    np.testing.assert_array_equal(packed['image_ids'], batch['image_ids'])
    assert batch_canvas(packed) == (64, 96)

    spec = packed['_pack_spec']
    out = jax.jit(
        lambda buf: unpack_batch(buf, spec)
    )(packed['packed'])
    fields = {
        k: v for k, v in batch.items()
        if k not in ('image_ids', 'scale_factor')
    }
    assert sorted(out) == sorted(fields)
    for k, v in fields.items():
        got = np.asarray(out[k])
        assert got.dtype == v.dtype, k
        np.testing.assert_array_equal(got, v, err_msg=k)


def test_builder_pack_flag_produces_packed_batches():
    builder = BatchBuilder(
        canvas=(64, 96), max_gts=4, max_blocks=4, max_objects=4,
        embedding_dim=8, num_all=5, with_clip=True, pack=True,
    )
    samples = [
        dict(
            image=np.zeros((32, 48, 3), np.uint8),
            img_hw=np.asarray([32.0, 48.0], np.float32),
            gt_boxes=np.asarray([[1, 2, 9, 9]], np.float32),
            gt_labels=np.asarray([1], np.int64),
            image_id=7,
            scale_factor=np.ones(4, np.float32),
        )
    ]
    batch = builder(samples)
    assert set(batch) == {
        'packed', '_pack_spec', 'image_ids', 'scale_factor'
    }
    out = unpack_batch(batch['packed'], batch['_pack_spec'])
    assert np.asarray(out['images']).shape == (1, 64, 96, 3)
    assert np.asarray(out['gt_valid'])[0, 0]
    assert not np.asarray(out['gt_valid'])[0, 1]


def test_unpack_follows_buffer_batch_dim():
    """Tail batches pad by repeating packed ROWS (DetEvaluator.run);
    the unpack must size the batch dim from the buffer, not the spec."""
    batch = _batch(b=2)
    packed = pack_batch(batch)
    buf = np.concatenate(
        [packed['packed'], np.repeat(packed['packed'][-1:], 3, 0)]
    )
    out = unpack_batch(buf, packed['_pack_spec'])
    got = np.asarray(out['gt_boxes'])
    assert got.shape == (5, 7, 4)
    np.testing.assert_array_equal(got[2], batch['gt_boxes'][1])


def test_pack_spec_is_hashable_and_static():
    a = pack_batch(_batch())
    b = pack_batch(_batch())
    assert a['_pack_spec'] == b['_pack_spec']
    hash(a['_pack_spec'])  # usable as a jit static / cache key
