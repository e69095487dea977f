"""Box algebra vs a torch oracle of the reference semantics
(/root/reference/oadp/oake/objects.py:76-155)."""

import numpy as np
import pytest

from oadp_tpu.ops import boxes as B

torch = pytest.importorskip('torch')


def _oracle_expand_adaptive(bboxes, image_wh, scale_ratio=8.0):
    """Reference _expand with ADAPTIVE mode (objects.py:94-114)."""
    bboxes = torch.as_tensor(bboxes, dtype=torch.float32)
    image_wh = torch.as_tensor(image_wh, dtype=torch.float32)
    wh = bboxes[:, 2:] - bboxes[:, :2]
    center = (bboxes[:, :2] + bboxes[:, 2:]) / 2
    area = wh[:, 0] * wh[:, 1]
    length = torch.sqrt(area * scale_ratio).unsqueeze(-1)
    lt = center - length / 2
    rb = center + length / 2
    offset = torch.zeros_like(lt)
    offset = torch.where(lt >= 0, offset, -lt)
    offset = torch.where(rb <= image_wh, offset, image_wh - rb)
    offset = torch.where(rb - lt <= image_wh, offset, torch.tensor(0.0))
    return torch.cat([lt + offset, rb + offset], dim=-1).numpy()


def _oracle_mask(foreground, object_box, grid):
    """Reference _mask (objects.py:129-155)."""
    import torch.nn.functional as F
    x = torch.arange(object_box[2] - object_box[0])
    w_mask = (foreground[0] <= x) & (x <= foreground[2])
    y = torch.arange(object_box[3] - object_box[1])
    h_mask = (foreground[1] <= y) & (y <= foreground[3])
    mask = ~(w_mask[None, :] & h_mask[:, None])
    mask = mask[None, None].float()
    return F.interpolate(mask, size=(grid, grid), mode='nearest')[0, 0].numpy()


def test_expand_adaptive_matches_reference():
    rng = np.random.RandomState(0)
    x0 = rng.uniform(0, 500, 64)
    y0 = rng.uniform(0, 350, 64)
    w = rng.uniform(2, 300, 64)
    h = rng.uniform(2, 300, 64)
    props = np.stack([x0, y0, x0 + w, y0 + h], -1).astype(np.float32)
    expected = _oracle_expand_adaptive(props, (640, 427))
    actual = B.expand_boxes(props, 640, 427, 'ADAPTIVE')
    np.testing.assert_allclose(actual, expected, atol=1e-3)
    # expanded boxes are square
    s = B.wh(actual)
    np.testing.assert_allclose(s[:, 0], s[:, 1], atol=1e-3)


def test_grid_masks_match_reference():
    rng = np.random.RandomState(1)
    for _ in range(20):
        x0, y0 = rng.uniform(0, 100, 2)
        w, h = rng.uniform(5, 200, 2)
        prop = np.array([x0, y0, x0 + w, y0 + h], np.float32)
        crop = B.expand_boxes(prop[None], 640, 480, 'ADAPTIVE')[0]
        fg = prop - np.concatenate([crop[:2], crop[:2]])
        expected = _oracle_mask(tuple(fg), tuple(crop), 14)
        actual = B.grid_mask(fg[None], crop[None], 14)[0]
        np.testing.assert_array_equal(actual, expected)


def test_filter_min_wh():
    props = np.array([
        [0, 0, 4, 10],  # w == 4 -> excluded (strict >)
        [0, 0, 5, 10],
        [0, 0, 10, 4.0001],
    ], np.float32)
    mask = B.filter_min_wh(props, 4, 4)
    np.testing.assert_array_equal(mask, [False, True, True])


def test_pairwise_iou_and_intersection():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    inter = B.pairwise_intersection(a, b)
    np.testing.assert_allclose(inter, [[25, 0]])
    iou = B.pairwise_iou(a, b)
    np.testing.assert_allclose(iou, [[25 / 175, 0]], atol=1e-6)


def test_expand_rectangle_mode():
    """RECTANGLE keeps the proposal's own rectangle (no squaring); the
    in-image translation still applies. The reference declares the mode
    (oadp/oake/objects.py:32-36) but crashes on it — see
    ops/boxes.py docstring."""
    import numpy as np
    from oadp_tpu.ops.boxes import expand_boxes

    boxes = np.array([
        [10.0, 20.0, 50.0, 90.0],   # fully inside: identity
        [-5.0, 10.0, 35.0, 50.0],   # crosses the left edge: translated
    ])
    out = expand_boxes(boxes, 200.0, 200.0, mode='RECTANGLE')
    np.testing.assert_allclose(out[0], boxes[0])
    np.testing.assert_allclose(out[1], [0.0, 10.0, 40.0, 50.0])
    # wider than the image: kept centered (offset suppressed)
    wide = np.array([[-10.0, 50.0, 250.0, 90.0]])
    out = expand_boxes(wide, 200.0, 200.0, mode='RECTANGLE')
    np.testing.assert_allclose(out[0], wide[0])
