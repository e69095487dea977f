"""TPU-native detection/preprocessing ops (XLA + Pallas)."""

from . import anchors, assign, attention, boxes, coder, masks, nms
from . import preprocess, roi_align

__all__ = [
    'anchors',
    'assign',
    'attention',
    'boxes',
    'coder',
    'masks',
    'nms',
    'preprocess',
    'roi_align',
]
