"""Model zoo: CLIP encoders, tokenizer, detector stack."""

from . import (
    clip,
    detector,
    fpn,
    heads,
    layers,
    mask_head,
    resnet,
    rpn,
    tokenizer,
)
from .detector import DetectorConfig, forward_train, init_detector, simple_test

__all__ = [
    'clip',
    'detector',
    'fpn',
    'heads',
    'layers',
    'mask_head',
    'resnet',
    'rpn',
    'tokenizer',
    'DetectorConfig',
    'forward_train',
    'init_detector',
    'simple_test',
]
