"""DP ("Distillation Pyramid") training/eval stage."""

from . import builder, coco_eval, datasets, evaluator, trainer

__all__ = ['builder', 'coco_eval', 'datasets', 'evaluator', 'trainer']
