"""OADP-TPU: a TPU-native open-vocabulary detection framework.

Re-implements the capabilities of LutingWang/OADP (CVPR 2023) with a
JAX/XLA/Pallas compute path designed for TPU: OAKE offline CLIP feature
extraction (globals / blocks / objects) and the DP distillation-pyramid
detector stack (see ``SURVEY.md`` for the reference analysis).
"""

__version__ = '0.1.0'
