"""OAKE: offline CLIP knowledge extraction (globals / blocks / objects).

Submodules are CLI entry points (``python -m oadp_tpu.oake.<task>``) and
are intentionally not imported here to keep ``runpy`` clean.
"""

from .encoders import ClipModel, OakeSteps, load_clip

__all__ = ['ClipModel', 'OakeSteps', 'load_clip']
