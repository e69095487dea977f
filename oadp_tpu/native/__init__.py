"""Native (C++) host-runtime kernels, built lazily with g++.

The TPU compute path is JAX/XLA/Pallas; these kernels cover host-side
hot loops that are otherwise Python-bound (the reference outsources its
equivalents to the pycocotools C extension). Loading is best-effort:
callers fall back to pure Python when no compiler is available.
"""

__all__ = ['load_library']

import ctypes
import hashlib
import pathlib
import subprocess
import tempfile

from ..utils import logger

_SRC_DIR = pathlib.Path(__file__).parent
_cache: dict[str, ctypes.CDLL | None] = {}


def load_library(name: str) -> ctypes.CDLL | None:
    """Compile-and-load ``{name}.cpp`` (cached by source hash)."""
    if name in _cache:
        return _cache[name]
    src = _SRC_DIR / f'{name}.cpp'
    code = src.read_bytes()
    tag = hashlib.sha256(code).hexdigest()[:16]
    out_dir = pathlib.Path(tempfile.gettempdir()) / 'oadp_tpu_native'
    out_dir.mkdir(parents=True, exist_ok=True)
    so = out_dir / f'{name}-{tag}.so'
    try:
        if not so.exists():
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-o', str(so),
                 str(src)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
    except Exception as e:  # no compiler / load failure: fall back
        logger.warning('native %s unavailable (%s); using Python', name, e)
        lib = None
    _cache[name] = lib
    return lib
