"""Process-wide logger (analogue of ``todd.logger`` in the reference)."""

__all__ = ['logger', 'add_file_handler']

import logging
import pathlib
import sys

logger = logging.getLogger('oadp_tpu')
if not logger.handlers:
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter(
            '[%(asctime)s %(process)d %(levelname)s] %(message)s',
            datefmt='%Y-%m-%d %H:%M:%S',
        )
    )
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    logger.propagate = False


def add_file_handler(path: str | pathlib.Path) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    handler = logging.FileHandler(path)
    handler.setFormatter(logger.handlers[0].formatter)
    logger.addHandler(handler)


def enable_compilation_cache(path: str = '') -> None:
    """Persistent XLA compilation cache (first full-detector compile is
    minutes; subsequent runs hit the cache). Opt-out with
    JAX_DISABLE_COMPILATION_CACHE=1."""
    import os
    if os.environ.get('JAX_DISABLE_COMPILATION_CACHE'):
        return
    import jax
    cache = path or os.environ.get(
        'JAX_COMPILATION_CACHE_DIR', os.path.expanduser('~/.cache/oadp_tpu_xla')
    )
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:  # older jax without these options
        logger.warning('persistent compilation cache unavailable')
