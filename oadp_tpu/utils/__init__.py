from .config import Config, DictAction, parse_override
from .dist import maybe_initialize_distributed, replicate_tree
from .logging import (
    add_file_handler,
    enable_compilation_cache,
    logger,
)
from .pth import PthAccessLayer, load_pth, save_pth
from .store import Store

__all__ = [
    'Config',
    'DictAction',
    'parse_override',
    'maybe_initialize_distributed',
    'replicate_tree',
    'add_file_handler',
    'enable_compilation_cache',
    'logger',
    'PthAccessLayer',
    'load_pth',
    'save_pth',
    'Store',
]
