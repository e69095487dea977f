"""Minimal type registry (analogue of todd/mmdet registries in the reference,
e.g. ``DatasetRegistry`` at reference ``oadp/oake/objects.py:39-40``)."""

__all__ = ['Registry']

from typing import Any, Callable, TypeVar

T = TypeVar('T')


class Registry:

    def __init__(self, name: str) -> None:
        self._name = name
        self._items: dict[str, Any] = {}

    def register(self, name: str | None = None) -> Callable[[T], T]:

        def wrapper(item: T) -> T:
            key = name or getattr(item, '__name__')
            if key in self._items:
                raise KeyError(f'{key} already registered in {self._name}')
            self._items[key] = item
            return item

        return wrapper

    def __getitem__(self, key: str) -> Any:
        return self._items[key]

    def __contains__(self, key: str) -> bool:
        return key in self._items

    def build(self, config: dict, **defaults: Any) -> Any:
        """Instantiate ``config['type']`` with remaining keys as kwargs."""
        config = dict(config)
        cls = self._items[config.pop('type')]
        for k, v in defaults.items():
            config.setdefault(k, v)
        return cls(**config)
