"""Registries for models, datasets and losses.

Replaces the reference's hand-maintained factory dicts
(lib/models/__init__.py `model_factory`, and the `eval(data_reader)` pattern
in lib/get_dataloader.py:109) with explicit decorator registries.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Any] = {}

    def register(self, name: str) -> Callable[[Any], Any]:
        def deco(obj: Any) -> Any:
            if name in self._entries:
                raise KeyError(f"{self.name}: duplicate entry {name!r}")
            self._entries[name] = obj
            return obj

        return deco

    def get(self, name: str) -> Any:
        if name not in self._entries:
            raise KeyError(
                f"{self.name}: unknown entry {name!r}; have {sorted(self._entries)}"
            )
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __getitem__(self, name: str) -> Any:
        return self.get(name)

    def keys(self):
        return self._entries.keys()


MODELS = Registry("models")
DATASETS = Registry("datasets")
LOSSES = Registry("losses")
