"""Minimal name->class registries (reference: basicsr/utils/registry.py:84-88).

Five registries mirror the reference public surface: DATASET / ARCH / MODEL /
LOSS / METRIC.  Population happens at import time of the subpackage __init__
modules (mirroring the reference's scandir-import pattern, but explicit)."""

from __future__ import annotations


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._obj_map: dict[str, object] = {}

    def register(self, obj=None, name: str | None = None):
        if obj is None:
            return lambda o: self.register(o, name=name)
        key = name or obj.__name__
        if key in self._obj_map:
            raise KeyError(f"'{key}' already registered in '{self._name}'")
        self._obj_map[key] = obj
        return obj

    def get(self, name: str):
        if name not in self._obj_map:
            raise KeyError(
                f"'{name}' not found in '{self._name}' registry. "
                f"Available: {sorted(self._obj_map)}")
        return self._obj_map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map

    def keys(self):
        return self._obj_map.keys()


DATASET_REGISTRY = Registry("dataset")
ARCH_REGISTRY = Registry("arch")
MODEL_REGISTRY = Registry("model")
LOSS_REGISTRY = Registry("loss")
METRIC_REGISTRY = Registry("metric")
