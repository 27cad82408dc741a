"""Minimal name->object registry (replaces fvcore.common.registry)."""


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._map = {}

    def register(self, obj=None, name=None):
        """Use as ``@REGISTRY.register()`` or ``REGISTRY.register(obj, name)``."""
        if obj is None:
            def deco(cls):
                self._do_register(name or cls.__name__, cls)
                return cls

            return deco
        self._do_register(name or obj.__name__, obj)
        return obj

    def _do_register(self, name, obj):
        if name in self._map:
            raise KeyError(f"{name} already registered in {self._name} registry")
        self._map[name] = obj

    def get(self, name):
        if name not in self._map:
            raise KeyError(
                f"No object named '{name}' in '{self._name}' registry. "
                f"Available: {sorted(self._map)}"
            )
        return self._map[name]

    def __contains__(self, name):
        return name in self._map

    def keys(self):
        return self._map.keys()
