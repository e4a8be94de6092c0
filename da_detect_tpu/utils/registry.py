"""Name -> factory registry (reference utils/registry.py:9-45)."""

from __future__ import annotations


class Registry(dict):
    def register(self, name: str, obj=None):
        if obj is not None:
            if name in self:
                raise KeyError(f"{name} already registered")
            self[name] = obj
            return obj

        def deco(fn):
            self.register(name, fn)
            return fn

        return deco
