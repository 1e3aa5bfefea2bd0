"""Settings containers.

DictNamespace: a dict with attribute access and recursive wrapping, mirroring
the reference's settings tree type (/root/reference/xframe/settings/
tools.py:7-73) so project code can write `settings.project.grid.max_order`.
"""
from __future__ import annotations


class DictNamespace(dict):
    """dict + attribute access; nested dicts are wrapped on insertion."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        self.update(dict(*args, **kwargs))

    @classmethod
    def _wrap(cls, value):
        if isinstance(value, DictNamespace):
            return value
        if isinstance(value, dict):
            return cls({k: cls._wrap(v) for k, v in value.items()})
        if isinstance(value, list):
            return [cls._wrap(v) for v in value]
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, self._wrap(value))

    def update(self, other=(), **kwargs):
        items = other.items() if hasattr(other, "items") else other
        for k, v in items:
            self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def dict(self):
        """Plain-dict deep copy."""
        out = {}
        for k, v in self.items():
            if isinstance(v, DictNamespace):
                out[k] = v.dict()
            elif isinstance(v, list):
                out[k] = [x.dict() if isinstance(x, DictNamespace) else x for x in v]
            else:
                out[k] = v
        return out


def deep_update(base: dict, override: dict) -> dict:
    """Recursively merge `override` into `base` (override wins), returning base."""
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base
