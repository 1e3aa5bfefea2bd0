"""Settings containers.

DictNamespace: a mapping with attribute access and recursive wrapping,
mirroring the reference's settings tree type (/root/reference/xframe/settings/
tools.py:7-73). Like the reference (SimpleNamespace-based), entries live as
instance attributes, so a data key named `values`/`items`/`keys` SHADOWS the
mapping method of the same name — settings keys always win over API names.
"""
from __future__ import annotations


class DictNamespace:
    """Attribute + item access settings tree; nested dicts wrap on insertion."""

    def __init__(self, *args, **kwargs):
        for source in args + (kwargs,):
            items = source.items() if hasattr(source, "items") else source
            for k, v in items:
                self[k] = v

    @classmethod
    def _wrap(cls, value):
        if isinstance(value, DictNamespace):
            return value
        if isinstance(value, dict):
            out = cls()
            for k, v in value.items():
                out[k] = v
            return out
        if isinstance(value, list):
            return [cls._wrap(v) for v in value]
        return value

    # ------------------------------------------------------------ item access
    def __setitem__(self, key, value):
        object.__setattr__(self, str(key), self._wrap(value))

    def __getitem__(self, key):
        try:
            return self.__dict__[key]
        except KeyError:
            raise KeyError(key) from None

    def __delitem__(self, key):
        del self.__dict__[key]

    def __contains__(self, key):
        return key in self.__dict__

    def __iter__(self):
        return iter(self.__dict__)

    def __len__(self):
        return len(self.__dict__)

    def __eq__(self, other):
        if isinstance(other, DictNamespace):
            return self.__dict__ == other.__dict__
        if isinstance(other, dict):
            return self.dict() == other
        return NotImplemented

    def __repr__(self):
        return f"DictNamespace({self.__dict__!r})"

    # ------------------------------------------------------- attribute access
    def __setattr__(self, name, value):
        self[name] = value

    def __getattr__(self, name):
        # only called when no instance attribute exists
        raise AttributeError(
            f"{name!r} (known settings keys: {list(self.__dict__)})")

    def __delattr__(self, name):
        try:
            del self.__dict__[name]
        except KeyError as e:
            raise AttributeError(name) from e

    # ------------------------------------------- mapping API (shadowable by
    # data keys of the same name, as in the reference)
    def keys(self):
        return self.__dict__.keys()

    def values(self):
        return self.__dict__.values()

    def items(self):
        return self.__dict__.items()

    def get(self, key, default=None):
        return self.__dict__.get(key, default)

    def pop(self, key, *default):
        return self.__dict__.pop(key, *default)

    def clear(self):
        self.__dict__.clear()

    def update(self, other=(), **kwargs):
        items = other.items() if hasattr(other, "items") else other
        for k, v in items:
            self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def copy(self):
        return DictNamespace(self.dict())

    def setdefault(self, key, default=None):
        if key not in self.__dict__:
            self[key] = default
        return self.__dict__[key]

    def dict(self):
        """Plain-dict deep copy."""
        out = {}
        for k, v in self.__dict__.items():
            if isinstance(v, DictNamespace):
                out[k] = v.dict()
            elif isinstance(v, list):
                out[k] = [x.dict() if isinstance(x, DictNamespace) else x
                          for x in v]
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
