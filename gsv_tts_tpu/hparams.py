"""Attribute-style hyperparameter containers (reference
``GPT_SoVITS/utils.py:1-58`` ``HParams``/``DictToAttrRecursive``)."""
from __future__ import annotations

from typing import Any, Dict


class HParams:
    """Recursive attr/dict hybrid over a plain dict."""

    def __init__(self, d: Dict[str, Any] = None, **kwargs):
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            if isinstance(v, dict):
                v = HParams(v)
            setattr(self, k, v)

    def __getitem__(self, k):
        return getattr(self, k)

    def __setitem__(self, k, v):
        setattr(self, k, v)

    def __contains__(self, k):
        return hasattr(self, k)

    def get(self, k, default=None):
        return getattr(self, k, default)

    def keys(self):
        return self.__dict__.keys()

    def items(self):
        return self.__dict__.items()

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self.__dict__.items():
            out[k] = v.to_dict() if isinstance(v, HParams) else v
        return out

    def __repr__(self):
        return f"HParams({self.to_dict()!r})"
