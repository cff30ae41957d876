"""Pure-Python reader for torch's zip-serialized checkpoints.

Loads ``torch.save`` archives (the modern zipfile format — which is what all
GPT-SoVITS ``.ckpt``/``.pth`` files are, including the header-doctored ones
after the ``b"PK"`` re-prefix) WITHOUT importing torch: tensors come back as
numpy arrays (bfloat16 via ml_dtypes), everything else as plain Python
objects.  This removes torch from the deployment path; ``loader.py`` falls
back to torch only for exotic/legacy pickles.
"""
from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, BinaryIO, Dict, Union

import numpy as np

try:
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
    "BFloat16Storage": _BFLOAT16,
    "ComplexFloatStorage": np.dtype(np.complex64),
    "ComplexDoubleStorage": np.dtype(np.complex128),
}

# torch.save with _use_new_zipfile_serialization also encodes dtypes via
# torch.<dtype> globals in newer "untyped storage" archives
_TORCH_DTYPE_NAMES = {
    "float32": np.dtype(np.float32), "float64": np.dtype(np.float64),
    "float16": np.dtype(np.float16), "bfloat16": _BFLOAT16,
    "int64": np.dtype(np.int64), "int32": np.dtype(np.int32),
    "int16": np.dtype(np.int16), "int8": np.dtype(np.int8),
    "uint8": np.dtype(np.uint8), "bool": np.dtype(np.bool_),
}


class _Storage:
    def __init__(self, data: bytes, dtype: np.dtype):
        self.data = data
        self.dtype = dtype


class _DTypeMarker:
    def __init__(self, dtype):
        self.dtype = dtype


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None, metadata=None):
    itemsize = storage.dtype.itemsize
    flat = np.frombuffer(storage.data, dtype=storage.dtype)
    if not size:
        return flat[storage_offset].copy()
    arr = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride))
    return np.ascontiguousarray(arr)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _FakeModule:
    """Stand-in for torch dtype globals (torch.float32 etc.)."""


# Builtins that only construct data (no code execution).  Same spirit as
# torch's _weights_only_unpickler allowlist.
_SAFE_BUILTINS = frozenset({
    "set", "frozenset", "bytearray", "complex", "slice",
    "dict", "list", "tuple",
})

# The numpy globals legitimate checkpoints reference (array reconstruction
# + dtype).  numpy's own reconstructors never execute embedded code.
_SAFE_NUMPY = frozenset({
    ("numpy", "ndarray"), ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "scalar"),
})


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, archive: zipfile.ZipFile, prefix: str):
        super().__init__(file, encoding="utf-8")
        self._archive = archive
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if module == "torch._utils":
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _DTypeMarker(_STORAGE_DTYPES[name])
        if module == "torch" and name in _TORCH_DTYPE_NAMES:
            return _DTypeMarker(_TORCH_DTYPE_NAMES[name])
        if module == "torch.storage" and name == "_load_from_bytes":
            # legacy inline storage (rare)
            def load_from_bytes(b):
                raise pickle.UnpicklingError("legacy inline torch storage")
            return load_from_bytes
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module == "builtins":
            # Only data-container builtins (mirrors torch's weights_only
            # unpickler).  Returning arbitrary builtins attributes (eval,
            # exec, getattr, __import__, ...) would let a crafted data.pkl
            # REDUCE straight into code execution.
            if name in _SAFE_BUILTINS:
                import builtins

                return getattr(builtins, name)
            raise pickle.UnpicklingError(
                f"builtins.{name} is not allowed in checkpoint pickles")
        if (module, name) in _SAFE_NUMPY:
            import importlib

            return getattr(importlib.import_module(module), name)
        # anything else (custom config classes, HParams-likes): a permissive
        # dict-backed stand-in that preserves attributes
        return _make_surrogate(module, name)

    def persistent_load(self, pid):
        # ('storage', dtype_marker_or_storage_cls, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        marker, key = pid[1], pid[2]
        if isinstance(marker, _DTypeMarker):
            dtype = marker.dtype
        elif isinstance(marker, np.dtype):
            dtype = marker
        else:
            raise pickle.UnpicklingError(f"unknown storage type {marker!r}")
        if dtype is None:
            raise pickle.UnpicklingError("bfloat16 needs ml_dtypes installed")
        data = self._archive.read(f"{self._prefix}/data/{key}")
        return _Storage(data, dtype)


_SURROGATES: Dict[tuple, type] = {}


def _make_surrogate(module: str, name: str):
    key = (module, name)
    if key not in _SURROGATES:
        cls = type(name, (), {"__module__": module})

        def _setstate(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)
            else:
                self.__dict__["_state"] = state

        cls.__setstate__ = _setstate
        cls.__reduce_ex__ = None  # never re-pickled
        _SURROGATES[key] = cls
    return _SURROGATES[key]


def load(path_or_file: Union[str, BinaryIO]) -> Any:
    """torch.load equivalent for zip-format checkpoints (tensors → numpy)."""
    if isinstance(path_or_file, (str, bytes)):
        f: BinaryIO = open(path_or_file, "rb")
        close = True
    else:
        f = path_or_file
        close = False
    try:
        with zipfile.ZipFile(f) as archive:
            pkl_names = [n for n in archive.namelist() if n.endswith("/data.pkl")]
            if not pkl_names:
                raise pickle.UnpicklingError("no data.pkl: not a torch zip archive")
            prefix = pkl_names[0][: -len("/data.pkl")]
            with archive.open(pkl_names[0]) as pf:
                up = _Unpickler(io.BytesIO(pf.read()), archive, prefix)
                return up.load()
    finally:
        if close:
            f.close()
