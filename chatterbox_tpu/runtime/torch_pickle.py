"""Minimal torch-free reader for ``torch.save`` zip archives.

The reference snapshot ships the default voice as ``conds.pt`` — a
``torch.save``'d ``{"t3": T3Cond.__dict__, "gen": {...}}`` dict of plain
tensors (/root/reference/src/tts_streaming.py:254-258 loads it via
``ChatterboxTTS.from_local``). The serving image must not need torch to read
it, so this implements just enough of the format:

* a ``torch.save`` archive is a zip with ``<name>/data.pkl`` (a pickle whose
  tensors are persistent-id references) and ``<name>/data/<key>`` raw
  little-endian storage blobs;
* each persistent id is ``('storage', <StorageType>, key, location, numel)``;
* tensors are rebuilt by ``torch._utils._rebuild_tensor_v2(storage,
  storage_offset, size, stride, requires_grad, backward_hooks[, metadata])``.

Only dict/list/tuple/str/int/float/bool containers and plain tensors are
allowed; any other global raises (the loader treats that as "no default
voice" and falls back). bfloat16 storages are widened to float32.
"""
from __future__ import annotations

import pickle
import zipfile
from typing import Any, Dict

import numpy as np

_STORAGE_DTYPES: Dict[str, Any] = {
    "DoubleStorage": np.float64,
    "FloatStorage": np.float32,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": "bfloat16",
}


class _StorageType:
    def __init__(self, name: str):
        self.name = name


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *unused) -> np.ndarray:
    data: np.ndarray = storage
    if len(size) == 0:
        return np.array(data[storage_offset])
    strides_bytes = [s * data.itemsize for s in stride]
    view = np.lib.stride_tricks.as_strided(
        data[storage_offset:], shape=tuple(size), strides=tuple(strides_bytes)
    )
    return np.ascontiguousarray(view)


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if name == "_rebuild_tensor_v2" and module.startswith("torch"):
            return _rebuild_tensor_v2
        if name in _STORAGE_DTYPES and module.startswith("torch"):
            return _StorageType(name)
        if module == "collections" and name == "OrderedDict":
            return dict
        raise pickle.UnpicklingError(
            f"torch_pickle: refusing to load global {module}.{name}"
        )

    def persistent_load(self, pid):
        kind, storage_type, key, _location, _numel = pid
        if kind != "storage" or not isinstance(storage_type, _StorageType):
            raise pickle.UnpicklingError(f"unsupported persistent id: {pid!r}")
        dtype = _STORAGE_DTYPES[storage_type.name]
        blob = self._zf.read(f"{self._prefix}data/{key}")
        if dtype == "bfloat16":
            u = np.frombuffer(blob, dtype=np.uint16).astype(np.uint32) << 16
            return u.view(np.float32)
        return np.frombuffer(blob, dtype=dtype)


def load_torch_archive(path) -> Any:
    """Read a ``torch.save`` zip archive into nested numpy containers."""
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(
            (n for n in zf.namelist() if n.endswith("/data.pkl") or n == "data.pkl"),
            None,
        )
        if pkl_name is None:
            raise ValueError(f"{path}: not a torch zip archive (no data.pkl)")
        prefix = pkl_name[: -len("data.pkl")]
        import io

        with zf.open(pkl_name) as f:
            return _Unpickler(io.BytesIO(f.read()), zf, prefix).load()
