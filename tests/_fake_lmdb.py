"""A tiny file-backed stand-in for the `lmdb` module (absent in this env).

Implements exactly the API surface used by the RULSTM feature readers
(reference datasets/epic_kitchens.py:416-483 and avt_tpu/data/readers.py):

    env = lmdb.open(path, readonly=True, lock=False)
    with env.begin() as txn:
        raw = txn.get(b"P01_01_frame_0000000123.jpg")   # bytes | None

plus `write=True` transactions with `txn.put` so tests can build fixture
stores. Storage is one pickle file `<path>/data.pkl` mapping bytes->bytes.
Not remotely a real LMDB — just enough to execute the readers' code paths.

API strictness: since the real C binding never runs in this environment
(no wheel), this fake is the only executable check on HOW the readers call
lmdb. It therefore enforces the real binding's contract: `open()` rejects
keyword arguments the C binding does not define (TypeError), transaction
keys/values must be bytes-like (the C binding raises TypeError on str),
and `get` honors the `default=` parameter. A reader change that would
crash against the real library fails here too.
"""
from __future__ import annotations

import io
import os
import pickle

__version__ = "0.0-fake"

# keyword parameters of the real lmdb.open / lmdb.Environment (py-lmdb);
# anything else is a TypeError against the C binding and must be one here
_OPEN_KWARGS = {
    "map_size", "subdir", "readonly", "metasync", "sync", "map_async",
    "mode", "create", "readahead", "writemap", "meminit", "max_readers",
    "max_dbs", "max_spare_txns", "lock",
}


def _check_key(key):
    if not isinstance(key, (bytes, bytearray, memoryview)):
        raise TypeError(
            f"Won't implicitly convert {type(key).__name__} to bytes"
        )


class _Txn:
    def __init__(self, env: "Environment", write: bool = False):
        self._env = env
        self._write = write

    def get(self, key, default=None):
        _check_key(key)
        return self._env._data.get(bytes(key), default)

    def put(self, key, value, dupdata=True, overwrite=True, append=False):
        if not self._write:
            raise RuntimeError("read-only transaction")
        _check_key(key)
        if not isinstance(value, (bytes, bytearray, memoryview)):
            raise TypeError(
                f"Won't implicitly convert {type(value).__name__} to bytes"
            )
        self._env._data[bytes(key)] = bytes(value)
        return True

    def cursor(self):
        return iter(self._env._data.items())

    def commit(self):
        if self._write:
            self._env._persist()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.commit()
        return False


class Environment:
    def __init__(self, path: str, readonly: bool = False):
        self._path = str(path)
        self._readonly = readonly
        self._file = os.path.join(self._path, "data.pkl")
        if os.path.exists(self._file):
            with io.open(self._file, "rb") as f:
                self._data = pickle.load(f)
        elif readonly:
            raise Exception(f"lmdb (fake): no store at {path}")
        else:
            os.makedirs(self._path, exist_ok=True)
            self._data = {}

    def begin(self, db=None, parent=None, write=False, buffers=False):
        if write and self._readonly:
            raise RuntimeError("environment is read-only")
        return _Txn(self, write=write)

    def stat(self):
        return {"entries": len(self._data)}

    def sync(self):
        self._persist()

    def close(self):
        pass

    def _persist(self):
        with io.open(self._file, "wb") as f:
            pickle.dump(self._data, f)


def open(path, **kwargs):  # noqa: A001
    unknown = set(kwargs) - _OPEN_KWARGS
    if unknown:
        raise TypeError(
            f"open() got unexpected keyword argument(s) {sorted(unknown)}"
        )
    return Environment(path, readonly=kwargs.get("readonly", False))
