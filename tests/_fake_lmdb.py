"""A tiny file-backed stand-in for the `lmdb` module (absent in this env).

Implements exactly the API surface used by the RULSTM feature readers
(reference datasets/epic_kitchens.py:416-483 and avt_tpu/data/readers.py):

    env = lmdb.open(path, readonly=True, lock=False)
    with env.begin() as txn:
        raw = txn.get(b"P01_01_frame_0000000123.jpg")   # bytes | None

plus `write=True` transactions with `txn.put` so tests can build fixture
stores. Storage is one pickle file `<path>/data.pkl` mapping bytes->bytes.
Not remotely a real LMDB — just enough to execute the readers' code paths.
"""
from __future__ import annotations

import io
import os
import pickle

__version__ = "0.0-fake"


class _Txn:
    def __init__(self, env: "Environment", write: bool = False):
        self._env = env
        self._write = write

    def get(self, key: bytes):
        return self._env._data.get(key)

    def put(self, key: bytes, value: bytes):
        if not self._write:
            raise RuntimeError("read-only transaction")
        self._env._data[key] = value
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

    def begin(self, write: bool = False, **kwargs):
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


def open(path, readonly: bool = False, lock: bool = True, **kwargs):  # noqa: A001
    del lock, kwargs
    return Environment(path, readonly=readonly)
