"""Per-process H5 result files: the training <-> analysis interface.

Parity target: reference func/train.py:269-284 (store_append_h5: resizable
gzip datasets appended batch by batch, uids as S64) and
notebooks/utils.py:92-150 (gen_load_resfiles/read_results: merge all ranks'
files, mean multiple predictions per idx into a dense [max_idx+1, ...]
array).
"""
from __future__ import annotations

import glob
import os.path as osp
from collections import OrderedDict
from typing import Dict, Iterator

import h5py
import numpy as np

STR_UID_MAXLEN = 64


def store_append_h5(endpoints: Dict[str, np.ndarray], output_dir: str, rank: int = 0):
    """Append a batch of arrays to this process's resizable H5 file."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    output_fpath = osp.join(output_dir, f"{rank}.h5")
    with h5py.File(output_fpath, "a") as fout:
        for key, val in endpoints.items():
            val = np.asarray(val)
            if val.dtype.kind == "U":
                if int(val.dtype.str[2:]) >= STR_UID_MAXLEN:
                    raise ValueError(
                        f"UID strings must be < {STR_UID_MAXLEN} chars"
                    )
                val = val.astype(f"S{STR_UID_MAXLEN}")
            if key not in fout:
                fout.create_dataset(
                    key,
                    data=val,
                    compression="gzip",
                    compression_opts=9,
                    chunks=True,
                    maxshape=(None,) + val.shape[1:],
                )
            else:
                fout[key].resize(
                    (fout[key].shape[0] + val.shape[0],) + val.shape[1:]
                )
                fout[key][-val.shape[0]:, ...] = val


def read_saved_results_uids(resfpath) -> set:
    """UIDs already present in a result file (feature-extraction resume;
    reference base_video_dataset.py:191-197)."""
    if not osp.exists(str(resfpath)):
        return set()
    with h5py.File(resfpath, "r") as fin:
        if "uid" not in fin:
            return set()
        res = fin["uid"][()].tolist()
    return {el.decode() if isinstance(el, bytes) else str(el) for el in res}


def _allkeys(obj, prefix="") -> list:
    keys = []
    for key in obj.keys():
        if isinstance(obj[key], h5py.Group):
            keys += _allkeys(obj[key], prefix + key + "/")
        else:
            keys.append(prefix + key)
    return keys


def gen_load_resfiles(resdir: str) -> Iterator[Dict[str, np.ndarray]]:
    resfiles = sorted(glob.glob(osp.join(resdir, "*.h5")))
    if len(resfiles) == 0:
        raise FileNotFoundError(f"No result files in {resdir}")
    for resfile in resfiles:
        out = {}
        with h5py.File(resfile, "r") as fin:
            for key in _allkeys(fin):
                out[key] = fin[key][()]
        yield out


def read_results(resdir: str) -> Dict[str, np.ndarray]:
    """Merge all ranks' files; mean multiple predictions per idx."""
    data0 = next(gen_load_resfiles(resdir))
    res_per_layer = {
        key: OrderedDict() for key in data0 if key not in ("epoch",)
    }
    if not res_per_layer:
        raise ValueError(f"No data keys found in {resdir}")
    for data in gen_load_resfiles(resdir):
        for i, idx in enumerate(data["idx"]):
            idx = int(idx)
            for key in res_per_layer:
                if data[key].shape[0] <= i:
                    continue
                res_per_layer[key].setdefault(idx, []).append(data[key][i])
    final_res = {}
    for key, per_idx in res_per_layer.items():
        if not per_idx:
            continue
        max_idx = max(per_idx.keys())
        first = np.asarray(per_idx[next(iter(per_idx))][0])
        numeric = first.dtype.kind in "fiu"
        dtype = np.float64 if numeric else first.dtype
        arr = np.zeros([max_idx + 1] + list(first.shape), dtype=dtype)
        for idx, vals in per_idx.items():
            vals = np.stack([np.asarray(v) for v in vals])
            # multiple predictions per idx (e.g. repeated clips) are averaged
            arr[idx] = np.mean(vals, axis=0) if numeric else vals[0]
        final_res[key] = arr
    return final_res


def read_all_results(run_dir: str, prefix: str = "results") -> Dict[str, Dict]:
    """Read every results<suffix>/ dir under run_dir."""
    all_res = {}
    for resdir in glob.glob(osp.join(run_dir, prefix + "*")):
        all_res[osp.basename(resdir)] = read_results(resdir)
    return all_res


def get_epoch_from_resdir(resdir: str):
    """The (fractional) epoch the stored results were computed at — min
    across rows — or None if absent (notebooks/utils.py:153-159); tells
    finished evals apart from stale/partial ones."""
    data = next(gen_load_resfiles(resdir))
    if "epoch" not in data:
        return None
    return float(np.min(data["epoch"]))


def get_logits_from_results(results: Dict[str, np.ndarray]):
    """The logits of a read_results dict: the single 'logits/<task>' entry
    (or legacy 'logits'), else a dict of all logits keys when a run stored
    several tasks (notebooks/utils.py:405-413)."""
    if "logits" in results:
        return results["logits"]
    keys = [k for k in results if k.startswith("logits/")]
    if not keys:
        raise KeyError(f"no logits keys in results: {sorted(results)}")
    if len(keys) == 1:
        return results[keys[0]]
    return {k: results[k] for k in keys}
