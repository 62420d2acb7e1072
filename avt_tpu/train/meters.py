"""Metric meters: windowed smoothing + epoch-global averages.

Parity target: reference common/log.py (SmoothedValue, MetricLogger):
median/avg over a deque window, global avg over the epoch, log_every
wrapper with iter/data timing and clips/s. Cross-process sync uses
jax.experimental.multihost_utils when running multi-host (the reference
all_reduces through torch.distributed).
"""
from __future__ import annotations

import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

import numpy as np


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        if not self.deque:
            return 0.0
        # torch.median picks the LOWER middle element on even-length
        # windows (unlike np.median's midpoint average) — keep the
        # reference's logged values exactly (common/log.py:56-58)
        vals = sorted(self.deque)
        return float(vals[(len(vals) - 1) // 2])

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        # reference divides by count + 1e-6 (common/log.py:16,65-67)
        return self.total / (self.count + 1e-6)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg,
            global_avg=self.global_avg, max=self.max, value=self.value,
        )


def host_rss_mb() -> float:
    """Resident-set size of this process in MB (the reference's CPU memory
    gauge, func/train.py:113-115 via psutil; /proc avoids the dep)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


_HBM_STATS = {"broken": False, "t": 0.0, "value": None}
_HBM_MIN_INTERVAL_S = 10.0


def device_hbm_mb() -> Optional[float]:
    """Device bytes-in-use in MB (the reference's CUDA max-mem readout,
    common/log.py:181). None when the backend exposes no memory_stats
    (e.g. CPU). The capability probe is cached after the first failure and
    successful reads are throttled to one per _HBM_MIN_INTERVAL_S — on
    tunnel backends memory_stats() can be a blocking RPC, and paying that
    per log line is waste."""
    if _HBM_STATS["broken"]:
        return None
    import time as _time

    now = _time.monotonic()
    if now - _HBM_STATS["t"] < _HBM_MIN_INTERVAL_S:
        return _HBM_STATS["value"]
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            _HBM_STATS["t"] = now
            _HBM_STATS["value"] = stats["bytes_in_use"] / (1024.0 * 1024.0)
            return _HBM_STATS["value"]
        # stats exist but lack bytes_in_use: a capability gap, sticky
        _HBM_STATS["broken"] = True
        return None
    except Exception:
        # a RAISED call may be transient (axon tunnel blips) — keep the
        # throttle timestamp so we retry at most once per interval, and
        # serve the stale cached value meanwhile instead of going dark
        # for the rest of a multi-hour run
        _HBM_STATS["t"] = now
        return _HBM_STATS["value"]


def make_tb_writer(log_dir: str, rank: int = 0):
    """Rank-0-only tensorboardX writer (common/log.py:218-223 parity)."""
    if rank != 0:
        return None
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(log_dir=log_dir)
    except ImportError:
        return None


class MetricLogger:
    def __init__(self, delimiter: str = "  ", logger=None, writer=None,
                 stat_set: str = "train"):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.logger = logger
        self.writer = writer
        self.stat_set = stat_set

    def update(self, n: int = 1, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v), n=n)

    def write_scalar(self, name: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(name, value, step)

    def dump_to_tb(self, step: int):
        """Per-meter TB dump (common/log.py:197-215 parity)."""
        if self.writer is None:
            return
        for name, meter in self.meters.items():
            self.writer.add_scalar(
                f"metric_logger/{self.stat_set}/{name}", meter.avg, step
            )

    def __getitem__(self, key) -> SmoothedValue:
        return self.meters[key]

    def synchronize_between_processes(self):
        """Average meter totals across hosts (multi-host runs only)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        keys = sorted(self.meters)
        totals = np.asarray(
            [[self.meters[k].total, self.meters[k].count] for k in keys]
        )
        summed = multihost_utils.process_allgather(totals).sum(axis=0)
        for i, k in enumerate(keys):
            self.meters[k].total = float(summed[i, 0])
            self.meters[k].count = int(summed[i, 1])

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in sorted(self.meters.items())
        )

    def log_every(
        self,
        iterable: Iterable,
        print_freq: int = 10,
        header: str = "",
        total: Optional[int] = None,
    ):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if self.logger and i % print_freq == 0:
                tot = total if total is not None else "?"
                eta = (
                    iter_time.global_avg * (total - i) if total else float("nan")
                )
                hbm = device_hbm_mb()
                mem = f"mem {host_rss_mb():.0f}MB" + (
                    f" hbm {hbm:.0f}MB" if hbm is not None else ""
                )
                self.logger.info(
                    "%s [%d/%s] eta %.0fs %s iter_t %.3fs data_t %.3fs %s",
                    header, i, tot, eta, str(self), iter_time.avg,
                    data_time.avg, mem,
                )
            i += 1
            end = time.time()
        if self.logger:
            self.logger.info(
                "%s done in %.1fs: %s", header, time.time() - start, str(self)
            )
