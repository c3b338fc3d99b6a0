"""Statistic reducers (numpy).

Reference: src/llm_mixed_q/statstic_profiler/stats.py:12-421 [directory name
sic]. Five stat types keyed by the same names; export() converts arrays to
lists for TOML serialization. Samples arrive as numpy arrays (fetched from
device once per batch — the TPU-side forward stays pure).
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)

STAT_NAME_TO_CLS = {}


def _register(cls):
    STAT_NAME_TO_CLS[cls.name] = cls
    return cls


class StatBase:
    name: str = None

    def update_a_sample(self, new_s) -> None:
        raise NotImplementedError

    def compute(self) -> dict:
        raise NotImplementedError

    def export(self) -> dict:
        return {
            self.name: {
                k: v.tolist() if isinstance(v, np.ndarray) else
                (v.item() if isinstance(v, np.generic) else v)
                for k, v in self.compute().items()
            }
        }


def _as_f32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


@_register
class Record(StatBase):
    """Concatenate every sample (reference stats.py:66-109)."""

    name = "record"

    def __init__(self, add_new_dim_before_concat: bool = False):
        self.add_new_dim = add_new_dim_before_concat
        self.data = None
        self.count = None

    def update_a_sample(self, new_s):
        new_s = _as_f32(new_s)
        if self.add_new_dim:
            new_s = new_s[None]
        if self.data is None:
            self.data = new_s
            self.count = 1
        else:
            self.data = np.concatenate([self.data, new_s], axis=0)
            self.count += 1

    def compute(self):
        return {
            "data": self.data,
            "count": self.count,
            "size_in_bytes": self.data.size * self.data.itemsize,
        }


@_register
class VarianceOnline(StatBase):
    """Welford/Chan running mean+variance (reference stats.py:113-223)."""

    name = "variance_online"

    def __init__(self, dims="all"):
        assert dims in ("all", None) or isinstance(dims, (list, tuple))
        self.dims = sorted(dims) if isinstance(dims, (list, tuple)) else dims
        self.count = 0
        self.mean = 0.0
        self.m = 0.0

    def _update_one(self, new_s):
        self.count += 1
        delta = new_s - self.mean
        self.mean = self.mean + delta / self.count
        self.m = self.m + delta * (new_s - self.mean)

    def update_a_sample(self, new_s):
        new_s = _as_f32(new_s)
        if self.dims == "all":
            flat = new_s.reshape(-1)
            n_b = flat.size
            mean_b = flat.mean()
            delta = mean_b - self.mean
            self.mean = self.mean + delta * n_b / (self.count + n_b)
            self.m = self.m + flat.var(ddof=1) * n_b + delta**2 * self.count * n_b / (
                self.count + n_b
            )
            self.count += n_b
        elif self.dims is None:
            self._update_one(new_s)
        else:
            keep = [i for i in range(new_s.ndim) if i not in self.dims]
            new_s = np.transpose(new_s, keep + list(self.dims))
            new_s = new_s.reshape(new_s.shape[: len(keep)] + (-1,))
            for i in range(new_s.shape[-1]):
                self._update_one(new_s[..., i])

    def compute(self):
        if self.count < 2:
            logger.warning("VarianceOnline: count < 2, returning NA")
            return {"mean": "NA", "variance": "NA"}
        return {
            "mean": np.asarray(self.mean),
            "variance": np.asarray(self.m / self.count),
            "count": self.count,
        }


@_register
class VariancePrecise(Record):
    """Exact variance over all recorded samples (reference stats.py:227-281)."""

    name = "variance_precise"

    def __init__(self, dims="all"):
        super().__init__(add_new_dim_before_concat=True)
        self.dims = dims

    def compute(self):
        if self.dims == "all":
            return {
                "mean": np.asarray(self.data.mean()),
                "variance": np.asarray(self.data.var(ddof=1)),
                "count": self.data.size,
            }
        if self.dims is None:
            if self.data.shape[0] < 2:
                logger.warning("VariancePrecise: count < 2, returning NA")
                return {"mean": "NA", "variance": "NA", "count": self.data.shape[0]}
            return {
                "mean": self.data.mean(axis=0),
                "variance": self.data.var(axis=0, ddof=1),
                "count": self.data.shape[0],
            }
        dims = [0] + [i + 1 for i in self.dims]
        return {
            "mean": self.data.mean(axis=tuple(dims)),
            "variance": self.data.var(axis=tuple(dims), ddof=1),
            "count": int(np.prod([self.data.shape[d] for d in dims])),
        }


@_register
class RangeMinMax(StatBase):
    """Running min/max/range, optional abs (reference stats.py:285-368)."""

    name = "range_min_max"

    def __init__(self, dims="all", abs: bool = False):
        self.dims = dims
        self.abs = abs
        self.min = None
        self.max = None
        self.count = 0

    def update_a_sample(self, new_s):
        new_s = _as_f32(new_s)
        if self.abs:
            new_s = np.abs(new_s)
        if self.dims == "all":
            mn, mx, n = new_s.min(), new_s.max(), new_s.size
        elif self.dims is None:
            mn, mx, n = new_s, new_s, 1
        else:
            mn = new_s.min(axis=tuple(self.dims))
            mx = new_s.max(axis=tuple(self.dims))
            n = int(np.prod([new_s.shape[d] for d in self.dims]))
        if self.min is None:
            self.min, self.max = mn, mx
        else:
            self.min = np.minimum(self.min, mn)
            self.max = np.maximum(self.max, mx)
        self.count += n

    def compute(self):
        if self.count < 2:
            logger.warning("RangeMinMax: count < 2, returning NA")
            return {"min": "NA", "max": "NA", "range": "NA", "count": self.count}
        return {
            "min": np.asarray(self.min),
            "max": np.asarray(self.max),
            "range": np.asarray(self.max - self.min),
            "count": self.count,
        }


@_register
class ThresholdCount(StatBase):
    """Outlier counting, LLM.int8-style (reference stats.py:372-411)."""

    name = "threshold_count"

    def __init__(self, threshold: float = 6.0, dims=None):
        self.threshold = threshold
        self.dims = dims
        self.n_outliers = 0
        self.total = 0
        self.n_samples = 0

    def update_a_sample(self, new_s):
        new_s = _as_f32(new_s)
        comp = np.abs(new_s) > self.threshold
        if self.dims is not None:
            self.n_outliers = self.n_outliers + comp.sum(axis=tuple(self.dims))
            self.total += int(np.prod([new_s.shape[d] for d in self.dims]))
        else:
            self.n_outliers = self.n_outliers + comp.sum()
            self.total += new_s.size
        self.n_samples += 1

    def compute(self):
        n = self.n_outliers
        return {
            "num_outliers": n.tolist() if isinstance(n, np.ndarray) else int(n),
            "total": self.total,
            "threshold": self.threshold,
            "num_samples": self.n_samples,
        }


def create_new_stat(stat_name: str, **stat_kwargs) -> StatBase:
    assert stat_name in STAT_NAME_TO_CLS, (
        f"Unknown stat name: {stat_name}. Available: {list(STAT_NAME_TO_CLS)}"
    )
    return STAT_NAME_TO_CLS[stat_name](**stat_kwargs)
