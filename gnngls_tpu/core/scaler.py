"""Min-max feature scaling with sklearn-compatible semantics.

The reference fits ``sklearn.preprocessing.MinMaxScaler`` per key ('features',
'regret') by ``partial_fit`` over the train set and pickles the dict
(scripts/preprocess_dataset.py:39-50).  Checkpoint-compatible inference needs
the exact same affine transform, including sklearn's zero-range guard.

This class is a 2-parameter affine map with JSON round-trip; ``from_sklearn``
ingests a pickled reference scaler object.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np


def _handle_zero_range(r: np.ndarray) -> np.ndarray:
    """sklearn _handle_zeros_in_scale: constant columns get scale 1."""
    r = np.asarray(r, dtype=np.float64).copy()
    r[r == 0.0] = 1.0
    return r


class MinMaxScaler:
    """Per-column min-max to [0, 1]: x -> (x - data_min) / (data_max - data_min)."""

    def __init__(self):
        self.data_min_: Optional[np.ndarray] = None
        self.data_max_: Optional[np.ndarray] = None

    def partial_fit(self, X) -> "MinMaxScaler":
        X = np.asarray(X, dtype=np.float64)
        mn, mx = X.min(axis=0), X.max(axis=0)
        if self.data_min_ is None:
            self.data_min_, self.data_max_ = mn, mx
        else:
            self.data_min_ = np.minimum(self.data_min_, mn)
            self.data_max_ = np.maximum(self.data_max_, mx)
        return self

    def fit(self, X) -> "MinMaxScaler":
        self.data_min_ = self.data_max_ = None
        return self.partial_fit(X)

    @property
    def scale_(self) -> np.ndarray:
        return 1.0 / _handle_zero_range(self.data_max_ - self.data_min_)

    @property
    def min_(self) -> np.ndarray:
        return -self.data_min_ * self.scale_

    def transform(self, X):
        X = np.asarray(X)
        return X * self.scale_.astype(X.dtype) + self.min_.astype(X.dtype)

    def inverse_transform(self, X):
        X = np.asarray(X)
        return (X - self.min_.astype(X.dtype)) / self.scale_.astype(X.dtype)

    # -- persistence ---------------------------------------------------------

    def to_dict(self) -> dict:
        return {
            "data_min": np.asarray(self.data_min_).tolist(),
            "data_max": np.asarray(self.data_max_).tolist(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "MinMaxScaler":
        s = cls()
        s.data_min_ = np.asarray(d["data_min"], dtype=np.float64)
        s.data_max_ = np.asarray(d["data_max"], dtype=np.float64)
        return s

    @classmethod
    def from_sklearn(cls, sk) -> "MinMaxScaler":
        """Ingest a fitted sklearn MinMaxScaler (default feature_range)."""
        fr = getattr(sk, "feature_range", (0, 1))
        if tuple(fr) != (0, 1):
            raise ValueError(f"only feature_range=(0,1) supported, got {fr}")
        s = cls()
        s.data_min_ = np.asarray(sk.data_min_, dtype=np.float64)
        s.data_max_ = np.asarray(sk.data_max_, dtype=np.float64)
        return s


def save_scalers(path, scalers: dict) -> None:
    with open(path, "w") as f:
        json.dump({k: v.to_dict() for k, v in scalers.items()}, f)


def load_scalers(path) -> dict:
    """Load scalers from our JSON format or a reference pickle (scalers.pkl).

    The reference pickle is a dict of sklearn scalers, possibly nested under
    an 'edges' key for backward compatibility (gnngls/datasets.py:48-51).
    """
    path = str(path)
    if path.endswith(".json"):
        with open(path) as f:
            return {k: MinMaxScaler.from_dict(v) for k, v in json.load(f).items()}
    import pickle

    with open(path, "rb") as f:
        obj = pickle.load(f)
    if "edges" in obj:
        obj = obj["edges"]
    return {k: MinMaxScaler.from_sklearn(v) for k, v in obj.items()}
