"""Datasets: array-resident TSP instances with scaled features/labels.

TPU re-design of the reference TSPDataset (gnngls/datasets.py:37-95).  The
reference re-reads one pickled networkx graph per __getitem__, rebuilds a DGL
template line graph and scales features per instance in DataLoader workers;
here the whole split lives as dense arrays (N, E, .) that slice directly into
device batches — batching is a leading axis, not a block-diagonal graph merge
(all instances share the one static K_n topology; see SURVEY §2.2).

Reference-format ingestion (`from_reference_dir`) reads the train/val/test.txt
split files, per-instance gpickles and scalers.pkl so published reference
datasets work once git-LFS objects are available.

Quirk note: the reference sets ndata['in_solution'] to the *unscaled regret*
tensor (gnngls/datasets.py:94).  We store the real boolean in_solution and the
unscaled regret separately; the BCE training path reproduces the buggy
behavior via config (see train/).
"""

from __future__ import annotations

import pathlib
import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..core.graph import build_topology, edge_index
from ..core.scaler import MinMaxScaler, load_scalers, save_scalers
from .generate import load_dataset
from .labels import edge_features


@dataclass
class TSPDataset:
    """A split of solved, labeled instances as dense arrays."""

    coords: np.ndarray  # (N, n, 2)
    features: np.ndarray  # (N, E, F) unscaled
    regret: np.ndarray  # (N, E) unscaled
    in_solution: np.ndarray  # (N, E) bool
    opt_cost: np.ndarray  # (N,)
    scalers: Dict[str, MinMaxScaler] = field(default_factory=dict)
    feat_drop_idx: List[int] = field(default_factory=list)

    def __len__(self) -> int:
        return self.coords.shape[0]

    @property
    def n_nodes(self) -> int:
        return self.coords.shape[1]

    @property
    def feat_dim(self) -> int:
        keep = self.features.shape[-1] - len(self.feat_drop_idx)
        return keep

    def fit_scalers(self) -> Dict[str, MinMaxScaler]:
        """MinMax over this split, matching preprocess_dataset.py:39-50
        (per-instance partial_fit over edge rows)."""
        f = MinMaxScaler()
        r = MinMaxScaler()
        for i in range(len(self)):
            f.partial_fit(self.features[i])
            r.partial_fit(self.regret[i][:, None])
        self.scalers = {"features": f, "regret": r}
        return self.scalers

    def get_scaled_batch(self, idx) -> dict:
        """Slice + scale a batch.  Mirrors get_scaled_features
        (gnngls/datasets.py:73-95): MinMax transform, optional feature-column
        drop; regret scaled with the regret scaler."""
        idx = np.asarray(idx)
        x = self.scalers["features"].transform(self.features[idx]).astype(np.float32)
        if self.feat_drop_idx:
            x = np.delete(x, self.feat_drop_idx, axis=-1)
        y = self.scalers["regret"].transform(
            self.regret[idx][..., None]).astype(np.float32)
        return {
            "features": x,  # (B, E, F)
            "regret": y,  # (B, E, 1) scaled
            "regret_unscaled": self.regret[idx][..., None].astype(np.float32),
            "in_solution": self.in_solution[idx][..., None].astype(np.float32),
            "coords": self.coords[idx],
            "opt_cost": self.opt_cost[idx],
        }

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_arrays(cls, data: dict, indices=None, scalers=None,
                    feat_drop_idx=()) -> "TSPDataset":
        idx = np.arange(data["coords"].shape[0]) if indices is None else np.asarray(indices)
        coords = data["coords"][idx]
        return cls(
            coords=coords,
            features=edge_features(coords),
            regret=np.asarray(data["regret"])[idx],
            in_solution=np.asarray(data["in_solution"])[idx],
            opt_cost=np.asarray(data["opt_cost"])[idx],
            scalers=scalers or {},
            feat_drop_idx=list(feat_drop_idx),
        )

    @classmethod
    def from_npz(cls, npz_path, split_file=None, scalers_file=None,
                 feat_drop_idx=()) -> "TSPDataset":
        """Load from a generated .npz shard; `split_file` holds 0-based indices
        (one per line) into the shard, like the reference's *.txt path lists."""
        data = load_dataset(npz_path)
        indices = None
        if split_file is not None:
            indices = np.loadtxt(split_file, dtype=np.int64, ndmin=1)
        scalers = load_scalers(scalers_file) if scalers_file else {}
        return cls.from_arrays(data, indices, scalers, feat_drop_idx)

    @classmethod
    def from_reference_dir(cls, instances_file, scalers_file=None,
                           feat_drop_idx=()) -> "TSPDataset":
        """Read a reference-format dataset: a txt listing of per-instance
        pickled networkx graphs (gnngls/datasets.py:38-60)."""
        instances_file = pathlib.Path(instances_file)
        root = instances_file.parent
        names = [ln.strip() for ln in open(instances_file) if ln.strip()]
        graphs = [_read_gpickle(root / p) for p in names]
        n = graphs[0].number_of_nodes()
        topo = build_topology(n)
        E = topo.n_edges

        N = len(graphs)
        coords = np.zeros((N, n, 2), dtype=np.float32)
        features_list = []
        regret = np.zeros((N, E), dtype=np.float32)
        in_sol = np.zeros((N, E), dtype=bool)
        opt_cost = np.zeros((N,), dtype=np.float64)
        for i, G in enumerate(graphs):
            for v in G.nodes:
                coords[i, v] = G.nodes[v]["pos"]
            feats = np.zeros((E, len(np.atleast_1d(
                G.edges[next(iter(G.edges))]["features"]))), dtype=np.float32)
            for (u, v), d in G.edges.items():
                e = edge_index(n, u, v)
                feats[e] = d["features"]
                regret[i, e] = d.get("regret", 0.0)
                in_sol[i, e] = bool(d.get("in_solution", False))
            features_list.append(feats)
            opt_cost[i] = sum(d["weight"] for d in G.edges.values()
                              if d.get("in_solution", False))
        scalers = {}
        if scalers_file is None:
            cand = root / "scalers.pkl"
            scalers_file = cand if cand.exists() else None
        if scalers_file is not None:
            scalers = load_scalers(scalers_file)
        return cls(coords=coords, features=np.stack(features_list), regret=regret,
                   in_solution=in_sol, opt_cost=opt_cost, scalers=scalers,
                   feat_drop_idx=list(feat_drop_idx))


def _read_gpickle(path):
    """networkx >= 3 removed read_gpickle; the files are plain pickles."""
    with open(path, "rb") as f:
        return pickle.load(f)


def split_dataset(n_total: int, n_train: int, n_test: int, n_val: int,
                  seed: Optional[int] = None, rng=None):
    """Shuffled train/test/val index split.

    Matches preprocess_dataset.py:26-31 including the order quirk: the shuffled
    list is carved as train, then TEST, then val.
    """
    rng = np.random.default_rng(seed) if rng is None else rng
    perm = rng.permutation(n_total)
    train = perm[:n_train]
    test = perm[n_train:n_train + n_test]
    val = perm[n_train + n_test:n_train + n_test + n_val]
    return train, val, test
