"""Data layer: exact solver, scalers, generation, labels, dataset ingestion."""

import itertools
import pickle

import networkx as nx
import numpy as np
import pytest

from gnngls_tpu.core.graph import build_topology, edge_index
from gnngls_tpu.core.scaler import MinMaxScaler, load_scalers, save_scalers
from gnngls_tpu.data import dataset as ds, generate as gen, labels as lb, solvers
from gnngls_tpu.utils import is_valid_tour, tour_cost


def rand_D(n, seed):
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 2))
    return np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)


def brute_force(D):
    n = D.shape[0]
    best, best_cost = None, np.inf
    for perm in itertools.permutations(range(1, n)):
        t = [0] + list(perm) + [0]
        c = D[t[:-1], t[1:]].sum()
        if c < best_cost:
            best, best_cost = t, c
    return best, best_cost


@pytest.mark.parametrize("n,seed", [(5, 0), (7, 1), (8, 2)])
def test_held_karp_matches_brute_force(n, seed):
    D = rand_D(n, seed)
    t, c = solvers.held_karp(D)
    bt, bc = brute_force(D)
    assert abs(c - bc) < 1e-9
    assert is_valid_tour(n, t)
    assert abs(tour_cost(D, t) - c) < 1e-9


@pytest.mark.parametrize("n,seed", [(6, 3), (7, 4)])
def test_held_karp_fixed_edge(n, seed):
    D = rand_D(n, seed)
    topo = build_topology(n)
    for e in map(tuple, topo.edges):
        t, c = solvers.held_karp_fixed_edge(D, e)
        assert is_valid_tour(n, t)
        pairs = set(zip(t[:-1], t[1:])) | set(zip(t[1:], t[:-1]))
        assert e in pairs, f"forced edge {e} missing"
        assert abs(tour_cost(D, t) - c) < 1e-6
        # exactness: best among all brute-force tours containing e
        best = min(
            (D[tt[:-1], tt[1:]].sum()
             for tt in ([0] + list(p) + [0] for p in itertools.permutations(range(1, n)))
             if e in set(zip(tt[:-1], tt[1:])) | set(zip(tt[1:], tt[:-1]))),
        )
        assert abs(c - best) < 1e-9


def test_scaler_matches_sklearn():
    from sklearn.preprocessing import MinMaxScaler as SK

    rng = np.random.default_rng(0)
    chunks = [rng.normal(size=(50, 3)) * 10 for _ in range(4)]
    sk, ours = SK(), MinMaxScaler()
    for c in chunks:
        sk.partial_fit(c)
        ours.partial_fit(c)
    X = rng.normal(size=(20, 3)) * 10
    np.testing.assert_allclose(ours.transform(X), sk.transform(X), rtol=1e-12)
    np.testing.assert_allclose(ours.inverse_transform(ours.transform(X)), X, rtol=1e-9)
    # constant-column guard matches sklearn
    sk2, ours2 = SK(), MinMaxScaler()
    Xc = np.ones((10, 2))
    sk2.fit(Xc)
    ours2.fit(Xc)
    np.testing.assert_allclose(ours2.transform(Xc), sk2.transform(Xc))
    # sklearn-pickle ingestion
    assert np.allclose(MinMaxScaler.from_sklearn(sk).transform(X), sk.transform(X))


def test_scaler_json_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    s = MinMaxScaler().fit(rng.normal(size=(30, 2)))
    save_scalers(tmp_path / "s.json", {"features": s})
    s2 = load_scalers(tmp_path / "s.json")["features"]
    X = rng.normal(size=(5, 2))
    np.testing.assert_allclose(s.transform(X), s2.transform(X))


def test_generate_and_label_small(tmp_path):
    data = gen.generate_instances(4, 8, seed=0)
    assert data["coords"].shape == (4, 8, 2)
    assert str(data["solver"]) == "held_karp"
    for i in range(4):
        assert is_valid_tour(8, data["opt_tour"][i].tolist())
        # in_solution has exactly n edges
        assert data["in_solution"][i].sum() == 8

    lb.compute_regret(data, method="held_karp")
    r = data["regret"]
    assert r.shape == (4, build_topology(8).n_edges)
    assert (r >= 0).all()
    assert (r[data["in_solution"]] == 0).all()
    assert (r[~data["in_solution"]] > 0).any()

    gen.save_dataset(tmp_path / "d.npz", data)
    back = gen.load_dataset(tmp_path / "d.npz")
    np.testing.assert_allclose(back["regret"], r)


def test_gls_regret_close_to_exact():
    """The batched GLS forced-edge oracle approximates exact regrets well."""
    data = gen.generate_instances(2, 10, seed=1)
    exact = lb.compute_regret(dict(data), method="held_karp").copy()
    approx = lb.compute_regret(dict(data), method="gls", n_iters=10)
    # regrets are ratios ~O(0.1); demand close agreement on average
    assert np.abs(exact - approx).mean() < 0.01
    assert np.abs(exact - approx).max() < 0.15


def test_dataset_roundtrip_and_split(tmp_path):
    data = gen.generate_instances(12, 7, seed=2)
    lb.compute_regret(data, method="held_karp")
    train, val, test = ds.split_dataset(12, 8, 2, 2, seed=0)
    assert len(set(train) | set(val) | set(test)) == 12

    d_train = ds.TSPDataset.from_arrays(data, train)
    d_train.fit_scalers()
    batch = d_train.get_scaled_batch(np.arange(4))
    assert batch["features"].shape == (4, 21, 1)
    assert batch["regret"].shape == (4, 21, 1)
    assert batch["features"].min() >= 0 and batch["features"].max() <= 1 + 1e-6
    # features are the edge weights
    D0 = gen.coords_to_distance_matrix(d_train.coords[0])
    topo = build_topology(7)
    w = D0[topo.edges[:, 0], topo.edges[:, 1]]
    np.testing.assert_allclose(d_train.features[0, :, 0], w, rtol=1e-6)


def test_reference_dir_ingestion(tmp_path):
    """Build a reference-format dataset dir (pickled nx graphs + sklearn
    scalers.pkl + txt listing) and ingest it."""
    from sklearn.preprocessing import MinMaxScaler as SK

    n, N = 6, 3
    rng = np.random.default_rng(5)
    graphs = []
    for i in range(N):
        G = nx.Graph()
        coords = rng.random((n, 2))
        for v, p in enumerate(coords):
            G.add_node(v, pos=p)
        for u, v in itertools.combinations(range(n), 2):
            G.add_edge(u, v, weight=float(np.linalg.norm(coords[u] - coords[v])))
        D = np.array([[G.edges[a, b]["weight"] if a != b else 0.0
                       for b in range(n)] for a in range(n)])
        t, c = solvers.held_karp(D)
        sol = set(zip(t[:-1], t[1:])) | set(zip(t[1:], t[:-1]))
        for u, v in G.edges:
            G.edges[u, v]["in_solution"] = (u, v) in sol
            G.edges[u, v]["features"] = np.array([G.edges[u, v]["weight"]],
                                                 dtype=np.float32)
            _, fc = solvers.held_karp_fixed_edge(D, (u, v))
            G.edges[u, v]["regret"] = 0.0 if (u, v) in sol else float((fc - c) / c)
        graphs.append(G)
        with open(tmp_path / f"inst{i}.pkl", "wb") as f:
            pickle.dump(G, f)

    with open(tmp_path / "test.txt", "w") as f:
        f.writelines(f"inst{i}.pkl\n" for i in range(N))

    sks = {"features": SK(), "regret": SK()}
    for G in graphs:
        sks["features"].partial_fit(np.stack([G.edges[e]["features"] for e in G.edges]))
        sks["regret"].partial_fit(np.array([[G.edges[e]["regret"]] for e in G.edges]))
    with open(tmp_path / "scalers.pkl", "wb") as f:
        pickle.dump(sks, f)

    d = ds.TSPDataset.from_reference_dir(tmp_path / "test.txt")
    assert len(d) == N
    assert d.n_nodes == n
    batch = d.get_scaled_batch([0, 1, 2])
    assert batch["features"].shape == (N, 15, 1)
    # scaled features match sklearn's own transform
    raw = np.stack([[graphs[i].edges[tuple(e)]["features"][0]
                     for e in build_topology(n).edges] for i in range(N)])
    np.testing.assert_allclose(batch["features"][..., 0],
                               sks["features"].transform(raw.reshape(-1, 1)).reshape(N, 15),
                               rtol=1e-5)
    assert (np.asarray([d.in_solution[i].sum() for i in range(N)]) == n).all()
