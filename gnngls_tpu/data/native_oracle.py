"""ctypes bindings for the native C++ TSP label oracle (native/tsp_oracle.cc).

The C calls release the GIL, so a ThreadPoolExecutor parallelizes label
generation across instances on all host cores — the native replacement for
the reference's Concorde/LKH subprocess fan-out (scripts/generate_instances.py
:54-58).  Falls back transparently to the numpy/JAX oracles in .solvers when
the shared library hasn't been built.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Tuple

import numpy as np

_LIB_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _LIB_DIR / "libtsp_oracle.so"
_lib = None


def build(force: bool = False) -> bool:
    """Compile the shared library if needed.  Returns availability."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(["sh", str(_LIB_DIR / "build.sh")], check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build():
        raise RuntimeError("native oracle unavailable (build failed)")
    lib = ctypes.CDLL(str(_LIB_PATH))
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.tsp_held_karp.restype = ctypes.c_double
    lib.tsp_held_karp.argtypes = [ctypes.c_int, dp, ip]
    lib.tsp_held_karp_fixed_edge.restype = ctypes.c_double
    lib.tsp_held_karp_fixed_edge.argtypes = [ctypes.c_int, dp, ctypes.c_int,
                                             ctypes.c_int, ip]
    lib.tsp_local_search.restype = ctypes.c_double
    lib.tsp_local_search.argtypes = [ctypes.c_int, dp, ip]
    lib.tsp_regret_costs.restype = ctypes.c_double
    lib.tsp_regret_costs.argtypes = [ctypes.c_int, dp, ctypes.c_int, dp]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def _as_c(D: np.ndarray):
    D = np.ascontiguousarray(D, dtype=np.float64)
    return D, D.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def held_karp(D: np.ndarray) -> Tuple[np.ndarray, float]:
    lib = _load()
    n = D.shape[0]
    D, dp = _as_c(D)
    tour = np.zeros(n + 1, dtype=np.int32)
    cost = lib.tsp_held_karp(n, dp, tour.ctypes.data_as(
        ctypes.POINTER(ctypes.c_int32)))
    return tour, float(cost)


def held_karp_fixed_edge(D: np.ndarray, u: int, v: int) -> Tuple[np.ndarray, float]:
    lib = _load()
    n = D.shape[0]
    D, dp = _as_c(D)
    tour = np.zeros(n + 1, dtype=np.int32)
    cost = lib.tsp_held_karp_fixed_edge(n, dp, u, v, tour.ctypes.data_as(
        ctypes.POINTER(ctypes.c_int32)))
    return tour, float(cost)


def local_search(D: np.ndarray) -> Tuple[np.ndarray, float]:
    lib = _load()
    n = D.shape[0]
    D, dp = _as_c(D)
    tour = np.zeros(n + 1, dtype=np.int32)
    cost = lib.tsp_local_search(n, dp, tour.ctypes.data_as(
        ctypes.POINTER(ctypes.c_int32)))
    return tour, float(cost)


def regret_costs(D: np.ndarray, max_exact_n: int = 16) -> Tuple[np.ndarray, float]:
    """Forced-edge costs for ALL E edges of one instance (C loop)."""
    lib = _load()
    n = D.shape[0]
    D, dp = _as_c(D)
    E = n * (n - 1) // 2
    costs = np.zeros(E, dtype=np.float64)
    base = lib.tsp_regret_costs(n, dp, max_exact_n,
                                costs.ctypes.data_as(
                                    ctypes.POINTER(ctypes.c_double)))
    return costs, float(base)


def regret_costs_batch(Ds: np.ndarray, max_exact_n: int = 16,
                       workers: Optional[int] = None) -> np.ndarray:
    """(B, n, n) -> (B, E) forced-edge costs, threaded across instances."""
    _load()
    with ThreadPoolExecutor(max_workers=workers) as ex:
        outs = list(ex.map(lambda D: regret_costs(D, max_exact_n)[0], Ds))
    return np.stack(outs)
