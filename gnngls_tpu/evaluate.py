"""Model inference + GLS evaluation (reference: scripts/test.py).

Pipeline per the reference (test.py:59-109), batched on TPU:
  1. predict scaled regret for every edge, inverse-transform, clamp at 0
     (test.py:72-83);
  2. initial tour = nearest neighbor on 'regret_pred' (or 'weight' when
     running without the model) (test.py:85-88);
  3. guided local search under the wall-clock (or fixed-iteration) budget
     (test.py:91-95);
  4. gap = (best_cost / opt_cost - 1) * 100 (test.py:104) and a
     search-progress DataFrame with cummin best_cost / gap / dt columns
     (test.py:113-123).
"""

from __future__ import annotations

import datetime
import pathlib
import time
import uuid
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.graph import build_topology, edge_vector_to_matrix
from .data.dataset import TSPDataset
from .data.generate import coords_to_distance_matrix
from .models import regret_gat as M
from .search import batched


def predict_regret(params, bn_state, cfg: M.RegretGNNConfig, dataset: TSPDataset,
                   *, batch_size: int = 64, gat_impl: str = "auto") -> np.ndarray:
    """Unscaled, non-negative per-edge regret predictions, (N, E)."""
    n = dataset.n_nodes
    if gat_impl == "auto":
        # pallas kernel: f32-exact aggregation on TPU (checkpoint parity)
        gat_impl = "pallas" if jax.default_backend() == "tpu" else "fast"
    apply = jax.jit(M.make_apply(cfg, n, gat_impl=gat_impl))
    outs = []
    for s in range(0, len(dataset), batch_size):
        idx = np.arange(s, min(s + batch_size, len(dataset)))
        batch = dataset.get_scaled_batch(idx)
        y, _ = apply(params, bn_state, jnp.asarray(batch["features"]))
        outs.append(np.asarray(y)[..., 0])
    y_scaled = np.concatenate(outs, axis=0)
    y = dataset.scalers["regret"].inverse_transform(y_scaled[..., None])[..., 0]
    return np.maximum(y, 0.0)  # clamp, test.py:83


def evaluate(dataset: TSPDataset, *, params=None, bn_state=None,
             model_cfg: Optional[M.RegretGNNConfig] = None,
             guides: List[str] = ("regret_pred",),
             time_limit: Optional[float] = 10.0,
             n_iters: Optional[int] = None,
             perturbation_moves: int = 20,
             first_improvement: bool = False,
             batch_size: int = 64,
             engine: str = "auto") -> dict:
    """Evaluate GLS (optionally model-guided) over a dataset.

    Either `time_limit` or `n_iters` (deterministic fixed budget) must be
    set; n_iters takes precedence when given.

    ⚠ `time_limit` semantics differ from the reference: the reference gives
    each instance `time_limit` seconds of one CPU thread (test.py:26-27,95);
    here ONE deadline applies to the whole vmapped batch, so all instances
    share the budget concurrently.  For a like-for-like "10 s protocol"
    comparison use `n_iters` calibrated via
    `gnngls_tpu.evaluate.calibrate_protocol_iters` (see benchmarks/), or
    batch_size=1.

    engine: "xla" (vmapped lax engine, per-move traces, exact reference
    trajectories), "pallas" (whole-search VMEM kernel, ~4x faster, guide
    cycling supported, per-outer-iteration traces), or "auto" (pallas when
    eligible on TPU, else xla).
    """
    guides = list(guides)
    n = dataset.n_nodes
    Ds = coords_to_distance_matrix(dataset.coords).astype(np.float32)

    regret_mats = None
    if "regret_pred" in guides:
        assert params is not None and model_cfg is not None
        preds = predict_regret(params, bn_state, model_cfg, dataset,
                               batch_size=batch_size)
        regret_mats = edge_vector_to_matrix(preds.astype(np.float32), n)
        init_guide = regret_mats  # nearest_neighbor on regret_pred, test.py:85
    else:
        init_guide = Ds

    init_tours = np.asarray(batched.nearest_neighbor_batch(jnp.asarray(init_guide)))
    guide_stack = batched.make_guide_stack(Ds, guides, regret_mats)

    if engine == "pallas" and n_iters is None:
        raise ValueError("engine='pallas' needs a fixed n_iters budget "
                         "(the kernel has no wall-clock chunking)")
    use_pallas = engine == "pallas" or (
        engine == "auto" and n_iters is not None
        and not first_improvement and jax.default_backend() == "tpu"
        # the whole-search kernel pads tour-space state to TPU tile sizes,
        # so its per-(instance, iteration) cost is ~n-independent: measured
        # 0.5k moves/s at n=20 vs 20k on the XLA engine (vs 95k pallas at
        # n=100).  Small instances route to the XLA engine.
        and n >= 50)
    if n_iters is not None and use_pallas:
        result = batched.run_fixed_pallas(Ds, guide_stack, init_tours,
                                          n_iters=n_iters,
                                          perturbation_moves=perturbation_moves)
    elif n_iters is not None:
        result = batched.run_fixed(Ds, guide_stack, init_tours, n_iters=n_iters,
                                   perturbation_moves=perturbation_moves,
                                   first_improvement=first_improvement)
    else:
        result = batched.run_wall_clock(Ds, guide_stack, init_tours,
                                        time_limit_s=time_limit,
                                        perturbation_moves=perturbation_moves,
                                        first_improvement=first_improvement)

    opt = np.asarray(dataset.opt_cost, dtype=np.float64)
    gaps = (result.best_costs / opt - 1.0) * 100.0
    init_costs = Ds[np.arange(len(dataset))[:, None],
                    init_tours[:, :-1], init_tours[:, 1:]].sum(-1)
    return {
        "gaps": gaps,
        "mean_gap": float(gaps.mean()),
        "best_costs": result.best_costs,
        "best_tours": result.best_tours,
        # the pallas kernel traces at outer-iteration granularity (one
        # best-cost snapshot per iteration); the XLA engine traces per move
        "trace_mode": ("per-iteration" if n_iters is not None and use_pallas
                       else "per-move"),
        # the engine that actually ran (auto-routing can pick either; results
        # tables must interpolate this, not assume — ADVICE r3)
        "engine": ("pallas" if n_iters is not None and use_pallas else "xla"),
        "init_costs": init_costs,
        "opt_costs": opt,
        "result": result,
    }


# Accepted-move throughput of the reference's single-thread Python GLS under
# its 10 s/instance protocol (test.py:26-27,95), measured on this machine by
# running the reference search stack verbatim (BASELINE.md methodology):
# mean accepted moves per instance over 3 seeds, uniform instances,
# weight-guided, 20 perturbation moves, best-improvement.  (An idle-machine
# re-measurement, ~1.7x BASELINE.md's loaded-machine numbers — the higher
# target is the conservative one for us.)
REFERENCE_10S_MOVES = {20: 32717.0, 50: 7322.0, 100: 1605.0}


def calibrate_protocol_iters(dataset: TSPDataset, *, target_moves: float,
                             probe_budgets: Tuple[int, int] = (5, 25),
                             max_iters: int = 2000, verify: bool = True,
                             **eval_kw) -> int:
    """Map the reference's 10 s/instance protocol to a fixed n_iters budget.

    The reference gives every instance 10 s of single-thread search; the
    accepted-move count that buys is in REFERENCE_10S_MOVES (measured, see
    BASELINE.md).  The deterministic TPU engines use fixed outer-iteration
    budgets instead of wall-clock (SURVEY §7.4), so this probes the
    accepted-moves-per-instance vs n_iters relationship on `dataset` and
    returns an n_iters whose MEAN accepted moves reaches `target_moves` —
    a budget approximately equivalent (in mean search work, not per
    instance) to the reference protocol.

    Acceptance decays as searches converge, so a linear extrapolation from
    two small probes understates the budget; with ``verify=True`` (default)
    the extrapolated budget is re-measured and bumped (x1.6 steps) until the
    measured mean meets the target or ``max_iters`` is hit.  If the search
    saturates below the target even at ``max_iters`` (common at small n,
    where instances solve to optimality long before the reference's 10 s
    runs out), the returned budget carries that ceiling — quote achieved
    moves alongside gaps whenever this calibration is used.
    """
    measured = {}

    def mean_moves(b: int) -> float:
        if b not in measured:
            out = evaluate(dataset, n_iters=b, **eval_kw)
            measured[b] = float(np.mean(out["result"].chunk_moves[:, -1]))
        return measured[b]

    b0, b1 = probe_budgets
    if mean_moves(b0) >= target_moves:
        return b0
    if mean_moves(b1) >= target_moves:
        # target crossed inside [b0, b1]: interpolate, verify, else take b1
        frac = (target_moves - measured[b0]) / (measured[b1] - measured[b0])
        need = int(np.ceil(b0 + frac * (b1 - b0)))
        need = max(b0 + 1, min(need, b1))
        if not verify or mean_moves(need) >= target_moves:
            return need
        return b1
    slope = (measured[b1] - measured[b0]) / (b1 - b0)
    if slope <= 0:
        return max_iters  # saturated below target: give the max budget
    need = int(np.ceil(b0 + (target_moves - measured[b0]) / slope))
    need = int(max(b1 + 1, min(need, max_iters)))
    if not verify:
        return need
    b = need
    for _ in range(8):
        if mean_moves(b) >= target_moves or b >= max_iters:
            break
        b = min(max_iters, max(b + 1, int(np.ceil(b * 1.6))))
    return b


def search_progress_records(dataset: TSPDataset, out: dict,
                            instance_names: Optional[List[str]] = None) -> list:
    """Reference-format search-progress rows (test.py:97-102,113-117).

    One row per traced accepted move: {instance, time, cost, opt_cost}; move
    timestamps interpolate within their chunk's wall-clock window.
    """
    res: batched.BatchResult = out["result"]
    names = instance_names or [f"instance_{i}" for i in range(len(dataset))]
    rows = []
    times = res.chunk_times
    cap = res.trace_costs.shape[1]
    n_over = int(np.sum(np.asarray(res.trace_n) > cap))
    if n_over:
        import warnings
        warnings.warn(
            f"search trace buffer saturated for {n_over} instance(s) "
            f"(cap={cap}): moves beyond the cap overwrote the last slot and "
            f"the progress DataFrame under-reports them — raise trace_cap "
            f"for full reference-fidelity traces", stacklevel=2)
    trace_moves = getattr(res, "trace_moves", None)
    for b in range(len(dataset)):
        n_tr = int(min(res.trace_n[b], res.trace_costs.shape[1]))
        cum = res.chunk_moves[b]
        for m in range(n_tr):
            # cumulative accepted moves at trace row m: for per-move traces
            # row m IS move m+1; per-iteration traces carry the kernel's
            # cumulative counter (ADVICE r4: using the row index compressed
            # all snapshots into the start of the launch window)
            mv = (m + 1) if trace_moves is None else int(trace_moves[b, m])
            # which chunk did that move land in?
            c = int(np.searchsorted(cum[1:], mv, side="left"))
            c = min(c, len(times) - 2)
            lo, hi = cum[c], cum[min(c + 1, len(cum) - 1)]
            frac = (mv - lo) / max(hi - lo, 1)
            t = times[c] + frac * (times[min(c + 1, len(times) - 1)] - times[c])
            rows.append({
                "instance": names[b],
                "time": t,
                "cost": float(res.trace_costs[b, m]),
                "opt_cost": float(out["opt_costs"][b]),
            })
    return rows


def write_run_dataframe(rows: list, run_dir) -> pathlib.Path:
    """Post-process rows into the reference's pickled DataFrame
    (test.py:113-123): cummin best_cost, gap, dt per instance."""
    import pandas as pd

    run_dir = pathlib.Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame.from_records(rows)
    if len(df):
        df["best_cost"] = df.groupby("instance")["cost"].cummin()
        df["gap"] = (df["best_cost"] / df["opt_cost"] - 1) * 100
        df["dt"] = df["time"] - df.groupby("instance")["time"].transform("min")
    timestamp = datetime.datetime.now().strftime("%b%d_%H-%M-%S")
    path = run_dir / f"{timestamp}_{uuid.uuid4().hex}.pkl"
    df.to_pickle(path)
    return path
