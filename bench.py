"""Benchmark: batched GLS throughput on tsp100 (the framework's hot loop).

Prints ONE JSON line {metric, value, unit, vs_baseline}.

Baseline: the reference's single-thread Python GLS sustains ~92 accepted
moves/s at n=100 under its 10 s protocol (BASELINE.md, measured on this
machine with the reference search stack verbatim).  We run identical search
semantics as one batch on a single TPU chip and report accepted moves/s.

Engine: the whole-search Pallas kernel (search/pallas_gls.py) — the entire
GLS state resident in VMEM, one grid cell per instance; falls back to the
vmapped XLA engine (search/batched.run_fixed) if the kernel path fails.

Methodology notes: the remote-TPU tunnel adds a stochastic O(100 ms) per-call
overhead and caches identical executions, so each timed chunk uses distinct
inputs and the run is sized to span seconds; results are fetched to host to
force completion.
"""

import json
import pathlib
import time

import numpy as np

# Reference GLS at n=100, 1 CPU thread, 10 s protocol.  Round-1 measured
# ~92 moves/s on a loaded machine (BASELINE.md); an idle-machine
# re-measurement this round gives 160.5 moves/s (evaluate.REFERENCE_10S_MOVES)
# — we compare against the stronger (conservative-for-us) number.
BASELINE_MOVES_PER_S = 160.5


def make_set(seed, B, n):
    import jax
    import jax.numpy as jnp

    from gnngls_tpu.search import batched

    # seed=None -> OS entropy.  Timed chunks MUST be entropy-seeded: the
    # remote-TPU tunnel caches executions by (executable, inputs) ACROSS
    # processes, so fixed seeds can be served from cache on a re-run and
    # report transfer latency instead of compute (round-3 finding).
    rng = np.random.default_rng(seed)
    pos = rng.random((B, n, 2))
    Ds = jnp.asarray(np.linalg.norm(pos[:, :, None] - pos[:, None, :],
                                    axis=-1).astype(np.float32))
    inits = batched.nearest_neighbor_batch(Ds)
    jax.block_until_ready((Ds, inits))
    return Ds, inits


def bench_pallas(n, B, n_iters, n_chunks):
    from gnngls_tpu.search import pallas_gls

    sets = [make_set(None, B, n) for s in range(n_chunks + 1)]
    # warm-up compile (not timed)
    m = pallas_gls.gls_pallas(sets[0][0], sets[0][0], sets[0][1],
                              n_iters=n_iters, perturbation_moves=20)[2]
    _ = np.asarray(m)

    moves, dt = 0.0, 0.0
    for Ds, inits in sets[1:]:
        t0 = time.perf_counter()
        mv = pallas_gls.gls_pallas(Ds, Ds, inits, n_iters=n_iters,
                                   perturbation_moves=20)[2]
        moves += float(np.asarray(mv).sum())  # host read forces completion
        dt += time.perf_counter() - t0
    return moves / dt, "pallas"


def bench_xla(n, B, n_iters, n_chunks):
    import jax

    from gnngls_tpu.search import batched

    sets = []
    for s in range(n_chunks + 1):
        Ds, inits = make_set(None, B, n)
        st = batched.batch_init(Ds, Ds[:, None], inits, 2048)
        jax.block_until_ready(st)
        sets.append((Ds, st, int(np.asarray(st.trace.n).sum())))

    warm = batched.batch_chunk(sets[0][1], sets[0][0], sets[0][0][:, None],
                               n_iters, 20)
    _ = int(np.asarray(warm.trace.n).sum())

    moves, dt = 0.0, 0.0
    for Ds, st, n0 in sets[1:]:
        t0 = time.perf_counter()
        out = batched.batch_chunk(st, Ds, Ds[:, None], n_iters, 20)
        n1 = int(np.asarray(out.trace.n).sum())
        dt += time.perf_counter() - t0
        moves += n1 - n0
    return moves / dt, "xla"


def main():
    n, B = 100, 1024
    try:
        value, engine = bench_pallas(n, B, n_iters=5, n_chunks=3)
    except Exception:
        value, engine = bench_xla(n, B, n_iters=2, n_chunks=3)
    out = {
        "metric": f"tsp100 GLS accepted moves/s ({engine} engine, B={B}, 1 chip)",
        "value": round(value, 1),
        "unit": "moves/s",
        "vs_baseline": round(value / BASELINE_MOVES_PER_S, 1),
    }
    # north-star side metrics, read from the latest recorded run (kept out of
    # the timed path: a cold model compile costs minutes on the remote chip)
    ns = pathlib.Path(__file__).parent / "benchmarks" / "RESULTS_north_star.json"
    if ns.exists():
        try:
            rec = json.loads(ns.read_text()).get("inference", {})
            # prefer the impl with the best utilization of its own dtype
            # peak (edges/s is near-identical across dtypes; MFU is not)
            best = max((r for r in rec.values() if "mfu_vs_v5e_peak" in r),
                       key=lambda r: r["mfu_vs_v5e_peak"], default=None)
            if best:
                out["extra"] = {
                    "inference_edges_per_s": round(best["edges_per_s"], 1),
                    "inference_mfu_vs_v5e_peak": round(
                        best["mfu_vs_v5e_peak"], 4),
                    # 'dense-equivalent' for the separable paths (they remove
                    # attention flops algorithmically; see north_star.py)
                    "inference_flops_accounting": best.get(
                        "flops_accounting", "executed"),
                }
            n500 = (json.loads(ns.read_text())
                    .get("pallas_gls_large_n", {}).get("500", {}))
            if "moves_per_s" in n500:
                out.setdefault("extra", {})["gls_n500_moves_per_s"] = round(
                    n500["moves_per_s"], 1)
        except Exception:
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
