"""Benchmark: batched GLS throughput on tsp100 (the framework's hot loop).

Prints ONE JSON line {metric, value, unit, vs_baseline}.

Baseline: the reference's single-thread Python GLS sustains ~92 accepted
moves/s at n=100 under its 10 s protocol (BASELINE.md, measured on this
machine with the reference search stack verbatim).  We run identical search
semantics (move-for-move parity, tests/test_search.py) as one vmapped batch
on a single TPU chip and report accepted moves/s.

Methodology notes: the remote-TPU tunnel adds a stochastic O(100 ms) per-call
overhead and caches identical executions, so each timed chunk uses distinct
inputs and the run is sized to span seconds; results are fetched to host to
force completion.
"""

import json
import time

import numpy as np

BASELINE_MOVES_PER_S = 92.0  # BASELINE.md: reference GLS, n=100, 1 CPU thread


def main():
    import jax
    import jax.numpy as jnp

    from gnngls_tpu.search import batched

    n, B, chunk_iters, n_chunks = 100, 1024, 2, 3
    states_list = []
    for s in range(n_chunks):
        rng = np.random.default_rng(100 + s)
        pos = rng.random((B, n, 2))
        Ds = jnp.asarray(np.linalg.norm(pos[:, :, None] - pos[:, None, :],
                                        axis=-1).astype(np.float32))
        inits = batched.nearest_neighbor_batch(Ds)
        st = batched.batch_init(Ds, Ds[:, None], inits, 2048)
        jax.block_until_ready(st)
        states_list.append((Ds, st, int(np.asarray(st.trace.n).sum())))

    # warm-up compile on the first set (not timed)
    warm = batched.batch_chunk(states_list[0][1], states_list[0][0],
                               states_list[0][0][:, None], chunk_iters, 20)
    _ = int(np.asarray(warm.trace.n).sum())

    moves, dt = 0, 0.0
    for Ds, st, n0 in states_list:
        t0 = time.perf_counter()
        out = batched.batch_chunk(st, Ds, Ds[:, None], chunk_iters, 20)
        n1 = int(np.asarray(out.trace.n).sum())  # host read forces completion
        dt += time.perf_counter() - t0
        moves += n1 - n0

    value = moves / dt
    print(json.dumps({
        "metric": f"tsp100 GLS accepted moves/s (B={B}, {n_chunks}x{chunk_iters} outer iters, 1 chip)",
        "value": round(value, 1),
        "unit": "moves/s",
        "vs_baseline": round(value / BASELINE_MOVES_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
