"""Large-n scale benchmark: tsp500 / tsp1000 class on one TPU chip.

The reference tops out at n=100 (its data/ dirs).  The paper's method
scales in principle; this exercises our large-n paths end to end:

  * chunked city-group GAT inference (ops/gat.gat_conv_chunked) — the
    (n, n-1, n-1, H) score tensor is flash-decomposed so peak memory is
    city_chunk/n of the full tensor;
  * batched XLA GLS engine at n=500/1000 (search/batched) — vmapped
    fixed-shape search, dense (n, n) state per instance.

Prints a table of throughput numbers and writes RESULTS_scale.json.
Usage: python benchmarks/scale_large_n.py [--quick]
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def bench_gat(n, batch, city_chunk, n_reps=3):
    import jax
    import jax.numpy as jnp

    from gnngls_tpu.core.graph import build_topology, n_edges
    from gnngls_tpu.models import regret_gat as M

    cfg = M.RegretGNNConfig()  # reference defaults, 1.19M params
    params, state = M.init_params(jax.random.PRNGKey(0), cfg)
    apply = jax.jit(M.make_apply(cfg, n, gat_impl="chunked"))
    E = n_edges(n)

    xs = [jax.random.uniform(jax.random.PRNGKey(i), (batch, E, 1))
          for i in range(n_reps + 1)]
    y, _ = apply(params, state, xs[0])
    jax.block_until_ready(y)  # compile
    t0 = time.perf_counter()
    for x in xs[1:]:
        y, _ = apply(params, state, x)
        _ = np.asarray(y[0, 0])  # force completion through the tunnel
    dt = (time.perf_counter() - t0) / n_reps
    # one GAT layer touches ~E * 2(n-2) directed line-graph edges; 8 layers
    edges_per_fwd = batch * E * 2 * (n - 2) * 8
    return {
        "n": n, "batch": batch, "E": E, "s_per_forward": dt,
        "edges_per_s": edges_per_fwd / dt,
        "instances_per_s": batch / dt,
    }


def bench_gls(n, batch, n_iters, n_reps=2):
    import jax
    import jax.numpy as jnp

    from gnngls_tpu.search import batched

    def mkset(seed):
        rng = np.random.default_rng(seed)
        pos = rng.random((batch, n, 2))
        Ds = jnp.asarray(np.linalg.norm(
            pos[:, :, None] - pos[:, None, :], axis=-1).astype(np.float32))
        inits = batched.nearest_neighbor_batch(Ds)
        st = batched.batch_init(Ds, Ds[:, None], inits, 256)
        jax.block_until_ready(st)
        return Ds, st

    sets = [mkset(10 + i) for i in range(n_reps + 1)]
    out = batched.batch_chunk(sets[0][1], sets[0][0], sets[0][0][:, None],
                              n_iters, 20)
    _ = int(np.asarray(out.trace.n).sum())  # compile

    moves, dt = 0, 0.0
    for Ds, st in sets[1:]:
        n0 = int(np.asarray(st.trace.n).sum())
        t0 = time.perf_counter()
        out = batched.batch_chunk(st, Ds, Ds[:, None], n_iters, 20)
        n1 = int(np.asarray(out.trace.n).sum())
        dt += time.perf_counter() - t0
        moves += n1 - n0
    return {
        "n": n, "batch": batch, "n_iters": n_iters,
        "moves_per_s": moves / dt, "s_per_chunk": dt / n_reps,
        "instances": batch,
    }


def main():
    quick = "--quick" in sys.argv
    results = {"gat": [], "gls": []}

    # peak chunk memory ~ B * city_chunk * (n-1)^2 * H * 4 B — keep < ~1 GB
    gat_cases = [(500, 2, 4), (1000, 1, 2)]
    gls_cases = [(500, 64, 2), (1000, 16, 1)]
    if quick:
        gat_cases, gls_cases = gat_cases[:1], gls_cases[:1]

    for n, b, cc in gat_cases:
        r = bench_gat(n, b, cc)
        results["gat"].append(r)
        print(f"[gat n={n}] batch {b}: {r['s_per_forward']:.3f}s/fwd, "
              f"{r['edges_per_s']:.3e} edge-msgs/s, "
              f"{r['instances_per_s']:.2f} inst/s")

    for n, b, it in gls_cases:
        r = bench_gls(n, b, it)
        results["gls"].append(r)
        print(f"[gls n={n}] batch {b}: {r['moves_per_s']:.0f} moves/s")

    with open(ROOT / "benchmarks" / "RESULTS_scale.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
