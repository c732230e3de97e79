"""Round-2 TPU measurement batch (run while the TPU is free).

1. north-star inference + GLS numbers (RESULTS_north_star.json/md);
2. gradient parity of the bf16 training path (GRAD_PARITY.json);
3. whole-GLS Pallas kernel at n=256/500 — the round-1 docstring capped it at
   n~128 on VMEM arithmetic, untested; measure whether it compiles and beats
   the XLA engine's 866 moves/s at n=500, B=64 (RESULTS_scale.md).
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def probe_large_n_pallas():
    import jax
    import jax.numpy as jnp

    from gnngls_tpu.search import batched, pallas_gls

    out = {}
    for n, batch_ladder, iters in ((256, (64,), 3), (500, (64, 16, 8), 3)):
        for B in batch_ladder:  # HBM OOM at big B: retry smaller
            rng = np.random.default_rng(5)
            pos = rng.random((B, n, 2))
            Ds = jnp.asarray(np.linalg.norm(
                pos[:, :, None] - pos[:, None, :], axis=-1).astype(np.float32))
            inits = batched.nearest_neighbor_batch(Ds)
            jax.block_until_ready(inits)
            try:
                t0 = time.perf_counter()
                tours, costs, moves = pallas_gls.gls_pallas(
                    Ds, Ds, inits, n_iters=iters, perturbation_moves=20)[:3]
                _ = float(np.asarray(moves).sum())
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                tours, costs, moves = pallas_gls.gls_pallas(
                    Ds * 1.0000001, Ds * 1.0000001, inits, n_iters=iters,
                    perturbation_moves=20)[:3]
                m1 = float(np.asarray(moves).sum())
                dt = time.perf_counter() - t0
                # validity: every tour is a permutation
                t = np.asarray(tours)
                ok = all(len(np.unique(r[:-1])) == n for r in t[:8])
                out[n] = {"B": B, "n_iters": iters, "compile_s": compile_s,
                          "moves_per_s": m1 / dt, "valid_sample": bool(ok)}
                print(f"[pallas-gls n={n}] B={B}: {m1/dt:.0f} moves/s "
                      f"(compile {compile_s:.0f}s, valid={ok})", flush=True)
                break
            except Exception as exc:  # noqa: BLE001
                err = f"{type(exc).__name__}: {exc}"[:300]
                prior = out.get(n, {}).get("failed_B", [])
                out[n] = {"error": err, "failed_B": prior + [B]}
                print(f"[pallas-gls n={n}] B={B} FAILED: {err[:120]}",
                      flush=True)
    path = ROOT / "benchmarks" / "RESULTS_north_star.json"
    rec = json.loads(path.read_text()) if path.exists() else {}
    rec["pallas_gls_large_n"] = out
    path.write_text(json.dumps(rec, indent=2))


def main():
    import north_star

    north_star.main(["--part", "tpu"])
    probe_large_n_pallas()
    import grad_parity_tpu

    grad_parity_tpu.main()


if __name__ == "__main__":
    main()
