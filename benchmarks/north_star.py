"""North-star performance metrics (BASELINE.json / VERDICT r1 item 3).

Measures and records:
  * regret-GNN inference edges/s/chip (full model, per gat_impl) with an
    MFU estimate against v5e peak;
  * GLS accepted moves/s (Pallas engine) — the bench.py headline;
  * weak-scaling efficiency on the virtual device mesh (DP train step and
    sharded GLS, 1 -> 8 devices), the single-chip-era proxy for multi-chip
    scaling (SURVEY §4.4 test strategy; real multi-chip is unavailable here).

Usage:
  python benchmarks/north_star.py --part tpu   # on the real chip
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/north_star.py --part scaling
Results merge into benchmarks/RESULTS_north_star.json + .md.
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

V5E_PEAK_BF16 = 197e12  # FLOP/s, one v5e chip
V5E_PEAK_F32 = 49e12


def model_flops_per_edge(cfg, n):
    """FLOPs per line-graph node (edge) per full-model forward."""
    K = 2 * (n - 2)
    HF = cfg.embed_dim
    per_layer = (
        2 * HF * HF            # GAT projection
        + 4 * HF               # el/er dots
        + 3 * K * cfg.n_heads  # scores + leaky + softmax (vector ops)
        + 2 * K * HF           # attention-weighted aggregation
        + 4 * HF * cfg.hidden_dim  # FFN in+out matmuls
    )
    return cfg.depth * per_layer + 2 * cfg.in_dim * HF + 2 * HF * cfg.out_dim


def bench_inference(n=100, B=128,
                    impls=("pallas_sep_fast", "pallas_sep", "sep_fast",
                           "sep", "fast", "bf16", "pallas"),
                    reps=16):
    """Full-model forward throughput per gat_impl.

    Methodology (remote-TPU tunnel — two traps, both hit in earlier rounds):
      1. dispatch is async and jax.block_until_ready can return before
         remote execution completes, so a naive per-call timer measures
         enqueue latency (round-2's 13,000% "MFU");
      2. the tunnel CACHES executions by (executable, inputs) ACROSS
         processes, so seeded inputs re-run in a later session are served
         from cache in ~ms (round-3's 131x-peak "MFU").
    Fix: inputs come from OS entropy on the host (never cacheable), `reps`
    forwards run inside ONE jitted lax.scan fenced by a host fetch, and the
    per-forward time is the SLOPE between a short and a long scan — the
    fixed tunnel round-trip and fetch cost cancels out.
    """
    import jax
    import jax.numpy as jnp

    from gnngls_tpu.core.graph import build_topology
    from gnngls_tpu.models import regret_gat as M

    cfg = M.RegretGNNConfig()
    topo = build_topology(n)
    E = topo.n_edges
    params, state = M.init_params(jax.random.PRNGKey(0), cfg)
    flops = model_flops_per_edge(cfg, n) * E * B
    edge_msgs = B * E * 2 * (n - 2) * cfg.depth
    short = max(1, reps // 4)

    out = {}
    for impl in impls:
        try:
            apply = M.make_apply(cfg, n, gat_impl=impl)

            @jax.jit
            def chained(params, state, xs):
                def step(s, x):
                    y, s2 = apply(params, s, x)
                    return s2, jnp.sum(y)
                _, ys = jax.lax.scan(step, state, xs)
                return ys

            ent = np.random.default_rng()  # OS entropy — uncacheable

            def run(k):
                xs = jnp.asarray(ent.random((k, B, E, 1), dtype=np.float32))
                xs = jax.block_until_ready(jax.device_put(xs))
                t0 = time.perf_counter()
                np.asarray(chained(params, state, xs))  # host fetch = fence
                return time.perf_counter() - t0

            assert reps > short, (
                f"slope timing needs reps > short probe ({reps} vs {short})")
            run(short), run(reps)       # compile warm-up (not timed)
            t_s = min(run(short), run(short))
            t_l = min(run(reps), run(reps))
            dt = (t_l - t_s) / (reps - short)
            timing_method = "slope"
            if dt <= 0:                  # noise floor — fall back to long run
                # NOTE: re-includes the fixed tunnel round-trip the slope
                # method cancels; marked so readers can tell (ADVICE r3)
                dt = t_l / reps
                timing_method = "long-run-fallback"
        except Exception as exc:  # noqa: BLE001 — record per-impl failures
            out[impl] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            print(f"[inference {impl}] FAILED: {out[impl]['error'][:120]}",
                  flush=True)
            continue
        base_impl = impl.partition("@")[0]
        peak = (V5E_PEAK_BF16
                if base_impl in ("bf16",) or base_impl.endswith("fast")
                else V5E_PEAK_F32)
        out[impl] = {
            "n": n, "batch": B, "s_per_forward": dt,
            "timing_method": timing_method,
            "edges_per_s": B * E / dt,
            "edge_messages_per_s": edge_msgs / dt,
            # NOTE: flops here are DENSE-EQUIVALENT (the attention work the
            # city-group einsum formulation executes).  The sep paths
            # (ops/gat_sep.py) algorithmically remove the O(K) aggregation
            # per edge, so their "MFU" is algorithmic throughput vs the dense
            # formulation's speed-of-light, in the flash-attention accounting
            # tradition — not hardware utilization of executed flops.
            "model_flops_per_s": flops / dt,
            "mfu_vs_v5e_peak": flops / dt / peak,
            "flops_accounting": ("dense-equivalent" if "sep" in impl
                                 else "executed"),
        }
        print(f"[inference {impl}] {dt*1e3:.1f} ms/fwd  "
              f"{B*E/dt:.3g} edges/s  {edge_msgs/dt:.3g} edge-msgs/s  "
              f"MFU {flops/dt/peak*100:.1f}%", flush=True)
    return out


def bench_gls(n=100, B=1024, n_iters=5, n_chunks=3):
    sys.path.insert(0, str(ROOT))
    import bench

    value, engine = bench.bench_pallas(n, B, n_iters, n_chunks)
    print(f"[gls {engine}] {value:.0f} accepted moves/s", flush=True)
    return {"engine": engine, "moves_per_s": value,
            "vs_reference_cpu": value / bench.BASELINE_MOVES_PER_S}


def bench_scaling():
    """Weak scaling on the virtual mesh: fixed per-device work, 1->8 devices.

    ⚠ Interpretation (round-2 VERDICT weak item 1): the 8 virtual devices
    share this host's physical cores (2 here), so a compute-bound workload
    is hard-capped at ncores/ndev "efficiency" — 25% at 8 devices — no
    matter how parallel the framework is.  To separate the framework's
    overhead from the host ceiling, each row also times a CONTROL: the same
    TOTAL batch on ONE device (identical work, no mesh machinery).
    `*_overhead_vs_single` = sharded time / control time; ~1.0 means the
    mesh adds nothing and the workload is at the host's compute ceiling,
    >1 means real sharding overhead.  On real multi-chip hardware each
    device has its own cores/HBM and the weak-scaling column is the
    meaningful one; on this box the overhead column is.
    """
    import jax
    import jax.numpy as jnp

    from gnngls_tpu.core.graph import build_topology
    from gnngls_tpu.models import regret_gat as M
    from gnngls_tpu.parallel import eval_shard, mesh as pm, train_dp
    from gnngls_tpu.search import batched
    from gnngls_tpu.train.step import TrainState, make_optimizer

    n = 20
    per_dev = 8
    topo = build_topology(n)
    cfg = M.RegretGNNConfig(in_dim=1, embed_dim=32, n_heads=4)
    params, bn_state = M.init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer()

    import os
    ncores = os.cpu_count() or 1
    rows = {}
    for ndev in (1, 2, 4, 8):
        if ndev > len(jax.devices()):
            break
        mesh = pm.make_mesh(ndev)
        B = per_dev * ndev
        state = TrainState(params, bn_state, optimizer.init(params))
        train_step, _ = train_dp.make_dp_train_step(cfg, n, optimizer, mesh)
        x = jax.random.uniform(jax.random.PRNGKey(1), (B, topo.n_edges, 1))
        y = jax.random.uniform(jax.random.PRNGKey(2), (B, topo.n_edges, 1))
        sh = train_dp.shard_batch(mesh, {"x": x, "y": y})
        state2, loss = train_step(state, sh["x"], sh["y"])  # compile
        jax.block_until_ready(state2)
        t0 = time.perf_counter()
        for _ in range(5):
            state2, loss = train_step(state2, sh["x"], sh["y"])
        jax.block_until_ready(state2)
        dt_train = (time.perf_counter() - t0) / 5

        rng = np.random.default_rng(0)
        pos = rng.random((B, n, 2))
        Ds = np.linalg.norm(pos[:, :, None] - pos[:, None, :],
                            axis=-1).astype(np.float32)
        inits = np.asarray(batched.nearest_neighbor_batch(jnp.asarray(Ds)))
        run = eval_shard.make_sharded_gls(mesh, n_iters=3, perturbation_moves=5)
        shd = train_dp.shard_batch(mesh, {"D": Ds, "g": Ds[:, None], "t": inits})
        _, costs, _ = run(shd["D"], shd["g"], shd["t"])  # compile
        jax.block_until_ready(costs)
        t0 = time.perf_counter()
        for _ in range(3):
            _, costs, _ = run(shd["D"], shd["g"], shd["t"])
            jax.block_until_ready(costs)
        dt_gls = (time.perf_counter() - t0) / 3

        # control: identical total work, ONE device, no mesh machinery
        mesh1 = pm.make_mesh(1)
        train1, _ = train_dp.make_dp_train_step(cfg, n, optimizer, mesh1)
        sh1 = train_dp.shard_batch(mesh1, {"x": x, "y": y})
        st1 = TrainState(params, bn_state, optimizer.init(params))
        st2, _ = train1(st1, sh1["x"], sh1["y"])
        jax.block_until_ready(st2)
        t0 = time.perf_counter()
        for _ in range(5):
            st2, _ = train1(st2, sh1["x"], sh1["y"])
        jax.block_until_ready(st2)
        dt_train1 = (time.perf_counter() - t0) / 5

        run1 = eval_shard.make_sharded_gls(mesh1, n_iters=3,
                                           perturbation_moves=5)
        sh1g = train_dp.shard_batch(mesh1, {"D": Ds, "g": Ds[:, None],
                                            "t": inits})
        _, c1, _ = run1(sh1g["D"], sh1g["g"], sh1g["t"])
        jax.block_until_ready(c1)
        t0 = time.perf_counter()
        for _ in range(3):
            _, c1, _ = run1(sh1g["D"], sh1g["g"], sh1g["t"])
            jax.block_until_ready(c1)
        dt_gls1 = (time.perf_counter() - t0) / 3

        rows[ndev] = {"batch": B, "train_s_per_step": dt_train,
                      "gls_s_per_batch": dt_gls,
                      "train_overhead_vs_single": dt_train / dt_train1,
                      "gls_overhead_vs_single": dt_gls / dt_gls1,
                      "host_core_ceiling": min(1.0, ncores / ndev)}
        print(f"[scaling {ndev} dev] train {dt_train*1e3:.1f} ms/step "
              f"(ovh {dt_train/dt_train1:.2f}x) "
              f"gls {dt_gls*1e3:.1f} ms/batch (ovh {dt_gls/dt_gls1:.2f}x) "
              f"(B={B})", flush=True)
    base_t, base_g = rows[1]["train_s_per_step"], rows[1]["gls_s_per_batch"]
    for ndev, r in rows.items():
        r["train_weak_scaling_eff"] = base_t / r["train_s_per_step"]
        r["gls_weak_scaling_eff"] = base_g / r["gls_s_per_batch"]
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=("tpu", "inference", "scaling"),
                    required=True)
    ap.add_argument("--impls", default=None,
                    help="comma list; measured rows MERGE into the recorded "
                         "inference dict (others keep their last recording)")
    args = ap.parse_args(argv)

    path = ROOT / "benchmarks" / "RESULTS_north_star.json"
    results = json.loads(path.read_text()) if path.exists() else {}
    if args.part in ("tpu", "inference"):
        kw = {"impls": tuple(args.impls.split(","))} if args.impls else {}
        results.setdefault("inference", {}).update(bench_inference(**kw))
        if args.part == "tpu":
            results["gls"] = bench_gls()
    else:
        results["weak_scaling_virtual_mesh"] = bench_scaling()
    path.write_text(json.dumps(results, indent=2))
    write_md(results)


def write_md(results):
    lines = ["# North-star metrics (BASELINE.json)", ""]
    if "inference" in results:
        lines += [
            "## Regret-GNN inference, one v5e chip (tsp100, shipped 1.19M-"
            "param model)",
            "",
            "| impl | ms/forward | edges/s | edge-messages/s | MFU |",
            "|---|---|---|---|---|",
        ]
        for impl, r in results["inference"].items():
            if "error" in r:
                lines.append(f"| {impl} | — failed: {r['error'][:60]} | | | |")
            else:
                lines.append(
                    f"| {impl} (B={r['batch']}) | {r['s_per_forward']*1e3:.1f} "
                    f"| {r['edges_per_s']:.3g} | "
                    f"{r['edge_messages_per_s']:.3g} | "
                    f"{r['mfu_vs_v5e_peak']*100:.1f}% |")
        for impl, r in results["inference"].items():
            if isinstance(r, dict) and r.get("note"):
                lines += ["", f"**{impl}**: {r['note']}"]
        lines += [
            "",
            "Methodology: OS-entropy inputs (uncacheable by the remote-"
            "tunnel execution cache) run inside one jitted lax.scan fenced "
            "by a host fetch; per-forward time is the slope between a short "
            "and a long scan, cancelling the fixed tunnel round-trip.  "
            "Reading: bf16 matching f32 time means the forward is bound by "
            "the slot gathers / (B,n,n-1,H) score VPU work, not the MXU "
            "matmuls — consistent with ~2.9e9 edge-messages/s being the "
            "stable number across dtypes.  `pallas_mxu` fails in the remote "
            "Mosaic compile step on this toolchain (works in interpret "
            "mode; tests cover it on CPU).", ""]
    if "gls" in results:
        g = results["gls"]
        lines += [
            f"## GLS search: {g['moves_per_s']:.0f} accepted moves/s "
            f"({g['engine']} engine) = {g['vs_reference_cpu']:.0f}x the "
            "reference CPU baseline (BASELINE.md)", ""]
    if "weak_scaling_virtual_mesh" in results:
        lines += [
            "## Weak scaling, virtual 8-device mesh (fixed per-device work)",
            "",
            "Host-CPU proxy for multi-chip ICI scaling (one real chip in "
            "this environment).  The virtual devices SHARE the host's "
            "physical cores, so a compute-bound workload is capped at "
            "ncores/ndev apparent efficiency regardless of the framework; "
            "the meaningful column here is **overhead vs single** — sharded "
            "time / one-device-same-total-work time; ~1.0x = the mesh "
            "machinery adds nothing and the row sits at the host's compute "
            "ceiling.  On real multi-chip hardware (own cores/HBM per "
            "device) the eff columns become meaningful.",
            "",
            "Round-5 diagnosis of the former GLS overhead (1.19x at 2/4 "
            "devices, r3): under globally-sharded jit the vmapped GLS "
            "while_loop conditions reduce over the GLOBAL batch, so every "
            "iteration synchronized all devices and ran to the global "
            "lockstep maximum.  eval_shard now uses shard_map (each device "
            "converges its local shard independently, zero collectives); "
            "A/B at identical instances measured the old path 1.20/1.76/"
            "1.19/1.46x slower at 1/2/4/8 devices with identical results.",
            "",
            "| devices | batch | train ms/step | eff | ovh vs single "
            "| GLS ms/batch | eff | ovh vs single | host ceiling |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        for ndev, r in results["weak_scaling_virtual_mesh"].items():
            ovh_t = r.get("train_overhead_vs_single")
            ovh_g = r.get("gls_overhead_vs_single")
            ceil = r.get("host_core_ceiling")
            lines.append(
                f"| {ndev} | {r['batch']} | {r['train_s_per_step']*1e3:.1f} "
                f"| {r['train_weak_scaling_eff']*100:.0f}% "
                f"| {'—' if ovh_t is None else f'{ovh_t:.2f}x'} "
                f"| {r['gls_s_per_batch']*1e3:.1f} "
                f"| {r['gls_weak_scaling_eff']*100:.0f}% "
                f"| {'—' if ovh_g is None else f'{ovh_g:.2f}x'} "
                f"| {'—' if ceil is None else f'{ceil*100:.0f}%'} |")
        lines.append("")
    if "pallas_gls_large_n" in results:
        lines += [
            "## Whole-search Pallas GLS kernel beyond n=128",
            "",
            "| n | B | status | moves/s | XLA-engine fallback (RESULTS_scale) |",
            "|---|---|---|---|---|",
        ]
        xla_fallback = {256: "—", 500: "866 moves/s (B=64)",
                        1000: "301 moves/s (B=16)"}
        for n, r in results["pallas_gls_large_n"].items():
            fb = xla_fallback.get(int(n), "—")
            if "error" in r:
                bs = ",".join(str(b) for b in r.get("failed_B", []))
                lines.append(f"| {n} | {bs} | remote-compile failure "
                             f"(Mosaic `tpu_compile_helper` exit 1 at every "
                             f"B) | — | {fb} |")
            else:
                lines.append(f"| {n} | {r['B']} | ok (valid tours) "
                             f"| {r['moves_per_s']:.0f} | {fb} |")
        lines += [
            "",
            "n=500 is the kernel's current ceiling on this toolchain: the "
            "whole-search kernel keeps the (n,n) distance + penalty + delta "
            "matrices VMEM-resident, and at n=500 the Mosaic remote compiler "
            "rejects the kernel regardless of batch size (B=64/16/8), so the "
            "failure is per-core VMEM/tiling, not HBM.  Mitigation: the XLA "
            "engine covers n>256 (same trajectories, ~7x slower at n=500); "
            "a source-chunked kernel variant (stream D row-slabs HBM->VMEM "
            "like ops/pallas_gat.py's flash path) is the known fix and is "
            "left as future work.", ""]
    gp = ROOT / "benchmarks" / "GRAD_PARITY.json"
    if gp.exists():
        g = json.loads(gp.read_text())
        lines += [
            "## Training-path gradient parity on TPU (bf16 fast path vs "
            "f32-exact naive path)",
            "",
            f"Backend `{g.get('backend')}`, {g.get('config')}: global "
            f"gradient cosine similarity **{g['grad_cosine_similarity']:.6f}**"
            f"; worst single-leaf relative error "
            f"{g['max_rel_err_any_leaf']:.2f} (max elementwise diff over "
            "that leaf's own max magnitude — bf16 aggregation noise "
            "concentrated in one small leaf; the near-1 cosine over all "
            "1.19M parameters is the training-relevant metric).", ""]
    (ROOT / "benchmarks" / "RESULTS_north_star.md").write_text(
        "\n".join(lines) + "\n")
    print("wrote benchmarks/RESULTS_north_star.md")


if __name__ == "__main__":
    main()
