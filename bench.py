"""Benchmark: SpMM edges/s per chip on an ogbn-arxiv-scale synthetic graph.

Protocol mirrors the reference kernel bench
(reference profiler/mpops/complete_test/README.md: ogbn-arxiv 169,343 nodes /
2,315,598 edges, feature dims {16,64,256}, repeated iterations). The headline
metric is the Pallas CSR segment-matmul SpMM in the TPU-idiomatic dtype
(bfloat16 features, f32 accumulation inside the kernel); `vs_baseline`
compares against the XLA scatter-add SpMM on the same chip at the same dtype
(the path any non-kernel JAX implementation would use -- parity with the
reference's "library vs native kernel" comparison axis).

Timing protocol: K data-dependent SpMMs chained through `lax.scan` inside
ONE jit, one scalar fetched at the end. This amortizes the tunnel's per-call
RPC floor (observed anywhere from ~3 ms to ~30 ms) and defeats the relay's
dedup of identical executions (each step consumes the previous output).
Distinct input buffers across repetitions guard the outer call as well.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

K = 16  # chained SpMMs per timed execution


def _chain_time(step, x0, reps=3):
    """min over reps of (one jit'd K-step scan) / K."""

    @jax.jit
    def run(x):
        def body(h, _):
            h = step(h)
            # bound the magnitude and add a data dependency between steps
            h = h / (jnp.max(jnp.abs(h)) + 1.0)
            return h, ()
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.astype(jnp.float32).sum()

    float(run(x0))  # compile + warm
    ts = []
    for r in range(reps):
        xr = x0 + r  # distinct buffer per repetition
        t0 = time.perf_counter()
        float(run(xr))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def bench_spmm(dtype=jnp.bfloat16, F=256):
    from gammagl_tpu.ops import spmm
    from gammagl_tpu.ops.pallas import (build_csr_plan_blocked,
                                        pad_edge_weights, spmm_csr)

    N, E = 169_343, 2_315_598
    rng = np.random.default_rng(0)
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    w = rng.random(E).astype(np.float32)

    ei = jnp.asarray(np.stack([src, dst]).astype(np.int32))
    wj = jnp.asarray(w, dtype)
    x0 = jnp.asarray(rng.normal(size=(N, F)), dtype)

    t_xla = _chain_time(lambda h: spmm(ei, wj, h, num_nodes=N), x0)

    # source-blocked plan keeps each gather's footprint in the fast regime
    # (~100 MB boundary); bf16 features fit in one block at arxiv scale.
    # R=128/ET=512 won the round-3/4 tile scans; the half-packed gather
    # kernel (segment_matmul.pack_halves + _packed_kernel) engages
    # automatically for bf16 F%256==0, and window=True gathers COMPACT
    # (E rows instead of E_pad -- profiler/spmm_win_tune.py).
    footprint = N * F * jnp.dtype(dtype).itemsize
    nb = max(1, -(-footprint // 90_000_000))
    plan = build_csr_plan_blocked(src, dst, N, num_src_blocks=nb,
                                  R=128, ET=256 if nb > 1 else 512,
                                  window=True)
    # static weights (GCN norms) are permuted into plan order once per
    # graph, outside the step
    w_padded = pad_edge_weights(plan, wj)
    t_pallas = _chain_time(
        lambda h: spmm_csr(h, w_padded, plan, weights_padded=True), x0)

    # correctness cross-check (single call, tolerance scaled to dtype)
    ref = spmm(ei, wj, x0, num_nodes=N)
    got = spmm_csr(x0, w_padded, plan, weights_padded=True)
    err = float(jnp.abs((got - ref).astype(jnp.float32)).max())
    tol = 1e-2 if dtype == jnp.float32 else 1.0
    assert err < tol, f"pallas/xla mismatch {err}"
    return E / t_pallas, t_xla / t_pallas, t_pallas


def bench_gather_wall(dtype=jnp.bfloat16, F=256):
    """Bare gather at the SAME index distribution and packed layout the
    SpMM kernel faces: the compact window plan's dst-sorted src ids
    (`plan.gsrc`) pulling rows of the half-packed f32-bitcast view
    (one 128-lane column group for bf16 F=256). This replaces the
    round-4 hard-coded 328e6 wall (VERDICT r4 weak #2) — if a relayout
    shifts the engine's row rate, pct_of_gather_wall tracks it."""
    from gammagl_tpu.ops.pallas import build_csr_plan, pack_halves

    N, E = 169_343, 2_315_598
    rng = np.random.default_rng(0)  # same graph as bench_spmm
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    plan = build_csr_plan(src, dst, N, R=128, ET=512, window=True)
    idx = jnp.asarray(plan.gsrc)
    G = int(idx.shape[0])

    def step(x):
        xp = pack_halves(x)  # (N, F//2) f32 view, 1 column group
        g = jnp.take(xp, idx, axis=0)
        # consume every gathered row (else XLA DCEs the gather) and
        # fold a scalar back so the chain stays data-dependent
        return (x + jnp.sum(g) * 0).astype(x.dtype)

    t = _chain_time(step, jnp.asarray(rng.normal(size=(N, F)), dtype))
    return G / t


def bench_sddmm(dtype=jnp.bfloat16, F=256):
    """Per-edge score dots (the attention-score primitive; BASELINE's
    'SpMM/SDDMM edges/sec/chip' second half). ONE src gather + the Pallas
    dst-block dot kernel: the dst side streams as dense (R, F) blocks on
    the MXU instead of a second 2.3M-row gather (the gather engine is the
    wall — PERF_NOTES 'gather wall')."""
    from gammagl_tpu.ops.pallas import build_csr_plan, sddmm_csr

    N, E = 169_343, 2_315_598
    rng = np.random.default_rng(1)
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    # half-packed compact gather + dst-block dot (no second gather);
    # R=128/ET=512 window won the round-4 scan for the gather-fed kernels
    plan = build_csr_plan(src, dst, N, R=128, ET=512, window=True)
    x0 = jnp.asarray(rng.normal(size=(N, F)), dtype)

    def step(x):
        s = sddmm_csr(x, x, plan)
        # fold the per-edge scores back to node width so the chain's
        # state keeps the (N, F) shape and dtype for the next step
        return (x + jnp.mean(s) * 0).astype(x.dtype)
    t = _chain_time(step, x0)
    return E / t


def bench_fused_gat(dtype=jnp.bfloat16, F=64):
    """Fused edge-softmax attention (score + online softmax + weighted
    aggregate in one Pallas pass; reference decomposes this across
    segment_softmax + SpMM). ONE gather per step: the per-edge source
    score rides the feature gather as an extra column (the conv-zoo
    GATConv plan path does exactly this)."""
    from gammagl_tpu.ops.pallas import (build_csr_plan,
                                        flash_edge_attention,
                                        plan_gather_src_compact)

    N, E = 169_343, 2_315_598
    rng = np.random.default_rng(2)
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    # window plan: the gather is COMPACT (E rows) and the flash kernel
    # streams it at scalar-prefetched window indices; ET=1024 won the
    # round-4 flash tile scan (per-grid-step overhead dominates the
    # extra dense VPU work -- profiler/flash_kernel_tune.py)
    plan = build_csr_plan(src, dst, N, R=128, ET=1024, window=True)
    x0 = jnp.asarray(rng.normal(size=(N, F)), dtype)
    a_d = jnp.asarray(rng.normal(size=(N,)), jnp.float32)

    def step(x):
        packed = jnp.concatenate(
            [x, jnp.sum(x.astype(jnp.float32), 1, keepdims=True
                        ).astype(x.dtype)], axis=1)
        g = plan_gather_src_compact(packed, plan)
        out = flash_edge_attention(g[:, F].astype(jnp.float32), a_d,
                                   g[:, :F], plan, 0.2)
        return out.astype(x.dtype)
    t = _chain_time(step, x0)
    return E / t


def bench_hgt(dtype=jnp.bfloat16, H=4, D=64):
    """Hetero attention: HGT relation attention through a TRAIN step
    (fwd+bwd), per profiler/hgt_attention_bench.py's protocol (bipartite
    200k->100k nodes, 2M edges, H=4, D=64 bf16).

    Round 5: the fully FUSED PACKED path (`hgt_flash_packed`) — one
    half-packed k|v gather (2 column groups instead of 4), q.k scores
    computed ON the MXU inside the kernel (no per-edge score tensor, no
    q expand), one fused backward emitting dq + packed dk|dv. Measured
    143 -> 79 ms/step vs the round-4 decomposed-gather path
    (profiler/hgt_roofline.py). Returns (edges/s, pct_of_roofline,
    measured 2-group gather rate): the roofline charges the two
    irreducible gather passes (fwd gather + backward scatter's internal
    gather, at the MEASURED packed row rate) plus three gp-sized HBM
    streams (fwd kernel read, bwd kernel read, dkv write) at 819 GB/s —
    everything else (dense softmax VPU work x2, q/dq/c block traffic)
    is headroom the number exposes."""
    from gammagl_tpu.ops.pallas import build_csr_plan, hgt_flash_packed
    from gammagl_tpu.ops.pallas.segment_matmul import pack_halves

    N_src, N_dst, E = 200_000, 100_000, 2_000_000
    rng = np.random.default_rng(3)
    src = rng.integers(0, N_src, E)
    dst = (N_dst * (rng.random(E) ** 1.3)).astype(np.int64)
    # ET=256 won the round-5 train-step sweep (78.8 ms vs 83.9 at 512)
    plan = build_csr_plan(src, dst, N_dst, num_src=N_src, R=128, ET=256,
                          window=True)
    kv0 = jnp.asarray(rng.normal(size=(N_src, 2 * H * D)), dtype)
    q0 = jnp.asarray(rng.normal(size=(N_dst, H, D)), dtype)

    KS = 8

    @jax.jit
    def run(kv, q):
        def body(carry, _):
            kv, q = carry
            loss, (gkv, gq) = jax.value_and_grad(
                lambda a, b: (hgt_flash_packed(a, b, plan).astype(
                    jnp.float32) ** 2).sum(), argnums=(0, 1))(kv, q)
            s = 1e-6
            return ((kv - (s * gkv).astype(kv.dtype)),
                    (q - (s * gq).astype(q.dtype))), loss
        _, losses = jax.lax.scan(body, (kv, q), None, length=KS)
        return losses.sum()

    float(run(kv0, q0))
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        float(run(kv0 + jnp.asarray(0.01 * r, dtype), q0))
        ts.append(time.perf_counter() - t0)
    t_train = min(ts) / KS

    # measured 2-group packed gather rate at this plan's distribution
    idx = jnp.asarray(plan.gsrc)
    G = int(idx.shape[0])

    @jax.jit
    def grun(kv):
        def body(h, _):
            g = jnp.take(pack_halves(h), idx, axis=0)
            h = h + (jnp.sum(g) * 0).astype(h.dtype)
            return h / (jnp.max(jnp.abs(h.astype(jnp.float32))
                                ).astype(h.dtype) + 1), ()
        h, _ = jax.lax.scan(body, kv, None, length=KS)
        return h.astype(jnp.float32).sum()

    float(grun(kv0))
    gts = []
    for r in range(3):
        t0 = time.perf_counter()
        float(grun(kv0 + jnp.asarray(0.01 * r, dtype)))
        gts.append(time.perf_counter() - t0)
    rate = G / (min(gts) / KS)
    bytes_stream = 3 * G * (H * D) * 4
    t_roof = 2 * G / rate + bytes_stream / 819e9
    return E / t_train, 100.0 * t_roof / t_train, rate


def _previous_round():
    """Newest BENCH_r*.json next to this file (driver artifacts), parsed
    to the metric dict — so every bench run prints r-over-r deltas and a
    >5% regression never ships silently."""
    import glob
    import os
    import re
    here = os.path.dirname(os.path.abspath(__file__))
    best, best_n = None, -1
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        try:
            with open(p) as f:
                doc = json.load(f)
            prev = doc.get("parsed") or json.loads(
                doc["tail"].strip().splitlines()[-1])
        except Exception:
            continue
        if int(m.group(1)) > best_n:
            best_n, best = int(m.group(1)), prev
    return best, best_n


def _deltas(result, prev):
    keys = ["value", "sddmm_edges_per_s", "fused_gat_edges_per_s",
            "hgt_train_edges_per_s"]
    names = {"value": "spmm"}
    out, regressions = {}, []
    for k in keys:
        if prev and k in prev and prev[k]:
            d = 100.0 * (result[k] - prev[k]) / prev[k]
            name = names.get(k, k.replace("_edges_per_s", ""))
            out[name] = round(d, 1)
            if d < -5.0:
                regressions.append(name)
    return out, regressions


def main():
    N, E, F = 169_343, 2_315_598, 256
    itemsize = 2  # bf16
    edges_per_s, ratio, t_spmm = bench_spmm(jnp.bfloat16, F=F)
    sddmm_eps = bench_sddmm(jnp.bfloat16, F=F)
    gat_eps = bench_fused_gat(jnp.bfloat16, F=64)
    hgt_eps, hgt_pct_roof, hgt_gather_rate = bench_hgt(jnp.bfloat16)
    wall_rows_per_s = bench_gather_wall(jnp.bfloat16, F=F)

    # speed-of-light accounting (VERDICT round-1): bytes-moved model
    # ((E gathered rows + N written rows) * F * itemsize) vs v5e HBM
    # 819 GB/s, and vs the gather-engine row-rate wall MEASURED THIS
    # RUN (bench_gather_wall: bare chained gather at the identical
    # index distribution and half-packed 1-column-group layout the
    # kernel faces) — no more hard-coded constant.
    bytes_moved = (E + N) * F * itemsize
    t_sol_hbm = bytes_moved / 819e9
    t_gather_wall = E / wall_rows_per_s
    result = {
        "metric": "spmm_edges_per_s",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(ratio, 3),
        "pct_of_sol_hbm": round(100 * t_sol_hbm / t_spmm, 1),
        "pct_of_gather_wall": round(100 * t_gather_wall / t_spmm, 1),
        "measured_gather_wall_rows_per_s": round(wall_rows_per_s),
        "sddmm_edges_per_s": round(sddmm_eps),
        "fused_gat_edges_per_s": round(gat_eps),
        "hgt_train_edges_per_s": round(hgt_eps),
        "hgt_pct_of_roofline": round(hgt_pct_roof, 1),
        "hgt_packed_gather_rows_per_s": round(hgt_gather_rate),
        "protocol": "arxiv-scale 169343n/2315598e bf16 F=256 (GAT F=64; "
                    "HGT 200k->100k/2M edges H=4 D=64 fwd+bwd)",
    }
    prev, prev_n = _previous_round()
    if prev is not None:
        deltas, regressions = _deltas(result, prev)
        result["delta_vs_r%02d_pct" % prev_n] = deltas
        if regressions:
            result["REGRESSION_GT_5PCT"] = regressions
    print(json.dumps(result))


if __name__ == "__main__":
    main()
