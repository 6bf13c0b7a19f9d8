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
    footprint = N * F * jnp.dtype(dtype).itemsize
    nb = max(1, -(-footprint // 90_000_000))
    plan = build_csr_plan_blocked(src, dst, N, num_src_blocks=nb,
                                  ET=256 if nb > 1 else 512)
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
    return E / t_pallas, t_xla / t_pallas


def main():
    edges_per_s, ratio = bench_spmm(jnp.bfloat16)
    print(json.dumps({
        "metric": "spmm_edges_per_s",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(ratio, 3),
    }))


if __name__ == "__main__":
    main()
