"""Kernel micro-benchmarks: segment ops + SpMM across sizes and dims.

Mirrors the reference protocol (reference profiler/mpops/complete_test/
README.md: Cora 2,708n/13,264e; PubMed 19,717n/108,368e; ogbn-arxiv
169,343n/2,315,598e; feature dims {16,64,256}; repeated iterations),
comparing the XLA scatter path against the Pallas CSR kernels on the
current default device.

Usage: python profiler/kernel_bench.py [--dims 16 64 256] [--iters 10]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

GRAPHS = {
    "cora": (2_708, 13_264),
    "pubmed": (19_717, 108_368),
    "ogbn-arxiv": (169_343, 2_315_598),
}


def graph_structure(name, rng):
    """(src, dst, N, tag): REAL adjacency for cora/citeseer/pubmed when
    the reference's bundled CSR files are present (datasets/
    real_structure.py — power-law degree skew and genuine gather
    locality instead of uniform-random synthetic), synthetic power-law
    otherwise."""
    from gammagl_tpu.datasets import load_real_structure
    if name in ("cora", "citeseer", "pubmed"):
        ei, n, is_real = load_real_structure(name)
        if is_real:
            return ei[0], ei[1], n, f"{name}*"
    N, E = GRAPHS[name]
    src = rng.integers(0, N, E)
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    return src, dst, N, name


def timeit(fn, args_cycle, iters=10, warmup=2):
    k = len(args_cycle)
    # warm every buffer: jnp.asarray is LAZY through the remote runtime,
    # so an untouched buffer's host->device transfer would land on the
    # clock (hundreds of ms for arxiv-scale operands)
    for i in range(max(warmup, k)):
        out = fn(*args_cycle[i % k])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args_cycle[i % k])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dims", type=int, nargs="+", default=[16, 64, 256])
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--graphs", nargs="+", default=list(GRAPHS))
    args = parser.parse_args()

    from gammagl_tpu.ops import sddmm_dot, segment_sum, spmm
    from gammagl_tpu.ops.pallas import (build_csr_plan, plan_gather_dst,
                                        plan_gather_src, spmm_csr)

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}")
    print(f"{'graph':>12} {'F':>4} {'xla spmm':>10} {'pallas':>10} "
          f"{'speedup':>8} {'edges/s':>12}")
    for name in args.graphs:
        src, dst, N, name = graph_structure(name, rng)
        E = len(src)
        w = rng.random(E).astype(np.float32)
        ei = jnp.asarray(np.stack([src, dst]).astype(np.int32))
        wj = jnp.asarray(w)
        plan = build_csr_plan(src, dst, N)
        for F in args.dims:
            xs = [jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
                  for _ in range(3)]
            t_x = timeit(jax.jit(lambda x: spmm(ei, wj, x, num_nodes=N)),
                         [(x,) for x in xs], args.iters)
            t_p = timeit(jax.jit(lambda x: spmm_csr(x, wj, plan)),
                         [(x,) for x in xs], args.iters)
            print(f"{name:>12} {F:>4} {t_x * 1e3:>9.2f}m {t_p * 1e3:>9.2f}m "
                  f"{t_x / t_p:>7.2f}x {E / t_p:>12.3e}")

    # segment reduces (reference mpops complete_test protocol: the
    # unsorted_segment_{sum,mean,max} tier, dims {16,64,256}, 10 iters)
    from gammagl_tpu.ops import (unsorted_segment_max,
                                 unsorted_segment_mean,
                                 unsorted_segment_sum)
    from gammagl_tpu.ops.pallas import segment_max_csr, segment_sum_csr
    print(f"\n{'graph':>12} {'F':>4} {'op':>6} {'xla':>10} "
          f"{'pallas':>10} {'edges/s':>12}")
    for name in args.graphs:
        src, dst, N, name = graph_structure(name, rng)
        E = len(src)
        dj = jnp.asarray(dst.astype(np.int32))
        plan = build_csr_plan(src, dst, N)
        perm = jnp.asarray(plan.perm)
        for F in args.dims:
            msgs = [jnp.asarray(rng.normal(size=(E, F)).astype(np.float32))
                    for _ in range(3)]
            for op_name, op in (("sum", unsorted_segment_sum),
                                ("mean", unsorted_segment_mean),
                                ("max", unsorted_segment_max)):
                t_x = timeit(jax.jit(lambda m: op(m, dj, N)),
                             [(m,) for m in msgs], args.iters)
                red = {"sum": segment_sum_csr,
                       "max": segment_max_csr}.get(op_name)
                if red is not None:
                    t_p = timeit(
                        jax.jit(lambda m, red=red: red(
                            jnp.take(m, perm, axis=0), plan)),
                        [(m,) for m in msgs], args.iters)
                    p_str = f"{t_p * 1e3:>9.2f}m"
                    best = min(t_x, t_p)
                else:
                    p_str = f"{'—':>10}"
                    best = t_x
                print(f"{name:>12} {F:>4} {op_name:>6} {t_x * 1e3:>9.2f}m "
                      f"{p_str} {E / best:>12.3e}")

    # SDDMM (per-edge score dot products, the attention score primitive)
    print(f"\n{'graph':>12} {'F':>4} {'xla sddmm':>10} {'plan':>10} "
          f"{'speedup':>8} {'edges/s':>12}")
    for name in args.graphs:
        src, dst, N, name = graph_structure(name, rng)
        E = len(src)
        ei = jnp.asarray(np.stack([src, dst]).astype(np.int32))
        plan = build_csr_plan(src, dst, N)

        def sddmm_plan(a, b):
            # chained plan-order gathers (data dependence keeps the two
            # gathers from interleaving working sets, PERF_NOTES.md)
            ga = plan_gather_src(a, plan)
            gb = plan_gather_dst(b + 0 * ga[:1, :1], plan)
            return jnp.sum(ga * gb, axis=-1)

        for F in args.dims:
            pairs = [(jnp.asarray(rng.normal(size=(N, F)),
                                  jnp.float32),
                      jnp.asarray(rng.normal(size=(N, F)), jnp.float32))
                     for _ in range(3)]
            t_x = timeit(jax.jit(lambda a, b: sddmm_dot(ei, a, b)),
                         pairs, args.iters)
            t_p = timeit(jax.jit(sddmm_plan), pairs, args.iters)
            print(f"{name:>12} {F:>4} {t_x * 1e3:>9.2f}m {t_p * 1e3:>9.2f}m "
                  f"{t_x / t_p:>7.2f}x {E / min(t_x, t_p):>12.3e}")


if __name__ == "__main__":
    main()
