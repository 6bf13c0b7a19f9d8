"""Planned-halo SpMM vs the flat XLA halo tier, single- or multi-device.

On the one real TPU chip this isolates the local-aggregation upgrade (the
Pallas segment-matmul vs XLA scatter) inside the shard_map halo program;
on a pod the interior/boundary split additionally overlaps the all_to_all.

Timing: K data-dependent steps chained in one jit (lax.scan), distinct
device_put-warmed buffers (see PERF_NOTES timing traps).
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np

K = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--edges", type=int, default=2_315_598)
    ap.add_argument("--feat", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--check", action="store_true",
                    help="small-size correctness check vs dense")
    ap.add_argument("--src-blocks", type=int, default=0,
                    help=">1: also run the src-blocked interior variant "
                         "(gather-wall mitigation; see auto_src_blocks)")
    ap.add_argument("--only-blocked", action="store_true",
                    help="skip the unblocked variants")
    ap.add_argument("--real", choices=["cora", "citeseer", "pubmed"],
                    default=None,
                    help="use the reference's bundled REAL citation "
                         "adjacency (datasets/real_structure.py) instead "
                         "of a uniform-random synthetic graph")
    ap.add_argument("--no-balance", action="store_true",
                    help="disable the builders' default "
                         "balance_permutation relabeling")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from gammagl_tpu.parallel import (build_halo_partition,
                                      build_halo_partition_planned,
                                      make_halo_spmm,
                                      make_halo_spmm_planned)

    if args.check:
        args.nodes, args.edges, args.feat = 3000, 30000, 64

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    if args.real:
        from gammagl_tpu.datasets import load_real_structure
        ei, args.nodes, is_real = load_real_structure(args.real)
        args.edges = ei.shape[1]
        print(f"{args.real}: {args.nodes:,} nodes / {args.edges:,} edges "
              f"({'REAL adjacency' if is_real else 'synthetic fallback'})")
    else:
        ei = np.stack([rng.integers(0, args.nodes, args.edges),
                       rng.integers(0, args.nodes, args.edges)])
    w = rng.random(args.edges).astype(np.float32)
    ndev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))

    t0 = time.perf_counter()
    bal = not args.no_balance
    flat = build_halo_partition(ei, args.nodes, ndev, w, balance=bal)
    plan = build_halo_partition_planned(ei, args.nodes, ndev, w,
                                        balance=bal)
    print(f"partitions built in {time.perf_counter() - t0:.1f}s "
          f"(rows/dev {plan.rows_per:,}, halo/peer {plan.halo_per_peer:,})")

    total = ndev * flat.rows_per
    x = rng.normal(size=(total, args.feat)).astype(np.float32)

    def timed(fn_name, run):
        @jax.jit
        def chain(xv):
            def body(h, _):
                h = run(h)
                h = (h / (jnp.max(jnp.abs(h)) + 1.0)).astype(dt)
                return h, ()
            h, _ = jax.lax.scan(body, xv, None, length=K)
            return h.astype(jnp.float32).sum()

        xs = [jax.device_put(jnp.asarray(x + i, dt),
                             NamedSharding(mesh, P("dp")))
              for i in range(3)]
        for b in xs:
            jax.block_until_ready(b)
            float(chain(b))  # compile + warm every buffer
        ts = []
        for b in xs:
            t = time.perf_counter()
            float(chain(b))
            ts.append(time.perf_counter() - t)
        dt_s = min(ts) / K
        print(f"{fn_name:28s} {dt_s * 1e3:8.2f} ms  "
              f"{args.edges / dt_s:10.3e} edges/s")
        return dt_s

    if args.check:
        xs = jax.device_put(jnp.asarray(x, dt),
                            NamedSharding(mesh, P("dp")))
        a = np.asarray(jax.jit(make_halo_spmm(mesh, flat))(xs), np.float64)
        b = np.asarray(jax.jit(make_halo_spmm_planned(
            mesh, plan, kernel=True))(xs), np.float64)
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        print(f"kernel-vs-flat rel err {err:.2e}")
        assert err < 5e-3, err
        return

    if args.src_blocks <= 1 or not args.only_blocked:
        t_flat = timed("flat halo (XLA scatter)",
                       make_halo_spmm(mesh, flat))
        t_plan = timed("planned halo (kernel)",
                       make_halo_spmm_planned(mesh, plan, kernel=True))
        timed("planned halo (XLA, overlap)",
              make_halo_spmm_planned(mesh, plan, kernel=False))
        print(f"kernel speedup vs flat: {t_flat / t_plan:.2f}x")
    if args.src_blocks > 1:
        blocked = build_halo_partition_planned(
            ei, args.nodes, ndev, w, num_src_blocks=args.src_blocks,
            balance=bal)
        timed(f"planned kernel, {args.src_blocks} src blocks",
              make_halo_spmm_planned(mesh, blocked, kernel=True))


if __name__ == "__main__":
    main()
