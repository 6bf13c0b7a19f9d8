"""Halo-partition balance statistics on REAL citation structure.

Random synthetic graphs flatter partition balance; this reports, for the
reference's bundled real Cora/Citeseer/PubMed adjacencies (+ an
arxiv-scale synthetic power-law), the padded edges/device inflation and
halo sizes of the block-owner halo partition under three node orders:
natural, RCM (reorder_bandwidth), and degree-balanced
(balance_permutation). Host-only (no device needed).

Usage: python profiler/partition_stats.py [--parts 4 8]
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np


def stats(ei, n, p):
    from gammagl_tpu.parallel.halo import _halo_sets
    rows_per, H, part_edges, halo, _ = _halo_sets(ei, n, p)
    counts = np.asarray([pe[0].shape[1] for pe in part_edges])
    return {
        "rows_per": rows_per,
        "edges_max": int(counts.max()),
        "edges_mean": float(counts.mean()),
        "inflation": float(counts.max() / max(counts.mean(), 1)),
        "halo_per_peer": H,
        "halo_total": p * H,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, nargs="+", default=[4, 8])
    args = ap.parse_args()

    from gammagl_tpu.datasets import load_real_structure
    from gammagl_tpu.parallel import balance_permutation, reorder_bandwidth

    graphs = []
    for name in ("cora", "citeseer", "pubmed"):
        ei, n, is_real = load_real_structure(name)
        graphs.append((f"{name}{'*' if is_real else ''}", ei, n))
    rng = np.random.default_rng(0)
    N, E = 169_343, 2_315_598
    graphs.append(("arxiv-synth", np.stack([
        rng.integers(0, N, E),
        (N * (rng.random(E) ** 1.5)).astype(np.int64)]), N))

    print(f"{'graph':>12} {'P':>3} {'order':>9} {'edges/dev max':>13} "
          f"{'inflation':>9} {'halo rows':>10}")
    for name, ei, n in graphs:
        for p in args.parts:
            orders = {"natural": ei}
            _, inv_b = balance_permutation(ei, n, p)
            orders["balanced"] = inv_b[ei]
            try:
                _, inv_r = reorder_bandwidth(ei, n)
                orders["rcm"] = inv_r[np.asarray(ei)]
            except Exception:
                pass
            for oname, e in orders.items():
                s = stats(np.asarray(e), n, p)
                print(f"{name:>12} {p:>3} {oname:>9} "
                      f"{s['edges_max']:>13,} {s['inflation']:>8.2f}x "
                      f"{s['halo_total']:>10,}")


if __name__ == "__main__":
    main()
