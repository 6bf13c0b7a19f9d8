"""Sampler throughput benchmark.

Mirrors the reference protocol (reference profiler/sampler/readme.md:10-24:
Reddit-scale graph, fanout [25,10] and full [-1], batch 1024, epoch time),
comparing the native C++ core against the numpy fallback.

Usage: python profiler/sampler_bench.py [--nodes 232965 --edges 11460000]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=232_965)
    parser.add_argument("--edges", type=int, default=11_460_000)
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--batches", type=int, default=20)
    args = parser.parse_args()

    from gammagl_tpu.sampler import NeighborSampler

    rng = np.random.default_rng(0)
    ei = np.stack([rng.integers(0, args.nodes, args.edges),
                   rng.integers(0, args.nodes, args.edges)])
    n_batches_epoch = args.nodes // args.batch_size

    for fanout, label in (([25, 10], "[25,10]"), ([-1], "full [-1]")):
        for use_ext in (True, False):
            s = NeighborSampler(ei, args.nodes, fanout, seed=0,
                                use_ext=use_ext)
            seeds = [rng.integers(0, args.nodes, args.batch_size)
                     for _ in range(args.batches)]
            t0 = time.perf_counter()
            tot_edges = 0
            for b in seeds:
                out = s.sample_from_nodes(b)
                tot_edges += len(out.row)
            dt = (time.perf_counter() - t0) / args.batches
            print(f"fanout {label:>10} ext={use_ext!s:>5}: "
                  f"{dt * 1e3:8.1f} ms/batch  "
                  f"epoch~{dt * n_batches_epoch:6.1f}s  "
                  f"{tot_edges / args.batches / dt:12.3e} edges/s")


if __name__ == "__main__":
    main()
