"""Neighbor-sampler benchmark (reference examples/sampler/): C++ host
sampler vs the numpy fallback, GraphSAGE-style fanouts.

Usage: python examples/sampler/neighbor_sampler.py --num_nodes 100000
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np

from gammagl_tpu.sampler.neighbor_sampler import NeighborSampler


def main(args):
    rng = np.random.default_rng(0)
    ei = np.stack([rng.integers(0, args.num_nodes, args.num_edges),
                   rng.integers(0, args.num_nodes, args.num_edges)])
    for use_ext, name in ((True, "C++"), (False, "numpy")):
        sampler = NeighborSampler(ei, args.num_nodes, args.fanouts,
                                  seed=0, use_ext=use_ext)
        seeds = rng.integers(0, args.num_nodes, args.batch_size)
        sampler.sample_from_nodes(seeds)  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = sampler.sample_from_nodes(seeds)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:6s}: {dt * 1e3:8.2f} ms/batch "
              f"({len(out.node)} nodes, {len(out.row)} edges)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num_nodes", type=int, default=100_000)
    p.add_argument("--num_edges", type=int, default=1_000_000)
    p.add_argument("--fanouts", type=int, nargs="+", default=[25, 10])
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--iters", type=int, default=5)
    main(p.parse_args())
