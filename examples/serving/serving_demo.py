"""GNN serving demo: sampled minibatch inference at fixed latency.

The production-serving shape for GNNs: node features stay RESIDENT in
HBM (`DeviceFeatureCache`), a request is a set of node ids, the host
sampler builds the fixed-fanout blocks, and an AOT-compiled
`InferenceSession` (one per padded bucket) returns logits — no tracing,
no compile, no feature upload on the request path. The reference has no
serving tier at all (SURVEY.md §5: pickled weights only).

  python examples/serving/serving_demo.py --requests 50
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20_000)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--fanout1", type=int, default=10)
    ap.add_argument("--fanout2", type=int, default=5)
    ap.add_argument("--requests", type=int, default=50)
    ap.add_argument("--micro_requests", type=int, default=48,
                    help="0 disables the MicroBatcher phase")
    ap.add_argument("--n_epoch", type=int, default=1, help="unused; lets "
                    "the smoke runner pass a tiny epoch count")
    args = ap.parse_args()

    from gammagl_tpu.datasets import synthetic_community_graph
    from gammagl_tpu.data.padding import size_bucket
    from gammagl_tpu.loader import DeviceFeatureCache, NeighborSamplerLoader
    from gammagl_tpu.models import GraphSAGESampleModel
    from gammagl_tpu.serve import InferenceSession

    g = synthetic_community_graph(args.nodes, 8, args.feat,
                                  avg_degree=10, seed=0)
    loader = NeighborSamplerLoader(
        np.asarray(g.edge_index), node_idx=np.arange(args.nodes),
        sample_lists=[args.fanout1, args.fanout2],
        batch_size=args.batch, num_nodes=g.num_nodes, seed=0)
    fcache = DeviceFeatureCache(np.asarray(g.x),
                                budget_rows=g.num_nodes)
    model = GraphSAGESampleModel(hidden_dim=64, num_class=8,
                                 num_layers=2, drop_rate=0.0)

    def pad_block(bs, n_id, adjs):
        """Static-shape buffers (same protocol as the sampled trainers:
        padded edges point dst at the bucketed size_dst row)."""
        n_pad = int(size_bucket(len(n_id) + 1))
        n_id_p = np.full(n_pad, n_id[-1], dtype=n_id.dtype)
        n_id_p[:len(n_id)] = n_id
        blocks, sizes = [], []
        for i, a in enumerate(adjs):
            size_dst = (int(bs) if i == len(adjs) - 1
                        else int(size_bucket(int(a.size[1]))))
            e_pad = int(size_bucket(int(a.edge_index.shape[1])))
            eb = np.full((2, e_pad), size_dst, dtype=np.int64)
            eb[:, :a.edge_index.shape[1]] = a.edge_index
            blocks.append(eb)
            sizes.append(size_dst)
        return n_id_p, blocks, tuple(sizes)

    rng = np.random.default_rng(0)
    params, sessions, lat = None, {}, []
    for _ in range(args.requests):
        seeds = rng.choice(args.nodes, args.batch, replace=False)
        t0 = time.perf_counter()
        bs, n_id, adjs = loader.sample(seeds)
        n_id_p, blocks, sizes = pad_block(bs, n_id, adjs)
        feats = fcache[n_id_p]
        key = (len(n_id_p),) + tuple(b.shape[1] for b in blocks) + sizes
        if key not in sessions:
            adjs_j = [(jnp.asarray(b), s) for b, s in zip(blocks, sizes)]
            if params is None:
                params = model.init(jax.random.PRNGKey(0), feats, adjs_j)
            szs = sizes
            sessions[key] = InferenceSession(
                lambda p, f, *ebs: model.apply(p, f, list(zip(ebs, szs))),
                params, (feats,) + tuple(jnp.asarray(b) for b in blocks),
                compute_dtype=jnp.bfloat16)
            continue  # session-build request not timed
        logits = sessions[key](feats,
                               *[jnp.asarray(b) for b in blocks])
        jax.block_until_ready(logits)
        lat.append(time.perf_counter() - t0)
    lat = np.sort(np.asarray(lat) * 1e3)
    print(f"{len(lat)} requests, {len(sessions)} bucket sessions: "
          f"p50 {lat[len(lat) // 2]:.1f} ms  "
          f"p95 {lat[int(len(lat) * 0.95)]:.1f} ms  "
          f"(sample + pad + HBM gather + AOT forward)")

    if args.micro_requests:
        micro_demo(args, loader, fcache, model, params)


def micro_demo(args, loader, fcache, model, params):
    """Online serving: concurrent SINGLE-node requests share one padded
    device batch via `serve.MicroBatcher` (each request is one seed id;
    the worker drains the queue, samples the union batch, and splits the
    logits back to per-request futures)."""
    from gammagl_tpu.data.padding import size_bucket
    from gammagl_tpu.serve import InferenceSession, MicroBatcher

    sessions = {}

    # Worst-case fanout caps per seed bucket: ONE session per bucket (the
    # variable-size `size_bucket` padding of the offline path would mint a
    # new AOT program whenever a sample lands in a fresh bucket — on the
    # request path that compile IS the tail latency).
    tot, prefix = 1, 1
    for f in (args.fanout1, args.fanout2):
        prefix *= f
        tot += prefix

    def pad_block(bs, n_id, adjs):
        n_cap = int(size_bucket(bs * tot + 1))
        e_cap = int(size_bucket(bs * (tot - 1)))
        n_id_p = np.full(n_cap, n_id[-1], dtype=n_id.dtype)
        n_id_p[:len(n_id)] = n_id
        blocks, sizes = [], []
        for i, a in enumerate(adjs):
            size_dst = int(bs) if i == len(adjs) - 1 else n_cap
            eb = np.full((2, e_cap), size_dst, dtype=np.int64)
            eb[:, :a.edge_index.shape[1]] = a.edge_index
            blocks.append(eb)
            sizes.append(size_dst)
        return n_id_p, blocks, tuple(sizes)

    def run(seed_batch, n_valid):
        seeds = np.asarray(seed_batch).reshape(-1)
        bs, n_id, adjs = loader.sample(seeds)
        n_id_p, blocks, sizes = pad_block(bs, n_id, adjs)
        feats = fcache[n_id_p]
        key = (len(n_id_p),) + tuple(b.shape[1] for b in blocks) + sizes
        if key not in sessions:
            szs = sizes
            sessions[key] = InferenceSession(
                lambda p, f, *ebs: model.apply(p, f, list(zip(ebs, szs))),
                params, (feats,) + tuple(jnp.asarray(b) for b in blocks),
                compute_dtype=jnp.bfloat16)
        logits = sessions[key](feats, *[jnp.asarray(b) for b in blocks])
        return np.asarray(logits[:len(seeds)])

    rng = np.random.default_rng(1)
    buckets = (8, 32)
    with MicroBatcher(run, buckets=buckets, linger_ms=3.0) as mb:
        # warm the bucket sessions off the clock
        for b in buckets:
            run(rng.choice(args.nodes, b, replace=False), b)
        t0 = time.perf_counter()
        futs = [mb.submit(np.asarray([int(s)]))
                for s in rng.choice(args.nodes, args.micro_requests,
                                    replace=False)]
        outs = [f.result(timeout=120) for f in futs]
        wall = time.perf_counter() - t0
    assert all(np.isfinite(o).all() for o in outs)
    print(f"micro-batched: {args.micro_requests} single-node requests in "
          f"{wall * 1e3:.0f} ms ({args.micro_requests / wall:.0f} req/s, "
          f"buckets {buckets}, {len(sessions)} sessions)")


if __name__ == "__main__":
    main()
