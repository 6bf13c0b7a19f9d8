"""Multi-host input pipeline on the virtual 8-device CPU mesh.

Single process here, but the exact pod code path: seed sharding, padded
host-side sampling, `make_array_from_process_local_data` assembly, and a
shard_map training step consuming the dp-sharded global batch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gammagl_tpu.data import Graph
from gammagl_tpu.loader import (MultiHostNodeLoader, make_global_batch,
                                pad_sampled_graph, shard_seeds)
from gammagl_tpu.sampler import NeighborSampler


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(0)
    n, e = 200, 1200
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = Graph(x=rng.normal(size=(n, 8)).astype(np.float32),
              edge_index=ei.astype(np.int64), num_nodes=n)
    g.y = rng.integers(0, 3, n).astype(np.int32)
    return g


def test_shard_seeds_disjoint_equal():
    seeds = np.arange(103)
    shards = [shard_seeds(seeds, pi, 4) for pi in range(4)]
    assert all(len(s) == 25 for s in shards)
    assert len(np.unique(np.concatenate(shards))) == 100


def test_pad_sampled_graph_masks(graph):
    sampler = NeighborSampler(graph.edge_index, graph.num_nodes, [5, 5],
                              seed=0)
    from gammagl_tpu.loader.node_loader import filter_graph
    out = sampler.sample_from_nodes(np.arange(8))
    sub = filter_graph(graph, out)
    padded = pad_sampled_graph(sub, 256, 1024, 8)
    assert padded["x"].shape == (256, 8)
    assert padded["edge_index"].shape == (2, 1024)
    assert padded["edge_mask"].sum() == sub.edge_index.shape[1]
    assert padded["seed_mask"].sum() == 8
    # padded edges must target the final padding row, never a real node
    pe = padded["edge_index"][:, ~padded["edge_mask"]]
    assert (pe == 255).all()


def test_multihost_loader_global_batch(graph):
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    sampler = NeighborSampler(graph.edge_index, graph.num_nodes, [5, 5],
                              seed=0)
    loader = MultiHostNodeLoader(graph, sampler, mesh, batch_size=16,
                                 node_bucket=512, edge_bucket=2048,
                                 shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader) == 1  # 200 seeds / (16*8)
    b = batches[0]
    assert b["x"].shape == (8, 512, 8)          # (dp, nodes, F)
    assert b["edge_index"].shape == (8, 2, 2048)
    # globally sharded over dp
    assert len(b["x"].sharding.device_set) == 8

    # consume it in a shard_map step: per-shard masked mean degree-0 GCN
    from gammagl_tpu.ops import segment_sum

    @jax.jit
    def step(x, ei, emask, seed_mask):
        def f(x, ei, emask, seed_mask):
            x, ei = x[0], ei[0]
            msg = jnp.take(x, ei[0], axis=0, mode="clip")
            msg = msg * emask[0][:, None]
            agg = segment_sum(msg, ei[1], x.shape[0])
            loss = jnp.sum((agg * seed_mask[0][:, None]) ** 2)
            return jax.lax.psum(loss, "dp")[None]
        from jax import shard_map
        return shard_map(
            f, mesh=mesh, in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
            out_specs=P("dp"))(x, ei, emask, seed_mask)

    loss = step(b["x"], b["edge_index"],
                b["edge_mask"].astype(jnp.float32),
                b["seed_mask"].astype(jnp.float32))
    assert np.isfinite(np.asarray(loss)).all()


def test_multihost_two_process_simulation(graph):
    """Two simulated hosts: disjoint seed coverage, equal step counts."""
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    sampler = NeighborSampler(graph.edge_index, graph.num_nodes, [3],
                              seed=0)
    seen = []
    lens = []
    for pi in range(2):
        loader = MultiHostNodeLoader(
            graph, sampler, mesh, batch_size=8, node_bucket=128,
            edge_bucket=512, shuffle=True, seed=7,
            process_index=pi, process_count=2)
        # hosts only materialize their local shard; iterate the seed
        # partition logic directly
        order = loader.all_seeds.copy()
        np.random.default_rng(7 + loader.epoch).shuffle(order)
        mine = shard_seeds(order, pi, 2)
        seen.append(mine)
        lens.append(len(loader))
    assert lens[0] == lens[1] > 0
    assert len(np.intersect1d(seen[0], seen[1])) == 0
