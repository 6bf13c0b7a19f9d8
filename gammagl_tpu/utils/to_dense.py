"""Dense conversions (reference: gammagl/utils/{to_dense_adj,to_dense_batch}.py)."""

import jax.numpy as jnp

from gammagl_tpu.ops.segment import segment_count, segment_sum

__all__ = ["to_dense_adj", "to_dense_batch"]


def to_dense_adj(edge_index, batch=None, edge_attr=None, max_num_nodes=None,
                 batch_size=None):
    """COO edges -> dense (B, N, N[, F]) adjacency (jit-safe when sizes static)."""
    src, dst = edge_index[0], edge_index[1]
    if batch is None:
        num_nodes = max_num_nodes or int(edge_index.max()) + 1
        vals = (jnp.ones(src.shape[0], jnp.float32)
                if edge_attr is None else edge_attr)
        shape = (num_nodes, num_nodes) + tuple(
            () if edge_attr is None else edge_attr.shape[1:])
        return jnp.zeros(shape, vals.dtype).at[src, dst].add(vals)
    batch = jnp.asarray(batch)
    if batch_size is None:
        batch_size = int(batch.max()) + 1
    counts = segment_count(batch, batch_size, jnp.int32)
    if max_num_nodes is None:
        max_num_nodes = int(counts.max())
    ptr = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(counts).astype(jnp.int32)])
    local = jnp.arange(batch.shape[0]) - ptr[batch]
    b = batch[src]
    vals = (jnp.ones(src.shape[0], jnp.float32)
            if edge_attr is None else edge_attr)
    shape = (batch_size, max_num_nodes, max_num_nodes) + tuple(
        () if edge_attr is None else edge_attr.shape[1:])
    return jnp.zeros(shape, vals.dtype).at[b, local[src], local[dst]].add(vals)


def to_dense_batch(x, batch=None, fill_value=0.0, max_num_nodes=None,
                   batch_size=None):
    """Ragged node features -> padded (B, N_max, F) plus boolean mask."""
    if batch is None:
        return x[None], jnp.ones((1, x.shape[0]), dtype=bool)
    batch = jnp.asarray(batch)
    if batch_size is None:
        batch_size = int(batch.max()) + 1
    counts = segment_count(batch, batch_size, jnp.int32)
    if max_num_nodes is None:
        max_num_nodes = int(counts.max())
    ptr = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(counts).astype(jnp.int32)])
    local = jnp.arange(batch.shape[0]) - ptr[batch]
    out = jnp.full((batch_size, max_num_nodes) + x.shape[1:], fill_value,
                   x.dtype)
    out = out.at[batch, local].set(x)
    mask = jnp.zeros((batch_size, max_num_nodes), bool).at[batch, local].set(
        True)
    return out, mask
