"""Graph-store roundtrip (reference examples/database/: exports Cora into
a Neo4j-style store via gdbi and trains from it). Here the same flow runs
against the in-memory FeatureStore/GraphStore backends — the abstraction
the reference's database interface implements.

Usage: python examples/database/cora_store.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import base_parser, load_node_dataset
from gammagl_tpu.data.feature_store import InMemoryFeatureStore
from gammagl_tpu.data.graph_store import EdgeLayout, InMemoryGraphStore
from gammagl_tpu.models import GCNModel
from gammagl_tpu.train import TrainState, accuracy, semi_supervised_loss


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)

    # export: node features/labels into the feature store, topology into
    # the graph store (the reference's NodeExportConfig/EdgeExportConfig)
    fstore = InMemoryFeatureStore()
    fstore.put_tensor(np.asarray(g.x), group_name="paper", attr_name="x")
    fstore.put_tensor(np.asarray(g.y), group_name="paper", attr_name="y")
    gstore = InMemoryGraphStore()
    gstore.put_edge_index(np.asarray(g.edge_index),
                          edge_type=("paper", "cites", "paper"),
                          layout=EdgeLayout.COO,
                          size=(g.num_nodes, g.num_nodes))

    # import back and train
    x = jnp.asarray(fstore.get_tensor("paper", "x"))
    y = jnp.asarray(fstore.get_tensor("paper", "y"))
    ei = jnp.asarray(gstore.get_edge_index(("paper", "cites", "paper"),
                                           layout=EdgeLayout.COO))
    train_mask = jnp.asarray(np.asarray(g.train_mask).reshape(-1))
    test_mask = jnp.asarray(np.asarray(g.test_mask).reshape(-1))

    model = GCNModel(hidden_dim=args.hidden_dim, num_class=num_classes,
                     drop_rate=0.0)
    params = model.init(jax.random.PRNGKey(args.seed), x, ei)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, x, ei, y, train_mask):
        loss, grads = jax.value_and_grad(
            lambda p: semi_supervised_loss(model.apply(p, x, ei), y,
                                           train_mask))(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def infer(state, x, ei):
        return model.apply(state.params, x, ei)

    for epoch in range(args.n_epoch):
        state, loss = step(state, x, ei, y, train_mask)
    acc = float(accuracy(infer(state, x, ei), y, test_mask))
    print(f"store-roundtrip GCN test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=50, lr=0.01).parse_args())
