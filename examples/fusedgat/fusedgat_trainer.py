"""FusedGAT trainer: GAT with the fused flash-attention plan path.

The reference's FusedGATConv wraps dgNN's fused CUDA kernels
(examples/fusedgat/). The TPU-native equivalent is GATConv with a
`CSRPlan`: score + edge softmax + weighted aggregation run as ONE Pallas
kernel (ops/pallas/flash_attention.py), 6.5-8.8x over the decomposed path.

Usage: python examples/fusedgat/fusedgat_trainer.py --dataset cora
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from examples.common import base_parser, device_graph, load_node_dataset
from gammagl_tpu.layers.conv import GATConv
from gammagl_tpu.ops.pallas import build_csr_plan
from gammagl_tpu.train import TrainState, accuracy, semi_supervised_loss


class FusedGAT(nn.Module):
    hidden_dim: int = 8
    heads: int = 8
    num_class: int = 7

    @nn.compact
    def __call__(self, x, edge_index, plan=None):
        x = GATConv(out_channels=self.hidden_dim, heads=self.heads,
                    dropout_rate=0.0)(x, edge_index, plan=plan)
        x = nn.elu(x)
        return GATConv(out_channels=self.num_class, heads=1,
                       dropout_rate=0.0)(x, edge_index, plan=plan)


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    plan = build_csr_plan(np.asarray(ei)[0], np.asarray(ei)[1],
                          g.num_nodes)
    model = FusedGAT(hidden_dim=args.hidden_dim, heads=args.heads,
                     num_class=num_classes)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei, plan)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args; the CSRPlan stays a closure
    # constant by design (numpy-backed, hashable by identity)
    @jax.jit
    def step(state, x, ei, y, train_mask):
        loss, grads = jax.value_and_grad(
            lambda p: semi_supervised_loss(model.apply(p, x, ei, plan),
                                           y, train_mask))(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def infer(state, x, ei):
        return model.apply(state.params, x, ei, plan)

    for epoch in range(args.n_epoch):
        state, loss = step(state, x, ei, d["y"], d["train_mask"])
        if epoch % 20 == 0:
            acc = accuracy(infer(state, x, ei), d["y"], d["test_mask"])
            print(f"epoch {epoch:3d} loss {float(loss):.4f} "
                  f"test {float(acc):.4f}")
    acc = float(accuracy(infer(state, x, ei), d["y"], d["test_mask"]))
    print(f"final test acc {acc:.4f} (fused attention path)")
    return acc


if __name__ == "__main__":
    parser = base_parser(hidden_dim=8, n_epoch=100, lr=0.005)
    parser.add_argument("--heads", type=int, default=8)
    main(parser.parse_args())
