"""AGNN (attention-based graph neural network) trainer.

Reference flow: examples/agnn/ in the reference repo (dataset -> model ->
Adam semi-supervised CE). The model is assembled inline from the conv layer
as the reference example does.

Usage: python examples/agnn/agnn_trainer.py --dataset cora
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import flax.linen as nn
from gammagl_tpu.layers.conv import AGNNConv
from examples.common import base_parser, run_simple_node_trainer, probe_num_classes


class Net(nn.Module):
    hidden_dim: int = 16
    num_class: int = 7
    drop_rate: float = 0.5

    @nn.compact
    def __call__(self, x, edge_index, train=False):
        drop = nn.Dropout(self.drop_rate, deterministic=not train)
        x = nn.relu(nn.Dense(self.hidden_dim)(drop(x)))
        for _ in range(2):
            x = AGNNConv()(x, edge_index)
        return nn.Dense(self.num_class)(drop(x))


def main(args):
    model = Net(hidden_dim=args.hidden_dim, num_class=probe_num_classes(args),
                drop_rate=args.drop_rate)
    return run_simple_node_trainer(model, args)


if __name__ == "__main__":
    main(base_parser(hidden_dim=16).parse_args())
