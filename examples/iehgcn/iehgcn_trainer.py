"""ieHGCN (interpretable evolved hetero GCN) trainer on a typed graph.

Reference flow: examples/iehgcn/ (hetero dataset -> x_dict/edge_index_dict
model -> Adam CE on the target node type). Synthetic typed-graph fallback
keeps it runnable offline.

Usage: python examples/iehgcn/iehgcn_trainer.py --dataset imdb
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from examples.common import base_parser, run_hetero_trainer
from gammagl_tpu.models import ieHGCNModel


def load_imdb(args):
    from gammagl_tpu.datasets import IMDB
    return IMDB(root=args.dataset_path)[0], "movie"


def main(args):
    def make(metadata, num_classes, target):
        return ieHGCNModel(metadata=metadata, hidden_channels=args.hidden_dim, num_class=num_classes, target_ntype=target)
    return run_hetero_trainer(make, args, dataset_loader=load_imdb)


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=50, lr=0.005,
                     drop_rate=0.4).parse_args())
