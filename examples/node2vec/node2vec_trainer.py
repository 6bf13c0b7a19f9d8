"""Node2Vec trainer: biased random walks (p, q) skip-gram + probe.

Reference flow: examples/node2vec/node2vec_trainer.py.

Usage: python examples/node2vec/node2vec_trainer.py --dataset cora --p 4 --q 1
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from examples.common import base_parser
from gammagl_tpu.models import Node2Vec

deepwalk_dir = osp.join(osp.dirname(__file__), "..", "deepwalk")
sys.path.insert(0, deepwalk_dir)
from deepwalk_trainer import main as _main


def main(args):
    return _main(args, model_cls=Node2Vec, p=args.p, q=args.q)


if __name__ == "__main__":
    parser = base_parser(hidden_dim=128, n_epoch=5, lr=0.01)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--p", type=float, default=4.0)
    parser.add_argument("--q", type=float, default=1.0)
    main(parser.parse_args())
