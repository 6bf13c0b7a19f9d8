"""HardGAT (hard graph attention, top-k neighbor gate) trainer.

Reference flow: examples/hardgat/hardgat_trainer.py (dataset -> model -> Adam
semi-supervised CE -> best-val test accuracy). TPU-native: the whole train
step is one jit region; synthetic SBM fallback keeps the script runnable
without downloads.

Usage: python examples/hardgat/hardgat_trainer.py --dataset cora --lr 0.005
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from examples.common import base_parser, run_simple_node_trainer, probe_num_classes
from gammagl_tpu.models import HardGATModel


def main(args):
    model = HardGATModel(hidden_dim=args.hidden_dim, num_class=probe_num_classes(args), heads=8, k=8)
    return run_simple_node_trainer(model, args)


if __name__ == "__main__":
    args = base_parser(hidden_dim=8).parse_args()
    main(args)
