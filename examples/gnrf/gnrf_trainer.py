"""GNRF (graph neural ODE / RK4 scan) trainer.

Reference flow: examples/gnrf/gnrf_trainer.py (dataset -> model -> Adam
semi-supervised CE -> best-val test accuracy). TPU-native: the whole train
step is one jit region; synthetic SBM fallback keeps the script runnable
without downloads.

Usage: python examples/gnrf/gnrf_trainer.py --dataset cora --lr 0.01
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from examples.common import base_parser, run_simple_node_trainer, probe_num_classes
from gammagl_tpu.models import GNRFModel


def main(args):
    model = GNRFModel(num_class=probe_num_classes(args), hidden=args.hidden_dim, num_steps=8)
    return run_simple_node_trainer(model, args)


if __name__ == "__main__":
    args = base_parser(hidden_dim=16).parse_args()
    main(args)
