"""GRADE (degree-fair graph contrastive) trainer: two-view contrastive pretraining + probe.

Reference flow: examples/grade/ (augment two views -> contrastive loss ->
linear probe on frozen embeddings). Synthetic SBM fallback when datasets
are unavailable.

Usage: python examples/grade/grade_trainer.py --dataset cora
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from examples.common import base_parser, run_two_view_ssl
from gammagl_tpu.models import GRADEModel


def main(args):
    model = GRADEModel(hidden_dim=args.hidden_dim)
    return run_two_view_ssl(model, args,
                            drop_rates=(0.2, 0.2, 0.2, 0.2),
                            embed_fn=lambda m, p, x, ei: m.apply(p, x, ei, None))


if __name__ == "__main__":
    parser = base_parser(hidden_dim=128, n_epoch=100, lr=0.0005)
    parser.add_argument('--drop_edge_rate_1', type=float, default=0.2)
    parser.add_argument('--drop_feature_rate_1', type=float, default=0.2)
    parser.add_argument('--drop_edge_rate_2', type=float, default=0.2)
    parser.add_argument('--drop_feature_rate_2', type=float, default=0.2)
    main(parser.parse_args())
