"""MA-GCL (model-augmentation contrastive) trainer: two-view contrastive pretraining + probe.

Reference flow: examples/magcl/ (augment two views -> contrastive loss ->
linear probe on frozen embeddings). Synthetic SBM fallback when datasets
are unavailable.

Usage: python examples/magcl/magcl_trainer.py --dataset cora
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from examples.common import base_parser, run_two_view_ssl
from gammagl_tpu.models import MAGCLModel


def main(args):
    model = MAGCLModel(hidden_dim=args.hidden_dim)
    return run_two_view_ssl(model, args,
                            embed_fn=lambda m, p, x, ei: m.apply(p, x, ei, None))


if __name__ == "__main__":
    main(base_parser(hidden_dim=128, n_epoch=100, lr=0.0005).parse_args())
