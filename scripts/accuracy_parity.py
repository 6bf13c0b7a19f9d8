"""Accuracy-parity harness vs the reference tables (BASELINE.md).

Runs GCN/GAT on Cora/Citeseer/Pubmed with the reference hyperparameters
(reference examples/gcn/gcn_trainer.py defaults; readme accuracy tables
at examples/{gcn,gat}/readme.md) over N seeds and writes mean/std to a
JSON artifact with the reference target and the |delta|<=0.3% verdict.

Real Planetoid raw files are required for a meaningful comparison; this
environment has no network egress, so when downloads fail each entry is
recorded with "data": "synthetic" and NO verdict (the synthetic SBM
fallback's accuracy is unrelated to the published tables). On any host
with network (or pre-staged `data/<name>/raw/`), the same command
produces the real parity table:

    python scripts/accuracy_parity.py --seeds 5 --out ACCURACY_r02.json
"""

import argparse
import importlib.util
import json
import os.path as osp
import statistics
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

# reference targets: torch-backend column of the readme tables
# (examples/gcn/readme.md:37-41, examples/gat/readme.md:36-40)
TARGETS = {
    ("gcn", "cora"): 81.43, ("gcn", "citeseer"): 70.53,
    ("gcn", "pubmed"): 78.63,
    ("gat", "cora"): 82.44, ("gat", "citeseer"): 70.94,
    ("gat", "pubmed"): 78.50,
}


def _load_main(model):
    path = osp.join(ROOT, "examples", model, f"{model}_trainer.py")
    spec = importlib.util.spec_from_file_location(f"{model}_trainer", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _have_real(name):
    return osp.exists(osp.join(ROOT, "data", name, "raw"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--models", nargs="*", default=["gcn", "gat"])
    ap.add_argument("--datasets", nargs="*",
                    default=["cora", "citeseer", "pubmed"])
    ap.add_argument("--out", default="ACCURACY_r02.json")
    args = ap.parse_args()

    from gammagl_tpu.data.download import network_available
    results = {}
    for model in args.models:
        mod = _load_main(model)
        for ds in args.datasets:
            real = _have_real(ds) or network_available()
            accs = []
            for seed in range(args.seeds):
                ns = argparse.Namespace(
                    dataset=ds, dataset_path=osp.join(ROOT, "data"),
                    lr=0.01 if model == "gcn" else 0.005, n_epoch=200,
                    hidden_dim=16 if model == "gcn" else 8,
                    drop_rate=0.5 if model == "gcn" else 0.6,
                    l2_coef=5e-4, seed=seed,
                    heads=8, best_model_path=f"/tmp/{model}_{ds}.msgpack")
                accs.append(100.0 * float(mod.main(ns)))
            mean = statistics.mean(accs)
            std = statistics.pstdev(accs) if len(accs) > 1 else 0.0
            target = TARGETS.get((model, ds))
            entry = {
                "acc_mean": round(mean, 2), "acc_std": round(std, 2),
                "seeds": args.seeds,
                "data": "real" if real else "synthetic",
                "reference_acc": target,
            }
            if real and target is not None:
                entry["delta"] = round(mean - target, 2)
                entry["within_0.3"] = abs(mean - target) <= 0.3
            else:
                entry["note"] = ("synthetic SBM fallback (no network "
                                 "egress); re-run with data/<name>/raw "
                                 "staged for the real comparison")
            results[f"{model}/{ds}"] = entry
            print(f"{model}/{ds}: {mean:.2f}±{std:.2f} "
                  f"({'real' if real else 'synthetic'})", flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
