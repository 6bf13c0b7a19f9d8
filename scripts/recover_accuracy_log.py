"""Rebuild an accuracy_parity artifact from its console log (the
round-5 first full run died of a host-LLVM allocation failure at
108/123 entries before writing its JSON; the per-entry results are all
in the log). Mirrors accuracy_parity.py's entry structure exactly;
entries whose models were re-run with the fixed loader are merged in
from the rerun artifact.

    python scripts/recover_accuracy_log.py LOG RERUN_JSON OUT_JSON
"""
import json
import re
import sys
import os.path as osp

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

src = open(osp.join(ROOT, "scripts", "accuracy_parity.py")).read()
ns = {"__name__": "ap_mod",
      "__file__": osp.join(ROOT, "scripts", "accuracy_parity.py")}
exec(compile(src, "accuracy_parity.py", "exec"), ns)
TARGETS, CONFIGS = ns["TARGETS"], ns["CONFIGS"]
REAL_FILES = ns["_REAL_STRUCTURE_FILES"]

_STRUCT_ADJ = {
    "cora": "/root/reference/examples/gcil/dataset/cora/0.01_1_1.npz",
    "citeseer": ("/root/reference/examples/citgnn/datasets/"
                 "citeseer_add_0.5.npz"),
    "pubmed": "/root/reference/examples/gcil/dataset/pubmed/0.01_1_1.npz",
}


def main():
    log, rerun_json, out = sys.argv[1], sys.argv[2], sys.argv[3]
    rerun = json.load(open(rerun_json))
    rerun_models = {k.split("/")[0] for k in rerun}
    results = {}
    pat = re.compile(
        r"^([a-z_0-9]+)/([a-zA-Z_0-9]+): ([0-9.]+)\xb1([0-9.]+) "
        r"\((real-structure|synthetic|real)\)")
    for line in open(log, encoding="utf-8", errors="replace"):
        m = pat.match(line)
        if not m:
            continue
        model, ds, mean, std, kind = m.groups()
        if model in rerun_models:
            continue            # fixed-loader rerun supersedes
        entry = {"acc_mean": float(mean), "acc_std": float(std),
                 "seeds": 3, "data": kind}
        tgt = TARGETS.get((model, ds))
        if tgt is not None:
            entry["reference_acc"] = tgt[0]
            entry["reference_source"] = tgt[1]
            entry["reference_backend"] = tgt[2]
        if kind == "real":
            entry["delta"] = round(float(mean) - tgt[0], 2)
            entry["within_0.3"] = abs(float(mean) - tgt[0]) <= 0.3
        elif kind == "real-structure":
            f = REAL_FILES.get((model, ds)) or _STRUCT_ADJ.get(ds)
            entry["note"] = ("REAL adjacency structure (reference "
                            f"in-tree npz: {f}) with structure-derived "
                            "features/labels — no accuracy verdict vs "
                            "the readme table, which needs Planetoid "
                            "feature/label files")
        else:
            entry["note"] = ("synthetic fallback (no network egress); "
                             "stage data/<name>/raw via "
                             "scripts/stage_data.py for the real "
                             "comparison")
        results[f"{model}/{ds}"] = entry
    results.update(rerun)
    kinds = {}
    for e in results.values():
        kinds[e.get("data", "error")] = kinds.get(
            e.get("data", "error"), 0) + 1
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}: {len(results)} entries, kinds={kinds}")


if __name__ == "__main__":
    main()
