"""Validate (and manifest) the raw-data layout for accuracy-parity runs.

This environment has no network egress, so the real-dataset accuracy
comparison (`scripts/accuracy_parity.py`, reference readme tables) is
blocked until someone stages the raw files. This script makes that a
one-command handoff on any networked host:

    # on a networked host (or after copying raw files in):
    python scripts/stage_data.py check            # layout present?
    python scripts/stage_data.py manifest         # record md5s
    python scripts/accuracy_parity.py --seeds 5 --out ACCURACY.json

    # on a later host: verify the staged files match the manifest
    python scripts/stage_data.py check --verify-md5

Layout registry mirrors each dataset class's `raw_file_names`
(gammagl_tpu/datasets/*.py; reference gammagl/datasets/*). `check`
reports per-dataset status; exit code 0 iff every dataset needed by the
default parity table is staged.
"""

import argparse
import hashlib
import json
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
DATA = osp.join(ROOT, "data")
MANIFEST = osp.join(DATA, "raw_manifest.json")

_PLANETOID = ["ind.{n}.x", "ind.{n}.tx", "ind.{n}.allx", "ind.{n}.y",
              "ind.{n}.ty", "ind.{n}.ally", "ind.{n}.graph",
              "ind.{n}.test.index"]
_HGB = ["adjM.npz", "features_0.npz", "features_1.npz", "features_2.npz",
        "labels.npy", "train_val_test_idx.npz"]
_ENTITIES = ["{n}_stripped.nt.gz", "completeDataset.tsv",
             "trainingSet.tsv", "testSet.tsv"]

# dataset dir name -> (raw file templates, source class)
REGISTRY = {
    "cora": (_PLANETOID, "datasets/planetoid.py:Planetoid"),
    "citeseer": (_PLANETOID, "datasets/planetoid.py:Planetoid"),
    "pubmed": (_PLANETOID, "datasets/planetoid.py:Planetoid"),
    "imdb": (_HGB, "datasets/hetero_datasets.py:IMDB"),
    "dblp": (_HGB, "datasets/hetero_datasets.py:DBLP"),
    "aifb": (_ENTITIES, "datasets/misc_datasets.py:Entities"),
    "mutag": (_ENTITIES, "datasets/misc_datasets.py:Entities"),
    "bgs": (_ENTITIES, "datasets/misc_datasets.py:Entities"),
    "am": (_ENTITIES, "datasets/misc_datasets.py:Entities"),
    "reddit": (["reddit_data.npz", "reddit_graph.npz"],
               "datasets/reddit.py:Reddit"),
    # OGB node datasets: either the npy fast path (preferred: mmap-able)
    # or OGB's own raw layout (data.npz / csv.gz) — see datasets/ogb.py
    "ogbn_arxiv": (["node_feat.npy", "edge_index.npy"],
                   "datasets/ogb.py:OgbNodeDataset"),
    "ogbn_papers100M": (["node_feat.npy", "edge_index.npy"],
                        "datasets/ogb.py:OgbNodeDataset"),
}


def _files(name):
    templates, _ = REGISTRY[name]
    return [t.format(n=name) for t in templates]


def _md5(path, chunk=1 << 20):
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                return h.hexdigest()
            h.update(b)


def check(args):
    manifest = {}
    if args.verify_md5 and osp.exists(MANIFEST):
        with open(MANIFEST) as f:
            manifest = json.load(f)
    ok = True
    for name in (args.datasets or REGISTRY):
        raw = osp.join(DATA, name, "raw")
        missing, bad = [], []
        for fn in _files(name):
            p = osp.join(raw, fn)
            if not osp.exists(p):
                missing.append(fn)
            elif args.verify_md5 and manifest.get(f"{name}/{fn}"):
                if _md5(p) != manifest[f"{name}/{fn}"]["md5"]:
                    bad.append(fn)
        if missing:
            print(f"{name:10s} MISSING {len(missing)}/{len(_files(name))}"
                  f" raw files (stage into {raw}/): {missing[:3]}...")
            ok = False
        elif bad:
            print(f"{name:10s} MD5 MISMATCH: {bad}")
            ok = False
        else:
            extra = " (md5 verified)" if args.verify_md5 and manifest \
                else ""
            print(f"{name:10s} staged OK{extra}")
    sys.exit(0 if ok else 1)


def manifest_cmd(args):
    out = {}
    if osp.exists(MANIFEST):
        with open(MANIFEST) as f:
            out = json.load(f)
    n = 0
    for name in (args.datasets or REGISTRY):
        raw = osp.join(DATA, name, "raw")
        for fn in _files(name):
            p = osp.join(raw, fn)
            if osp.exists(p):
                out[f"{name}/{fn}"] = {"md5": _md5(p),
                                       "bytes": osp.getsize(p)}
                n += 1
    with open(MANIFEST, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"recorded {n} files -> {MANIFEST}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("check")
    c.add_argument("--datasets", nargs="*")
    c.add_argument("--verify-md5", action="store_true")
    c.set_defaults(fn=check)
    m = sub.add_parser("manifest")
    m.add_argument("--datasets", nargs="*")
    m.set_defaults(fn=manifest_cmd)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
