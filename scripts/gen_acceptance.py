"""Generate ACCEPTANCE.md: per-example acceptance status vs the
reference readme tables (the reference's de-facto acceptance contract,
SURVEY.md §6).

For every reference example dir: does its readme publish an accuracy
table; do we ship a runnable trainer; is that trainer smoke-verified
(SMOKE_r*.json); is it wired into the parity harness
(scripts/accuracy_parity.py TARGETS); and what blocks the real-number
comparison (offline environment). Usage:

    python scripts/gen_acceptance.py          # writes ACCEPTANCE.md
"""

import glob
import json
import os.path as osp
import re
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
REF = "/root/reference/examples"
sys.path.insert(0, ROOT)


def _readme(d):
    for n in ("readme.md", "README.md", "Readme.md"):
        p = osp.join(REF, d, n)
        if osp.exists(p):
            return p
    return None


def _has_accuracy_table(path):
    """Heuristic: a markdown table row containing ±/(± (result tables)."""
    try:
        txt = open(path, encoding="utf-8", errors="replace").read()
    except OSError:
        return False
    for line in txt.splitlines():
        if line.lstrip().startswith("|") and ("±" in line or "(±" in line):
            return True
    return False


def _our_trainers(d):
    return sorted(osp.basename(p) for p in
                  glob.glob(osp.join(ROOT, "examples", d, "*.py"))
                  if not osp.basename(p).startswith("__"))


def _smoke_status():
    """Newest SMOKE_r*.json -> {example_dir: status}."""
    best, best_n = {}, -1
    for p in glob.glob(osp.join(ROOT, "SMOKE_r*.json")):
        m = re.search(r"SMOKE_r(\d+)\.json$", p)
        if not m or int(m.group(1)) <= best_n:
            continue
        try:
            with open(p) as f:
                doc = json.load(f)
        except Exception:
            continue
        best_n = int(m.group(1))
        best = {d: ("ok" if e.get("status", "").startswith(("OK", "SKIP"))
                    else "FAIL")
                for d, e in doc.get("examples", {}).items()}
    return best, best_n


# Reference tables whose metric protocol is outside the
# node-classification parity harness (they still smoke-run and converge
# on synthetic data; their acceptance bar is the metric their own
# trainer prints):
_PROTOCOL_MISMATCH = {
    "amp": "graph-regression MAE on Diameter/SSSP/Ecc/ZINC; "
           "amp_trainer prints the task metric",
    "defog": "generation metrics (validity/uniqueness/FCD); "
             "defog_trainer prints sampling metrics",
}


def main():
    from scripts.accuracy_parity import TARGETS
    parity_models = {m for m, _ in TARGETS}
    smoke, smoke_round = _smoke_status()
    dirs = sorted(d for d in next(iter([__import__("os").listdir(REF)]))
                  if osp.isdir(osp.join(REF, d)))

    rows = []
    counts = {"parity-wired": 0, "table-no-harness": 0, "no-table": 0,
              "missing-trainer": 0}
    for d in dirs:
        rd = _readme(d)
        table = rd is not None and _has_accuracy_table(rd)
        ours = _our_trainers(d)
        sm = smoke.get(d, "—")
        if not ours:
            status = "MISSING trainer"
            counts["missing-trainer"] += 1
        elif d in parity_models:
            status = "parity-wired (blocked-offline: real data needed)"
            counts["parity-wired"] += 1
        elif d in _PROTOCOL_MISMATCH:
            status = ("table-present; protocol-mismatch ("
                      + _PROTOCOL_MISMATCH[d] + ")")
            counts["table-no-harness"] += 1
        elif table:
            status = "table-present; harness-pending (blocked-offline)"
            counts["table-no-harness"] += 1
        else:
            status = "no reference table (smoke acceptance only)"
            counts["no-table"] += 1
        src = osp.relpath(rd, "/root/reference") if rd else "—"
        rows.append((d, "yes" if table else "no",
                     ", ".join(ours) if ours else "—", sm, status, src))

    smoke_note = (f"latest smoke sweep: SMOKE_r{smoke_round:02d}.json"
                  if smoke_round >= 0 else
                  "no SMOKE_r*.json artifact found")
    lines = [
        "# ACCEPTANCE — per-example status vs the reference contract",
        "",
        "The reference's acceptance criteria are the accuracy tables in",
        "`examples/*/readme.md` (90 dirs; BASELINE.md: within 0.3%).",
        "This environment has NO network egress, so real-dataset numbers",
        "cannot be produced here; the classes below separate what is",
        "proven (offline smoke + synthetic convergence + kernel/unit",
        "parity) from what awaits real data",
        "(`scripts/stage_data.py` + `scripts/accuracy_parity.py` produce",
        "the real table in two commands on any networked host).",
        "",
        "Status classes:",
        "- **parity-wired** — trainer uses reference hyperparameters and",
        "  is registered in `scripts/accuracy_parity.py` TARGETS with the",
        "  readme number cited; runs today on synthetic fallback, flips",
        "  to the real comparison when data is staged.",
        "- **table-present; harness-pending** — readme publishes a table;",
        "  our trainer exists and smoke-runs, but is not yet in TARGETS.",
        "- **no reference table** — the readme publishes no accuracy",
        "  numbers (the reference's own acceptance there is 'it runs');",
        "  our smoke sweep is the matching bar.",
        "",
        f"Generated by `scripts/gen_acceptance.py`; {smoke_note}.",
        "",
        "| example | ref table | our trainer(s) | smoke | status |"
        " ref source |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(c) for c in r) + " |")
    lines += [
        "",
        f"**Totals**: {len(rows)} reference example dirs — "
        f"{counts['parity-wired']} parity-wired, "
        f"{counts['table-no-harness']} table-present/harness-pending, "
        f"{counts['no-table']} smoke-only, "
        f"{counts['missing-trainer']} missing trainers.",
    ]
    out = osp.join(ROOT, "ACCEPTANCE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(rows)} rows, {counts}")


if __name__ == "__main__":
    main()
