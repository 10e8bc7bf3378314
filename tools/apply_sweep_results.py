"""Pretty-print /tmp/sweep_results.jsonl as markdown rows for
BASELINE.md / docs/PERF.md. Read-only — paste the rows where they belong.

Usage: python tools/apply_sweep_results.py [results.jsonl]
"""

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_results.jsonl"
    try:
        lines = open(path).read().splitlines()
    except FileNotFoundError:
        print(f"no results at {path}")
        return
    rows = []
    for ln in lines:
        if not ln.strip():
            continue
        rec = json.loads(ln)
        tag, res = rec.get("tag"), rec.get("result")
        if isinstance(res, dict):
            val = res.get("value")
            unit = res.get("unit", "")
            extra = {k: v for k, v in res.items()
                     if k not in ("metric", "value", "unit")}
            rows.append(f"| {tag} | {val} {unit} | {extra} |")
        else:
            rows.append(f"| {tag} | {res} | |")
    if not rows:
        print("results file is empty")
        return
    print("| stage | result | detail |")
    print("|---|---|---|")
    print("\n".join(rows))


if __name__ == "__main__":
    main()
