"""Aggregate artifacts/attribution_ab.json (and label_starved_ab.json if
present) into the per-arm mean +- spread table PARITY.md carries.

Usage: python tools/attribution_summary.py
"""

import json
import os
import re
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def aggregate(path):
    if not os.path.exists(path):
        return {}
    results = json.load(open(path))
    arms = defaultdict(list)
    for key, r in results.items():
        m = re.match(r"(.+)_s(\d+)(?:_(cpu|tpu))?(_lr[0-9.]+)?$", key)
        arm = (m.group(1) + (m.group(4) or "")) if m else key
        arms[arm].append(r)
    return arms


def fmt(vals):
    if not vals:
        return "-"
    if len(vals) == 1:
        return f"{vals[0]:.3f} (n=1)"
    mean = sum(vals) / len(vals)
    spread = (max(vals) - min(vals)) / 2
    return f"{mean:.3f} +- {spread:.3f} (n={len(vals)})"


def table(arms, cols=("knn_plateau", "best_val_acc", "test_acc", "test_f1")):
    header = "| arm | " + " | ".join(cols) + " | seeds |"
    lines = [header, "|" + "---|" * (len(cols) + 2)]
    for arm in sorted(arms):
        runs = arms[arm]
        cells = [fmt([r[c] for r in runs if r.get(c) is not None]) for c in cols]
        lines.append(f"| {arm} | " + " | ".join(cells) + f" | {len(runs)} |")
    return "\n".join(lines)


if __name__ == "__main__":
    arms = aggregate(os.path.join(REPO, "artifacts", "attribution_ab.json"))
    print(table(arms))
    starved = aggregate(os.path.join(REPO, "artifacts", "label_starved_ab.json"))
    if starved:
        print("\nlabel-starved finetunes:")
        print(table(starved, cols=("best_val_acc", "test_acc", "test_f1")))
