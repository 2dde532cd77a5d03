#!/usr/bin/env python
"""Merge hparam-sweep winners into the main zoo summary by avg_accuracy.

Closes the lr asymmetry flagged in VERDICT r4 (weak #4): CNNs were swept
at lr 3e-4 while transformers only ever ran the reference ViT recipe's
1e-4 (reference configs/vit_optimizer_params.json). After running the
transformer zoo at 3e-4 (scripts/run_zoo_kfold_demo.py --transformer-lr
3e-4 --out reports/demo_run/lr_sweep), this script folds any sweep row
that beats the main-summary row into reports/demo_run/all_models_summary
.json, keeping the losing row's numbers in a `swept` sub-record so the
comparison is auditable either way.

Usage:
    python scripts/merge_sweep_winners.py \
        --sweep reports/demo_run/lr_sweep/all_models_summary.json \
        --main reports/demo_run/all_models_summary.json
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sweep",
                   default="reports/demo_run/lr_sweep/all_models_summary.json")
    p.add_argument("--main",
                   default="reports/demo_run/all_models_summary.json")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()

    sweep = json.loads(Path(args.sweep).read_text())
    main_path = Path(args.main)
    summary = json.loads(main_path.read_text())

    merged, kept = [], []
    for name, row in sweep.items():
        if name.startswith("_") or "avg_accuracy" not in row:
            continue
        cur = summary.get(name)
        cur_acc = (cur or {}).get("avg_accuracy", float("-inf"))
        new_acc = row["avg_accuracy"]
        alt = {
            "avg_accuracy": (cur or {}).get("avg_accuracy"),
            "std_accuracy": (cur or {}).get("std_accuracy"),
            "hparams": (cur or {}).get("hparams"),
        }
        if new_acc > cur_acc:
            row = dict(row)
            row["swept"] = {"note": "won the lr sweep; previous row below",
                            "previous": alt}
            summary[name] = row
            merged.append((name, cur_acc, new_acc))
        else:
            # record the losing sweep point on the surviving row
            if cur is not None:
                cur["swept"] = {
                    "note": "lr-sweep point lost; row unchanged",
                    "alternative": {
                        "avg_accuracy": new_acc,
                        "std_accuracy": row.get("std_accuracy"),
                        "hparams": row.get("hparams"),
                    },
                }
            kept.append((name, cur_acc, new_acc))

    for name, old, new in merged:
        print(f"MERGE {name}: {old:.4f} -> {new:.4f}")
    for name, old, new in kept:
        print(f"KEEP  {name}: {old:.4f} (sweep point {new:.4f})")

    if not args.dry_run:
        main_path.write_text(json.dumps(summary, indent=2, default=str))
        print(f"wrote {main_path}")


if __name__ == "__main__":
    main()
