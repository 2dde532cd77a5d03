#!/usr/bin/env python
"""Write reports/quality_report.json (reference:
scripts/data_quality_report.py:81-134 — per-split stats + issue index lists)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default="data/raw")
    p.add_argument("--split-dir", default="data/splits")
    p.add_argument("--output", default="reports/quality_report.json")
    args = p.parse_args()

    from thyroid_tpu.data.quality_report import generate_quality_report

    cfg = {"data_path": args.data_path, "split_dir": args.split_dir,
           "val_split_ratio": 0.15, "test_split_ratio": 0.15,
           "random_seed": 42}
    report = generate_quality_report(cfg, args.output)
    print("summary:", report["summary"])


if __name__ == "__main__":
    main()
