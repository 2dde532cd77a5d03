#!/usr/bin/env python
"""Performance comparison charts (reference:
scripts/generate_performance_charts.py — reads measured results from
all_models_summary.json instead of a hard-coded table; the reference's
published numbers are overlaid for comparison)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--summary", default="outputs/all_models_kfold/all_models_summary.json")
    p.add_argument("--output-dir", default="outputs/charts")
    args = p.parse_args()

    from thyroid_tpu.analysis.charts import (
        REFERENCE_RESULTS, load_results_from_summary, performance_chart)

    results = load_results_from_summary(args.summary)
    if not results:
        raise SystemExit(f"no aggregated results in {args.summary}")
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    performance_chart(results, out / "model_comparison.png",
                      reference=REFERENCE_RESULTS)
    print("wrote", out / "model_comparison.png")


if __name__ == "__main__":
    main()
