#!/usr/bin/env python
"""Parity harness: diff measured k-fold results against the reference's
published per-model numbers (BASELINE.md / scripts/generate_performance_charts.py
RESULTS_DATA), with the driver's ±0.5% accuracy/AUC target.

The reference repo ships no images, so runs in this environment use the
synthetic corpus — the report states its data provenance explicitly. On the
real CARS corpus the same command produces the true parity verdict.

Usage:
    python scripts/parity_report.py \
        --summary outputs/all_models_kfold/all_models_summary.json \
        --output reports/parity_report.json
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--summary", default="outputs/all_models_kfold/all_models_summary.json")
    p.add_argument("--output", default="reports/parity_report.json")
    p.add_argument("--tolerance", type=float, default=0.005,
                   help="accuracy parity band (absolute fraction)")
    p.add_argument("--data-provenance", default="synthetic",
                   choices=["synthetic", "real"])
    args = p.parse_args()

    from thyroid_tpu.analysis.charts import REFERENCE_RESULTS

    summary_path = Path(args.summary)
    if not summary_path.exists():
        raise SystemExit(f"no summary at {summary_path} — run the all-models "
                         "sweep first (scripts/run_all_models_quick_test.py "
                         "or the AllModelsFullKFoldExperiment)")
    measured = json.loads(summary_path.read_text())

    rows = []
    for name, rec in measured.items():
        if not isinstance(rec, dict) or name.startswith("_"):
            continue  # "_meta" records run provenance, not a model
        acc = rec.get("avg_accuracy") if "avg_accuracy" in rec else rec.get("avg_test_acc")
        if acc is None:
            rows.append({"model": name, "status": "no result",
                         "error": rec.get("error")})
            continue
        # quick-test summaries key by config option path ("cnn/resnet18");
        # the reference table keys by bare model name
        ref = REFERENCE_RESULTS.get(name) \
            or REFERENCE_RESULTS.get(name.rsplit("/", 1)[-1])
        ref_acc = ref[0] / 100.0 if ref else None
        row = {
            "model": name,
            "measured_acc": round(float(acc), 4),
            "measured_auc": rec.get("avg_test_auc"),
            "reference_acc": ref_acc,
        }
        if ref_acc is not None:
            diff = float(acc) - ref_acc
            row["acc_diff"] = round(diff, 4)
            row["within_tolerance"] = abs(diff) <= args.tolerance
        rows.append(row)

    comparable = [r for r in rows if r.get("reference_acc") is not None
                  and "measured_acc" in r]
    passing = [r for r in comparable if r.get("within_tolerance")]
    report = {
        "data_provenance": args.data_provenance,
        "note": ("synthetic corpus — reference parity is only meaningful on "
                 "the real CARS dataset; this report validates the harness "
                 "and records synthetic-run metrics"
                 if args.data_provenance == "synthetic" else
                 "real CARS corpus"),
        "tolerance": args.tolerance,
        "models_compared": len(comparable),
        "models_within_tolerance": len(passing),
        "rows": rows,
    }
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items() if k != "rows"}, indent=2))
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
