#!/usr/bin/env python
"""Data organisation / validation / summary + optional synthetic corpus +
k-fold generation (reference: scripts/prepare_data.py:35-329)."""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default="data/raw")
    p.add_argument("--split-dir", default="data/splits")
    p.add_argument("--synthetic", action="store_true",
                   help="generate the deterministic synthetic corpus")
    p.add_argument("--n-images", type=int, default=450)
    p.add_argument("--kfold", type=int, default=0)
    p.add_argument("--summary-out", default="data/dataset_summary.json")
    args = p.parse_args()

    from thyroid_tpu.data.corpus import (generate_kfold_splits, scan_corpus,
                                         generate_splits, save_split_info)
    from thyroid_tpu.data.synthetic import generate_corpus

    if args.synthetic:
        n0, n1 = generate_corpus(args.data_path, n_images=args.n_images)
        print(f"synthetic corpus: {n0} normal / {n1} cancerous")
    paths, labels, _ = scan_corpus(args.data_path)
    if len(paths) == 0:
        raise SystemExit(f"no images under {args.data_path}")
    summary = {
        "total_images": len(paths),
        "normal": int((labels == 0).sum()),
        "cancerous": int((labels == 1).sum()),
        "formats": sorted({p.suffix for p in paths}),
    }
    Path(args.summary_out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.summary_out).write_text(json.dumps(summary, indent=2))
    print("summary:", summary)
    splits = generate_splits(labels)
    save_split_info(splits, Path(args.split_dir) / "split_info.json", len(labels))
    if args.kfold:
        generate_kfold_splits(labels, args.kfold, args.split_dir)
        print(f"wrote {args.kfold} fold files to {args.split_dir}")


if __name__ == "__main__":
    main()
