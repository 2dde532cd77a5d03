#!/usr/bin/env python
"""Generate rotating stratified k-fold split JSONs (reference:
scripts/prepare_kfold_data.py:30-73 — test=fold i, val=fold i+1, train=rest)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default="data/raw")
    p.add_argument("--split-dir", default="data/splits")
    p.add_argument("--k", type=int, default=7)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from thyroid_tpu.data.corpus import generate_kfold_splits, scan_corpus

    _, labels, _ = scan_corpus(args.data_path)
    if len(labels) == 0:
        raise SystemExit(f"no images under {args.data_path}")
    files = generate_kfold_splits(labels, args.k, args.split_dir,
                                  random_seed=args.seed)
    for f in files:
        print("wrote", f)


if __name__ == "__main__":
    main()
