#!/usr/bin/env python
"""Pytest suite runner with suite/marker/coverage selection (reference:
scripts/run_tests.py:32-103)."""
import argparse
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="all",
                   choices=["all", "unit", "integration", "quality",
                            "attention", "fast"])
    p.add_argument("--coverage", action="store_true")
    p.add_argument("--include-slow", action="store_true")
    p.add_argument("-k", default=None)
    args = p.parse_args()

    cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    markers = []
    if args.suite in ("unit", "integration", "quality", "attention"):
        markers.append(args.suite)
    if args.suite == "fast" or not args.include_slow:
        markers.append("not slow")
    if markers:
        cmd += ["-m", " and ".join(markers)]
    if args.k:
        cmd += ["-k", args.k]
    if args.coverage:
        cmd += ["--cov=thyroid_tpu", "--cov-report=term-missing"]
    raise SystemExit(subprocess.call(cmd, cwd=Path(__file__).resolve().parents[1]))


if __name__ == "__main__":
    main()
