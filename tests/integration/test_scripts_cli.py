"""CLI-surface smoke: every script must at least parse --help.

Mirrors the reference's script-level smoke testing approach
(reference: scripts/run_all_models_quick_test.py drives the real entry
points via subprocess; scripts/verify_phase1.py checks the environment).
Catches bitrot in the 28-script surface without running any real work.
"""
from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPTS_DIR = Path(__file__).resolve().parents[2] / "scripts"
SCRIPTS = sorted(p.name for p in SCRIPTS_DIR.glob("*.py"))


@pytest.mark.integration
@pytest.mark.slow
@pytest.mark.parametrize("script", SCRIPTS)
def test_script_help(script):
    env = dict(os.environ, THYROID_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, str(SCRIPTS_DIR / script), "--help"],
        capture_output=True, text=True, timeout=120, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
