"""merge_sweep_winners.py folds winning sweep rows into the zoo summary."""
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def test_merge_sweep_winners(tmp_path):
    main = tmp_path / "all_models_summary.json"
    sweep = tmp_path / "sweep.json"
    main.write_text(json.dumps({
        "_meta": {"folds": 5},
        "vit_small": {"avg_accuracy": 0.74, "std_accuracy": 0.04,
                      "hparams": {"lr": 1e-4}},
        "swin_tiny": {"avg_accuracy": 0.738, "std_accuracy": 0.05,
                      "hparams": {"lr": 1e-4}},
    }))
    sweep.write_text(json.dumps({
        "_meta": {"folds": 5},
        "vit_small": {"avg_accuracy": 0.76, "std_accuracy": 0.03,
                      "hparams": {"lr": 3e-4}},
        "swin_tiny": {"avg_accuracy": 0.70, "std_accuracy": 0.06,
                      "hparams": {"lr": 3e-4}},
    }))
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts/merge_sweep_winners.py"),
         "--sweep", str(sweep), "--main", str(main)],
        capture_output=True, text=True, check=True)
    assert "MERGE vit_small" in out.stdout
    assert "KEEP  swin_tiny" in out.stdout

    merged = json.loads(main.read_text())
    # winner replaced, loser preserved with the sweep point recorded
    assert merged["vit_small"]["avg_accuracy"] == 0.76
    assert merged["vit_small"]["hparams"]["lr"] == 3e-4
    assert merged["vit_small"]["swept"]["previous"]["avg_accuracy"] == 0.74
    assert merged["swin_tiny"]["avg_accuracy"] == 0.738
    assert merged["swin_tiny"]["swept"]["alternative"]["hparams"]["lr"] == 3e-4
