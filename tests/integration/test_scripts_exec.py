"""Executed-script integration tier (VERDICT r2 item #5).

The reference's integration tier runs every model through the real manager
subprocess (reference: scripts/run_all_models_quick_test.py:46-58); the
`--help` smoke in test_scripts_cli.py catches bitrot but executes no real
logic. This suite runs the key CLIs END TO END on a 16-image synthetic
corpus (configs/dataset/synthetic_tiny.yaml) and asserts on their OUTPUT
ARTIFACTS, not their exit banners:

    train.py                     → checkpoint + test metrics
    run_all_models_quick_test.py → quick_test JSON (2 models × 2 folds)
    run_distillation.py          → distillation summary JSON
    generate_gradcam.py          → heatmap PNGs (from train.py's ckpt)
    generate_confusion_roc.py    → metrics JSON + figure
    export_serving.py + serve.py → StableHLO bundle served over HTTP
    parity_report.py             → parity JSON from the quick-test summary
    data_quality_report.py       → reference-shaped quality report JSON

Everything runs on CPU (THYROID_PLATFORM=cpu) in a shared tmp workdir;
the corpus/splits land under the subprocess CWD.

Markers (VERDICT r3 item #7): the train.py → quick-test → parity_report
slice (~2-3 min) runs in the DEFAULT gate (`-m "not slow"`) so the
documented suite executes at least one real CLI path end to end; the
heavier artifact scripts (distillation, gradcam, confusion/ROC, quality
report, export+serve) stay `slow`.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]
SCRIPTS = REPO / "scripts"

pytestmark = [pytest.mark.integration]


def _env():
    env = dict(os.environ, THYROID_PLATFORM="cpu")
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # single-device is enough and faster here
    return env


def _run(args, cwd, timeout=600):
    proc = subprocess.run([sys.executable, *args], cwd=cwd, env=_env(),
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"{args[0]} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}")
    return proc


@pytest.fixture(scope="module")
def work(tmp_path_factory):
    return tmp_path_factory.mktemp("scripts_exec")


@pytest.fixture(scope="module")
def trained(work):
    """One real train.py run shared by the analysis-script tests."""
    _run([str(SCRIPTS / "train.py"), "model=cnn/resnet18",
          "dataset=synthetic_tiny", "trainer.max_epochs=2",
          "training.batch_size=4", f"output_dir={work}/outputs"], cwd=work)
    # orbax ckpt dirs are named <model>-epochNNN-<metric>.ckpt (+ a -best
    # copy) inside outputs/<model>/checkpoints/
    ckpts = [p for p in (work / "outputs" / "resnet18").rglob("*.ckpt")
             if p.is_dir()]
    assert ckpts, f"train.py left no checkpoint under {work}/outputs/resnet18"
    best = [p for p in ckpts if "best" in p.name]
    return (best or sorted(ckpts))[-1]


def test_train_writes_checkpoint(trained):
    assert trained.exists()


def test_quick_test_matrix(work):
    out = work / "quick_test_results.json"
    _run([str(SCRIPTS / "run_all_models_quick_test.py"),
          "--models", "cnn/resnet18", "vit/vit_tiny",
          "--dataset", "synthetic_tiny", "--folds", "2", "--epochs", "1",
          "--img-size", "64", "--output", str(out)], cwd=work, timeout=900)
    results = json.loads(out.read_text())
    # keys are the model option paths as passed (cnn/resnet18, vit/vit_tiny)
    for want in ("resnet18", "vit_tiny"):
        key = next((k for k in results if k.endswith(want)), None)
        assert key is not None, list(results)
        rec = results[key]
        assert "error" not in rec, rec
        acc = rec.get("avg_accuracy", rec.get("avg_test_acc"))
        assert acc is not None and 0.0 <= float(acc) <= 1.0, rec


def test_parity_report_from_quick_test(work):
    summary = work / "quick_test_results.json"
    if not summary.exists():
        pytest.skip("quick-test summary missing (ordering)")
    out = work / "parity_report.json"
    _run([str(SCRIPTS / "parity_report.py"), "--summary", str(summary),
          "--output", str(out), "--data-provenance", "synthetic"], cwd=work)
    rep = json.loads(out.read_text())
    models = {r["model"] for r in rep["rows"]}
    assert any(str(m).endswith("resnet18") for m in models), rep
    # path-form summary keys must still land reference comparisons
    assert rep["models_compared"] >= 1, rep


@pytest.mark.slow
def test_distillation(work):
    out = work / "distill"
    _run([str(SCRIPTS / "run_distillation.py"), "--teacher", "resnet18",
          "--student", "deit_tiny", "--folds", "1", "--epochs", "1",
          "--dataset", "synthetic_tiny", "--img-size", "64", "--baseline",
          "--output-dir", str(out)], cwd=work, timeout=900)
    summary = out / "distillation_results.json"
    assert summary.exists(), f"no distillation summary under {out}"
    blob = json.loads(summary.read_text())
    assert blob["teacher"] == "resnet18" and blob["student"] == "deit_tiny"
    assert blob["folds"] and "teacher_checkpoint" in blob["folds"][0]
    assert blob["mean_test_acc"] is None or 0.0 <= blob["mean_test_acc"] <= 1.0
    assert blob["baseline_folds"] and "distillation_gain" in blob


@pytest.mark.slow
def test_gradcam(work, trained):
    out = work / "gradcam"
    _run([str(SCRIPTS / "generate_gradcam.py"), "--model", "resnet18",
          "--checkpoint", str(trained), "--dataset", "synthetic_tiny",
          "--split", "test", "--n-samples", "2", "--output-dir", str(out)],
         cwd=work)
    pngs = list(out.glob("*.png"))
    assert pngs, f"gradcam produced no figures in {out}"


@pytest.mark.slow
def test_confusion_roc(work, trained):
    out = work / "roc"
    _run([str(SCRIPTS / "generate_confusion_roc.py"),
          "--models", f"resnet18={trained}", "--dataset", "synthetic_tiny",
          "--output-dir", str(out)], cwd=work)
    arts = list(out.rglob("*"))
    assert any(p.suffix == ".json" for p in arts), arts
    assert any(p.suffix == ".png" for p in arts), arts
    blob = json.loads(next(p for p in arts if p.suffix == ".json").read_text())
    assert "resnet18" in json.dumps(blob)


@pytest.mark.slow
def test_data_quality_report(work):
    corpus = work / "data" / "synthetic_tiny"
    if not corpus.exists():
        from thyroid_tpu.data.synthetic import generate_corpus
        generate_corpus(corpus, n_images=16)
    out = work / "quality_report.json"
    _run([str(SCRIPTS / "data_quality_report.py"), "--data-path", str(corpus),
          "--output", str(out)], cwd=work)
    rep = json.loads(out.read_text())
    assert "dataset_stats" in rep
    # reference shape: dataset_stats.{split}.metrics.quality_issues.{...}
    # (reference: scripts/data_quality_report.py:93-129)
    split = next(iter(rep["dataset_stats"].values()))
    issues = split["metrics"]["quality_issues"]
    assert set(issues) >= {"extreme_dark", "low_contrast",
                           "potential_artifacts"}


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_export_and_serve_bundle(work):
    bundle = work / "bundle"
    _run([str(SCRIPTS / "export_serving.py"), "--model", "resnet18",
          "--img-size", "64", "--out", str(bundle), "--buckets", "1", "4",
          "--preprocessed"], cwd=work)
    assert (bundle / "manifest.json").exists() or list(bundle.iterdir())

    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, str(SCRIPTS / "serve.py"), "--bundle", str(bundle),
         "--port", str(port), "--no-warmup"],
        cwd=work, env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        deadline = time.time() + 120
        up = False
        while time.time() < deadline:
            if proc.poll() is not None:
                out, err = proc.communicate()
                raise AssertionError(
                    f"serve.py exited early: {err.decode()[-2000:]}")
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=2) as r:
                    json.loads(r.read())
                    up = True
                    break
            except OSError:
                time.sleep(1.0)
        assert up, "server never became healthy"
        imgs = np.random.RandomState(0).rand(4, 64, 64).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"images": imgs.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            payload = json.loads(r.read())
        probs = np.asarray(payload["probs"])
        assert probs.shape == (4, 2)
        assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-3)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
