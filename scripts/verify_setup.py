#!/usr/bin/env python
"""Environment/setup verification checklist (reference:
scripts/verify_phase1.py:23-199 — git, data, deps, components)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def check(name, fn):
    try:
        detail = fn()
        print(f"  ✓ {name}" + (f" — {detail}" if detail else ""))
        return True
    except Exception as e:
        print(f"  ✗ {name}: {e}")
        return False


def main():
    import argparse

    p = argparse.ArgumentParser(
        description="Verify environment + framework setup (deps, config "
                    "composition, model registry, devices, git)")
    p.parse_args()

    results = []
    print("dependencies:")
    for mod in ["jax", "flax", "optax", "orbax.checkpoint", "numpy", "yaml",
                "cv2", "PIL", "sklearn", "matplotlib", "pydantic"]:
        results.append(check(mod, lambda m=mod: __import__(m) and ""))
    print("framework components:")
    results.append(check("config compose", lambda: (
        __import__("thyroid_tpu.config", fromlist=["compose"]).compose()
        .model.name)))
    results.append(check("model registry (25+ models)", lambda: _registry()))
    results.append(check("devices", lambda: _devices()))
    results.append(check("git repo", lambda: _git()))
    n_ok = sum(results)
    print(f"\n{n_ok}/{len(results)} checks passed")
    raise SystemExit(0 if n_ok == len(results) else 1)


def _registry():
    from thyroid_tpu.models import ModelRegistry
    listed = ModelRegistry.list_models()
    n = sum(len(v) for v in listed.values())
    assert n >= 25, f"only {n} models registered"
    return f"{n} models"


def _devices():
    import jax
    return f"{jax.device_count()}x {jax.devices()[0].device_kind}"


def _git():
    import subprocess
    out = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd=Path(__file__).resolve().parents[1])
    assert out.returncode == 0
    return out.stdout.strip()


if __name__ == "__main__":
    main()
