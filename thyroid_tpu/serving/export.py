"""AOT serving export: frozen StableHLO artifacts per batch bucket.

The reference has no deployment-export story — models ship as Lightning
checkpoints that require the full source tree (and its exact class
definitions) to un-pickle. Here a serving engine exports to a
self-describing bundle:

    out_dir/
      manifest.json        model/preprocess metadata + artifact listing
      params.npz           flax variables, flattened "a/b/c" → array
      bucket_<B>.stablehlo jax.export artifact for batch bucket B

Each bucket artifact is the FULL serving program (on-device preprocess →
normalisation → forward → softmax) lowered to StableHLO. Loading needs
jax + this module only: no model registry, no flax module code, no config
tree — `load_exported(out_dir).predict(frames)` reproduces the live
engine's outputs (same traced program, so numerically identical). This is
the TPU-native analogue of the torch world's TorchScript/ONNX export.

Params ride as runtime inputs (params.npz), not baked constants, so the N
bucket artifacts stay small and share one weight file. Mesh-sharded
engines are not exportable (jax.export fixes the device topology); export
the single-device engine and shard at load time if needed.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MANIFEST = "manifest.json"
_PARAMS = "params.npz"


# -- variables <-> flat npz -------------------------------------------------

def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
        return out
    out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def export_engine(engine: Any, out_dir: str,
                  buckets: Sequence[int] | None = None,
                  platforms: Sequence[str] = ("cpu", "tpu")) -> Dict[str, Any]:
    """Export an `InferenceEngine`'s bucket programs to `out_dir`.

    Returns the manifest dict. The engine must be single-device
    (mesh=None) — exported artifacts pin the lowering-time topology.
    `platforms` lowers each artifact for every listed backend (default
    cpu+tpu) so a bundle built on a CPU host deploys to TPU serving
    unchanged; artifacts refuse to run elsewhere at call time.
    """
    from jax import export as jax_export

    if getattr(engine, "mesh", None) is not None:
        raise ValueError("mesh-sharded engines are not exportable; "
                         "export a single-device engine")
    buckets = tuple(sorted(set(int(b) for b in (buckets or engine.buckets))))
    os.makedirs(out_dir, exist_ok=True)

    var_shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype),
        engine.variables)
    side = 512 if engine.raw_inputs else engine.img_size
    artifacts: List[Dict[str, Any]] = []
    for b in buckets:
        x_shape = jax.ShapeDtypeStruct(
            (b, side, side, 1), jnp.float32)
        # NOTE: the traced program is platform-shaped — ops-level code picks
        # Pallas kernels when tracing ON TPU (ops/tpu_platform.is_tpu), and
        # Mosaic custom-calls may not cross-lower to other backends. If the
        # multi-platform lowering fails, fall back to the current platform.
        try:
            exp = jax_export.export(engine._fn(b),
                                    platforms=list(platforms))(
                var_shapes, x_shape)
        except Exception:
            if len(platforms) == 1:
                raise
            platforms = (jax.default_backend(),)
            exp = jax_export.export(engine._fn(b),
                                    platforms=list(platforms))(
                var_shapes, x_shape)
        name = f"bucket_{b}.stablehlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        artifacts.append({"bucket": b, "file": name,
                          "input_shape": list(x_shape.shape)})

    np.savez(os.path.join(out_dir, _PARAMS), **_flatten(engine.variables))

    mcfg = engine.model_config
    manifest = {
        "format": "thyroid_tpu.serving.export/v1",
        "jax_version": jax.__version__,
        "model_config": dict(mcfg.to_dict() if hasattr(mcfg, "to_dict")
                             else mcfg),
        "buckets": list(buckets),
        "img_size": engine.img_size,
        "in_channels": engine.in_channels,
        "raw_inputs": engine.raw_inputs,
        "quality": engine.quality,
        "mean": list(engine.mean),
        "std": list(engine.std),
        "platforms": list(platforms),
        "artifacts": artifacts,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    return manifest


class ExportedEngine:
    """Serving over deserialized StableHLO artifacts — no model code.

    Mirrors `InferenceEngine.predict`'s bucket/pad/slice behaviour; the
    per-bucket programs are the exact traced programs of the engine that
    exported them.
    """

    def __init__(self, out_dir: str):
        from jax import export as jax_export

        with open(os.path.join(out_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format") != "thyroid_tpu.serving.export/v1":
            raise ValueError(f"not an export bundle: {out_dir}")
        flat = np.load(os.path.join(out_dir, _PARAMS))
        self.variables = _unflatten({k: flat[k] for k in flat.files})
        self.buckets = tuple(self.manifest["buckets"])
        self._fns = {}
        for art in self.manifest["artifacts"]:
            with open(os.path.join(out_dir, art["file"]), "rb") as f:
                exp = jax_export.deserialize(f.read())
            self._fns[int(art["bucket"])] = jax.jit(exp.call)

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def warmup(self) -> None:
        """Compile every deserialized bucket program up front."""
        for art in self.manifest["artifacts"]:
            shape = tuple(art["input_shape"])
            jax.block_until_ready(
                self._fns[int(art["bucket"])](self.variables,
                                              jnp.zeros(shape, jnp.float32)))

    def predict(self, images: np.ndarray) -> np.ndarray:
        images = np.asarray(images, np.float32)
        if images.ndim == 3:
            images = images[..., None]
        n = images.shape[0]
        top = self.buckets[-1]
        outs: List[np.ndarray] = []
        start = 0
        while start < n:
            chunk = images[start:start + top]
            m = chunk.shape[0]
            b = self.bucket_for(m)
            if m < b:
                chunk = np.concatenate(
                    [chunk, np.zeros((b - m, *chunk.shape[1:]), np.float32)])
            probs = np.asarray(self._fns[b](self.variables,
                                            jnp.asarray(chunk)))
            outs.append(probs[:m])
            start += m
        return np.concatenate(outs, axis=0)


def load_exported(out_dir: str) -> ExportedEngine:
    return ExportedEngine(out_dir)
