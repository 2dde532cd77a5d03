#!/usr/bin/env python
"""Grad-CAM generation for any registered model (reference:
scripts/generate_vit_gradcam.py + generate_densenet_gradcam.py)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--split", default="test")
    p.add_argument("--demo-corpus", action="store_true",
                   help="rebuild the zoo demo corpus from checkpoint "
                        "metadata; sample the checkpoint's fold test split")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--n-samples", type=int, default=4)
    p.add_argument("--output-dir", default="outputs/gradcam")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from thyroid_tpu.analysis.gradcam import gradcam, gradcam_overlay
    from thyroid_tpu.config import compose
    from thyroid_tpu.data.pipeline import create_data_loaders
    from thyroid_tpu.models import ModelRegistry
    from thyroid_tpu.training.checkpoint import load_checkpoint

    variables, meta = load_checkpoint(args.checkpoint)
    if args.demo_corpus:
        from run_ensemble_kfold_evaluation import _demo_fold_pipelines

        pipes = _demo_fold_pipelines(meta, int(meta.get("folds", 5)),
                                     args.batch, args.img_size)
        pipe = pipes[int(meta.get("fold", 1))]
    else:
        cfg = compose(overrides=[f"dataset={args.dataset}"])
        pipe = create_data_loaders(cfg.dataset.to_dict(),
                                   splits=(args.split,))[args.split]
    mcfg = dict(meta.get("model_config") or {"name": args.model})
    # Grad-CAM differentiates a train=False forward; the serving-only fused
    # kernels (token-2D LN+QKV, swin block-attention epilogue) have no
    # custom_vjp — force the differentiable (and numerically exact) XLA path
    mcfg["token_kernels"] = False
    mcfg["use_pallas_attention"] = False
    model = ModelRegistry.create_model(mcfg)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    batch = next(iter(pipe.epoch(jax.random.PRNGKey(0))))
    for i in range(min(args.n_samples, batch.image.shape[0])):
        img = batch.image[i:i + 1]
        heat, cls, conf = gradcam(model, variables, img)
        label = int(batch.label[i])
        gradcam_overlay(
            heat, np.asarray(img[0]),
            out / f"gradcam_{args.model}_{i}.png",
            title=f"true={label} pred={cls} conf={conf:.2f}")
        print(f"sample {i}: true={label} pred={cls} conf={conf:.3f}")
    print("wrote figures to", out)


if __name__ == "__main__":
    main()
