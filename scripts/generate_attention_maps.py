#!/usr/bin/env python
"""Comprehensive attention analysis: per-layer CLS attention, rollout,
gradient patch importance, Swin stage maps (reference:
scripts/generate_attention_maps.py)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--demo-corpus", action="store_true",
                   help="rebuild the zoo demo corpus from checkpoint "
                        "metadata; sample the checkpoint's fold test split")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--output-dir", default="outputs/attention")
    args = p.parse_args()

    import jax
    import numpy as np

    from thyroid_tpu.analysis.attention import (
        attention_figure, attention_rollout, cls_attention_heatmap,
        collect_attention_maps, gradient_patch_importance,
        swin_stage_feature_maps)
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
                                   splits=("test",))["test"]
    mcfg = dict(meta.get("model_config") or {"name": args.model})
    # gradient_patch_importance differentiates a train=False forward; the
    # serving-only fused kernels (token-2D LN+QKV, swin block-attention
    # epilogue) have no custom_vjp — force the differentiable XLA path
    mcfg["token_kernels"] = False
    mcfg["use_pallas_attention"] = False
    model = ModelRegistry.create_model(mcfg)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    batch = next(iter(pipe.epoch(jax.random.PRNGKey(0))))
    img = batch.image[:1]
    heatmaps = {}
    if "swin" in args.model:
        for i, m in enumerate(swin_stage_feature_maps(model, variables, img)):
            heatmaps[f"stage {i} activity"] = m
    else:
        maps = collect_attention_maps(model, variables, img)
        if maps:
            heatmaps["last-layer CLS attention"] = cls_attention_heatmap(maps[-1])
            heatmaps["attention rollout"] = attention_rollout(maps)
    heatmaps["gradient patch importance"] = gradient_patch_importance(
        model, variables, img)
    attention_figure(np.asarray(img[0]), heatmaps,
                     out / f"attention_{args.model}.png")
    print("wrote", out / f"attention_{args.model}.png")


if __name__ == "__main__":
    main()
