#!/usr/bin/env python
"""K-fold weighted-probability ensemble evaluation (reference:
scripts/run_ensemble_kfold_evaluation.py — default weights 0.50/0.25/0.25
:164, sklearn-style sens/spec/ppv/npv :108-124).

Two checkpoint/data sources:
- default: the sequential-training layout
  {root}/{model}/fold_{f}/checkpoints/{model}-best.ckpt + split files from
  the dataset config (real-corpus path);
- --demo-corpus: checkpoints exported by
  `scripts/run_zoo_kfold_demo.py --export-checkpoints`; the synthetic_hard
  corpus and the rotating folds are REBUILT from the checkpoint metadata
  (difficulty/label_noise/n_images/folds/fold_seed recorded at export), so
  eval runs on exactly the per-fold test splits the members never saw.
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _demo_fold_pipelines(meta: dict, folds: int, batch: int, img_size: int):
    """Rebuild the zoo demo's corpus + rotating test splits from exported
    checkpoint metadata. fold_scheme in the metadata picks the rotation:
    'stratified' (round-5+ exports, reference prepare_kfold_data semantics)
    vs the legacy permute-and-chunk of earlier exports."""
    from thyroid_tpu.data import DevicePipeline, generate_corpus_arrays
    from thyroid_tpu.data.corpus import rotating_fold_indices

    imgs, labels = generate_corpus_arrays(
        n_images=int(meta["n_images"]), size=int(meta.get("size", 512)),
        difficulty=float(meta["difficulty"]),
        label_noise=float(meta["label_noise"]))
    splits = rotating_fold_indices(
        labels, folds, seed=int(meta.get("fold_seed", 42)),
        stratified=meta.get("fold_scheme") == "stratified")
    pipelines = {}
    for i, (_, _, te) in enumerate(splits):
        pipelines[i + 1] = DevicePipeline(
            imgs[te], labels[te], batch_size=batch, img_size=img_size,
            quality_preprocessing=True, train=False)
    return pipelines


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--members", nargs="+",
                   default=["densenet169", "vit_small", "vit_tiny"])
    p.add_argument("--weights", nargs="+", type=float,
                   default=[0.5, 0.25, 0.25])
    p.add_argument("--checkpoint-root", default="outputs")
    p.add_argument("--folds", type=int, default=7)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--demo-corpus", action="store_true",
                   help="evaluate on the zoo demo's synthetic_hard corpus, "
                        "rebuilt from exported checkpoint metadata")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--output", default="outputs/ensemble_kfold_results.json")
    p.add_argument("--summary-row", default=None,
                   help="also merge a 'cnn_ensemble' row (weighted-average "
                        "mode) into this all_models_summary.json, so the "
                        "ensemble appears beside the trained zoo models "
                        "(reference covers every config YAML in its sweep — "
                        "src/experiment/all_models_full_kfold_experiment.py:16)")
    args = p.parse_args()

    from thyroid_tpu.analysis.evaluation import evaluate_ensemble_kfold

    root = Path(args.checkpoint_root)
    member_specs = []
    for name in args.members:
        ckpts = {}
        model_cfg = {"name": name}
        for fold in range(1, args.folds + 1):
            best = root / name / f"fold_{fold}" / "checkpoints" / f"{name}-best.ckpt"
            if not best.exists():
                raise SystemExit(f"missing checkpoint {best} — train {name} first")
            ckpts[fold] = str(best)
            meta_path = best / "metadata.json"
            if fold == 1 and meta_path.exists():
                stored = json.loads(meta_path.read_text()).get("model_config")
                if stored:
                    model_cfg = stored
        member_specs.append({"model": model_cfg, "checkpoints": ckpts})

    if args.demo_corpus:
        first_meta = json.loads(
            (Path(member_specs[0]["checkpoints"][1]) / "metadata.json")
            .read_text())
        fold_pipelines = _demo_fold_pipelines(
            first_meta, args.folds, args.batch, args.img_size)
    else:
        from thyroid_tpu.config import compose
        from thyroid_tpu.data.pipeline import create_data_loaders

        cfg = compose(overrides=[f"dataset={args.dataset}"])
        dataset_cfg = cfg.dataset.to_dict()
        fold_pipelines = {}
        for fold in range(1, args.folds + 1):
            dcfg = dict(dataset_cfg)
            dcfg["split_file"] = str(
                Path(dcfg["split_dir"]) / f"split_fold_{fold}.json")
            fold_pipelines[fold] = create_data_loaders(
                dcfg, splits=("test",))["test"]

    summary = evaluate_ensemble_kfold(member_specs, fold_pipelines,
                                      weights=args.weights,
                                      output_path=args.output)
    slim = {k: v for k, v in summary.items() if k not in ("folds",)}
    slim["modes"] = {m: {k: v for k, v in d.items() if k != "folds"}
                     for m, d in summary["modes"].items()}
    slim["members"] = {m: {k: v for k, v in d.items() if k != "folds"}
                       for m, d in summary["members"].items()}
    print(json.dumps(slim, indent=2))

    if args.summary_row:
        import numpy as np

        path = Path(args.summary_row)
        zoo = json.loads(path.read_text()) if path.exists() else {}
        accs = [f["accuracy"] for f in summary["folds"].values()]
        # mirror _agg in thyroid_tpu/analysis/evaluation.py: a single-class
        # test fold yields NaN AUC, and json.dumps would emit an invalid
        # NaN token — filter to finite values, None when empty
        aucs = [f["auc"] for f in summary["folds"].values()
                if np.isfinite(f["auc"])]
        zoo["cnn_ensemble"] = {
            "avg_accuracy": float(np.mean(accs)),
            "std_accuracy": float(np.std(accs)),
            "avg_test_auc": float(np.mean(aucs)) if aucs else None,
            "num_successful_folds": len(accs),
            "hparams": {
                # the normalized weights actually applied (w / w.sum()),
                # not the raw CLI values
                "members": args.members, "weights": summary["weights"],
                "mode": "weighted_average",
                "provenance": "ensemble k-fold evaluation of exported fold "
                              "checkpoints (not trained) — see "
                              "ensemble_eval.json for all modes",
            },
            "per_fold": [
                {"fold": k, "test_acc": f["accuracy"], "test_auc": f["auc"]}
                for k, f in summary["folds"].items()],
        }
        path.write_text(json.dumps(zoo, indent=2, default=str))
        print(f"merged cnn_ensemble row into {path}")


if __name__ == "__main__":
    main()
