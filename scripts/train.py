#!/usr/bin/env python
"""Standalone single-model training CLI.

Parity with the reference's train_cnn.py entry (reference:
src/training/train_cnn.py:41-211: seed → transforms → loaders → module →
callbacks → fit → test), generalised to every registered model. Uses the
same override syntax as the experiment manager:

    python scripts/train.py model=cnn/resnet50 dataset=synthetic \
        trainer.max_epochs=5 training.batch_size=16
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    if any(a in ("-h", "--help") for a in sys.argv[1:]):
        print(__doc__)
        print("Overrides: group=option (model=vit/swin_tiny), dotted "
              "(trainer.max_epochs=5), +key=value to add, ~key to delete.")
        return
    import jax

    from thyroid_tpu.config import compose
    from thyroid_tpu.data.pipeline import create_data_loaders
    from thyroid_tpu.models import ModelRegistry, cfg_get
    from thyroid_tpu.training.engine import Trainer
    from thyroid_tpu.utils.logging import get_logger, print_table

    logger = get_logger("train")
    cfg = compose(overrides=sys.argv[1:])
    model_cfg = cfg.model
    dataset_cfg = cfg.dataset.to_dict()
    dataset_cfg["img_size"] = cfg_get(model_cfg, "img_size", None) or \
        dataset_cfg.get("img_size", 224)
    arch = cfg_get(model_cfg, "architecture", "cnn")
    print_table("run", {"model": model_cfg.name, "dataset": dataset_cfg["name"],
                        "epochs": cfg.trainer.max_epochs,
                        "devices": jax.device_count()})
    loaders = create_data_loaders(
        dataset_cfg, augment_mode="vit" if arch == "vit" else "standard")
    trainer = Trainer(
        ModelRegistry.create_model(model_cfg), model_cfg, cfg.training,
        cfg.trainer, steps_per_epoch=loaders["train"].steps_per_epoch(),
        output_dir=Path(cfg.output_dir) / str(model_cfg.name))
    fit = trainer.fit(loaders["train"], loaders["val"])
    test = trainer.test(loaders["test"], checkpoint=fit.best_checkpoint)
    logger.info("test metrics: %s", test)
    print_table("test", {k: round(v, 4) for k, v in test.items()})


if __name__ == "__main__":
    main()
