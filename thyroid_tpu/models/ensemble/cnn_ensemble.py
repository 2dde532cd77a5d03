"""CNN ensemble — weighted combination of trained member models.

Reference parity: src/models/ensemble/cnn_ensemble.py:19-325
(ThyroidCNNEnsemble): accuracy-weighted probability averaging / simple
averaging / weighted voting, temperature scaling, inter-model std as an
uncertainty estimate, and the hard-coded member accuracy table
(:38-42). Functional design: the ensemble holds member modules + their
variables and combines forward passes under jit; members are typically
restored from checkpoints via training.checkpoint utilities.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..registry import ModelRegistry, cfg_get

# Reference's measured member accuracies (cnn_ensemble.py:38-42)
DEFAULT_MODEL_ACCURACIES: Dict[str, float] = {
    "resnet50": 0.9118,
    "efficientnet_b0": 0.8971,
    "densenet121": 0.8824,
}


@dataclass
class CNNEnsemble:
    """Stateless combiner over member (module, variables) pairs."""

    member_names: Sequence[str]
    modules: List[Any] = field(default_factory=list)
    variables: List[Any] = field(default_factory=list)
    model_accuracies: Dict[str, float] = field(
        default_factory=lambda: dict(DEFAULT_MODEL_ACCURACIES))
    method: str = "weighted_average"  # weighted_average | simple_average | weighted_voting
    temperature: float = 1.0

    def weights(self) -> jnp.ndarray:
        if self.method == "simple_average":
            w = jnp.ones(len(self.member_names))
        else:
            w = jnp.asarray([self.model_accuracies.get(n, 1.0)
                             for n in self.member_names])
        return w / w.sum()

    def member_probs(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(M, B, num_classes) softmax probabilities per member."""
        probs = []
        for module, variables in zip(self.modules, self.variables):
            logits = module.apply(variables, x, train=train)
            if isinstance(logits, tuple):
                logits = logits[0]
            probs.append(jax.nn.softmax(logits / self.temperature, axis=-1))
        return jnp.stack(probs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Combined probabilities (B, num_classes)."""
        probs = self.member_probs(x)
        w = self.weights().reshape(-1, 1, 1)
        if self.method == "weighted_voting":
            votes = jax.nn.one_hot(probs.argmax(-1), probs.shape[-1])
            return (votes * w).sum(axis=0)
        return (probs * w).sum(axis=0)

    def predict_with_uncertainty(self, x: jnp.ndarray):
        """(mean_probs, uncertainty) — uncertainty is the inter-model std of
        probabilities (reference: cnn_ensemble.py:245-247). torch's .std is
        the UNBIASED estimator (ddof=1), so ours matches; callers wanting the
        reference's per-sample scalar take .mean(axis=-1)."""
        probs = self.member_probs(x)
        w = self.weights().reshape(-1, 1, 1)
        mean = (probs * w).sum(axis=0)
        return mean, probs.std(axis=0, ddof=1)

    def logits(self, x: jnp.ndarray) -> jnp.ndarray:
        """Log-prob combination usable as distillation-teacher logits."""
        return jnp.log(jnp.clip(self(x), 1e-8, 1.0))


def build_ensemble_from_members(
    member_configs: Sequence[Any],
    member_variables: Sequence[Any],
    model_accuracies: Optional[Dict[str, float]] = None,
    method: str = "weighted_average",
    temperature: float = 1.0,
) -> CNNEnsemble:
    names, modules = [], []
    for cfg in member_configs:
        name = cfg if isinstance(cfg, str) else cfg_get(cfg, "name")
        names.append(name)
        modules.append(ModelRegistry.create_model(cfg))
    return CNNEnsemble(
        member_names=names,
        modules=modules,
        variables=list(member_variables),
        model_accuracies=model_accuracies or dict(DEFAULT_MODEL_ACCURACIES),
        method=method,
        temperature=temperature,
    )


@ModelRegistry.register("cnn_ensemble", "ensemble")
def build_cnn_ensemble(cfg: Any) -> CNNEnsemble:
    """Registry builder — returns an *empty* ensemble shell (modules built,
    variables to be loaded from checkpoints via
    training.checkpoint.restore_ensemble)."""
    members = list(cfg_get(cfg, "members", list(DEFAULT_MODEL_ACCURACIES)))
    num_classes = int(cfg_get(cfg, "num_classes", 2))
    in_channels = int(cfg_get(cfg, "in_channels", 1))
    member_cfgs = [{"name": m, "num_classes": num_classes,
                    "in_channels": in_channels} for m in members]
    modules = [ModelRegistry.create_model(c) for c in member_cfgs]
    return CNNEnsemble(
        member_names=members,
        modules=modules,
        variables=[],
        model_accuracies=dict(cfg_get(cfg, "model_accuracies",
                                      DEFAULT_MODEL_ACCURACIES)),
        method=str(cfg_get(cfg, "method", "weighted_average")),
        temperature=float(cfg_get(cfg, "temperature", 1.0)),
    )
