"""CNN ensemble tests (reference: src/models/ensemble/cnn_ensemble.py —
accuracy-weighted averaging, voting, temperature, uncertainty)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thyroid_tpu.models import ModelRegistry
from thyroid_tpu.models.base import create_and_init
from thyroid_tpu.models.ensemble import (
    CNNEnsemble, build_ensemble_from_members, DEFAULT_MODEL_ACCURACIES,
)


def _members(tmp_names=("resnet18", "resnet18")):
    cfgs = [{"name": n, "img_size": 32, "in_channels": 1, "num_classes": 2}
            for n in tmp_names]
    variables = [create_and_init(c, jax.random.PRNGKey(i))[1]
                 for i, c in enumerate(cfgs)]
    return cfgs, variables


@pytest.mark.unit
class TestCNNEnsemble:
    def test_weighted_average_probs(self):
        cfgs, variables = _members()
        ens = build_ensemble_from_members(
            cfgs, variables, model_accuracies={"resnet18": 1.0})
        x = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 1).astype(np.float32))
        probs = np.asarray(ens(x))
        assert probs.shape == (4, 2)
        assert np.allclose(probs.sum(-1), 1.0, atol=1e-5)

    def test_weights_normalised_by_accuracy(self):
        ens = CNNEnsemble(member_names=["resnet50", "efficientnet_b0",
                                        "densenet121"])
        w = np.asarray(ens.weights())
        accs = np.array([DEFAULT_MODEL_ACCURACIES[n] for n in ens.member_names])
        assert np.allclose(w, accs / accs.sum(), atol=1e-6)

    def test_simple_average_equal_weights(self):
        ens = CNNEnsemble(member_names=["a", "b"], method="simple_average")
        assert np.allclose(np.asarray(ens.weights()), [0.5, 0.5])

    def test_voting(self):
        cfgs, variables = _members()
        ens = build_ensemble_from_members(cfgs, variables,
                                          method="weighted_voting")
        x = jnp.zeros((2, 32, 32, 1))
        probs = np.asarray(ens(x))
        assert np.allclose(probs.sum(-1), 1.0, atol=1e-5)

    def test_uncertainty_is_member_std(self):
        cfgs, variables = _members()
        ens = build_ensemble_from_members(cfgs, variables)
        x = jnp.asarray(np.random.RandomState(1).rand(3, 32, 32, 1).astype(np.float32))
        mean, unc = ens.predict_with_uncertainty(x)
        member = np.asarray(ens.member_probs(x))
        # torch-parity: unbiased (ddof=1) std, like tensor.std(dim=0)
        assert np.allclose(np.asarray(unc), member.std(axis=0, ddof=1),
                           atol=1e-6)

    def test_registry_shell_and_restore(self, tmp_path):
        from thyroid_tpu.training import build_optimizer, create_train_state, save_checkpoint
        from thyroid_tpu.training.checkpoint import restore_ensemble

        shell = ModelRegistry.create_model(
            {"name": "cnn_ensemble", "members": ["resnet18", "resnet18"],
             "num_classes": 2, "in_channels": 1})
        assert len(shell.modules) == 2 and shell.variables == []
        # save two member checkpoints and restore
        ckpts = []
        for i in range(2):
            model, variables = create_and_init(
                {"name": "resnet18", "img_size": 32, "in_channels": 1,
                 "num_classes": 2}, jax.random.PRNGKey(i))
            tx = build_optimizer(variables["params"], lambda _: 1e-3)
            state = create_train_state(model, variables, tx)
            ckpts.append(save_checkpoint(tmp_path / f"m{i}.ckpt", state))
        restore_ensemble(shell, ckpts)
        x = jnp.zeros((1, 32, 32, 1))
        probs = np.asarray(shell(x))
        assert probs.shape == (1, 2) and np.isfinite(probs).all()
