"""Optimizer-trajectory parity against torch.optim — the reference's
training dynamics (AdamW + CosineAnnealingLR + global-norm grad clip,
src/training/lightning_modules.py:259-293; trainer gradient_clip_val=1.0,
configs/trainer/default.yaml) reproduced step-for-step by our
training/schedules.build_schedule + build_optimizer.

Alignment notes (what maps to what):
- torch CosineAnnealingLR steps per EPOCH (interval='epoch'); our cosine is
  per-step. With steps_per_epoch=1 the two formulas coincide exactly
  (cos(pi*t/T) at integer t), which is what this oracle pins. Intra-epoch
  our lr is smoother — a documented deviation, not drift.
- torch AdamW decays EVERY param (reference passes self.parameters());
  build_optimizer masks decay off ndim<=1 leaves (LN/bias — standard
  practice, SURVEY §7 build plan). The oracle therefore uses a 2D weight,
  and a companion test asserts the 1D deviation is the mask, not a bug.
- clip: torch.nn.utils.clip_grad_norm_ and optax.clip_by_global_norm are
  both global-L2; one step uses an over-threshold gradient to pin it.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from thyroid_tpu.training.schedules import build_optimizer, build_schedule

LR, WD, ETA_MIN, EPOCHS = 1e-3, 0.05, 1e-5, 6


def _grads(step: int, shape) -> np.ndarray:
    rs = np.random.RandomState(100 + step)
    g = rs.randn(*shape).astype(np.float32)
    if step == 3:  # force the clip path: global norm >> 1
        g = g * 50.0
    return g


@pytest.mark.unit
def test_adamw_cosine_clip_trajectory_matches_torch():
    shape = (16, 8)
    w0 = np.random.RandomState(0).randn(*shape).astype(np.float32) * 0.1

    # --- torch side (reference semantics) ---
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([wt], lr=LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=EPOCHS, eta_min=ETA_MIN)
    torch_traj = []
    for step in range(EPOCHS):
        opt.zero_grad()
        wt.grad = torch.from_numpy(_grads(step, shape))
        torch.nn.utils.clip_grad_norm_([wt], 1.0)
        opt.step()
        sched.step()
        torch_traj.append(wt.detach().numpy().copy())

    # --- our side ---
    params = {"w": jnp.asarray(w0)}
    schedule = build_schedule(LR, steps_per_epoch=1, epochs=EPOCHS,
                              eta_min=ETA_MIN, kind="cosine")
    tx = build_optimizer(params, schedule, weight_decay=WD,
                         gradient_clip_val=1.0)
    state = tx.init(params)
    for step in range(EPOCHS):
        grads = {"w": jnp.asarray(_grads(step, shape))}
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        np.testing.assert_allclose(
            np.asarray(params["w"]), torch_traj[step], atol=1e-6, rtol=1e-5,
            err_msg=f"step {step}")


@pytest.mark.unit
def test_schedule_matches_cosine_annealing_lr_formula():
    sched = build_schedule(LR, steps_per_epoch=1, epochs=EPOCHS,
                           eta_min=ETA_MIN, kind="cosine")
    for t in range(EPOCHS + 1):
        want = ETA_MIN + (LR - ETA_MIN) * 0.5 * (
            1 + np.cos(np.pi * min(t, EPOCHS) / EPOCHS))
        np.testing.assert_allclose(float(sched(t)), want, rtol=1e-6)


@pytest.mark.unit
def test_no_decay_mask_is_the_only_1d_deviation():
    """With wd=0 a 1D param tracks torch exactly; with wd>0 it deviates by
    exactly the decay term (our mask) — proving the mask is the sole
    1D difference from the reference's decay-everything AdamW."""
    v0 = np.linspace(-1, 1, 8).astype(np.float32)
    g = np.full((8,), 0.3, dtype=np.float32)

    def ours(wd):
        params = {"v": jnp.asarray(v0)}
        tx = build_optimizer(params, build_schedule(LR, 1, 1, kind="constant"),
                             weight_decay=wd, gradient_clip_val=None)
        state = tx.init(params)
        updates, _ = tx.update({"v": jnp.asarray(g)}, state, params)
        return np.asarray(params["v"] + updates["v"])

    vt = torch.nn.Parameter(torch.from_numpy(v0.copy()))
    opt = torch.optim.AdamW([vt], lr=LR, weight_decay=0.0)
    vt.grad = torch.from_numpy(g)
    opt.step()
    torch_no_wd = vt.detach().numpy()

    np.testing.assert_allclose(ours(0.0), torch_no_wd, atol=1e-7)
    # wd>0: ours is STILL the no-decay trajectory for 1D leaves
    np.testing.assert_allclose(ours(0.5), torch_no_wd, atol=1e-7)


@pytest.mark.unit
@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_cross_entropy_label_smoothing_matches_torch(smoothing):
    """training/losses.cross_entropy vs torch nn.CrossEntropyLoss with the
    reference's label_smoothing wiring (lightning_modules.py:345-350)."""
    from thyroid_tpu.training.losses import cross_entropy

    rs = np.random.RandomState(11)
    logits = rs.randn(16, 2).astype(np.float32) * 3
    labels = rs.randint(0, 2, size=(16,))
    want = torch.nn.CrossEntropyLoss(label_smoothing=smoothing)(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                              label_smoothing=smoothing))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


@pytest.mark.unit
def test_deit_dual_head_rule_matches_reference():
    """No-teacher DeiT training loss: 0.5·CE(cls)+0.5·CE(dist) on true
    labels (lightning_modules.py:455-462)."""
    from thyroid_tpu.training.losses import cross_entropy

    rs = np.random.RandomState(12)
    cls_l = rs.randn(8, 2).astype(np.float32)
    dist_l = rs.randn(8, 2).astype(np.float32)
    labels = rs.randint(0, 2, size=(8,))
    ce = torch.nn.CrossEntropyLoss()
    want = (0.5 * ce(torch.from_numpy(cls_l), torch.from_numpy(labels))
            + 0.5 * ce(torch.from_numpy(dist_l), torch.from_numpy(labels))).item()
    got = 0.5 * float(cross_entropy(jnp.asarray(cls_l), jnp.asarray(labels))) \
        + 0.5 * float(cross_entropy(jnp.asarray(dist_l), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
