"""Train state — one functional state pytree replacing the reference's three
stateful LightningModules (reference: src/training/lightning_modules.py:38,
:310, :742). Model params, BatchNorm stats, optimizer state, optional EMA,
and the step counter travel together through jitted steps.
"""
from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False, default=None)
    apply_fn: Any = flax.struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads: Any, new_batch_stats: Any = None,
                        ema_decay: Optional[float] = None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if ema_decay is not None and self.ema_params is not None:
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                self.ema_params, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )

    def variables(self, use_ema: bool = False) -> dict:
        params = self.ema_params if (use_ema and self.ema_params is not None) else self.params
        v = {"params": params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(
    model: Any,
    variables: dict,
    tx: optax.GradientTransformation,
    ema: bool = False,
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats"),
        opt_state=tx.init(params),
        # jnp.copy, NOT identity: aliased param/ema buffers make the
        # buffer-donating epoch program fail with "donate the same buffer
        # twice" (the whole TrainState is donated in scan_epoch)
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        tx=tx,
        apply_fn=model.apply,
    )
