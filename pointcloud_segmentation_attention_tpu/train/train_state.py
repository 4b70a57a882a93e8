"""Train state: params + BN running stats + optimizer state + step.

Replaces the reference's TF global-variable soup (``tf.train.AdamOptimizer`` +
``tf.contrib.layers.batch_norm`` EMA variables + global_step) with one pytree
that can be sharded/replicated over a device mesh and checkpointed as a
flat numpy pytree (train/checkpoints.py).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
        )

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(
            step=0,
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            apply_fn=apply_fn,
            tx=tx,
        )


def create_state(model, tx, rng, *example_inputs, **example_kwargs):
    """Initialize model variables and wrap in a TrainState.

    init runs under jit: eager initialization dispatches every layer op
    individually, which is pathological on remote-TPU backends.
    """
    init = jax.jit(
        lambda keys, *a: model.init(keys, *a, **example_kwargs)
    )
    variables = init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        *example_inputs,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState.create(model.apply, params, batch_stats, tx)
