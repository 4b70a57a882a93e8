"""Tensor parallelism: 2-D (data x model) mesh with channel-sharded weights.

The reference has no tensor parallelism (SURVEY.md §2.8 — its only strategy
is single-host data-parallel towers).  This module adds the TPU-native
capability anyway, because it is how the framework scales past data
parallelism on a pod slice: the shared-MLP ``PointConv`` kernels are 2-D
``(c_in, c_out)`` matrices, so sharding their OUTPUT channel over a ``model``
mesh axis splits every MXU matmul across chips, with XLA's SPMD partitioner
inserting the (all-gather / reduce-scatter) collectives over ICI.

Usage::

    mesh = make_mesh_2d(n_data, n_model)
    step = model_parallel_jit(seg_train_step, mesh, state)
    metrics = step(state_sharded, shard_batch(batch, mesh), rng)

Sharding rule: any float param with ndim >= 2 whose last dim divides evenly
over the ``model`` axis is sharded ``P(..., 'model')`` (dense/conv kernels);
everything else (biases, BN scales/stats, Adam count) is replicated.  The
optimizer state mirrors the params (Adam's mu/nu have identical shapes, so
the same rule applies leaf-wise).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(
    n_data: int,
    n_model: int,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """2-D mesh over the first n_data*n_model devices (data-major, so the
    model axis rides the fastest/nearest ICI links)."""
    devices = jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise RuntimeError(f"need {need} devices, have {len(devices)}")
    return Mesh(np.array(devices[:need]).reshape(n_data, n_model),
                tuple(axis_names))


def _leaf_sharding(x, mesh: Mesh, model_axis: str) -> NamedSharding:
    n_model = mesh.shape[model_axis]
    if (hasattr(x, "ndim") and x.ndim >= 2
            and np.issubdtype(x.dtype, np.floating)
            and x.shape[-1] % n_model == 0 and x.shape[-1] >= n_model):
        return NamedSharding(
            mesh, P(*([None] * (x.ndim - 1) + [model_axis]))
        )
    return NamedSharding(mesh, P())


def state_sharding(state: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """Sharding pytree for a TrainState: kernels channel-sharded over the
    model axis, everything else replicated."""
    return jax.tree_util.tree_map(
        lambda x: _leaf_sharding(x, mesh, model_axis), state
    )


def shard_state(state: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """Device-put a (host or replicated) TrainState with TP shardings."""
    shardings = state_sharding(state, mesh, model_axis)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def model_parallel_jit(
    fn,
    mesh: Mesh,
    state_like: Any,
    *,
    batch_argnums: Sequence[int] = (1,),
    data_axis: str = "data",
    model_axis: str = "model",
    donate_argnums: Sequence[int] = (),
):
    """jit ``fn(state, batch, ...)`` over a 2-D mesh: batch sharded over
    ``data``, kernels sharded over ``model`` — dp x tp in one program.

    ``state_like`` provides the state pytree structure for the sharding rule
    (shapes only; it is not captured).

    The traced function runs inside an ``activation_sharding`` context, so
    ``PointConv``/``Dense`` outputs are constrained to P(data, ..., model) —
    keeping every matmul split over ``model`` (see parallel/act_sharding.py;
    the HLO-level guarantee is tested in tests/test_tensor_parallel.py)."""
    import inspect

    from pointcloud_segmentation_attention_tpu.parallel.act_sharding import (
        activation_sharding,
    )

    st_shard = state_sharding(state_like, mesh, model_axis)
    batch_shard = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())
    n_args = sum(
        1 for p in inspect.signature(fn).parameters.values()
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    )
    in_shardings = tuple(
        st_shard if i == 0 else (batch_shard if i in batch_argnums else repl)
        for i in range(n_args)
    )

    def fn_constrained(*args, **kwargs):
        with activation_sharding(mesh, data_axis, model_axis):
            return fn(*args, **kwargs)

    return jax.jit(fn_constrained, in_shardings=in_shardings,
                   donate_argnums=tuple(donate_argnums))
