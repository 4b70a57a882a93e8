"""Device mesh + sharding helpers for data-parallel training and inference.

This subsumes the reference's entire distributed story — single-host in-graph
multi-GPU towers with explicit gradient averaging
(``pointnet2_tensorflow/train_multi_gpu.py:91-126,181-211``) — with the
TPU-native formulation: one ``Mesh`` over all chips (across hosts via ICI/DCN),
batch sharded over the ``data`` axis, params/optimizer state replicated, and
XLA inserting the gradient all-reduce (the ``average_gradients`` equivalent)
automatically from the sharding annotations.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first n (default all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put a host batch with the leading axis sharded over the mesh.

    This replaces the reference's per-tower ``tf.slice`` batch split
    (``train_multi_gpu.py:185-188``).
    """
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def data_parallel_jit(
    fn,
    mesh: Mesh,
    *,
    batch_argnums: Sequence[int] = (1,),
    axis_name: str = "data",
    static_argnames: Sequence[str] = (),
    donate_argnums: Sequence[int] = (0,),
):
    """jit ``fn(state, batch, ...)`` with state replicated and batch sharded.

    The gradient all-reduce emerges from XLA's SPMD partitioner: the loss is a
    mean over the sharded batch axis, so d(loss)/d(replicated params) lowers to
    a psum over ``data`` — the TPU equivalent of the reference's
    ``average_gradients`` tower-mean.
    """
    import inspect

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))
    # jit in_shardings needs one (pytree-prefix) entry per positional arg;
    # a bare sharding broadcasts over that argument's whole pytree.
    n_args = sum(
        1 for p in inspect.signature(fn).parameters.values()
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    )
    in_shardings = tuple(
        shard if i in batch_argnums else repl for i in range(n_args)
    )
    return jax.jit(
        fn,
        in_shardings=in_shardings,
        static_argnames=tuple(static_argnames),
        donate_argnums=tuple(donate_argnums),
    )
