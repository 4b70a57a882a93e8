"""Multi-process pod self-test: real ``jax.distributed`` over CPU processes.

``tests/test_multihost.py`` proves shard-wise placement parity within one
process; this module exercises the code path that actually runs on a pod —
``parallel.dist.initialize_distributed`` + per-host scene sharding +
host-sharded precompute + one data-parallel step over the GLOBAL device
mesh — with N real OS processes and a coordinator, no hardware required
(subsumes the distributed driver role of
``/root/reference/pointnet2_tensorflow/train_multi_gpu.py:149-211``).

Each process runs::

    COORDINATOR_ADDRESS=localhost:PORT NUM_PROCESSES=2 PROCESS_ID=i \
    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python -m pointcloud_segmentation_attention_tpu.parallel.dist_selftest \
        --workdir W --npoints 128

Process 0 prints ``DISTLOSS <loss>``; the launcher
(``tests/test_distributed_procs.py``) asserts it equals the single-process
run bit-for-bit (same chunks — precompute is scene-name-keyed — same state,
same global batch, the gradient all-reduce merely partitioned differently).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

_TINY = dict(sa_npoints=(16, 8, 4, 2), sa_radii=(0.2, 0.4, 0.8, 1.2),
             sa_nsample=4, sa_mlps=((8, 8),) * 4,
             fp_mlps=((8,), (8,), (8,), (8, 8)))


def one_dp_step(precompute_dir: str, scene_names: Sequence[str],
                npoints: int, n_devices: Optional[int] = None) -> float:
    """One deterministic data-parallel train step on epoch-0 chunks of all
    scenes; returns the loss.  Runs identically single-process (the control)
    and multi-process (state/batch leaves are host numpy, identical on every
    process, so jit scatters the global shards itself)."""
    import jax
    import jax.numpy as jnp
    import optax

    from pointcloud_segmentation_attention_tpu import models, parallel
    from pointcloud_segmentation_attention_tpu.data import pipeline
    from pointcloud_segmentation_attention_tpu.data.scannet import precompute
    from pointcloud_segmentation_attention_tpu.train import (
        create_state, steps,
    )

    chunks = [
        precompute._load_chunk(
            precompute._train_chunk_path(precompute_dir, 0, name))
        for name in scene_names
    ]
    batch = pipeline.make_batch(chunks, use_colors=True, use_normals=True)

    model = models.get_model("sem_seg_features", num_classes=21, **_TINY)
    state = create_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        jnp.zeros((1, npoints, 3)), jnp.zeros((1, npoints, 6)), train=False)
    # Host-numpy leaves: every process holds the identical full value, which
    # jit may scatter/replicate onto the GLOBAL mesh without the
    # local-to-global array plumbing a committed single-device tree needs.
    state = jax.tree_util.tree_map(np.asarray, state)

    mesh = parallel.make_mesh(n_devices)
    step = parallel.data_parallel_jit(
        lambda s, b, r: steps.seg_train_step(s, b, r), mesh,
        batch_argnums=(1,), donate_argnums=(0,))
    _, m = step(state, parallel.shard_batch(batch, mesh),
                jax.random.PRNGKey(1))
    return float(m["loss"])


def main(argv=None):
    import argparse

    import jax

    # Force CPU BEFORE any backend use (the axon sitecustomize registers a
    # TPU plugin at interpreter start; env vars alone are too late).
    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--npoints", type=int, default=128)
    args = p.parse_args(argv)

    from pointcloud_segmentation_attention_tpu.data.scannet import (
        precompute, read_split,
    )
    from pointcloud_segmentation_attention_tpu.parallel.dist import (
        host_shard, initialize_distributed,
    )

    initialize_distributed()   # COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
    from jax.experimental import multihost_utils

    data_root = os.path.join(args.workdir, "scannet")
    precompute_dir = os.path.join(args.workdir, "chunks")
    train_scenes = read_split(os.path.join(data_root, "splits"), "train")

    # Each host precomputes ITS scene shard into the shared store; the
    # scene-name-keyed rng makes the result identical to a single-host pass.
    mine = host_shard(train_scenes)
    precompute.precompute_train_chunks(
        data_root, mine, precompute_dir, epochs=1, npoints=args.npoints)
    multihost_utils.sync_global_devices("precompute_done")

    loss = one_dp_step(precompute_dir, train_scenes, args.npoints)
    if jax.process_index() == 0:
        print(f"DISTLOSS {loss:.8f}", flush=True)


if __name__ == "__main__":
    main()
