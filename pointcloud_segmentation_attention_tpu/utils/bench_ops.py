"""Per-op microbenchmarks at the flagship model's shapes.

Times each geometry kernel at every SA/FP level of the ScanNet semantic-
segmentation hierarchy (npoint 1024/256/64/16, nsample 32 — ref
``pointnet2_sem_seg.py:19-69``) plus the full train step, to show where step
time goes.  Run on TPU::

    python -m pointcloud_segmentation_attention_tpu.utils.bench_ops

Timing uses a value fetch to synchronize (``block_until_ready`` is
optimistic on the axon backend — see .claude/skills/verify/SKILL.md).
"""
from __future__ import annotations

import time

import numpy as np


def _time(fn, *args, iters: int = 50, warmup: int = 5) -> float:
    """Median-of-3 wall time per call, synchronized by a scalar fetch."""
    import jax.numpy as jnp

    def run(k):
        out = None
        for _ in range(k):
            out = fn(*args)
        leaf = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(leaf.astype(jnp.float32)))

    run(warmup)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(iters)
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def main(b: int = 16, n: int = 8192):
    import jax
    import jax.numpy as jnp

    from pointcloud_segmentation_attention_tpu import ops

    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()} batch={b} n={n}")
    rows = []

    # Real training-chunk geometry (1.5 m + context margin, room height) so
    # ball densities match what the kernels see on ScanNet data.
    extent = np.array([1.9, 1.9, 2.6], np.float32)
    levels = [(n, 1024, 0.1), (1024, 256, 0.2), (256, 64, 0.4), (64, 16, 0.8)]
    for n_in, npoint, radius in levels:
        xyz = jnp.asarray((rng.rand(b, n_in, 3) * extent).astype(np.float32))
        fps = jax.jit(lambda x, np_=npoint: ops.farthest_point_sample(x, np_))
        t = _time(fps, xyz)
        rows.append((f"fps      {n_in:5d}->{npoint:4d}", t))
        idx = fps(xyz)
        new_xyz = jax.jit(ops.gather_point)(xyz, idx)
        bq = jax.jit(lambda x, c, r=radius: ops.ball_query(x, c, r, 32))
        rows.append((f"ballq    {n_in:5d}@{npoint:4d}", _time(bq, xyz, new_xyz)))
        grp = jax.jit(ops.group_point)
        gidx, gcnt = bq(xyz, new_xyz)
        feats = jnp.asarray(rng.rand(b, n_in, 64).astype(np.float32))
        rows.append((f"group    {n_in:5d}@{npoint:4d}x32", _time(grp, feats, gidx)))
        # The count-aware Pallas gather the model actually uses at L1
        # (docs/performance.md opt 6): skips the ~(1 - cnt/nsample) padded
        # slots the dense gather re-fetches.
        grpc = jax.jit(ops.group_point_with_counts)
        rows.append((f"grp_cnt  {n_in:5d}@{npoint:4d}x32",
                     _time(grpc, feats, gidx, gcnt)))
        tnn = jax.jit(ops.three_nn)
        rows.append((f"three_nn {n_in:5d}<-{npoint:4d}", _time(tnn, xyz, new_xyz)))

    # Full train step at flagship geometry.
    import optax

    from pointcloud_segmentation_attention_tpu import models
    from pointcloud_segmentation_attention_tpu.train import (
        create_state,
        make_sample_weights,
        seg_train_step,
    )

    batch = {
        "points": jnp.asarray((rng.rand(b, n, 3) * extent).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 21, (b, n)).astype(np.int32)),
        "features": jnp.asarray(rng.rand(b, n, 6).astype(np.float32)),
    }
    batch["weights"] = make_sample_weights(
        batch["labels"], jnp.ones((b, n), jnp.float32))
    key = jax.random.PRNGKey(0)
    for dtype_name in ("float32", "bfloat16"):
        model = models.get_model("sem_seg_features", num_classes=21,
                                 compute_dtype=jnp.dtype(dtype_name))
        state = create_state(model, optax.adam(1e-3), key,
                             batch["points"][:1], batch["features"][:1],
                             train=False)
        step = jax.jit(seg_train_step, donate_argnums=())

        def run_step(s=state):
            s2, m = step(s, batch, key)
            return m["loss"]

        t = _time(run_step, iters=30, warmup=110)
        rows.append((f"train_step[{dtype_name}]", t))
        # forward only
        fwd = jax.jit(lambda p, f: model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            p, f, train=False))
        rows.append((f"forward[{dtype_name}]",
                     _time(fwd, batch["points"], batch["features"],
                           iters=30, warmup=110)))

    print(f"{'op':28s} {'ms':>9s}")
    for name, t in rows:
        print(f"{name:28s} {t * 1e3:9.3f}")


if __name__ == "__main__":
    main()
