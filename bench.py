"""End-to-end benchmark: flagship model TRAINING throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: training points/sec through the color+normal semantic-segmentation
model — a full jitted train step (forward, weighted CE, backward, Adam,
BN-EMA, confusion-matrix update) at the reference's exact training geometry
(batch 16 x 8192 points, ``attention_points/train.py:14-17``).

vs_baseline: the reference's published epoch time — 1201 scenes x 8192 points
in 85 s with its precomputed-pickle pipeline on a consumer GPU (Report.pdf
§3.3) ≈ 115.7k training points/sec.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_POINTS_PER_SEC = 1201 * 8192 / 85.0  # reference epoch, Report.pdf §3.3


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from pointcloud_segmentation_attention_tpu import models
    from pointcloud_segmentation_attention_tpu.train import (
        create_state,
        make_sample_weights,
        schedules,
        seg_train_step,
    )

    rng = np.random.RandomState(0)
    b, n = 16, 8192
    # Points in the real training-chunk geometry: a 1.5 x 1.5 m x room-height
    # cuboid (+0.2 m context margin), ref data_transformation.py:98-99 — ball
    # density at radius 0.1 matches what the kernels see on real ScanNet data.
    extent = np.array([1.9, 1.9, 2.6], np.float32)
    batch = {
        "points": jnp.asarray((rng.rand(b, n, 3) * extent).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 21, (b, n)).astype(np.int32)),
        "features": jnp.asarray(rng.rand(b, n, 6).astype(np.float32)),
    }
    batch["weights"] = make_sample_weights(
        batch["labels"], jnp.ones((b, n), jnp.float32)
    )

    model = models.get_model("sem_seg_features", num_classes=21)
    tx = optax.adam(schedules.scannet_learning_rate)
    state = create_state(
        model, tx, jax.random.PRNGKey(0),
        batch["points"][:1], batch["features"][:1], train=False,
    )
    step = jax.jit(seg_train_step, donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    state, m = step(state, batch, key)  # compile
    float(m["loss"])
    # Warmup past secondary (donation-layout) compiles.  NOTE: on the axon
    # remote backend block_until_ready can return optimistically; a value
    # fetch (float(...)) is the only reliable synchronization point.
    for _ in range(110):
        state, m = step(state, batch, key)
    float(m["loss"])

    iters = 200
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, key)
    final_loss = float(m["loss"])  # true sync point
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    pps = iters * b * n / dt
    print(json.dumps({
        "metric": "semseg_features_train_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
