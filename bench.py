"""End-to-end benchmark: flagship model chunk throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: points/sec through the color+normal semantic-segmentation model
(forward, batch 16 x 8192 points — the reference's training geometry,
``attention_points/train.py:14-17``).  vs_baseline compares against the
reference's only published pipeline-speed number reinterpreted as chunk
throughput: 1201 scenes x 8192 pts / 85 s epoch (Report.pdf §3.3, the
precomputed-pickle pipeline on a consumer GPU) ≈ 115.7k points/sec.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_POINTS_PER_SEC = 1201 * 8192 / 85.0  # reference epoch time, Report.pdf §3.3


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fwd, (points, features) = entry()
    fwd = jax.jit(fwd)

    # Warmup/compile.
    out = fwd(points, features)
    out.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(points, features)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    b, n = points.shape[0], points.shape[1]
    pps = iters * b * n / dt
    print(json.dumps({
        "metric": "semseg_features_fwd_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
