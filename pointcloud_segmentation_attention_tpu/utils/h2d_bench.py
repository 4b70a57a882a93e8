"""Raw host->device link measurement: per-transfer latency, bandwidth, and
compute overlap.

VERDICT r2 #1 asked for the hard ceiling behind the end-to-end trainer rate:
on a remote-tunneled chip the H2D path may be the floor no loader can beat.
This tool measures it directly:

- ``sweep``: device_put wall time vs payload size -> per-call latency (the
  intercept) and asymptotic bandwidth (the slope).
- ``overlap``: can device_put make progress while the chip computes?  Times
  a compute loop alone, a transfer loop alone, and both interleaved from a
  feeder thread (the trainer's prefetch structure).  overlap_efficiency of
  1.0 means transfers are free behind compute; 0.0 means they serialize.

Implied step floor for a training batch of X bytes:
``latency + X / bandwidth`` if serialized, ``max(step, ...)`` if overlapped.

Run: ``python -m pointcloud_segmentation_attention_tpu.utils.h2d_bench``
(prints one JSON object).
"""
from __future__ import annotations

import json
import threading
import time
from typing import Dict, List

import numpy as np


def _put_sync(x, device):
    import jax

    y = jax.device_put(x, device)
    # Value fetch = only reliable sync on the axon remote backend.
    np.asarray(jax.device_get(y[:1]))
    return y


def sweep(sizes_mb=(0.0625, 0.25, 1.0, 4.0, 8.0, 16.0), iters=8) -> List[Dict]:
    import jax

    dev = jax.devices()[0]
    out = []
    for mb in sizes_mb:
        nbytes = int(mb * 2**20)
        x = np.random.randint(0, 255, nbytes, np.uint8)
        _put_sync(x, dev)  # warm the path
        t0 = time.perf_counter()
        for _ in range(iters):
            _put_sync(x, dev)
        dt = (time.perf_counter() - t0) / iters
        out.append({"mb": mb, "ms": round(dt * 1e3, 3),
                    "mb_per_s": round(mb / dt, 1)})
    return out


def fit_latency_bandwidth(rows: List[Dict]) -> Dict:
    """Least-squares time = latency + bytes/bw over the sweep.

    Tunnel noise can flip the slope of a short sweep (one stalled window on
    a small payload makes bigger transfers look faster per byte), which
    would read as infinite bandwidth and a latency equal to the mean sample
    — and anything derived from the fit (``*_expected_from_link``) becomes
    nonsense.  A non-positive slope therefore falls back to per-row BOUNDS
    (latency = fastest observed transfer, bandwidth = best achieved rate)
    and flags the fit ``degenerate`` so callers can re-sweep."""
    x = np.array([r["mb"] for r in rows])
    y = np.array([r["ms"] for r in rows]) / 1e3
    a = np.vstack([np.ones_like(x), x * 2**20]).T
    (lat, inv_bw), *_ = np.linalg.lstsq(a, y, rcond=None)
    if inv_bw <= 0:
        return {"latency_ms": round(min(r["ms"] for r in rows), 3),
                "bandwidth_mb_per_s": round(
                    max(r["mb_per_s"] for r in rows), 1),
                "degenerate": True}
    # A slightly negative intercept (noise around a real slope) clamps to 0
    # rather than predicting negative transfer times.
    lat = max(float(lat), 0.0)
    return {"latency_ms": round(lat * 1e3, 3),
            "bandwidth_mb_per_s": round(1.0 / float(inv_bw) / 2**20, 1)}


def overlap(payload_mb=4.0, compute_ms_target=20.0, iters=20) -> Dict:
    """Compute loop vs transfer loop vs both (feeder thread)."""
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]

    # A matmul chain sized to ~compute_ms_target on-device.
    n = 2048
    a = jax.device_put(np.random.rand(n, n).astype(np.float32), dev)

    @jax.jit
    def burn(a, k):
        def body(_, x):
            return x @ a * (1.0 / n)
        return jax.lax.fori_loop(0, k, body, a)

    k = 4
    r = burn(a, k)
    float(r[0, 0])
    t0 = time.perf_counter()
    r = burn(a, k)
    float(r[0, 0])
    step_ms = (time.perf_counter() - t0) * 1e3
    # Scale k so one burn ~ compute_ms_target.
    k = max(1, int(k * compute_ms_target / max(step_ms, 1e-3)))
    r = burn(a, k)
    float(r[0, 0])

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return (time.perf_counter() - t0) / iters

    def compute_only():
        for _ in range(iters):
            r = burn(a, k)
        float(r[0, 0])

    x = np.random.randint(0, 255, int(payload_mb * 2**20), np.uint8)

    def transfer_only():
        for _ in range(iters):
            _put_sync(x, dev)

    stop = threading.Event()

    def feeder():
        while not stop.is_set():
            _put_sync(x, dev)

    t_compute = timed(compute_only)
    t_transfer = timed(transfer_only)

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    try:
        t_both = timed(compute_only)
    finally:
        stop.set()
        th.join(timeout=10)

    serial = t_compute + t_transfer
    denom = max(serial - t_compute, 1e-9)
    eff = float(np.clip((serial - t_both) / denom, 0.0, 1.0))
    return {
        "compute_ms": round(t_compute * 1e3, 2),
        "transfer_ms": round(t_transfer * 1e3, 2),
        "interleaved_compute_ms": round(t_both * 1e3, 2),
        "overlap_efficiency": round(eff, 3),
    }


def main():
    rows = sweep()
    fit = fit_latency_bandwidth(rows)
    ov = overlap()
    # Implied e2e floor for the flagship step (B16 x 8192):
    step_bytes = {"f32_dict": 16 * 8192 * 44, "compact": 16 * 8192 * 23,
                  "packed": 16 * 8192 * 23, "packed_q16": 16 * 8192 * 14 + 512}
    floors = {}
    for name, nbytes in step_bytes.items():
        n_calls = 6 if name == "f32_dict" else (5 if name == "compact" else 1)
        t = n_calls * fit["latency_ms"] / 1e3 + nbytes / (
            fit["bandwidth_mb_per_s"] * 2**20)
        floors[name] = {
            "transfer_ms": round(t * 1e3, 2),
            "pts_per_s_if_serialized": round(16 * 8192 / (t + 0.0215), 1),
            "pts_per_s_if_overlapped": round(16 * 8192 / max(t, 0.0215), 1),
        }
    print(json.dumps({"sweep": rows, "fit": fit, "overlap": ov,
                      "implied_flagship_floors": floors}))


if __name__ == "__main__":
    main()
