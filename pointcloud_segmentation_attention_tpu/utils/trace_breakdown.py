"""Capture + aggregate a device-op trace of the flagship train step.

Runs N steps under ``jax.profiler.trace``, parses the emitted chrome-trace
JSON (``*.trace.json.gz``), and aggregates device-op wall time per step —
the tool behind the step-breakdown and roofline tables in
``docs/performance.md``.

Buckets: each device op is matched to a coarse bucket (fusion, pallas
kernel family, copy, ...) so the output answers "where do the milliseconds
go" directly.

Run: ``python -m pointcloud_segmentation_attention_tpu.utils.trace_breakdown
[--steps 30] [--out trace.json]`` (TPU; prints one JSON object).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import tempfile
from typing import Dict, Optional

BUCKETS = (
    ("ball_query", re.compile(r"ball_query")),
    ("fps", re.compile(r"farthest_point")),
    ("three_nn", re.compile(r"three_nn")),
    ("interpolate", re.compile(r"interpolate")),
    ("group_gather", re.compile(r"group_gather|gather_counts")),
    ("copy", re.compile(r"^copy[.\d]*$|copy-start|copy-done")),
    ("fusion", re.compile(r"^(loop_|input_)?fusion[.\d]*$")),
    ("multiply_reduce", re.compile(r"multiply|reduce")),
    ("dynamic_slice", re.compile(r"slice|dynamic-update")),
    ("convert", re.compile(r"convert|bitcast")),
)


def bucket_of(name: str) -> str:
    for b, pat in BUCKETS:
        if pat.search(name):
            return b
    return "other"


def parse_trace_dir(trace_dir: str, n_steps: int) -> Dict:
    """Aggregate device-op durations from the chrome trace; per-step ms."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    per_op = collections.Counter()
    per_bucket = collections.Counter()
    counts = collections.Counter()
    for f in files:
        data = json.load(gzip.open(f, "rt"))
        # Device track pids: process names containing TPU/device core labels.
        device_pids = set()
        for ev in data.get("traceEvents", []):
            if (ev.get("ph") == "M" and ev.get("name") == "process_name"):
                pname = ev.get("args", {}).get("name", "")
                if re.search(r"TPU|/device:|Device|XLA Op", pname,
                             re.IGNORECASE):
                    device_pids.add(ev["pid"])
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
                continue
            name = ev.get("name", "")
            dur_ms = ev.get("dur", 0) / 1e3
            per_op[name] += dur_ms / n_steps
            per_bucket[bucket_of(name)] += dur_ms / n_steps
            counts[bucket_of(name)] += 1
    top = [{"op": k, "ms_per_step": round(v, 3)}
           for k, v in per_op.most_common(40)]
    buckets = [{"bucket": k, "ms_per_step": round(v, 3),
                "events": counts[k] // max(n_steps, 1)}
               for k, v in per_bucket.most_common()]
    return {"buckets": buckets, "top_ops": top}


def capture(n_steps: int = 30, b: int = 16, n: int = 8192,
            trace_dir: Optional[str] = None,
            model_name: str = "sem_seg_features") -> Dict:
    import jax

    import bench

    state, batch = bench._make_state_and_batch(b, n, model_name=model_name)
    from pointcloud_segmentation_attention_tpu.train import seg_train_step

    step = jax.jit(seg_train_step, donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, key)
    float(m["loss"])
    for _ in range(110):  # past secondary donation-layout compiles
        state, m = step(state, batch, key)
    float(m["loss"])

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="psa_trace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(n_steps):
        state, m = step(state, batch, key)
    float(m["loss"])
    jax.profiler.stop_trace()
    out = parse_trace_dir(trace_dir, n_steps)
    out["trace_dir"] = trace_dir
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--model", default="sem_seg_features")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    out = capture(args.steps, model_name=args.model)
    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
