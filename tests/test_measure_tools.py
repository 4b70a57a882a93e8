"""Unit tests for the measurement tooling: h2d link fit, trace parsing,
HLO collective parsing on synthetic inputs."""
import gzip
import json
import os

import numpy as np

from pointcloud_segmentation_attention_tpu.parallel.hlo_analysis import (
    collective_stats, full_kernel_allgathers,
)
from pointcloud_segmentation_attention_tpu.utils.h2d_bench import (
    fit_latency_bandwidth,
)
from pointcloud_segmentation_attention_tpu.utils.trace_breakdown import (
    bucket_of, parse_trace_dir,
)


def test_h2d_fit_recovers_latency_and_bandwidth():
    lat_ms, bw_mb_s = 50.0, 40.0
    rows = [{"mb": mb, "ms": lat_ms + mb / bw_mb_s * 1e3}
            for mb in (0.25, 1.0, 4.0, 16.0)]
    fit = fit_latency_bandwidth(rows)
    assert abs(fit["latency_ms"] - lat_ms) < 1.0
    assert abs(fit["bandwidth_mb_per_s"] - bw_mb_s) < 1.0


def test_h2d_fit_degenerate_slope_falls_back_to_bounds():
    """A stalled small-payload window can make time DECREASE with size; the
    fit must not report infinite bandwidth / bogus latency (which poisoned
    one bench record's *_expected_from_link fields) — it falls back to
    per-row bounds and flags itself."""
    rows = [{"mb": 0.25, "ms": 300.0, "mb_per_s": 0.8},
            {"mb": 1.0, "ms": 60.0, "mb_per_s": 16.7},
            {"mb": 4.0, "ms": 140.0, "mb_per_s": 28.6}]
    fit = fit_latency_bandwidth(rows)
    assert fit["degenerate"] is True
    assert np.isfinite(fit["bandwidth_mb_per_s"])
    assert fit["bandwidth_mb_per_s"] == 28.6   # best achieved rate
    assert fit["latency_ms"] == 60.0           # fastest observed transfer


def test_h2d_fit_clamps_negative_intercept():
    """Noise around a real slope can push the intercept slightly negative;
    the fit clamps to zero instead of predicting negative transfer times."""
    rows = [{"mb": mb, "ms": -2.0 + mb / 40.0 * 1e3, "mb_per_s": 40.0}
            for mb in (1.0, 4.0, 16.0)]
    fit = fit_latency_bandwidth(rows)
    assert "degenerate" not in fit
    assert fit["latency_ms"] == 0.0
    assert abs(fit["bandwidth_mb_per_s"] - 40.0) < 1.0


def test_trace_bucketing():
    assert bucket_of("fusion.12") == "fusion"
    assert bucket_of("copy.181") == "copy"
    assert bucket_of("copy-start.3") == "copy"
    assert bucket_of("ball_query_pallas.7") == "ball_query"
    assert bucket_of("three_nn_pallas.1") == "three_nn"
    assert bucket_of("jit_something") == "other"


def test_parse_trace_dir(tmp_path):
    trace = {
        "traceEvents": [
            {"ph": "M", "pid": 7, "name": "process_name",
             "args": {"name": "/device:TPU:0 XLA Op"}},
            {"ph": "M", "pid": 1, "name": "process_name",
             "args": {"name": "python host"}},
            {"ph": "X", "pid": 7, "name": "fusion.1", "dur": 4000},
            {"ph": "X", "pid": 7, "name": "fusion.1", "dur": 2000},
            {"ph": "X", "pid": 7, "name": "copy.2", "dur": 1000},
            # host-side event must be ignored
            {"ph": "X", "pid": 1, "name": "fusion.9", "dur": 999999},
        ]
    }
    d = tmp_path / "plugins" / "profile" / "x"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump(trace, f)
    out = parse_trace_dir(str(tmp_path), n_steps=2)
    buckets = {b["bucket"]: b["ms_per_step"] for b in out["buckets"]}
    assert abs(buckets["fusion"] - 3.0) < 1e-6  # (4+2)ms over 2 steps
    assert abs(buckets["copy"] - 0.5) < 1e-6
    assert "other" not in buckets or buckets["other"] == 0


def test_collective_stats_and_kernel_detector():
    hlo = "\n".join([
        "  %ag = f32[128,256]{1,0} all-gather(%x), dimensions={0}",
        "  %ar = f32[16,64]{1,0} all-reduce(%y), to_apply=%sum",
        "  %rs.1 = bf16[8,8]{1,0} reduce-scatter(%z)",
        "  %ag2-start = (f32[4,4]{1,0}) all-gather-start(%w)",
        "  %ag2-done = f32[4,4]{1,0} all-gather-done(%ag2-start)",
        "  %dot = f32[2,2]{1,0} dot(%a, %b)",
    ])
    st = collective_stats(hlo)
    assert st["all-gather"]["count"] == 2  # start counted once, done skipped
    assert st["all-reduce"]["count"] == 1
    assert st["reduce-scatter"]["bytes"] == 8 * 8 * 2
    assert (128, 256) in st["all-gather"]["shapes"]
    bad = full_kernel_allgathers(hlo, [(128, 256)])
    assert bad == [(128, 256)]
    assert full_kernel_allgathers(hlo, [(999, 999)]) == []


def test_collective_stats_async_tuple_counts_destination_only():
    # The normal TPU async form: start returns (operand_alias, destination).
    hlo = ("  %s = (f32[4,128]{1,0}, f32[8,128]{1,0}) "
           "all-gather-start(%x), dimensions={0}")
    st = collective_stats(hlo)
    assert st["all-gather"]["count"] == 1
    assert st["all-gather"]["bytes"] == 8 * 128 * 4  # destination only
    assert st["all-gather"]["shapes"] == [(8, 128)]
