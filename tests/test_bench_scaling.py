"""Functional test of the bench.py measurement harnesses on the virtual CPU
mesh (VERDICT #3: the scaling harness must exist and run at n_devices in
{1, 8} even without multi-chip hardware; real rates come from the driver's
TPU bench run)."""
import jax
import numpy as np

import bench

# Tiny hierarchy for harness tests: the full-width flagship costs ~60-160 s
# of CPU XLA compile per mesh config, which dominated the suite (r3
# durations); the harness logic is model-independent.
TINY = dict(sa_npoints=(16, 8, 4, 2), sa_radii=(0.2, 0.4, 0.8, 1.2),
            sa_nsample=4, sa_mlps=((8, 8),) * 4,
            fp_mlps=((8,), (8,), (8,), (8, 8)))


def test_scaling_sweep_runs_on_virtual_mesh():
    res = bench.measure_scaling(
        b_per_chip=2, n=256, device_counts=[1, len(jax.devices())],
        warmup=1, iters=2, model_kwargs=TINY,
    )
    counts = [r["n_devices"] for r in res]
    assert counts[0] == 1 and counts[-1] == len(jax.devices())
    for r in res:
        assert r["points_per_sec"] > 0
        assert r["points_per_sec_per_chip"] > 0
        assert np.isfinite(r["efficiency"])
    assert res[0]["efficiency"] == 1.0


def test_end_to_end_harness_runs():
    pps, samples = bench.measure_end_to_end(b=4, n=256, warmup=1, iters=3,
                                            reps=2, n_devices=2,
                                            model_kwargs=TINY)
    assert np.isfinite(pps) and pps > 0
    assert len(samples) == 2 and all(s > 0 for s in samples)


def test_end_to_end_packed_wire_harness_runs():
    for wire in ("packed", "packed_q16"):
        pps, _ = bench.measure_end_to_end(b=4, n=256, warmup=1, iters=3,
                                          reps=2, n_devices=2, wire=wire,
                                          model_kwargs=TINY)
        assert np.isfinite(pps) and pps > 0


def test_serving_resident_harness_runs():
    pps, samples, fields = bench.measure_serving_resident(
        n=256, batch_size=4, n_scenes=2, scene_points=3000, warmup_scenes=1,
        reps=2, model_kwargs=TINY,
        link_fit={"latency_ms": 10.0, "bandwidth_mb_per_s": 50.0},
        inference_pps=1e6)
    assert np.isfinite(pps) and pps > 0
    # slots include margin duplicates + tail fill
    assert fields["slots_per_sec"] >= pps
    assert fields["scenes_per_sec_per_device"] > 0
    # the link model predicts a finite positive rate
    assert fields["expected_from_link"] > 0


def test_link_fit_harness_runs():
    fit = bench.measure_link()
    # CPU timing noise can push the fitted intercept slightly negative, but
    # it must at least be a finite number.
    assert np.isfinite(fit["latency_ms"])
    assert "degraded" in fit and "bandwidth_mb_per_s" in fit
