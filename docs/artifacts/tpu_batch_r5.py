"""TPU batch r5: every on-chip run of the round in ONE process.

The tunnel's exclusive lease takes minutes to reclaim between processes, so
all TPU work batches here (the pattern the verify skill documents).  Every
stage is exception-guarded: a failed stage tags its error and the batch
continues.

1. regression: flagship device step + device-sampler step (the r5 geometry
   knob must not have moved either; r4 steady state 21.0 ms / 36.9 ms),
2. Report Table 1 attention ablation, 7 arms at matched steps
   (VERDICT r4 #1) -> RESULTS_attention_ablation.json,
3. flagship-GEOMETRY convergence run: 8192 pts x B16 x 32 x ~150k-pt
   scenes, input='sampler', 1600 steps, val + best-ckpt + stitched eval
   (VERDICT r4 #3) -> RESULTS_flagship_geometry.json,
4. Report Table 4 context-margin ablation: train once, stitched eval at
   margin 0 vs 0.2 (VERDICT r4 #2) -> RESULTS_context_margin.json,
5. extended family arms: cls_msg+normals, part_seg_msg_one_hot vs
   part_seg, pointnet1_seg, attention_net, v1 whole-scene
   (VERDICT r4 #6) -> merged into RESULTS_family_convergence.json,
6. full bench with the new *_expected_from_link fields (VERDICT r4 #7).

Output: `@@tag@@ {json}` lines.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

WORKDIR = "logs/r5_batch"
os.makedirs(WORKDIR, exist_ok=True)


def tag(name, obj):
    print(f"@@{name}@@ " + json.dumps(obj, default=float), flush=True)


def stage(name, fn):
    t0 = time.time()
    try:
        out = fn()
        tag(name, {"ok": True, "wall_s": round(time.time() - t0, 1),
                   "result": out})
        return out
    except Exception as e:  # noqa: BLE001
        tag(name, {"ok": False, "wall_s": round(time.time() - t0, 1),
                   "error": f"{type(e).__name__}: {e}",
                   "trace": traceback.format_exc()[-1500:]})
        return None


t_start = time.time()
import jax  # noqa: E402
import numpy as np  # noqa: E402

tag("devices", {"devices": [str(d) for d in jax.devices()]})

import bench  # noqa: E402


# --- 1. perf regression gate -------------------------------------------
def regression():
    pps = bench.measure_device_step(16, 8192, warmup=110, iters=150)
    out = {"device_step_pts_per_s": round(pps, 1),
           "device_step_ms": round(16 * 8192 / pps * 1e3, 2), "r4_ms": 21.0}

    from pointcloud_segmentation_attention_tpu.train.device_sampler import (
        ResidentScenes, make_sampling_train_step,
    )
    rng = np.random.RandomState(0)
    scenes = ResidentScenes([
        {"points": (rng.rand(150_000, 3) * [6, 5, 2.5]).astype(np.float32),
         "labels": rng.randint(1, 21, 150_000).astype(np.int32),
         "colors": rng.randint(0, 256, (150_000, 3)).astype(np.uint8),
         "normals": rng.rand(150_000, 3).astype(np.float32)}
        for _ in range(4)])
    state, _ = bench._make_state_and_batch(16, 8192)
    step = make_sampling_train_step(scenes, 8192)
    ids = np.zeros(16, np.int32)
    key = jax.random.PRNGKey(1)
    import jax.numpy as jnp
    dids = jnp.asarray(ids)
    state, m = step(state, dids, key)
    float(m["loss"])
    for _ in range(110):
        state, m = step(state, dids, key)
    float(m["loss"])
    t0 = time.perf_counter()
    iters = 100
    for _ in range(iters):
        state, m = step(state, dids, key)
    float(m["loss"])
    dt = time.perf_counter() - t0
    out["sampler_step_ms"] = round(dt / iters * 1e3, 2)
    out["sampler_pts_per_s"] = round(iters * 16 * 8192 / dt, 1)
    out["r4_sampler_ms"] = 36.9
    return out


stage("regression", regression)

# --- 2. Table 1 attention ablation -------------------------------------
from pointcloud_segmentation_attention_tpu.recipes import (  # noqa: E402
    run_attention_ablation, run_context_margin, run_extended,
    run_zero_precompute,
)


def ablation():
    out = run_attention_ablation(
        os.path.join(WORKDIR, "ablation"),
        n_train_scenes=12, n_val_scenes=3, scene_points=40000,
        n_points=2048, batch_size=4, max_steps=600, seed=0,
        results_path="RESULTS_attention_ablation.json")
    return {a: {"val": r["best_val_miou"], "off": r["offline_mean_iou"]}
            for a, r in out["arms"].items()}


stage("ablation", ablation)


# --- 3. flagship-geometry convergence ----------------------------------
def flagship():
    out = run_zero_precompute(
        os.path.join(WORKDIR, "flagship"),
        n_train_scenes=32, n_val_scenes=8, scene_points=150_000,
        n_points=8192, batch_size=16, epochs=800, n_epochs_to_val=50,
        seed=0, results_path="RESULTS_flagship_geometry.json")
    return {k: out[k] for k in ("offline_mean_iou", "best_val_miou",
                                "final_loss", "median_points_per_sec")}


stage("flagship_geometry", flagship)


# --- 4. Table 4 context margin -----------------------------------------
def margin():
    out = run_context_margin(
        os.path.join(WORKDIR, "margin"),
        margins=(0.0, 0.2), n_train_scenes=8, n_val_scenes=3,
        scene_points=40000, n_points=2048, batch_size=4, max_steps=400,
        seed=0, results_path="RESULTS_context_margin.json")
    return {"by_margin": out["offline_miou_by_margin"],
            "delta": out["delta_with_minus_without"]}


stage("context_margin", margin)


# --- 5. extended family arms -------------------------------------------
def family_ext():
    out = run_extended(os.path.join(WORKDIR, "family"), epochs=40, seed=0)
    # Merge into the vendored family results file.
    path = "RESULTS_family_convergence.json"
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(json.loads(json.dumps(out, default=float)))
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, default=float)
    keys = {}
    for k, v in out.items():
        if isinstance(v, dict):
            keys[k] = {kk: v[kk] for kk in
                       ("best_accuracy", "best_class_avg_iou", "eval_miou",
                        "eval_calibrated_vox_accuracy", "best_val_miou",
                        "final_train_loss") if kk in v}
        else:
            keys[k] = v
    return keys


stage("family_ext", family_ext)

# --- 6. full bench ------------------------------------------------------
stage("bench_full", lambda: bench.run_bench())

tag("done", {"total_wall_s": round(time.time() - t_start, 1)})
