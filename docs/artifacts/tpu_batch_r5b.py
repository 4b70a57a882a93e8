"""TPU batch r5b: rerun the extended family arms (r5 stage 5) after the
group-gather center-tile VMEM fix (cls MSG's 512x128-slot level blew the
16 MB scoped-vmem stack when the tile was bounded by count alone), plus a
flagship device-step regression gate for the kernel change."""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")


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
                   "error": f"{type(e).__name__}: {e}"[:800],
                   "trace": traceback.format_exc()[-1200:]})
        return None


import jax  # noqa: E402

tag("devices", {"devices": [str(d) for d in jax.devices()]})

import bench  # noqa: E402


def regression():
    pps = bench.measure_device_step(16, 8192, warmup=110, iters=150)
    return {"device_step_ms": round(16 * 8192 / pps * 1e3, 2),
            "r5_ms": 21.04}


stage("regression_after_tile_fix", regression)

from pointcloud_segmentation_attention_tpu.recipes import run_extended  # noqa: E402


def family_ext():
    out = run_extended("logs/r5_batch/family", epochs=40, seed=0)
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
tag("done", {})
