"""TPU batch r4: every on-chip measurement of the round in ONE process.

The tunnel's exclusive lease takes minutes to reclaim between processes, so
all TPU work batches here (the pattern the verify skill documents):

1. flagship device step — regression check for the HIGHEST-precision MXU
   scatter-add VJP (r3 steady state: 21.0 ms / 6.24M pts/s),
2. device sampler step, fast (presorted-voxel) vs exact occupancy
   (r3: 64.3 ms; target <= 30 ms),
3. resident-scene serving rate (new serving_resident bench),
4. BN-fold inference delta (VERDICT r3 #8),
5. driver entry compile check,
6. the FULL bench, twice back-to-back (weather-proofing acceptance:
   agreement within ~15 % on every link-bound extra).

Output: `@@tag@@ {json}` lines.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def tag(name, obj):
    print(f"@@{name}@@ " + json.dumps(obj), flush=True)


t_start = time.time()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

tag("devices", {"devices": [str(d) for d in jax.devices()]})

import bench  # noqa: E402

# --- 1. flagship device step: scatter-add VJP ingest precision A/B ------
from pointcloud_segmentation_attention_tpu.ops.pallas import (  # noqa: E402
    group_gather_kernel as ggk,
)

for prec in (None, jax.lax.Precision.HIGHEST):
    ggk.VJP_PRECISION = prec
    pps = bench.measure_device_step(16, 8192)
    tag(f"device_step_prec_{prec}", {
        "pts_per_s": round(pps, 1),
        "ms": round(16 * 8192 / pps * 1e3, 2), "r3_ms": 21.0})
ggk.VJP_PRECISION = None

# --- 2. device sampler: fast vs exact occupancy -------------------------
from pointcloud_segmentation_attention_tpu.train.device_sampler import (  # noqa: E402
    ResidentScenes, make_sampling_train_step,
)

rng = np.random.RandomState(0)
scenes = ResidentScenes([
    {"points": (rng.rand(150_000, 3) * [6, 5, 2.5]).astype(np.float32),
     "labels": rng.randint(1, 21, 150_000).astype(np.int32),
     "colors": rng.randint(0, 256, (150_000, 3)).astype(np.uint8),
     "normals": rng.rand(150_000, 3).astype(np.float32)}
    for _ in range(8)
])
state, _ = bench._make_state_and_batch(16, 8192)
ids = jnp.asarray(rng.randint(0, 8, (16,)).astype(np.int32))
key = jax.random.PRNGKey(1)
for occ in ("fast", "exact"):
    step = make_sampling_train_step(scenes, 8192, occupancy=occ)
    # Fresh state per variant: the step donates its state argument, so
    # reusing one template across variants dies on a deleted buffer.
    st, _ = bench._make_state_and_batch(16, 8192)
    st, m = step(st, ids, key)
    float(m["loss"])
    for _ in range(40):
        st, m = step(st, ids, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(60):
        st, m = step(st, ids, key)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 60
    tag(f"sampler_{occ}", {"ms": round(dt * 1e3, 2),
                           "pts_per_s": round(16 * 8192 / dt, 1),
                           "r3_ms": 64.3})
del scenes, st

# --- 3. resident serving ------------------------------------------------
med, samples, slots = bench.measure_serving_resident(n=8192, batch_size=16)
tag("serving_resident", {"vertices_per_s": round(med, 1),
                         "samples": samples, "slots_per_s": slots})

# --- 4. BN-fold inference delta -----------------------------------------
from pointcloud_segmentation_attention_tpu.train.bn_fold import (  # noqa: E402
    fold_batchnorm_for_inference,
)
from pointcloud_segmentation_attention_tpu.train import seg_predict_step  # noqa: E402

state_i, batch_i = bench._make_state_and_batch(16, 8192)
folded, n_folded = fold_batchnorm_for_inference(state_i)


def time_inference(st):
    pred = jax.jit(seg_predict_step)
    logits = pred(st, batch_i["points"], batch_i["features"])
    float(logits[0, 0, 0])
    for _ in range(40):
        logits = pred(st, batch_i["points"], batch_i["features"])
    float(logits[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(150):
        logits = pred(st, batch_i["points"], batch_i["features"])
    float(logits[0, 0, 0])
    return (time.perf_counter() - t0) / 150


ms_plain = time_inference(state_i) * 1e3
ms_fold = time_inference(folded) * 1e3
tag("bn_fold", {"ms_plain": round(ms_plain, 3), "ms_folded": round(ms_fold, 3),
                "delta_ms": round(ms_plain - ms_fold, 3),
                "n_folded": n_folded})
del state_i, batch_i, folded

# --- 5. driver entry check ----------------------------------------------
import __graft_entry__  # noqa: E402

fn, args = __graft_entry__.entry()
out = jax.jit(fn)(*args)
tag("entry", {"shape": list(out.shape)})
del fn, args, out

# --- 6. full bench, twice -----------------------------------------------
for i in range(2):
    r = bench.run_bench()
    with open(f"/tmp/BENCH_r4_run{i}.json", "w") as f:
        json.dump(r, f)
    tag(f"bench_run{i}", r)

tag("done", {"total_s": round(time.time() - t_start, 1)})
