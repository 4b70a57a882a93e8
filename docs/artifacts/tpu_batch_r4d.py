"""TPU batch r4d: stripe-window sampler + chunker-v3 serving.

Follow-ups measured here:
- device sampler with x-stripe windows (r4c full-window sort-draw: 53.8 ms;
  target <= 30),
- resident serving with the top_k slot inversion (r4c: 899k verts/s,
  chunker alone 96 ms/scene),
- serialized chunker timing (chunker returns n_chunks, so int() is a real
  sync with no extra program compiles),
- traces for whichever is still off target.
"""
import json
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
tag("sampler_geometry", {"max_len": scenes.max_len,
                         "sub_len": scenes.sub_len})
ids = jnp.asarray(rng.randint(0, 8, (16,)).astype(np.int32))
key = jax.random.PRNGKey(1)

results = {}
for name, kw in (("stripe", {}), ("stripe_augment", {"augment": True}),
                 ("stripe_exact", {"occupancy": "exact"})):
    step = make_sampling_train_step(scenes, 8192, **kw)
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
    results[name] = dt * 1e3
    tag(f"sampler_{name}", {"ms": round(dt * 1e3, 2),
                            "pts_per_s": round(16 * 8192 / dt, 1)})

if results.get("stripe", 0) > 32.0:
    step = make_sampling_train_step(scenes, 8192)
    st, _ = bench._make_state_and_batch(16, 8192)
    st, m = step(st, ids, key)
    float(m["loss"])
    for _ in range(20):
        st, m = step(st, ids, key)
    float(m["loss"])
    jax.profiler.start_trace("/tmp/psa_trace_sampler_r4d")
    for _ in range(10):
        st, m = step(st, ids, key)
    float(m["loss"])
    jax.profiler.stop_trace()
    from pointcloud_segmentation_attention_tpu.utils.trace_breakdown import (
        parse_trace_dir,
    )
    out = parse_trace_dir("/tmp/psa_trace_sampler_r4d", n_steps=10)
    tag("sampler_buckets", out["buckets"])
    tag("sampler_top", out["top_ops"][:14])
del scenes, st

# --- resident serving with chunker v3 ------------------------------------
from pointcloud_segmentation_attention_tpu.eval.resident_serving import (  # noqa: E402
    ResidentSceneServer, chunk_count,
)

med, samples, slots = bench.measure_serving_resident(n=8192, batch_size=16)
tag("serving_resident_v3", {"vertices_per_s": round(med, 1),
                            "samples": samples, "slots_per_s": slots})

# Serialized chunker timing (real sync: int() on the chunker's own output).
state_s, _ = bench._make_state_and_batch(16, 8192)
server = ResidentSceneServer(state_s, 8192, batch_size=16, layout="q16")
rng2 = np.random.RandomState(5)
sp = 160000
scene = {
    "points": (rng2.rand(sp, 3) * [6.0, 6.0, 2.6]).astype(np.float32),
    "colors": rng2.randint(0, 256, (sp, 3)).astype(np.uint8),
    "normals": rng2.rand(sp, 3).astype(np.float32),
}
server.predict_scene(scene)  # compile
n_pad = server._n_pad(sp)
layout = server._layout(n_pad)
buf = layout.pack(scene["points"], scene["colors"], scene["normals"])
x = chunk_count(layout.decode_host(buf)["points"][:sp], 8192) + 16
x_cap = max(64, -(-x // 64) * 64)
chunker, stitch, step = server._get_programs(n_pad, x_cap)
dbuf = jax.device_put(buf)
idx, mask, nc = chunker(dbuf, sp)
int(nc)  # warm+sync
t0 = time.perf_counter()
for _ in range(10):
    idx, mask, nc = chunker(dbuf, sp)
total = int(nc)
chunker_ms = (time.perf_counter() - t0) / 10 * 1e3
tag("chunker_serialized", {"ms": round(chunker_ms, 2), "n_chunks": total,
                           "r4c_ms": 95.7})

tag("done", {"total_s": round(time.time() - t_start, 1)})
