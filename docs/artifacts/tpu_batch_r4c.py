"""TPU batch r4c: sampler with the sort-method inverse-CDF draw.

r4b traced the 62 ms sampling step: 24 ms was jnp.searchsorted's default
'scan' binary search (18 sequential per-element-gather iterations over the
(B, 150k) cdf).  This measures the method='sort' co-sort draw, plus a trace
if the step is still > 32 ms.
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
ids = jnp.asarray(rng.randint(0, 8, (16,)).astype(np.int32))
key = jax.random.PRNGKey(1)

results = {}
for name, kw in (("fast_sortdraw", {}),
                 ("fast_sortdraw_augment", {"augment": True})):
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

if results.get("fast_sortdraw", 0) > 32.0:
    step = make_sampling_train_step(scenes, 8192)
    st, _ = bench._make_state_and_batch(16, 8192)
    st, m = step(st, ids, key)
    float(m["loss"])
    for _ in range(20):
        st, m = step(st, ids, key)
    float(m["loss"])
    jax.profiler.start_trace("/tmp/psa_trace_sampler_r4c")
    for _ in range(10):
        st, m = step(st, ids, key)
    float(m["loss"])
    jax.profiler.stop_trace()
    from pointcloud_segmentation_attention_tpu.utils.trace_breakdown import (
        parse_trace_dir,
    )
    out = parse_trace_dir("/tmp/psa_trace_sampler_r4c", n_steps=10)
    tag("buckets", out["buckets"])
    tag("top", out["top_ops"][:16])

del scenes

# --- resident serving: rate + per-phase attribution ----------------------
from pointcloud_segmentation_attention_tpu.eval.resident_serving import (  # noqa: E402
    ResidentSceneServer, chunk_count,
)

med, samples, slots = bench.measure_serving_resident(n=8192, batch_size=16)
tag("serving_resident_v2", {"vertices_per_s": round(med, 1),
                            "samples": samples, "slots_per_s": slots})

# Serialized per-phase timing of one scene (value-fetch sync per phase).
state_s, _ = bench._make_state_and_batch(16, 8192)
server = ResidentSceneServer(state_s, 8192, batch_size=16, layout="q16")
rng2 = np.random.RandomState(5)
sp = 160000
scene = {
    "points": (rng2.rand(sp, 3) * [6.0, 6.0, 2.6]).astype(np.float32),
    "colors": rng2.randint(0, 256, (sp, 3)).astype(np.uint8),
    "normals": rng2.rand(sp, 3).astype(np.float32),
}
server.predict_scene(scene)  # compile everything
n = sp
n_pad = server._n_pad(n)
layout = server._layout(n_pad)
buf = layout.pack(scene["points"], scene["colors"], scene["normals"])
x = chunk_count(layout.decode_host(buf)["points"][:n], 8192) + 16
x_cap = max(64, -(-x // 64) * 64)
chunker, stitch, step = server._get_programs(n_pad, x_cap)
phases = {}
t0 = time.perf_counter()
dbuf = jax.device_put(buf)
np.asarray(dbuf[:1])
phases["upload_ms"] = (time.perf_counter() - t0) * 1e3
t0 = time.perf_counter()
idx, mask, n_chunks = chunker(dbuf, n)
phases["n_chunks"] = int(n_chunks)
phases["chunker_ms"] = (time.perf_counter() - t0) * 1e3
nb = -(-x // 16)
t0 = time.perf_counter()
labs = [step(state_s, dbuf, idx[b * 16:(b + 1) * 16]) for b in range(nb)]
float(labs[-1][0, 0])
phases["predict_ms"] = (time.perf_counter() - t0) * 1e3
phases["nb"] = nb
if nb * 16 < x_cap:
    labs.append(jnp.zeros((x_cap - nb * 16, 8192), jnp.uint8))
t0 = time.perf_counter()
acc = stitch(jnp.concatenate(labs, axis=0), idx, mask)
out = np.asarray(acc)
phases["stitch_fetch_ms"] = (time.perf_counter() - t0) * 1e3
phases = {k: round(v, 2) if isinstance(v, float) else v
          for k, v in phases.items()}
tag("serving_phases", phases)

tag("done", {"total_s": round(time.time() - t_start, 1)})
