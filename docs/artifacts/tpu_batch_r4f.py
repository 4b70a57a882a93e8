"""TPU batch r4f: threaded-upload serving + final full-bench validation."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def tag(name, obj):
    print(f"@@{name}@@ " + json.dumps(obj), flush=True)


t_start = time.time()
import jax  # noqa: E402

tag("devices", {"devices": [str(d) for d in jax.devices()]})

import bench  # noqa: E402

med, samples, slots = bench.measure_serving_resident(n=8192, batch_size=16)
tag("serving_resident_v5", {"vertices_per_s": round(med, 1),
                            "samples": samples, "slots_per_s": slots})

r = bench.run_bench()
with open("/tmp/BENCH_r4_final2.json", "w") as f:
    json.dump(r, f)
tag("bench_final2", r)
tag("done", {"total_s": round(time.time() - t_start, 1)})
