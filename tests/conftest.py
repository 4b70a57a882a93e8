"""Test configuration: run on a virtual 8-device CPU mesh by default.

Set PSA_TEST_TPU=1 to run the suite on real TPU hardware instead (used for
kernel parity/perf checks on-device).

IMPORTANT: in this image a sitecustomize imports jax at interpreter start to
register the axon TPU plugin, so JAX_PLATFORMS/JAX_PLATFORM_NAME env tweaks
made here are too late (jax.config captured the env at import).  The platform
MUST be selected via jax.config.update before the first backend use;
XLA_FLAGS is still read lazily at CPU-client creation, so the virtual-device
flag can be set here.
"""
import os
import sys

if os.environ.get("PSA_TEST_TPU", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: model compiles dominate suite time on CPU;
# caching makes re-runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/psa_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# Repo root on sys.path so `import pointcloud_segmentation_attention_tpu` works
# without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
