"""Real 2-process ``jax.distributed`` run (VERDICT r3 #6): launches two CPU
worker processes with a coordinator, each host-sharding + precomputing its
scene shard and joining one data-parallel step over the global 4-device
mesh; the loss must equal the single-process control bit-for-bit."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu.data import scannet as sc

pytestmark = pytest.mark.slow


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_matches_single(tmp_path):
    workdir = str(tmp_path)
    data_root = os.path.join(workdir, "scannet")
    sc.write_synthetic_dataset(data_root, n_train=4, n_val=0, n_test=0,
                               n_points=4000)

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "COORDINATOR_ADDRESS": f"localhost:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "pointcloud_segmentation_attention_tpu.parallel.dist_selftest",
             "--workdir", workdir, "--npoints", "64"],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    dist_lines = [ln for out in outs for ln in out.splitlines()
                  if ln.startswith("DISTLOSS ")]
    assert len(dist_lines) == 1, outs  # only process 0 reports
    dist_loss = float(dist_lines[0].split()[1])

    # Single-process control on the same precomputed chunks (both worker
    # shards landed in the shared store), 4-device mesh in THIS process.
    from pointcloud_segmentation_attention_tpu.parallel.dist_selftest import (
        one_dp_step,
    )

    train_scenes = sc.read_split(os.path.join(data_root, "splits"), "train")
    control = one_dp_step(os.path.join(workdir, "chunks"), train_scenes,
                          npoints=64, n_devices=4)
    assert np.isfinite(dist_loss)
    np.testing.assert_allclose(dist_loss, control, rtol=1e-6)
