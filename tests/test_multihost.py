"""Two-host input-pipeline simulation (VERDICT r2 #8): host-sharded scene
lists must cover the corpus disjointly, per-host precompute + replay must be
deterministic, and a dp step consuming the per-host shards must reproduce
the single-host loss (the generalization of the reference's batch slicing,
``train_multi_gpu.py:185-188``)."""
import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu.parallel.dist import host_shard


def test_host_shard_disjoint_full_coverage():
    scenes = [f"scene{i:04d}_00" for i in range(11)]
    shards = [host_shard(scenes, process_index=h, process_count=2)
              for h in range(2)]
    assert not set(shards[0]) & set(shards[1])
    assert sorted(shards[0] + shards[1]) == sorted(scenes)
    # Deterministic: same inputs -> same shard.
    assert shards[0] == host_shard(scenes, process_index=0, process_count=2)


def test_per_host_precompute_and_replay_deterministic(tmp_path):
    from pointcloud_segmentation_attention_tpu.data import scannet as sc

    data_root = str(tmp_path / "scannet")
    splits = sc.write_synthetic_dataset(data_root, n_train=4, n_val=0,
                                        n_test=0, n_points=2000)
    scenes = splits["train"]
    # Each simulated host precomputes only its shard (the precompute CLI's
    # --num_hosts/--host_id path), into the SAME chunk dir.
    pre = str(tmp_path / "chunks")
    for host in range(2):
        names = host_shard(scenes, process_index=host, process_count=2)
        sc.precompute.precompute_train_chunks(
            data_root, names, pre, epochs=1, npoints=128)
    # The union covers every scene: full single-host replay works.
    chunks = list(_take(sc.precompute.replay_train_chunks(pre, 1, scenes),
                        len(scenes)))
    assert len(chunks) == len(scenes)

    # Determinism: a second precompute into a fresh dir writes bitwise-equal
    # chunks (seed-keyed RNG per (epoch, scene), independent of host split).
    pre2 = str(tmp_path / "chunks2")
    sc.precompute.precompute_train_chunks(
        data_root, scenes, pre2, epochs=1, npoints=128)
    a = list(_take(sc.precompute.replay_train_chunks(pre, 1, scenes), 4))
    b = list(_take(sc.precompute.replay_train_chunks(pre2, 1, scenes), 4))
    for ca, cb in zip(a, b):
        for k in ca:
            np.testing.assert_array_equal(ca[k], cb[k])


def _take(it, n):
    for _ in range(n):
        yield next(it)


def test_two_host_dp_step_matches_single_host():
    """Global batch split into two per-host halves, placed shard-wise on an
    8-device mesh, must give the same loss as the single-host placement —
    the numerical contract of multi-host dp (per-host device_put of local
    data + one global psum)."""
    import jax
    import jax.numpy as jnp
    import optax

    from pointcloud_segmentation_attention_tpu import models, parallel
    from pointcloud_segmentation_attention_tpu.train import (
        create_state, make_sample_weights, seg_train_step,
    )

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs multiple (virtual) devices")
    rng = np.random.RandomState(0)
    b, n = n_dev, 64
    batch = {
        "points": rng.rand(b, n, 3).astype(np.float32),
        "labels": rng.randint(0, 21, (b, n)).astype(np.int32),
    }
    batch["weights"] = np.asarray(make_sample_weights(
        jnp.asarray(batch["labels"]), jnp.ones((b, n), jnp.float32)))
    model = models.get_model(
        "sem_seg", num_classes=21,
        sa_npoints=(16, 8, 4, 2), sa_radii=(0.1, 0.2, 0.4, 0.8), sa_nsample=4,
        sa_mlps=((8, 8),) * 4, fp_mlps=((8,), (8,), (8,), (8, 8)))
    state = create_state(model, optax.adam(1e-3), jax.random.PRNGKey(0),
                         jnp.asarray(batch["points"][:1]), None, train=False)
    mesh = parallel.make_mesh(n_dev)
    step = parallel.data_parallel_jit(
        seg_train_step, mesh, batch_argnums=(1,), donate_argnums=())

    # Single-host placement: one shard_batch over the global batch.
    _, m_single = step(state, parallel.shard_batch(batch, mesh),
                       jax.random.PRNGKey(1))

    # Two-host simulation: each "host" owns half the devices and device_puts
    # ONLY its half of the global batch, shard by shard (jax.device_put to
    # explicit devices — what per-host addressable placement does on a pod).
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    devices = list(mesh.devices.reshape(-1))

    def place_two_host(arr):
        per_dev = np.split(arr, n_dev, axis=0)
        shards = []
        for host in range(2):
            local_devs = devices[host * n_dev // 2:(host + 1) * n_dev // 2]
            local = per_dev[host * n_dev // 2:(host + 1) * n_dev // 2]
            shards.extend(jax.device_put(x, d)
                          for x, d in zip(local, local_devs))
        return jax.make_array_from_single_device_arrays(
            arr.shape, sharding, shards)

    batch_2h = {k: place_two_host(np.asarray(v)) for k, v in batch.items()}
    _, m_two = step(state, batch_2h, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_two["loss"]), float(m_single["loss"]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_two["confusion"]),
                                  np.asarray(m_single["confusion"]))
