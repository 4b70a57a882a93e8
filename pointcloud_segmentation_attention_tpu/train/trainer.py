"""Unified ScanNet trainer.

TPU-native equivalent of ``attention_points/train.py:288-388`` — the
``train(epochs, batch_size, use_color, use_normal, use_attention,
attention_single_layer, use_subset, n_epochs_to_val)`` entry point — built on:

- model selection logic mirroring ref :323-330 (features -> features model,
  attention -> all-attention, single-layer -> wrapper, else baseline),
- precomputed-chunk replay input (ref precompute_dataset),
- jitted data-parallel train step over a device mesh (subsumes
  ``train_multi_gpu.py``),
- streaming confusion-matrix mIoU with per-eval reset (ref :146-161),
- best-val-IoU checkpoint retention (ref :268-276).
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np
import optax

from pointcloud_segmentation_attention_tpu import models, parallel
from pointcloud_segmentation_attention_tpu.data import pipeline
from pointcloud_segmentation_attention_tpu.data.scannet import precompute, read_split
from pointcloud_segmentation_attention_tpu.train import schedules, steps
from pointcloud_segmentation_attention_tpu.train.checkpoints import (
    BestKeeper,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from pointcloud_segmentation_attention_tpu.train.metrics import StreamingMeanIoU
from pointcloud_segmentation_attention_tpu.train.train_state import create_state
from pointcloud_segmentation_attention_tpu.utils.config import TrainConfig
from pointcloud_segmentation_attention_tpu.utils.logging import MetricLogger


def select_model(config: TrainConfig):
    """Model dispatch (ref train.py:323-330)."""
    import jax.numpy as jnp

    kw = dict(num_classes=config.num_classes)
    if config.compute_dtype == "bfloat16":
        kw["compute_dtype"] = jnp.bfloat16
    if config.model_overrides:
        # Tuples, not lists: flax module fields must be hashable.
        kw.update({k: tuple(tuple(x) if isinstance(x, list) else x
                            for x in v) if isinstance(v, list) else v
                   for k, v in config.model_overrides.items()})
    name = config.model
    if name == "sem_seg_attention_single_layer":
        return models.get_model(name, layer_idx=config.attention_single_layer, **kw)
    return models.get_model(name, **kw)


def _make_wire_spec(config: TrainConfig):
    """WireSpec for the packed single-buffer wire formats (optionally with
    an 'xK' split-transfer suffix, e.g. 'packed_q16x4'), else None."""
    from pointcloud_segmentation_attention_tpu.data.wire import WireSpec

    spec, _ = WireSpec.from_format(
        config.wire_format, n=config.n_points,
        use_colors=config.use_colors, use_normals=config.use_normals,
    )
    return spec


def resolve_input_mode(config: TrainConfig) -> str:
    """'auto' derives the input path from the legacy flags
    (device_replay -> resident, packed wire_format -> packed, else npz);
    explicit modes are validated against conflicting flags."""
    mode = config.input
    packed = _make_wire_spec(config) is not None
    if mode == "auto":
        return ("resident" if config.device_replay
                else "packed" if packed else "npz")
    if mode not in ("npz", "packed", "resident", "sampler"):
        raise ValueError(
            f"input must be auto|npz|packed|resident|sampler, got {mode!r}")
    if mode in ("npz", "sampler") and packed:
        raise ValueError(
            f"input='{mode}' replays raw arrays — drop the packed "
            f"wire_format={config.wire_format!r} (it only applies to the "
            "packed/resident record paths)")
    if mode == "sampler" and config.device_replay:
        raise ValueError("input='sampler' and device_replay are exclusive")
    if mode in ("npz", "packed") and config.device_replay:
        raise ValueError(
            f"input='{mode}' ships batches from host but device_replay=True "
            "requests the HBM-resident corpus — use input='resident' (or "
            "'auto'), or drop device_replay")
    return mode


def _onfly_val_chunks(data_root: str, val_scenes, n_points: int, seed=0,
                      chunk_size: Optional[float] = None,
                      margin: Optional[float] = None):
    """Full-coverage val chunks cut on the fly from RAW scenes — the val
    path of the zero-precompute sampler mode (no precompute dir exists).
    Geometry defaults come from the canonical chunks.CHUNK_SIZE /
    CONTEXT_MARGIN (not re-declared literals, which would drift)."""
    from pointcloud_segmentation_attention_tpu.data.scannet.chunks import (
        CHUNK_SIZE, CONTEXT_MARGIN, grid_chunks_for_eval,
    )

    chunk_size = CHUNK_SIZE if chunk_size is None else chunk_size
    margin = CONTEXT_MARGIN if margin is None else margin
    from pointcloud_segmentation_attention_tpu.data.scannet.scenes import (
        load_scene_mapped,
    )

    for name in val_scenes:
        sc = load_scene_mapped(data_root, name)
        out = grid_chunks_for_eval(
            sc["points"], sc["labels"], sc["colors"], sc["normals"],
            n_points, rng=np.random.RandomState(seed),
            chunk_size=chunk_size, margin=margin)
        for i in range(len(out["points"])):
            yield {k: out[k][i]
                   for k in ("points", "labels", "colors", "normals",
                             "weights")}


def make_eval_state(config: TrainConfig):
    """Template TrainState (same param/opt tree as ``train()`` builds) for
    restoring a checkpoint outside the trainer, e.g. for full-scene
    prediction (ref ``generate_predictions.py:128-130`` restores
    ``tf.train.latest_checkpoint`` into a freshly built graph)."""
    import jax.numpy as jnp

    model = select_model(config)
    # Opt-state VALUES don't matter for eval, but the tree structure must
    # match train()'s adam-with-schedule (a float lr would build a different
    # optax state tree and break restore).
    tx = optax.adam(lambda s: 1e-3)
    pts = jnp.zeros((1, config.n_points, 3), jnp.float32)
    k = 3 * int(config.use_colors) + 3 * int(config.use_normals)
    feats = jnp.zeros((1, config.n_points, k), jnp.float32) if k else None
    return create_state(model, tx, jax.random.PRNGKey(config.seed), pts,
                        feats, train=False)


def train(config: TrainConfig, max_steps: Optional[int] = None,
          max_seconds: Optional[float] = None) -> dict:
    """Run training on the configured input path (config.input: precomputed
    npz / packed store / device-resident replay / zero-precompute device
    sampler); returns summary dict.  ``max_seconds`` stops at a wall-clock
    budget (checked at step granularity; a final checkpoint is always
    written so budgeted runs are restorable)."""
    rng = jax.random.PRNGKey(config.seed)
    use_features = config.use_colors or config.use_normals
    model = select_model(config)

    train_scenes = read_split(config.split_dir, "train")
    if config.use_subset:
        train_scenes = train_scenes[: len(train_scenes) // 3]
    val_scenes = read_split(config.split_dir, "val")

    n_train = len(train_scenes)
    lr = lambda step: schedules.scannet_learning_rate(
        step, config.batch_size, n_train
    )
    bn = lambda step: schedules.scannet_bn_momentum(
        step, config.batch_size, n_train
    )
    tx = optax.adam(lr)

    mesh = parallel.make_mesh(config.n_devices)

    # Data plane: one of four input modes (config.input; see utils/config.py)
    # feeding the same step/metrics/checkpoint machinery.  For the
    # host-shipping modes the H2D transfer happens INSIDE the prefetch
    # thread (device_put is thread-safe and async) so chunk loading AND the
    # copy both overlap the device step — critical on a remote accelerator.
    mode = resolve_input_mode(config)
    wire_spec = _make_wire_spec(config)
    if mode in ("packed", "resident") and wire_spec is None:
        # Packed record paths default to the best measured wire layout.
        from pointcloud_segmentation_attention_tpu.data.wire import WireSpec

        wire_spec = WireSpec(n=config.n_points, layout="q16",
                             use_colors=config.use_colors,
                             use_normals=config.use_normals)
    sampler_scenes = None
    epochs_avail = (None if mode == "sampler"
                    else _precomputed_epochs(config.precompute_dir,
                                             train_scenes))

    if mode == "sampler":
        # ZERO-precompute: raw scenes resident in HBM; every step cuts a
        # fresh validity-checked chunk on device (train/device_sampler.py).
        # Per-step H2D: a (B,) scene-id array.
        import jax.numpy as jnp

        from pointcloud_segmentation_attention_tpu.data.scannet.scenes import (
            load_scene_mapped,
        )
        from pointcloud_segmentation_attention_tpu.train import (
            device_sampler as ds,
        )

        replay = None
        # Multi-host: each process keeps only ITS scene shard resident
        # (the reference's per-host scene lists, generator_dataset.py:12-43
        # implicit contract); batches index the LOCAL shard, so per-host
        # HBM and host RAM scale down with process_count.
        local_scenes = parallel.host_shard(train_scenes)
        sampler_scenes = ds.ResidentScenes(
            [load_scene_mapped(config.data_root, s) for s in local_scenes],
            mesh=mesh, use_colors=config.use_colors,
            use_normals=config.use_normals,
            chunk_size=config.chunk_size, margin=config.context_margin,
            budget_mb=config.sampler_budget_mb)

        def _device_batches():
            rng_np = np.random.RandomState(config.seed + 31 * jax.process_index())
            n_local = len(local_scenes)
            n_full = n_local // config.batch_size * config.batch_size
            while True:
                order = rng_np.permutation(n_local)
                for i in range(0, max(n_full, config.batch_size),
                               config.batch_size):
                    ids = np.resize(order[i:i + config.batch_size],
                                    config.batch_size).astype(np.int32)
                    yield {"scene_ids": parallel.shard_batch(
                        jnp.asarray(ids), mesh)}
    elif wire_spec is not None:
        # Packed wire: build (idempotent) and replay the memmap record store —
        # the host path per batch is one fancy-index memcpy, and the batch is
        # already the single H2D buffer (data/scannet/packstore.py).
        from pointcloud_segmentation_attention_tpu.data.scannet import (
            packstore,
        )

        pack_dir = os.path.join(
            config.precompute_dir,
            f"pack_{wire_spec.layout}_c{int(wire_spec.use_colors)}"
            f"n{int(wire_spec.use_normals)}_p{wire_spec.n}",
        )
        packstore.write_pack_from_npz(
            config.precompute_dir, pack_dir, epochs_avail, train_scenes,
            wire_spec,
        )
        reader = packstore.PackReader(pack_dir)

        if mode == "resident":
            # Whole corpus resident in HBM; per-step H2D = a (B,) index
            # array (train/device_replay.py).
            from pointcloud_segmentation_attention_tpu.train import (
                device_replay as dr,
            )

            total_mb = (reader.epochs * len(reader.scenes)
                        * wire_spec.row_nbytes) / 2**20
            if total_mb > config.device_replay_budget_mb:
                raise ValueError(
                    f"packed corpus is {total_mb:.0f} MB > "
                    f"device_replay_budget_mb={config.device_replay_budget_mb}"
                    " — raise the budget or disable device_replay"
                )
            corpus = np.concatenate(
                [reader._epoch_rows(e) for e in range(reader.epochs)])
            replay = dr.DeviceReplay(
                corpus, wire_spec, epoch_len=len(reader.scenes), mesh=mesh)

            def _device_batches():
                for idx in replay.index_stream(config.batch_size,
                                               seed=config.seed):
                    yield {"resident_idx": parallel.shard_batch(idx, mesh)}
        else:
            replay = None
            from pointcloud_segmentation_attention_tpu.data.wire import (
                WireSpec, split_wire_batch,
            )

            _, n_splits = WireSpec.from_format(
                config.wire_format, n=config.n_points,
                use_colors=config.use_colors,
                use_normals=config.use_normals,
            )

            def _device_batches():
                for host_batch in reader.replay_batches(
                        config.batch_size, shuffle_seed=config.seed):
                    yield parallel.shard_batch(
                        split_wire_batch(host_batch, n_splits), mesh)
    else:
        replay = None

        def _device_batches():
            host_iter = pipeline.batched(
                precompute.replay_train_chunks(
                    config.precompute_dir, epochs_avail, train_scenes,
                    shuffle_seed=config.seed,
                ),
                config.batch_size, config.use_colors, config.use_normals,
                wire=config.wire_format,
            )
            for host_batch in host_iter:
                yield parallel.shard_batch(host_batch, mesh)

    train_iter = pipeline.prefetch(_device_batches(), depth=4)

    first = next(train_iter)
    if wire_spec is not None or mode == "sampler":
        import jax.numpy as jnp

        k = 3 * int(config.use_colors) + 3 * int(config.use_normals)
        pts0 = jnp.zeros((1, config.n_points, 3), jnp.float32)
        feats0 = (jnp.zeros((1, config.n_points, k), jnp.float32)
                  if use_features and k else None)
        state = create_state(model, tx, rng, pts0, feats0, train=False)
    else:
        if use_features:
            if "features" not in first:
                raise ValueError(
                    "use_colors/use_normals is set but the precomputed "
                    "batches carry no 'features' array — re-run precompute "
                    "with the feature columns enabled"
                )
            feats0 = first["features"][:1]
        else:
            feats0 = None
        state = create_state(model, tx, rng, first["points"][:1], feats0,
                             train=False)
    if config.resume:
        # Continue from the newest checkpoint — periodic if present, else the
        # best-val one (the reference resumed by hand-loading a checkpoint
        # into a "_continued" log dir; here it is a flag).
        ckpt = (latest_checkpoint(config.ckpt_dir)
                or latest_checkpoint(config.ckpt_dir, prefix="best"))
        if ckpt is not None:
            state = restore_checkpoint(ckpt, state)

    if mode == "sampler":
        from pointcloud_segmentation_attention_tpu.train import (
            device_sampler as ds,
        )

        _samp_step = ds.make_sampling_train_step(
            sampler_scenes, config.n_points, mesh=mesh, bn_schedule=bn,
            lr_schedule=lr, num_classes=config.num_classes,
            remat=config.remat, augment=config.resident_augment,
        )

        def train_step(s, b, r):
            return _samp_step(s, b["scene_ids"], r)
    elif replay is not None:
        from pointcloud_segmentation_attention_tpu.train import (
            device_replay as dr,
        )

        _res_step = dr.make_resident_train_step(
            wire_spec, mesh=mesh, bn_schedule=bn, lr_schedule=lr,
            num_classes=config.num_classes, remat=config.remat,
            augment=config.resident_augment,
        )

        def train_step(s, b, r):
            return _res_step(s, replay.device_corpus, b["resident_idx"], r)
    else:
        train_step = parallel.data_parallel_jit(
            lambda s, b, r: steps.seg_train_step(s, b, r, bn_schedule=bn,
                                                 lr_schedule=lr,
                                                 num_classes=config.num_classes,
                                                 remat=config.remat,
                                                 wire_spec=wire_spec),
            mesh, batch_argnums=(1,), donate_argnums=(0,),
        )
    eval_step = parallel.data_parallel_jit(
        lambda s, b: steps.seg_eval_step(s, b, num_classes=config.num_classes,
                                         wire_spec=wire_spec),
        mesh, batch_argnums=(1,), donate_argnums=(),
    )

    logger = MetricLogger(config.log_dir, "train")
    best = BestKeeper(config.ckpt_dir)
    train_miou = StreamingMeanIoU(config.num_classes)
    dropout_rng = jax.random.fold_in(rng, 999)

    steps_per_epoch = max(1, n_train // config.batch_size)
    total_steps = max_steps or config.epochs * steps_per_epoch
    batch = first
    summary = {}
    # On-device epoch accumulators — fetched once per epoch.  A per-step host
    # fetch would serialize every step on a device->host round trip (measured
    # 354k -> >1M points/sec end-to-end by batching it).  loss/accuracy are
    # epoch MEANS like the reference's per-epoch averages
    # (ref attention_points/train.py:365-387), not the last step's values.
    conf_acc = None
    loss_acc = acc_acc = None
    train_t0 = epoch_t0 = time.perf_counter()
    step_idx = -1
    # Sampler-mode val chunks are deterministic (fixed seed): cut the full
    # val grid ONCE and replay the cache every val epoch — re-cutting is
    # O(total val points) host numpy per validation (a multi-minute stall
    # at the reference's 312-scene val set).
    val_chunk_cache = None

    def _sampler_val_iter():
        nonlocal val_chunk_cache
        gen = _onfly_val_chunks(
            config.data_root, val_scenes, config.n_points,
            chunk_size=config.chunk_size, margin=config.context_margin)
        if not config.cache_val_chunks:
            return gen
        if val_chunk_cache is None:
            val_chunk_cache = list(gen)
        return iter(val_chunk_cache)
    for step_idx in range(total_steps):
        if (max_seconds is not None
                and time.perf_counter() - train_t0 > max_seconds):
            step_idx -= 1  # this step did not run
            break
        state, m = train_step(state, batch, dropout_rng)
        batch = next(train_iter)  # already on device (prefetch thread)
        conf_acc = m["confusion"] if conf_acc is None else conf_acc + m["confusion"]
        loss_acc = m["loss"] if loss_acc is None else loss_acc + m["loss"]
        acc_acc = m["accuracy"] if acc_acc is None else acc_acc + m["accuracy"]

        epoch_end = (step_idx + 1) % steps_per_epoch == 0
        if epoch_end:
            epoch = (step_idx + 1) // steps_per_epoch
            train_miou.update_confusion(conf_acc)  # syncs the queued steps
            conf_acc = None
            miou, _ = train_miou.result()
            epoch_s = max(time.perf_counter() - epoch_t0, 1e-9)
            steps_this_epoch = steps_per_epoch if step_idx + 1 >= steps_per_epoch \
                else (step_idx + 1)
            summary["final_train_loss"] = float(loss_acc) / steps_this_epoch
            logger.log(step_idx + 1, {
                "train_loss": summary["final_train_loss"],
                "train_accuracy": float(acc_acc) / steps_this_epoch,
                "train_miou": miou,
                "learning_rate": float(m["learning_rate"]),
                # honest end-to-end rate: epoch wall time incl. host pipeline
                "points_per_sec": steps_this_epoch * config.batch_size
                                  * config.n_points / epoch_s,
            })
            epoch_t0 = time.perf_counter()
            train_miou.reset()
            loss_acc = acc_acc = None
            if config.save_every_epochs and epoch % config.save_every_epochs == 0:
                save_checkpoint(config.ckpt_dir, state, step_idx + 1)
            if epoch % config.n_epochs_to_val == 0:
                val_iter = (_sampler_val_iter()
                            if mode == "sampler" else None)
                val = evaluate(config, state, eval_step, mesh, val_scenes,
                               chunk_iter=val_iter)
                logger.log(step_idx + 1, {f"val_{k}": v for k, v in val.items()})
                if best.maybe_save(state, step_idx + 1, val["miou"]):
                    summary["best_val_miou"] = val["miou"]
    logger.close()
    if max_seconds is not None and step_idx + 1 < total_steps:
        # Budgeted run stopped mid-schedule: persist the final state so the
        # matched-cost experiments (and resume) can pick it up.
        save_checkpoint(config.ckpt_dir, state, step_idx + 1)
    summary["final_step"] = int(state.step)
    summary.setdefault("best_val_miou", best.best if best.best > -np.inf else None)
    return summary


def evaluate(config: TrainConfig, state, eval_step, mesh, val_scenes,
             chunk_iter=None) -> dict:
    """Full val pass over precomputed val chunks (ref eval_model :221-285);
    ``chunk_iter`` overrides the chunk source (the sampler mode cuts val
    chunks on the fly — no precompute dir exists)."""
    miou = StreamingMeanIoU(config.num_classes)
    it = pipeline.batched(
        chunk_iter if chunk_iter is not None
        else precompute.replay_val_chunks(config.precompute_dir, val_scenes),
        config.batch_size, config.use_colors, config.use_normals,
        pad_final=True, wire=config.wire_format,
    )
    # Accumulate loss/accuracy/confusion ON DEVICE and fetch once at the end
    # of the pass — a per-batch float() would re-introduce the host sync the
    # train loop removed (one sync per val pass, not per batch).
    conf = loss_sum = acc_sum = None
    n_batches = 0
    for batch in pipeline.prefetch(it):
        m = eval_step(state, parallel.shard_batch(batch, mesh))
        conf = m["confusion"] if conf is None else conf + m["confusion"]
        loss_sum = m["loss"] if loss_sum is None else loss_sum + m["loss"]
        acc_sum = m["accuracy"] if acc_sum is None else acc_sum + m["accuracy"]
        n_batches += 1
    if n_batches:
        miou.update_confusion(conf)
    mean_iou, _ = miou.result()
    return {
        "miou": mean_iou,
        "loss": float(loss_sum) / n_batches if n_batches else 0.0,
        "accuracy": float(acc_sum) / n_batches if n_batches else 0.0,
    }


def _precomputed_epochs(precompute_dir: str, scenes) -> int:
    """Count how many precomputed epochs exist for the first scene."""
    n = 0
    while os.path.exists(os.path.join(precompute_dir, f"{n}-{scenes[0]}.npz")):
        n += 1
    if n == 0:
        raise FileNotFoundError(
            f"no precomputed chunks in {precompute_dir}; run "
            "`python -m pointcloud_segmentation_attention_tpu.data.scannet.precompute_cli`"
        )
    return n


def main(argv=None):
    config = TrainConfig.from_args(argv)
    os.makedirs(config.log_dir, exist_ok=True)
    with open(os.path.join(config.log_dir, "config.json"), "w") as f:
        f.write(config.to_json())
    summary = train(config)
    print(summary)


if __name__ == "__main__":
    main()
