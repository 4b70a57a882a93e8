"""Device-resident chunk replay: the end of the host-pipeline wall.

Measured on this environment's remote-tunneled chip (``utils/h2d_bench``):
the host->device link does ~80 ms/transfer latency and tens of MB/s — so
ANY input pipeline that ships each training point per step is capped at
~2-3M pts/s against a 6M pts/s device step.  The TPU-native fix is to stop
shipping points per step: the packed q16 record corpus is small (ScanNet:
1201 scenes x 8192 pts x 14 B ≈ 138 MB *per precomputed epoch*, so tens of
epochs fit in spare HBM next to the ~1.3 GB step working set) — upload it
ONCE, keep it resident, and let each jitted step gather its batch rows by
index from the resident buffer.  Per-step H2D traffic: one (B,) int32
index array (64 bytes).

Epoch/shuffle semantics mirror ``precompute.replay_train_chunks`` +
``packstore.PackReader``: each pass walks the uploaded epochs with a fresh
per-epoch permutation.

This is the production replacement for the reference's pickled-chunk replay
(``precompute_dataset.py:149-271``, its answer to the same bottleneck,
Report.pdf §3.3) when HBM allows; the packed wire path (``data/wire.py``)
remains for corpora larger than device memory.
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from pointcloud_segmentation_attention_tpu.data.wire import WireSpec


def corpus_nbytes(n_rows: int, spec: WireSpec) -> int:
    return n_rows * spec.row_nbytes


class DeviceReplay:
    """Upload a packed record corpus once; stream per-step batch indices.

    corpus: (K, row_nbytes) u8 (e.g. from ``packstore.PackReader`` epoch
    files, or ``wire.pack_chunks``).  ``epoch_len`` rows form one epoch
    (default: all K) — the permutation reshuffles every epoch.
    """

    def __init__(self, corpus: np.ndarray, spec: WireSpec,
                 epoch_len: Optional[int] = None, mesh=None):
        import jax

        self.spec = spec
        self.n_rows = int(corpus.shape[0])
        self.epoch_len = int(epoch_len or self.n_rows)
        if not 0 < self.epoch_len <= self.n_rows:
            raise ValueError(
                f"epoch_len {self.epoch_len} outside (0, {self.n_rows}] — "
                f"out-of-range indices would be silently clamped by the "
                f"on-device gather"
            )
        if mesh is not None:
            # Replicate across the mesh so a dp step can gather any row on
            # every device (the corpus is small; activations dominate HBM).
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.device_corpus = jax.device_put(
                corpus, NamedSharding(mesh, P()))
        else:
            self.device_corpus = jax.device_put(corpus)

    def index_stream(self, batch_size: int, seed: int = 0) -> Iterator[np.ndarray]:
        """Infinite (B,) int32 batch-index stream with per-epoch reshuffle;
        remainder rows carry into the next epoch's batches."""
        rng = np.random.RandomState(seed)
        carry = np.empty((0,), np.int64)
        # Cover ALL rows: a trailing partial epoch keeps its (shorter) slot
        # instead of being silently dropped.
        bases = list(range(0, self.n_rows, self.epoch_len))
        while True:
            for base in bases:
                length = min(self.epoch_len, self.n_rows - base)
                order = base + rng.permutation(length)
                order = np.concatenate([carry, order])
                n_full = len(order) // batch_size * batch_size
                for i in range(0, n_full, batch_size):
                    yield order[i:i + batch_size].astype(np.int32)
                carry = order[n_full:]


def gather_batch(device_corpus, idx, spec: WireSpec) -> dict:
    """(K, row) resident u8 corpus + (B,) indices -> standard batch dict,
    entirely on device (jit-safe; fuses into the consuming step)."""
    from pointcloud_segmentation_attention_tpu.data.wire import unpack_batch

    rows = device_corpus[idx]          # (B, row_nbytes) on-device gather
    return unpack_batch(rows, spec)


def rotate_batch_z(batch: dict, spec: WireSpec, rng) -> dict:
    """Fresh per-sample random z-rotation of a resident batch, ON DEVICE.

    Precomputed chunks bake ONE rotation per (epoch, scene)
    (``chunks.random_z_rotation``, ref data_transformation.py:334-352);
    with the corpus resident, re-rotating per step costs one fused 2x2
    matmul and multiplies augmentation diversity by the number of visits —
    diversity the reference's pickle pipeline could not afford.  Rotates
    points and (when present) the normals columns of the feature concat,
    exactly the host rotation's semantics."""
    import jax
    import jax.numpy as jnp

    b = batch["points"].shape[0]
    angle = jax.random.uniform(rng, (b,), jnp.float32, 0.0, 2.0 * jnp.pi)
    c, s = jnp.cos(angle)[:, None], jnp.sin(angle)[:, None]

    def rot(v):  # (B, N, 3) rotated about z by the per-sample angle
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        return jnp.stack([x * c + y * s, -x * s + y * c, z], axis=-1)

    out = dict(batch)
    out["points"] = rot(batch["points"])
    if spec.use_normals and "features" in batch:
        off = 3 * int(spec.use_colors)
        feats = batch["features"]
        out["features"] = jnp.concatenate(
            [feats[..., :off], rot(feats[..., off:off + 3]),
             feats[..., off + 3:]], axis=-1)
    return out


def make_resident_train_step(spec: WireSpec, mesh=None, donate=True,
                             augment=False, **step_kwargs):
    """jit ``(state, corpus, idx, rng) -> (state, metrics)``: the standard
    segmentation train step reading its batch from the resident corpus.

    With a mesh, the state is replicated, the corpus replicated, and the
    index array sharded over ``data`` — each device gathers only its rows.
    ``augment=True`` applies a fresh per-sample z-rotation each step
    (``rotate_batch_z``; folded from the step's rng and the optimizer step,
    so every visit to a chunk sees a new orientation).
    """
    import jax

    from pointcloud_segmentation_attention_tpu.train.steps import (
        seg_train_step,
    )

    def step(state, corpus, idx, rng):
        batch = gather_batch(corpus, idx, spec)
        if augment:
            aug_rng = jax.random.fold_in(
                jax.random.fold_in(rng, 77), state.step)
            batch = rotate_batch_z(batch, spec, aug_rng)
        return seg_train_step(state, batch, rng, **step_kwargs)

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(repl, repl, NamedSharding(mesh, P("data")), repl),
        donate_argnums=donate_argnums,
    )
