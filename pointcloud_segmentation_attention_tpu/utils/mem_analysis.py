"""HBM footprint of the flagship train step vs remat mode (AOT analysis).

AOT-compiles ``seg_train_step`` at the reference training geometry for each
``remat`` mode and prints XLA's compiled memory analysis — the measured basis
for the ``TrainConfig.remat`` documentation (activation HBM traded for
recompute FLOPs).  Run on TPU::

    python -m pointcloud_segmentation_attention_tpu.utils.mem_analysis \
        [--batch 16] [--n 8192]

Uses ``jax.jit(...).lower(...).compile().memory_analysis()``.  No step is
executed, but compilation still claims the (exclusively leased) device —
run it alone, like any other TPU process here.
"""
from __future__ import annotations

import argparse
from functools import partial


def analyze(b: int = 16, n: int = 8192, modes=("none", "dots", "full")):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pointcloud_segmentation_attention_tpu import models
    from pointcloud_segmentation_attention_tpu.train import (
        create_state,
        make_sample_weights,
        seg_train_step,
    )

    rng = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rng.rand(b, n, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 21, (b, n)).astype(np.int32)),
        "features": jnp.asarray(rng.rand(b, n, 6).astype(np.float32)),
    }
    batch["weights"] = make_sample_weights(
        batch["labels"], jnp.ones((b, n), jnp.float32)
    )
    model = models.get_model("sem_seg_features", num_classes=21)
    state = create_state(model, optax.adam(1e-3), jax.random.PRNGKey(0),
                         batch["points"][:1], batch["features"][:1],
                         train=False)
    key = jax.random.PRNGKey(0)

    rows = []
    for mode in modes:
        step = jax.jit(partial(seg_train_step, remat=mode),
                       donate_argnums=(0,))
        compiled = step.lower(state, batch, key).compile()
        ma = compiled.memory_analysis()
        if ma is None:
            raise RuntimeError(
                f"memory_analysis() unsupported on backend "
                f"{jax.default_backend()!r} — run on TPU"
            )
        rows.append({
            "remat": mode,
            "temp_mb": ma.temp_size_in_bytes / 2**20,
            "argument_mb": ma.argument_size_in_bytes / 2**20,
            "output_mb": ma.output_size_in_bytes / 2**20,
            # NOT XLA's true peak: with donate_argnums the output aliases
            # donated args, so temp+args over-counts.  Labelled accordingly.
            "temp_plus_args_mb": (
                ma.temp_size_in_bytes + ma.argument_size_in_bytes) / 2**20,
        })
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n", type=int, default=8192)
    args = p.parse_args(argv)
    rows = analyze(args.batch, args.n)
    print(f"{'remat':8s} {'temp MB':>10s} {'args MB':>10s} "
          f"{'temp+args MB':>13s}")
    for r in rows:
        print(f"{r['remat']:8s} {r['temp_mb']:10.1f} {r['argument_mb']:10.1f} "
              f"{r['temp_plus_args_mb']:13.1f}")


if __name__ == "__main__":
    main()
