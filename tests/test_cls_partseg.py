"""Tests: ModelNet/ShapeNet loaders + classification/part-seg train steps."""
import numpy as np
import jax
import optax
import pytest

from pointcloud_segmentation_attention_tpu import models
from pointcloud_segmentation_attention_tpu.data import modelnet, shapenet_part
from pointcloud_segmentation_attention_tpu.train import (
    cls_eval_step,
    cls_train_step,
    create_state,
    partseg_train_step,
)
from pointcloud_segmentation_attention_tpu.eval.part_iou import PartIoUAccumulator


@pytest.fixture(scope="module")
def modelnet_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("modelnet"))
    modelnet.write_synthetic_modelnet(root, num_classes=4, shapes_per_class=3,
                                      n_points=128)
    return root


@pytest.fixture(scope="module")
def shapenet_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shapenet"))
    shapenet_part.write_synthetic_shapenet_part(root, n_shapes_per_cat=4,
                                                n_points=64)
    return root


def test_modelnet_txt_dataset(modelnet_root):
    ds = modelnet.ModelNetDataset(modelnet_root, batch_size=4, npoints=128,
                                  split="train", normal_channel=True)
    assert len(ds) == 8  # 4 classes x 2 train shapes
    assert ds.num_channel() == 6
    batch, labels, bsize = ds.next_batch(augment_data=True)
    assert batch.shape == (4, 128, 6)
    assert labels.shape == (4,)
    # Normalized to unit sphere before augment: xyz within a loose bound.
    assert np.abs(batch[:, :, :3]).max() < 2.5
    # epoch iteration terminates
    ds.reset()
    count = 0
    while ds.has_next_batch():
        ds.next_batch()
        count += 1
    assert count == 2


def test_modelnet_h5_dataset(modelnet_root, tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.RandomState(0)
    path = str(tmp_path / "shard0.h5")
    with h5py.File(path, "w") as f:
        f["data"] = rng.rand(10, 128, 3).astype(np.float32)
        f["label"] = rng.randint(0, 4, size=(10, 1))
    listfile = str(tmp_path / "files.txt")
    with open(listfile, "w") as f:
        f.write("shard0.h5\n")
    ds = modelnet.ModelNetH5Dataset(listfile, batch_size=4, npoints=128)
    batches = 0
    while ds.has_next_batch():
        batch, labels, bsize = ds.next_batch(augment_data=True)
        assert batch.shape == (4, 128, 3)
        batches += 1
    assert batches == 3


def test_shapenet_part_dataset(shapenet_root):
    ds = shapenet_part.PartNormalDataset(shapenet_root, npoints=64,
                                         split="train", return_cls_label=True)
    assert len(ds) == 4  # 2 cats x 2 train shapes
    p, n, s, c = ds[0]
    assert p.shape == (64, 3) and n.shape == (64, 3) and s.shape == (64,)
    name = ds.category_of(0)
    from pointcloud_segmentation_attention_tpu.eval.part_iou import SEG_CLASSES
    assert set(np.unique(s)).issubset(set(SEG_CLASSES[name]))
    batches = list(ds.batches(2))
    assert len(batches) == 2
    pts, seg, cls, bsize = batches[0]
    assert pts.shape == (2, 64, 6)


def test_cls_train_step_learns(modelnet_root):
    ds = modelnet.ModelNetDataset(modelnet_root, batch_size=8, npoints=128,
                                  split="train")
    batch_np, labels, _ = ds.next_batch()
    import jax.numpy as jnp
    batch = {"points": jnp.asarray(batch_np), "labels": jnp.asarray(labels)}
    model = models.ClsSSG(num_classes=4)
    state = create_state(model, optax.adam(1e-3), jax.random.PRNGKey(0),
                         batch["points"], None, train=False)
    step = jax.jit(cls_train_step)
    losses = []
    for _ in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    ev = jax.jit(cls_eval_step)(state, batch)
    assert ev["predictions"].shape == (8,)


def test_pointnet1_cls_step_with_ortho_reg():
    import jax.numpy as jnp
    from functools import partial
    rng = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rng.rand(4, 64, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 40, 4)),
    }
    model = models.pointnet1.PointNetCls()
    state = create_state(model, optax.adam(1e-3), jax.random.PRNGKey(0),
                         batch["points"], train=False)
    step = jax.jit(partial(cls_train_step, reg_weight=0.001))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_partseg_train_step_with_onehot(shapenet_root):
    import jax.numpy as jnp
    ds = shapenet_part.PartNormalDataset(shapenet_root, npoints=64, split="train")
    pts, seg, cls, _ = next(ds.batches(2))
    batch = {
        "points": jnp.asarray(pts),
        "labels": jnp.asarray(seg),
        "cls": jnp.asarray(cls),
    }
    model = models.PartSegMSGOneHot()
    state = create_state(model, optax.adam(1e-3), jax.random.PRNGKey(0),
                         batch["points"], batch["cls"], train=False)
    step = jax.jit(partseg_train_step)
    losses = []
    for _ in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(2))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_partseg_eval_with_part_iou(shapenet_root):
    import jax.numpy as jnp
    from pointcloud_segmentation_attention_tpu.train import partseg_eval_step
    ds = shapenet_part.PartNormalDataset(shapenet_root, npoints=64, split="test")
    pts, seg, cls, _ = next(ds.batches(2, shuffle=False))
    model = models.PartSegSSG()
    state = create_state(model, optax.adam(1e-3), jax.random.PRNGKey(0),
                         jnp.asarray(pts), train=False)
    out = jax.jit(partseg_eval_step)(state, {"points": jnp.asarray(pts),
                                             "labels": jnp.asarray(seg)})
    acc = PartIoUAccumulator()
    cats = sorted(ds.classes, key=lambda c: ds.classes[c])
    for i in range(2):
        acc.add_shape(np.asarray(out["logits"][i]), seg[i], cats[cls[i]])
    res = acc.result()
    assert 0.0 <= res["instance_avg_iou"] <= 1.0
