"""Forward-shape smoke tests for the model zoo on tiny point clouds."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_attention_tpu import models

TINY_HIER = dict(
    sa_npoints=(32, 16, 8, 4),
    sa_radii=(0.1, 0.2, 0.4, 0.8),
    sa_nsample=8,
    sa_mlps=((8, 8), (8, 16), (16, 16), (16, 32)),
    fp_mlps=((16,), (16,), (16,), (16, 16)),
)

KEYS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def _xyz(b=2, n=64, c=3, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(b, n, c).astype(np.float32))


@pytest.mark.parametrize(
    "factory",
    ["sem_seg", "sem_seg_features", "sem_seg_attention", "sem_seg_attention_and_pooling"],
)
def test_sem_seg_variants(factory):
    kwargs = dict(TINY_HIER)
    model = models.get_model(factory, num_classes=21, **kwargs)
    xyz = _xyz()
    feats = _xyz(c=6, seed=1) if factory == "sem_seg_features" else None
    variables = model.init(KEYS, xyz, feats, train=False)
    logits = model.apply(variables, xyz, feats, train=False)
    assert logits.shape == (2, 64, 21)
    assert np.isfinite(np.asarray(logits)).all()


def test_sem_seg_single_layer_attention():
    model = models.get_model(
        "sem_seg_attention_single_layer", layer_idx=2, num_classes=21, **TINY_HIER
    )
    assert model.sa_pooling == ("max", "max", "attention", "max")
    xyz = _xyz()
    variables = model.init(KEYS, xyz, None, train=False)
    logits = model.apply(variables, xyz, None, train=False)
    assert logits.shape == (2, 64, 21)


def test_cls_ssg():
    model = models.ClsSSG(num_classes=40)
    xyz = _xyz(n=128)
    variables = model.init(KEYS, xyz, train=False)
    logits = model.apply(variables, xyz, train=False)
    assert logits.shape == (2, 40)
    assert np.isfinite(np.asarray(logits)).all()


def test_cls_msg_with_normals():
    model = models.ClsMSG(num_classes=40)
    xyz = _xyz(n=128)
    normals = _xyz(n=128, seed=2)
    variables = model.init(KEYS, xyz, normals, train=False)
    logits = model.apply(variables, xyz, normals, train=False)
    assert logits.shape == (2, 40)


def test_part_seg_ssg():
    model = models.PartSegSSG()
    pc = _xyz(n=128, c=6)
    variables = model.init(KEYS, pc, train=False)
    logits = model.apply(variables, pc, train=False)
    assert logits.shape == (2, 128, 50)


def test_part_seg_msg_one_hot():
    model = models.PartSegMSGOneHot()
    pc = _xyz(n=128, c=6)
    cls_label = jnp.asarray([3, 7])
    variables = model.init(KEYS, pc, cls_label, train=False)
    logits = model.apply(variables, pc, cls_label, train=False)
    assert logits.shape == (2, 128, 50)


@pytest.mark.parametrize("name", ["attention_net", "attention_net_mlp", "pooling_attention_net"])
def test_attention_net_models(name):
    model = models.get_model(name, num_classes=21)
    xyz = _xyz(b=1, n=64)
    variables = model.init(KEYS, xyz, None, train=False)
    logits = model.apply(variables, xyz, None, train=False)
    assert logits.shape == (1, 64, 21)


def test_pointnet1_cls_basic():
    model = models.pointnet1.PointNetClsBasic()
    xyz = _xyz(n=128)
    variables = model.init(KEYS, xyz, train=False)
    logits = model.apply(variables, xyz, train=False)
    assert logits.shape == (2, 40)


def test_pointnet1_cls_with_tnets_and_ortho_loss():
    model = models.pointnet1.PointNetCls()
    xyz = _xyz(n=128)
    variables = model.init(KEYS, xyz, train=False)
    logits, end_points = model.apply(variables, xyz, train=False)
    assert logits.shape == (2, 40)
    t = end_points["transform"]
    assert t.shape == (2, 64, 64)
    # At init the transform params are zero => transform == identity => loss 0.
    loss = models.pointnet1.orthogonality_loss(t)
    # BN shifts make it not exactly identity, just check finite & small-ish
    assert np.isfinite(float(loss))


def test_pointnet1_seg():
    model = models.pointnet1.PointNetSeg()
    xyz = _xyz(n=128)
    variables = model.init(KEYS, xyz, train=False)
    logits, _ = model.apply(variables, xyz, train=False)
    assert logits.shape == (2, 128, 50)


def test_pointnet1_sem_seg():
    model = models.pointnet1.PointNetSemSeg()
    pc = _xyz(n=128, c=9)
    variables = model.init(KEYS, pc, train=False)
    logits = model.apply(variables, pc, train=False)
    assert logits.shape == (2, 128, 13)


def test_registry_lists_all():
    names = models.available_models()
    for expected in [
        "sem_seg", "sem_seg_features", "sem_seg_attention",
        "sem_seg_attention_single_layer", "sem_seg_attention_and_pooling",
        "cls_ssg", "cls_msg", "part_seg", "part_seg_msg_one_hot",
        "attention_net", "attention_net_mlp", "pooling_attention_net",
        "pointnet1_cls_basic", "pointnet1_cls", "pointnet1_seg", "pointnet1_sem_seg",
    ]:
        assert expected in names
