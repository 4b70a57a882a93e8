"""Golden fixed-weights activation parity of the attention layers against
literal numpy ports of the reference (attention_layer.py:10-125).

VERDICT r2 weak #4: this separates "faithfully-reproduced weak architecture"
from "our bug" — the quirky head-mixing reshape, the missing out-projection,
and the V-reshaped-with-key_dim behaviours are each asserted numerically.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_segmentation_attention_tpu.nn.attention import (
    AttentionPool, FeedForward, InnerAttention, InnerAttentionBlock,
)
from oracles import (
    attention_pool_oracle, feed_forward_oracle, inner_attention_oracle,
)


def _dense_wb(params, name):
    p = params[name]
    return np.asarray(p["kernel"]), np.asarray(p["bias"])


def test_attention_pool_matches_reference_port():
    b, npt, s, c = 2, 6, 8, 12
    h, kd = 16, 4
    rng = np.random.RandomState(0)
    inp = rng.randn(b, npt, s, c).astype(np.float32)
    query = inp[:, :, :1, :]  # first group element, as tf.gather(.., [0], axis=2)

    mod = AttentionPool(output_dim=kd, key_dim=kd, num_heads=h)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(inp), jnp.asarray(query))
    got = np.asarray(mod.apply(params, jnp.asarray(inp), jnp.asarray(query)))

    p = params["params"]
    want = attention_pool_oracle(
        inp, query, *_dense_wb(p, "query_net"), *_dense_wb(p, "key_net"),
        *_dense_wb(p, "value_net"), num_heads=h, key_dim=kd,
    )
    assert got.shape == (b, npt, h * kd)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_attention_pool_head_split_is_raw_reshape():
    # The reference's head split is a raw row-major reshape, NOT a
    # transpose-correct (.., S, h, kd) split.  A transpose-correct
    # implementation would differ; prove ours is the raw one by comparing
    # against an explicitly transpose-correct variant and asserting mismatch.
    b, npt, s, c = 1, 2, 4, 8
    h, kd = 4, 4
    rng = np.random.RandomState(3)
    inp = rng.randn(b, npt, s, c).astype(np.float32)
    query = inp[:, :, :1, :]
    mod = AttentionPool(output_dim=kd, key_dim=kd, num_heads=h)
    params = mod.init(jax.random.PRNGKey(2), jnp.asarray(inp), jnp.asarray(query))
    got = np.asarray(mod.apply(params, jnp.asarray(inp), jnp.asarray(query)))

    p = params["params"]
    wq, bq = _dense_wb(p, "query_net")
    wk, bk = _dense_wb(p, "key_net")
    wv, bv = _dense_wb(p, "value_net")

    def transpose_correct(inp, query):
        q = (query @ wq + bq).reshape(b, npt, 1, h, kd).transpose(0, 1, 3, 2, 4)
        k = (inp @ wk + bk).reshape(b, npt, s, h, kd).transpose(0, 1, 3, 2, 4)
        v = (inp @ wv + bv).reshape(b, npt, s, h, kd).transpose(0, 1, 3, 2, 4)
        w = (q @ np.swapaxes(k, -1, -2)) / np.sqrt(np.float32(kd))
        e = np.exp(w - w.max(-1, keepdims=True))
        w = e / e.sum(-1, keepdims=True)
        return (w @ v).transpose(0, 1, 3, 2, 4).reshape(b, npt, h * kd)

    alt = transpose_correct(inp, query)
    raw = attention_pool_oracle(inp, query, wq, bq, wk, bk, wv, bv, h, kd)
    np.testing.assert_allclose(got, raw, rtol=2e-5, atol=2e-5)
    assert np.abs(alt - raw).max() > 1e-3  # the quirk is observable


def test_inner_attention_matches_reference_port():
    b, npt, s, c = 2, 3, 5, 10
    h, kd = 5, 4
    out_dim = 10
    rng = np.random.RandomState(1)
    x = rng.randn(b, npt, s, c).astype(np.float32)

    mod = InnerAttention(output_dim=out_dim, key_dim=kd, num_heads=h)
    params = mod.init(jax.random.PRNGKey(4), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = params["params"]
    want = inner_attention_oracle(
        x, *_dense_wb(p, "query_net"), *_dense_wb(p, "key_net"),
        *_dense_wb(p, "value_net"), *_dense_wb(p, "out_net"),
        num_heads=h, key_dim=kd,
    )
    assert got.shape == (b, npt, s, out_dim)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_feed_forward_matches_reference_port():
    b, npt, s, c = 2, 3, 4, 6
    inner = 8
    rng = np.random.RandomState(2)
    x = rng.randn(b, npt, s, c).astype(np.float32)
    mod = FeedForward(input_and_output_dim=c, inner_dim=inner)
    params = mod.init(jax.random.PRNGKey(5), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    p = params["params"]
    want = feed_forward_oracle(
        x, [_dense_wb(p, f"layer_{i}") for i in (1, 2, 3, 4)])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_inner_attention_block_composition():
    # pre-FF -> inner attention -> FF + residual (ref :118-125, incl. the
    # no-BN / no-skip-on-attention TODOs left unimplemented there).
    b, npt, s, c = 1, 2, 4, 6
    kd = 4
    rng = np.random.RandomState(6)
    x = rng.randn(b, npt, s, c).astype(np.float32)
    mod = InnerAttentionBlock(out_dim=c, key_dim=kd)
    params = mod.init(jax.random.PRNGKey(7), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = params["params"]
    pre = feed_forward_oracle(
        x, [_dense_wb(p["pre_feed_forward"], f"layer_{i}") for i in (1, 2, 3, 4)])
    att = inner_attention_oracle(
        pre, *_dense_wb(p["attention"], "query_net"),
        *_dense_wb(p["attention"], "key_net"),
        *_dense_wb(p["attention"], "value_net"),
        *_dense_wb(p["attention"], "out_net"), num_heads=5, key_dim=kd,
    )
    ff = feed_forward_oracle(
        att, [_dense_wb(p["feed_forward"], f"layer_{i}") for i in (1, 2, 3, 4)])
    np.testing.assert_allclose(got, ff + att, rtol=2e-5, atol=2e-5)
