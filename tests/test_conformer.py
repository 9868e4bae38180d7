"""ResNet-Conformer encoder tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adyolo_tpu.models.resnet_conformer import ResNetConformer
from adyolo_tpu.models.wrapper import SELDModel


@pytest.fixture(scope="module")
def enc():
    model = ResNetConformer()
    x = jnp.zeros((1, 16, 64, 7))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    return model, variables


def test_shapes(enc):
    model, variables = enc
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 64, 7)), jnp.float32)
    y = model.apply(variables, x, False)
    assert y.shape == (2, 4, 256)
    assert np.isfinite(np.asarray(y)).all()


def test_varlen_masking_matches_exact(enc):
    model, variables = enc
    rng = np.random.default_rng(1)
    T_short, T_long = 8, 16
    xs = rng.standard_normal((1, T_short, 64, 7)).astype(np.float32)
    xp = np.zeros((1, T_long, 64, 7), np.float32)
    xp[:, :T_short] = xs
    exact = model.apply(variables, jnp.asarray(xs), False,
                        feat_lengths=jnp.array([T_short]))
    padded = model.apply(variables, jnp.asarray(xp), False,
                         feat_lengths=jnp.array([T_short]))
    np.testing.assert_allclose(np.asarray(padded)[:, : T_short // 4],
                               np.asarray(exact), atol=3e-5)


def test_full_model_with_conformer_encoder():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 64, 7)), jnp.float32)
    m = SELDModel(encoder_nm="resnet-conformer", loss_nm="adyolo", nb_classes=13)
    v = m.init(jax.random.PRNGKey(0), x, False)
    y = m.apply(v, x, False)
    assert y.shape == (1, 4, 8 * 4 * 5 * 16)
    # train mode w/ dropout + BN mutation works
    y2, mut = m.apply(v, x, True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in mut


def test_param_scale():
    """The conformer encoder should be in the tens-of-millions range
    (ResNet34 ~21M + 8 conformer blocks)."""
    model = ResNetConformer()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 64, 7)), False)
    n = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert 20e6 < n < 60e6, n


def test_mhsa_blocked_eval_matches_fused(monkeypatch):
    """Long-clip eval attention (lax.map over query blocks, activated
    above BLOCK_THRESHOLD frames) must equal the fused path exactly —
    same softmax rows and matmuls, just bounded peak memory."""
    from adyolo_tpu.models.resnet_conformer import MHSA

    rng = np.random.default_rng(0)
    B, T, D = 2, 160, 32
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lens = jnp.array([160, 112])
    mask = jnp.arange(T)[None, :] < lens[:, None]
    m = MHSA(D)
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, False)

    fused = m.apply(variables, x, False)
    fused_m = m.apply(variables, x, False, frame_mask=mask)
    monkeypatch.setattr(MHSA, "BLOCK_THRESHOLD", 100)  # force blocked (bq=80)
    blocked = m.apply(variables, x, False)
    blocked_m = m.apply(variables, x, False, frame_mask=mask)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(fused),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(blocked_m), np.asarray(fused_m),
                               atol=2e-6)

    # train mode keeps the fused path (dropout needs the full prob tensor)
    tr = m.apply(variables, x, True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert tr.shape == fused.shape


def test_mhsa_flash_auto_routing(monkeypatch):
    """flash="auto" (the round-4 default, PLAN.md "Round 4 — A/B
    decisions") must resolve by backend: bit-identical to flash="0" on
    CPU, and the Pallas kernel exactly when the default backend reports
    TPU (pinned by stubbing the kernel — CPU cannot execute Mosaic).
    Guards the +4.3% A/B win against silent misrouting."""
    import adyolo_tpu.models.resnet_conformer as rc

    rng = np.random.default_rng(0)
    B, T, D = 2, 48, 32  # T % 8 == 0, so only the backend gate decides
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    m_auto = rc.MHSA(D, flash="auto")
    variables = m_auto.init({"params": jax.random.PRNGKey(0)}, x, False)

    out_auto = m_auto.apply(variables, x, False)
    out_off = rc.MHSA(D, flash="0").apply(variables, x, False)
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_off))

    calls = []

    def fake_kernel(q, k, v, mask, rate=0.0, rng_key=None):
        calls.append(q.shape)
        return jnp.zeros(q.shape, q.dtype)

    monkeypatch.setattr(rc, "flash_mhsa", fake_kernel)
    monkeypatch.setattr(rc.jax, "default_backend", lambda: "tpu")
    m_auto.apply(variables, x, False)
    assert calls == [(B, T, 4, D // 4)]
    # flash="0" must keep the XLA path even on a TPU backend
    calls.clear()
    rc.MHSA(D, flash="0").apply(variables, x, False)
    assert calls == []


@pytest.mark.slow
def test_remat_exactness():
    """nn.remat is semantics-preserving: same forward and same gradients,
    only the backward's memory/recompute schedule changes."""
    from adyolo_tpu.models.resnet_conformer import ResNetConformer

    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 16, 64, 7)).astype(np.float32))
    m0 = ResNetConformer(num_layers=2)
    m1 = ResNetConformer(num_layers=2, remat=True)
    vs = m0.init({"params": jax.random.PRNGKey(0)}, x, False)

    o0 = m0.apply(vs, x, False)
    o1 = m1.apply(vs, x, False)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

    def loss(mdl, params):
        out, _ = mdl.apply({**vs, "params": params}, x, True,
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(vs["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(vs["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_conf_packed_stages_exactness():
    """Packed-resident layer1 interior (ADYOLO_CONF_PACKED=1) must be
    numerically equivalent to the per-conv path and leave the param tree
    unchanged (checkpoint compatibility)."""
    from adyolo_tpu.models.resnet_conformer import ResNetConformer

    x = jnp.asarray(np.random.default_rng(6).standard_normal(
        (1, 16, 64, 7)).astype(np.float32))
    m0 = ResNetConformer(num_layers=1, conf_packed_stages=False)
    m1 = ResNetConformer(num_layers=1, conf_packed_stages=True)
    vs = m0.init({"params": jax.random.PRNGKey(0)}, x, False)
    vs1 = m1.init({"params": jax.random.PRNGKey(0)}, x, False)
    assert (jax.tree.structure(vs["params"])
            == jax.tree.structure(vs1["params"]))
    for a, b in zip(jax.tree.leaves(vs["params"]),
                    jax.tree.leaves(vs1["params"])):
        assert a.shape == b.shape

    o0 = m0.apply(vs, x, False)
    o1 = m1.apply(vs, x, False)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=2e-5,
                               rtol=1e-5)

    # masked variable-length input follows the same path
    lens = jnp.array([12])
    o0m = m0.apply(vs, x, False, feat_lengths=lens)
    o1m = m1.apply(vs, x, False, feat_lengths=lens)
    np.testing.assert_allclose(np.asarray(o0m), np.asarray(o1m), atol=2e-5,
                               rtol=1e-5)

    # train mode: batch_stats updates must agree (BN combines per-copy
    # moments exactly in packed layout)
    o0t, mut0 = m0.apply(vs, x, True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    o1t, mut1 = m1.apply(vs, x, True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    for a, b in zip(jax.tree.leaves(mut0["batch_stats"]),
                    jax.tree.leaves(mut1["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o0t), np.asarray(o1t), atol=2e-4,
                               rtol=1e-4)
