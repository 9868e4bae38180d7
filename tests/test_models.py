"""Model component tests: GRU parity vs torch, encoder shapes, masking."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adyolo_tpu.models.layers import BiGRU, reverse_sequence
from adyolo_tpu.models.seresnet34 import SEResNet34
from adyolo_tpu.models.wrapper import SELDModel


def test_gru_matches_torch():
    """Weight-for-weight parity with torch nn.GRU (the reference's recurrent
    block, resnet.py:153) — validates gate order/bias conventions."""
    import torch

    D, H, B, T = 32, 16, 2, 11
    tg = torch.nn.GRU(D, H, num_layers=2, bidirectional=True, batch_first=True,
                      dropout=0.0)
    tg.eval()
    x = np.random.default_rng(0).standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        want, _ = tg(torch.from_numpy(x))
    want = want.numpy()

    model = BiGRU(hidden=H, num_layers=2, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    p = params["params"]
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    new = {}
    for layer in range(2):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            key = f"l{layer}_{direction}"
            new[key] = {
                "w_ih": sd[f"weight_ih_l{layer}{suffix}"].T,
                "w_hh": sd[f"weight_hh_l{layer}{suffix}"].T,
                "b_ih": sd[f"bias_ih_l{layer}{suffix}"],
                "b_hh": sd[f"bias_hh_l{layer}{suffix}"],
            }
    got = model.apply({"params": new}, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_reverse_sequence():
    x = jnp.arange(10).reshape(1, 10, 1).astype(jnp.float32)
    r = reverse_sequence(x, jnp.array([4]))
    np.testing.assert_array_equal(np.asarray(r[0, :, 0]), [3, 2, 1, 0, 4, 5, 6, 7, 8, 9])


@pytest.fixture(scope="module")
def small_encoder():
    model = SEResNet34()
    x = jnp.zeros((1, 32, 64, 7))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    return model, variables


def test_encoder_shapes(small_encoder):
    model, variables = small_encoder
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 64, 7)), jnp.float32)
    y = model.apply(variables, x, False)
    assert y.shape == (2, 8, 256)  # T/4, enc_out_dim
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_encoder_varlen_masking_matches_exact(small_encoder):
    """A padded clip with feat_lengths must equal the exact-length run on
    valid frames (eval mode, running BN stats)."""
    model, variables = small_encoder
    rng = np.random.default_rng(2)
    T_short, T_long = 16, 32
    x_short = rng.standard_normal((1, T_short, 64, 7)).astype(np.float32)
    x_pad = np.zeros((1, T_long, 64, 7), np.float32)
    x_pad[:, :T_short] = x_short

    exact = model.apply(variables, jnp.asarray(x_short), False,
                        feat_lengths=jnp.array([T_short]))
    padded = model.apply(variables, jnp.asarray(x_pad), False,
                         feat_lengths=jnp.array([T_short]))
    np.testing.assert_allclose(
        np.asarray(padded)[:, : T_short // 4], np.asarray(exact), atol=1e-5
    )


@pytest.mark.slow
def test_full_model_all_heads():
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 32, 64, 7)), jnp.float32)
    K = 13
    expect = {
        "seddoa": 4 * K,
        "accdoa": 3 * K,
        "adpit": 9 * K,
        "adyolo": 8 * 4 * 5 * (K + 3),
    }
    for loss_nm, out_dim in expect.items():
        m = SELDModel(loss_nm=loss_nm, nb_classes=K)
        v = m.init(jax.random.PRNGKey(0), x, False)
        y = m.apply(v, x, False)
        assert y.shape == (1, 8, out_dim), loss_nm
        if loss_nm == "seddoa":
            out = np.asarray(y)
            assert (out[..., :K] >= 0).all() and (out[..., :K] <= 1).all()
            assert (np.abs(out[..., K:]) <= 1).all()


@pytest.mark.slow
def test_batchnorm_updates_in_train_mode():
    model = SEResNet34()
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 16, 64, 7)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    y, mutated = model.apply(variables, x, True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_u8dropout_semantics():
    """U8Dropout: eval identity; train drops at the quantized rate with an
    unbiased keep-scale; zero rate is a no-op; works with rbg keys (the
    train-step impl, config.TrainConfig.dropout_rng)."""
    from adyolo_tpu.models.layers import U8Dropout

    x = jnp.ones((512, 513), jnp.float32)
    # eval / zero-rate: exact identity
    for mod in (U8Dropout(0.2, deterministic=True), U8Dropout(0.0)):
        y = mod.apply({}, x, rngs={"dropout": jax.random.PRNGKey(0)})
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    for impl in ("threefry2x32", "rbg"):
        y = np.asarray(U8Dropout(0.2).apply(
            {}, x, rngs={"dropout": jax.random.key(3, impl=impl)}))
        kept = y != 0.0
        # quantized drop rate 51/256 = 0.19922 (binomial std ~0.0008)
        drop_frac = 1.0 - kept.mean()
        assert abs(drop_frac - 51 / 256) < 0.005, (impl, drop_frac)
        # surviving values scaled by exactly 256/205
        np.testing.assert_allclose(y[kept], 256.0 / 205.0, rtol=1e-6)
        # unbiased in expectation
        assert abs(y.mean() - 1.0) < 0.01, (impl, y.mean())
