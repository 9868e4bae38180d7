"""Frequency-packed conv (ops/packed_conv.py): exact equivalence with the
plain XLA 3x3 SAME conv, forward and gradients, across the SE-ResNet
stage shapes and the 7-channel stem."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from adyolo_tpu.ops.packed_conv import best_pack, conv3x3_packed

rng = np.random.default_rng(0)


def _ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _case(T, F, cin, cout):
    x = jnp.asarray(rng.standard_normal((2, T, F, cin)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, cin, cout)) * 0.1)
                    .astype(np.float32))
    return x, w


def test_packed_conv_matches_plain_all_stages():
    for (T, F, cin, cout) in [(16, 8, 32, 32), (16, 8, 64, 64),
                              (8, 16, 128, 128), (16, 8, 7, 32),
                              (16, 8, 32, 64)]:
        x, w = _case(T, F, cin, cout)
        pack = best_pack(cout, F)
        got = conv3x3_packed(x, w, pack)
        want = _ref(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_packed_conv_gradients_match():
    x, w = _case(16, 8, 32, 32)
    g = jnp.asarray(rng.standard_normal((2, 16, 8, 32)).astype(np.float32))
    pack = best_pack(32, 8)

    def lp(x, w):
        return jnp.sum(conv3x3_packed(x, w, pack) * g)

    def lr(x, w):
        return jnp.sum(_ref(x, w) * g)

    dxp, dwp = jax.grad(lp, (0, 1))(x, w)
    dxr, dwr = jax.grad(lr, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dwp), np.asarray(dwr), atol=1e-4)


def test_best_pack_rules():
    assert best_pack(32, 64) == 4
    assert best_pack(64, 32) == 2
    assert best_pack(128, 16) == 1
    assert best_pack(32, 6) == 2   # F must divide the pack
    assert best_pack(32, 5) == 1


def test_fullpack_matches_plain_conv():
    """Whole-F-axis packing (F in {1, 2, 4}) is exactly the SAME-padded
    spatial 3x3 conv (boundary taps included via tridiagonal blocks)."""
    import jax
    import jax.numpy as jnp

    from adyolo_tpu.ops.packed_conv import conv3x3_fullpack

    rng = np.random.default_rng(0)
    for F, C, K in ((1, 16, 24), (2, 12, 8), (4, 8, 8)):
        x = jnp.asarray(rng.standard_normal((2, 10, F, C)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, C, K)) * 0.1, jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = conv3x3_fullpack(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

        # gradients flow through the packed form identically
        g1 = jax.grad(lambda w: jnp.sum(conv3x3_fullpack(x, w) ** 2))(w)
        g2 = jax.grad(lambda w: jnp.sum(jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2))(w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


@pytest.mark.slow
def test_packed_resident_stages_match_per_conv_packing():
    """SEResNet34(packed_stages=True) — pack once per stage, every op in
    packed layout — must equal the per-conv-packing model: identical param
    tree (paths, shapes, init values), equal outputs in eval/train/masked
    modes, and equal batch_stats updates (the packed BN combines per-copy
    moments exactly)."""
    from adyolo_tpu.models.seresnet34 import SEResNet34

    B, T, F, C = 2, 32, 64, 7
    x = jnp.asarray(rng.standard_normal((B, T, F, C)).astype(np.float32))
    lens = jnp.array([32, 24])
    mp = SEResNet34(packed_stages=True)
    mu = SEResNet34(packed_stages=False)
    init_rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    vp = mp.init(init_rngs, x, True)
    vu = mu.init(init_rngs, x, True)
    flat_p = jax.tree_util.tree_leaves_with_path(vp["params"])
    flat_u = dict(jax.tree_util.tree_leaves_with_path(vu["params"]))
    assert len(flat_p) == len(flat_u)
    for path, leaf in flat_p:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_u[path]),
                                      err_msg=str(path))

    yp = mp.apply(vu, x, False)
    yu = mu.apply(vu, x, False)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yu), atol=1e-5)

    rngs = {"dropout": jax.random.PRNGKey(3)}
    yp, sp = mp.apply(vu, x, True, mutable=["batch_stats"], rngs=rngs)
    yu, su = mu.apply(vu, x, True, mutable=["batch_stats"], rngs=rngs)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yu), atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(sp), jax.tree_util.tree_leaves(su)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    yp = mp.apply(vu, x, False, feat_lengths=lens)
    yu = mu.apply(vu, x, False, feat_lengths=lens)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yu), atol=1e-5)


@pytest.mark.slow
def test_time_packed_conv_matches_plain():
    """Time-axis packing for the conformer's freq-strided convs: exact
    equivalence with the plain symmetrically padded stride-(1, s) conv,
    across the stem 7x7 (Cin=7->64), the layer-1 entry 3x3 (64->64),
    pack in {2, 4}, and both forward and gradients."""
    from adyolo_tpu.ops.packed_conv import conv_time_packed

    def ref(x, w, s):
        kt, kf = w.shape[0], w.shape[1]
        return jax.lax.conv_general_dilated(
            x, w, (1, s), ((kt // 2, kt // 2), (kf // 2, kf // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for (T, F, cin, cout, kt, kf, s, pack) in [
            (16, 16, 7, 64, 7, 7, 2, 2),    # conformer stem shape (scaled T/F)
            (16, 16, 64, 64, 3, 3, 2, 2),   # layer-1 entry conv
            (16, 8, 7, 32, 7, 7, 2, 4),     # deeper packing
            (12, 8, 5, 16, 3, 3, 1, 2),     # stride-1 freq
            (16, 9, 6, 16, 5, 3, 3, 4)]:    # odd F, uneven stride
        x = jnp.asarray(rng.standard_normal((2, T, F, cin)).astype(np.float32))
        w = jnp.asarray((rng.standard_normal((kt, kf, cin, cout)) * 0.1)
                        .astype(np.float32))
        got = conv_time_packed(x, w, pack, f_stride=s)
        want = ref(x, w, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"{(T, F, cin, cout, kt, kf, s, pack)}")

    # gradients (stem shape)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 7)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((7, 7, 7, 24)) * 0.1)
                    .astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 16, 8, 24)).astype(np.float32))
    dxp, dwp = jax.grad(
        lambda x, w: jnp.sum(conv_time_packed(x, w, 2, f_stride=2) * g),
        (0, 1))(x, w)
    dxr, dwr = jax.grad(
        lambda x, w: jnp.sum(ref(x, w, 2) * g), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dwp), np.asarray(dwr), atol=1e-4)


@pytest.mark.slow
def test_conformer_time_pack_flag_equivalence():
    """ResNetConformer(time_pack=True) — the default — must have the same
    param tree and outputs as the plain-conv model (eval + masked eval)."""
    from adyolo_tpu.models.resnet_conformer import ResNetConformer

    x = jnp.asarray(rng.standard_normal((2, 16, 64, 7)).astype(np.float32))
    lens = jnp.array([16, 12])
    mp = ResNetConformer(num_layers=1, time_pool=2, time_pack=True)
    mu = ResNetConformer(num_layers=1, time_pool=2, time_pack=False)
    init_rngs = {"params": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}
    vp = mp.init(init_rngs, x, True)
    vu = mu.init(init_rngs, x, True)
    flat_p = jax.tree_util.tree_leaves_with_path(vp["params"])
    flat_u = dict(jax.tree_util.tree_leaves_with_path(vu["params"]))
    assert len(flat_p) == len(flat_u)
    for path, leaf in flat_p:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_u[path]),
                                      err_msg=str(path))
    yp = mp.apply(vu, x, False)
    yu = mu.apply(vu, x, False)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yu), atol=2e-5)
    yp = mp.apply(vu, x, False, feat_lengths=lens)
    yu = mu.apply(vu, x, False, feat_lengths=lens)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yu), atol=2e-5)


def test_pack_weights_1x1_blockdiag():
    from adyolo_tpu.ops.packed_conv import pack_weights_1x1

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, 16, 24)).astype(np.float32) * 0.1)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x2 = x.reshape(2, 8, 4, 32)
    got = jax.lax.conv_general_dilated(
        x2, pack_weights_1x1(w, 2), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).reshape(2, 8, 8, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
