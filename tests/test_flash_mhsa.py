"""Exactness + gradient tests for the fused Pallas MHSA kernel
(ops/flash_mhsa), run in interpret mode on the CPU mesh.

The dropout mask depends only on (seed, block shape) — never on q/k/v
values — so finite differences at a fixed seed are a valid check of the
recompute-based backward pass.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adyolo_tpu.ops.flash_mhsa import flash_mhsa


def _ref_attn(q, k, v, frame_mask=None, scale=None):
    dh = q.shape[-1]
    scale = scale or dh ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if frame_mask is not None:
        s = jnp.where(frame_mask[:, None, None, :], s,
                      jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _mk(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("masked", [False, True])
def test_forward_matches_xla(masked):
    B, T, H, dh = 2, 48, 2, 8
    q, k, v = _mk((B, T, H, dh), 0), _mk((B, T, H, dh), 1), _mk((B, T, H, dh), 2)
    mask = None
    if masked:
        mask = jnp.arange(T)[None, :] < jnp.array([T, T - 15])[:, None]
    out = flash_mhsa(q, k, v, mask, bq=16, interpret=True)
    ref = _ref_attn(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_grads_match_xla_no_dropout():
    B, T, H, dh = 1, 32, 2, 8
    q, k, v = _mk((B, T, H, dh), 3), _mk((B, T, H, dh), 4), _mk((B, T, H, dh), 5)
    mask = jnp.arange(T)[None, :] < jnp.array([T - 7])[:, None]
    co = _mk((B, T, H, dh), 6)  # fixed cotangent

    def loss_flash(q, k, v):
        return jnp.sum(flash_mhsa(q, k, v, mask, bq=16, interpret=True) * co)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attn(q, k, v, mask) * co)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_dropout_deterministic_and_scaled():
    B, T, H, dh = 1, 32, 2, 8
    q, k, v = _mk((B, T, H, dh), 7), _mk((B, T, H, dh), 8), _mk((B, T, H, dh), 9)
    key = jax.random.PRNGKey(11)
    f = lambda: flash_mhsa(q, k, v, rate=0.2, rng_key=key, bq=16,
                           interpret=True)
    a, b = f(), f()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a different key gives a different mask
    c = flash_mhsa(q, k, v, rate=0.2, rng_key=jax.random.PRNGKey(12),
                   bq=16, interpret=True)
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # rate ~1.0 drops everything (U8Dropout edge semantics)
    z = flash_mhsa(q, k, v, rate=1.0, rng_key=key, bq=16, interpret=True)
    assert np.all(np.asarray(z) == 0)


def test_dropout_keep_rate():
    """With uniform probs (q=0), out = drop(1/T_valid) @ v: the per-row
    keep count is Binomial(T, 1-q_rate); check the global mean."""
    B, T, H, dh = 2, 64, 2, 8
    q = jnp.zeros((B, T, H, dh))
    k = jnp.zeros((B, T, H, dh))
    v = jnp.ones((B, T, H, dh))
    out = flash_mhsa(q, k, v, rate=0.25, rng_key=jax.random.PRNGKey(3),
                     bq=32, interpret=True)
    # each out element = keep_frac_row * scale; E == 1
    m = float(jnp.mean(out))
    assert 0.93 < m < 1.07, m


@pytest.mark.slow
def test_dropout_grads_finite_difference():
    B, T, H, dh = 1, 16, 1, 8
    q, k, v = _mk((B, T, H, dh), 10), _mk((B, T, H, dh), 11), _mk((B, T, H, dh), 12)
    mask = jnp.arange(T)[None, :] < jnp.array([13])[:, None]
    key = jax.random.PRNGKey(5)
    co = _mk((B, T, H, dh), 13)

    def loss(q, k, v):
        return jnp.sum(flash_mhsa(q, k, v, mask, rate=0.2, rng_key=key,
                                  bq=8, interpret=True) * co)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rng = np.random.default_rng(0)
    eps = 1e-3
    for arr, g in ((q, gq), (k, gk), (v, gv)):
        for _ in range(4):
            idx = tuple(rng.integers(0, s) for s in arr.shape)
            d = np.zeros(arr.shape, np.float32)
            d[idx] = eps
            num = (float(loss(*[a + d if a is arr else a for a in (q, k, v)]))
                   - float(loss(*[a - d if a is arr else a
                                  for a in (q, k, v)]))) / (2 * eps)
            np.testing.assert_allclose(num, float(g[idx]), atol=2e-3,
                                       rtol=2e-2)


def test_mhsa_module_flash_flag_matches_xla_path():
    """MHSA(flash='1') in interpret-free CPU mode is only exercised via
    direct kernel calls above; here check the module's flash branch wiring
    end-to-end in interpret mode by monkeypatching flash_mhsa."""
    import adyolo_tpu.models.resnet_conformer as rc

    B, T, D = 2, 32, 16
    x = _mk((B, T, D), 20)
    m = rc.MHSA(D, heads=2, dropout=0.0, flash="0")
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, False)
    ref = m.apply(variables, x, True)

    orig = rc.flash_mhsa
    try:
        rc.flash_mhsa = lambda *a, **kw: orig(*a, **kw, interpret=True)
        m1 = rc.MHSA(D, heads=2, dropout=0.0, flash="1")
        out = m1.apply(variables, x, True)
        # eval below BLOCK_THRESHOLD also routes through the kernel
        out_eval = m1.apply(variables, x, False)
    finally:
        rc.flash_mhsa = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_long_online_softmax_matches_fused():
    from adyolo_tpu.ops.flash_mhsa import flash_mhsa_long

    B, T, H, dh = 2, 96, 2, 8
    q, k, v = _mk((B, T, H, dh), 30), _mk((B, T, H, dh), 31), _mk((B, T, H, dh), 32)
    # ragged valid lengths; bkv=32 -> 3 kv blocks, T padded to 96 exactly
    mask = jnp.arange(T)[None, :] < jnp.array([96, 50])[:, None]
    out = flash_mhsa_long(q, k, v, mask, bq=32, bkv=32, interpret=True)
    ref = _ref_attn(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
    # unmasked + pad-only masking (T not a multiple of bkv)
    out2 = flash_mhsa_long(q, k, v, bq=32, bkv=40, interpret=True)
    ref2 = _ref_attn(q, k, v)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-6, rtol=1e-5)


def test_long_all_masked_leading_block():
    """A fully-masked leading KV block must not poison the running max
    (the exp(0)=1 edge): mask out the first 32 keys entirely."""
    from adyolo_tpu.ops.flash_mhsa import flash_mhsa_long

    B, T, H, dh = 1, 96, 1, 8
    q, k, v = _mk((B, T, H, dh), 33), _mk((B, T, H, dh), 34), _mk((B, T, H, dh), 35)
    mask = (jnp.arange(T)[None, :] >= 32)
    out = flash_mhsa_long(q, k, v, mask, bq=32, bkv=32, interpret=True)
    ref = _ref_attn(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_long_fully_masked_row_is_finite_zero():
    """A batch element with every key masked (feat_length 0) must emit
    finite zeros from the online-softmax kernel, not 0/0 NaN."""
    from adyolo_tpu.ops.flash_mhsa import flash_mhsa_long

    B, T, H, dh = 2, 64, 1, 8
    q, k, v = _mk((B, T, H, dh), 40), _mk((B, T, H, dh), 41), _mk((B, T, H, dh), 42)
    mask = jnp.stack([jnp.ones(T, bool), jnp.zeros(T, bool)])
    out = np.asarray(flash_mhsa_long(q, k, v, mask, bq=32, bkv=32,
                                     interpret=True))
    assert np.isfinite(out).all()
    assert np.all(out[1] == 0)
    ref = _ref_attn(q[:1], k[:1], v[:1], mask[:1])
    np.testing.assert_allclose(out[:1], np.asarray(ref), atol=2e-6, rtol=1e-5)


def test_train_long_T_falls_back_to_xla(monkeypatch):
    """Training above BLOCK_THRESHOLD must NOT route into the whole-KV
    kernel (VMEM cap) — it keeps the fused XLA path with dropout."""
    import adyolo_tpu.models.resnet_conformer as rc

    calls = []
    monkeypatch.setattr(rc, "flash_mhsa",
                        lambda *a, **kw: calls.append(1) or (_ for _ in ()).throw(
                            AssertionError("flash used above threshold")))
    # eval above the threshold correctly routes to the long kernel — give
    # it interpret mode for the CPU-backed init call
    orig_long = rc.flash_mhsa_long
    monkeypatch.setattr(rc, "flash_mhsa_long",
                        lambda *a, **kw: orig_long(*a, **kw, interpret=True))
    monkeypatch.setattr(rc.MHSA, "BLOCK_THRESHOLD", 16)
    B, T, D = 1, 32, 16
    x = _mk((B, T, D), 50)
    m = rc.MHSA(D, heads=2, dropout=0.2, flash="1")
    vs = m.init({"params": jax.random.PRNGKey(0)}, x, False)
    out = m.apply(vs, x, True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (B, T, D) and not calls


def test_tp_guard_follows_model_not_env(monkeypatch):
    """ADYOLO_FLASH_MHSA is read ONCE, at import, into the MHSA class
    default; the TP guard in build_train_step must key on that resolved
    default (what the blocks actually route to), never on a live
    os.environ read.  Flipping the env *after* import therefore must NOT
    trip the guard: on this CPU backend the resolved default ("auto")
    routes to the partitionable XLA path, so TP build succeeds even with
    the env set.  (The raise side — resolved default + tpu backend — is
    pinned in test_tp_mesh.py::test_tp_rejects_flash_mhsa_on_tpu_backend;
    the two diverged once, when the default flipped "0" -> "auto".)"""
    import dataclasses

    from adyolo_tpu.config import Config, MeshConfig, RunConfig
    from adyolo_tpu.engine.evaluate import make_frontend
    from adyolo_tpu.models.resnet_conformer import MHSA
    from adyolo_tpu.models.wrapper import build_model
    from adyolo_tpu.parallel.mesh import make_mesh
    from adyolo_tpu.parallel.train_step import build_train_step

    monkeypatch.setenv("ADYOLO_FLASH_MHSA", "1")
    assert MHSA.flash == "auto"  # post-import env writes don't reach it
    cfg = dataclasses.replace(
        Config(), args=RunConfig(encoder="resnet-conformer"),
        mesh=MeshConfig(model_parallel=2))
    frontend = make_frontend(cfg)
    model = build_model(cfg)
    mesh = make_mesh(cfg.mesh, batch_size=8)
    step = build_train_step(cfg, model, frontend, mesh)
    assert callable(step)


def test_tpu_lowering_from_cpu():
    """Mosaic validates block shapes/layouts at LOWERING time, so the TPU
    kernel structure can be regression-checked from the CPU host (this
    caught the original per-head 4-D blocks violating the
    last-two-dims-(8k,128k) rule).  Runtime perf still needs the chip."""
    from adyolo_tpu.ops.flash_mhsa import flash_mhsa, flash_mhsa_long

    B, T, H, dh = 4, 800, 4, 64
    q = jnp.zeros((B, T, H, dh), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    mask = jnp.arange(T)[None, :] < T - 100

    def train_fn(a, b, c):
        return flash_mhsa(a, b, c, mask, rate=0.2, rng_key=key)

    def grad_fn(a, b, c):
        return jax.grad(lambda x, y, z: jnp.sum(
            train_fn(x, y, z).astype(jnp.float32)), argnums=(0, 1, 2))(a, b, c)

    qe = jnp.zeros((1, 4000, H, dh), jnp.float32)
    for fn, args in ((train_fn, (q, q, q)), (grad_fn, (q, q, q)),
                     (lambda a, b, c: flash_mhsa_long(a, b, c), (qe, qe, qe))):
        low = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
        assert "tpu_custom_call" in low.as_text()
