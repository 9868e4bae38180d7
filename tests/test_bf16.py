"""bfloat16 training-compute path tests."""
import pytest
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from adyolo_tpu.config import Config
from adyolo_tpu.models.wrapper import build_model


@pytest.mark.slow
def test_bf16_model_params_stay_f32_and_outputs_f32():
    cfg = Config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train,
                                                             compute_dtype="bfloat16"))
    m = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 64, 7)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, False)
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(v["params"]))
    y = m.apply(v, x, False)
    assert y.dtype == jnp.float32  # head stays f32
    assert np.isfinite(np.asarray(y)).all()


def test_bf16_close_to_f32():
    cfg = Config()
    m32 = build_model(cfg, compute_dtype="float32")
    m16 = build_model(cfg, compute_dtype="bfloat16")
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16, 64, 7)) * 0.5,
                    jnp.float32)
    v = m32.init(jax.random.PRNGKey(0), x, False)
    y32 = np.asarray(m32.apply(v, x, False))
    y16 = np.asarray(m16.apply(v, x, False))  # same params, bf16 compute
    # logits agree to bf16-accumulation tolerance
    assert np.abs(y32 - y16).max() < 0.3
    assert np.corrcoef(y32.ravel(), y16.ravel())[0, 1] > 0.999


@pytest.mark.slow
def test_bf16_grad_finite():
    cfg = Config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train,
                                                             compute_dtype="bfloat16"))
    m = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 64, 7)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, False)

    def loss_fn(p):
        out, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]}, x, True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean(out ** 2)

    g = jax.grad(loss_fn)(v["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert all(l.dtype == jnp.float32 for l in leaves)  # grads in param dtype
