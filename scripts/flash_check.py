"""On-TPU validation + microbench for the fused MHSA kernel (run from bash).

1. exactness: flash (dropout off) vs the XLA fused path at the training
   geometry, fwd + grads;
2. hardware-PRNG dropout statistics: keep fraction ~ 1 - round(.2*256)/256,
   determinism across calls, different seeds differ;
3. microbench: XLA fused path vs flash kernel, fwd and fwd+bwd, bf16,
   B=16/32 T=800 D=256 H=4 (device-timeline timing via utils.profiling).
"""
from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adyolo_tpu.ops.flash_mhsa import flash_mhsa
    from adyolo_tpu.utils.cache import enable_compilation_cache
    from adyolo_tpu.utils.profiling import benchmark

    enable_compilation_cache()
    H, dh = 4, 64
    rng = np.random.default_rng(0)

    def mk(shape, dtype=jnp.bfloat16):
        return jax.device_put(jnp.asarray(rng.standard_normal(shape), dtype))

    def xla_attn(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    # --- 1. exactness (f32, dropout off) --------------------------------
    B, T = 4, 800
    q, k, v = (mk((B, T, H, dh), jnp.float32) for _ in range(3))
    co = mk((B, T, H, dh), jnp.float32)
    f = jax.jit(lambda q, k, v: jnp.sum(flash_mhsa(q, k, v) * co))
    g = jax.jit(lambda q, k, v: jnp.sum(xla_attn(q, k, v) * co))
    lf, lg = float(f(q, k, v)), float(g(q, k, v))
    gf = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(q, k, v)
    gg = jax.jit(jax.grad(g, argnums=(0, 1, 2)))(q, k, v)
    rel = abs(lf - lg) / max(abs(lg), 1e-9)
    print(f"loss flash={lf:.6f} xla={lg:.6f} rel={rel:.2e}")
    assert rel < 1e-4, (lf, lg)
    for name, a, b in zip("qkv", gf, gg):
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        print(f"grad d{name} relmax={err:.2e}")
        assert err < 1e-3, name
    print("EXACTNESS OK")

    # --- 2. hardware-PRNG dropout statistics ----------------------------
    qz = jnp.zeros((2, 800, H, dh))
    vz = jnp.ones((2, 800, H, dh))
    key = jax.random.PRNGKey(7)
    drop = jax.jit(partial(flash_mhsa, rate=0.2), static_argnames=())
    o1 = drop(qz, qz, vz, rng_key=key)
    o2 = drop(qz, qz, vz, rng_key=key)
    o3 = drop(qz, qz, vz, rng_key=jax.random.PRNGKey(8))
    m = float(jnp.mean(o1))
    assert np.array_equal(np.asarray(o1), np.asarray(o2)), "nondeterministic"
    assert not np.allclose(np.asarray(o1), np.asarray(o3)), "seed ignored"
    print(f"dropout mean={m:.4f} (expect ~1.0)")
    assert 0.97 < m < 1.03, m
    # keep fraction from a zero-value probe: count nonzero attn outputs
    # with v=identity-ish is awkward; the mean test above is the invariant
    print("DROPOUT OK")

    # --- 3. microbench ---------------------------------------------------
    for B in (16, 32):
        q, k, v = (mk((B, 800, H, dh)) for _ in range(3))
        key = jax.random.key(1, impl="rbg")

        def xla_train(q, k, v, key):
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * (dh ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            bits = jax.random.bits(key, p.shape, jnp.uint8)
            p = jnp.where(bits >= 51, p * (256.0 / 205.0), 0.0).astype(v.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v)

        def flash_train(q, k, v, key):
            return flash_mhsa(q, k, v, rate=0.2, rng_key=key)

        for name, fn in (("xla", xla_train), ("flash", flash_train)):
            fwd = jax.jit(fn)
            t = benchmark(lambda: fwd(q, k, v, key))
            lossf = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(fn(q, k, v, key).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2)))
            tg = benchmark(lambda: lossf(q, k, v))
            print(f"B={B} {name:6s} fwd {t * 1e3:7.3f} ms   fwd+bwd {tg * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
