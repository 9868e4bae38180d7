"""Rank MHSA implementation variants at production shape (B=32,T=800,D=256).

Variants:
  xla-f32sm      current: einsum scores f32 -> softmax f32 -> flax Dropout
  xla-remat      same but jax.checkpoint around the attention core
  xla-u8drop     uint8 random-bits threshold dropout (no f32 uniform)
  xla-u8drop-rm  u8 dropout + remat
  flash-nodrop   stock pallas flash attention (no dropout) -- ceiling probe
  xla-nodrop     current minus dropout -- isolates dropout cost

Run on the TPU from bash.
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

    from adyolo_tpu.utils.cache import enable_compilation_cache
    from adyolo_tpu.utils.profiling import benchmark

    enable_compilation_cache()
    B, T, D, H = 32, 800, 256, 4
    dh = D // H
    p = 0.2
    rng = np.random.default_rng(0)

    def mk(shape):
        return jax.device_put(jnp.asarray(rng.standard_normal(shape), jnp.bfloat16))

    q = mk((B, T, H, dh))
    k = mk((B, T, H, dh))
    v = mk((B, T, H, dh))
    key = jax.random.key(1, impl="rbg")

    def core_f32(q, k, v, key, drop):
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (dh ** -0.5)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        if drop == "flax":
            keep = jax.random.bernoulli(key, 1.0 - p, attn.shape)
            attn = jnp.where(keep, attn / (1.0 - p), 0.0).astype(v.dtype)
        elif drop == "u8":
            bits = jax.random.bits(key, attn.shape, jnp.uint8)
            thresh = int(round(p * 256.0))  # drop if bits < thresh
            attn = jnp.where(bits >= thresh, attn * (1.0 / (1.0 - p)),
                             0.0).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", attn, v)

    def bench_fn(name, fn):
        def loss(q, k, v, key):
            return jnp.sum(fn(q, k, v, key).astype(jnp.float32) ** 2)

        jf = jax.jit(fn)
        jg = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        t_f = benchmark(jf, q, k, v, key, iters=10)
        t_g = benchmark(jg, q, k, v, key, iters=10)
        print(f"{name:16s} fwd {t_f*1e3:7.3f} ms   grad {t_g*1e3:7.3f} ms",
              flush=True)

    bench_fn("xla-f32sm", partial(core_f32, drop="flax"))
    bench_fn("xla-remat", jax.checkpoint(partial(core_f32, drop="flax")))
    bench_fn("xla-u8drop", partial(core_f32, drop="u8"))
    bench_fn("xla-u8drop-rm", jax.checkpoint(partial(core_f32, drop="u8")))
    bench_fn("xla-nodrop", partial(core_f32, drop="none"))
    bench_fn("xla-nodrop-rm", jax.checkpoint(partial(core_f32, drop="none")))

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)

        def flash(q, k, v, key):
            # kernel wants (B, H, T, dh)
            out = flash_attention(q.transpose(0, 2, 1, 3),
                                  k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3),
                                  sm_scale=dh ** -0.5)
            return out.transpose(0, 2, 1, 3)

        bench_fn("flash-nodrop", flash)
    except Exception as e:
        print(f"flash: failed ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
