"""Quantify dropout RNG cost in the conformer block: threefry vs rbg.

Run on the TPU from bash."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adyolo_tpu.models.resnet_conformer import ConformerBlock
    from adyolo_tpu.utils.cache import enable_compilation_cache
    from adyolo_tpu.utils.profiling import benchmark

    enable_compilation_cache()
    B, T, D = 32, 800, 256
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16))
    mod = ConformerBlock(D, 1, dtype=jnp.bfloat16)
    vs = mod.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, D), jnp.bfloat16), False)

    def bench_with_key(name, key):
        def loss(vs, x, key):
            out = mod.apply(vs, x, True, rngs={"dropout": key},
                            mutable=["batch_stats"])
            return jnp.sum(out[0].astype(jnp.float32) ** 2)

        jg = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_g = benchmark(jg, vs, x, key, iters=10)
        print(f"{name:28s} grad {t_g * 1e3:7.3f} ms", flush=True)

    bench_with_key("threefry (default)", jax.random.PRNGKey(1))
    for impl in ("rbg", "unsafe_rbg"):
        try:
            k = jax.random.key(1, impl=impl)
            bench_with_key(f"{impl}", k)
        except Exception as e:
            print(f"{impl}: unavailable ({e})", flush=True)

    # raw RNG cost: one uniform the size of the attention weights
    for impl in ("threefry2x32", "rbg", "unsafe_rbg"):
        try:
            k = jax.random.key(1, impl=impl)
            f = jax.jit(lambda k: jax.random.uniform(
                k, (B, 4, T, T), jnp.float32))
            t = benchmark(f, k, iters=10)
            print(f"uniform(32,4,800,800) {impl:14s} {t * 1e3:7.3f} ms",
                  flush=True)
        except Exception as e:
            print(f"uniform {impl}: unavailable ({e})", flush=True)


if __name__ == "__main__":
    main()
