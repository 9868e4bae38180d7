"""Per-module microbench of the Conformer block at production shapes.

(B=32, T=800, D=256, bf16 compute.)  Times fwd and grad for each
sub-module and the whole block, plus variants (f32-vs-bf16 attention
softmax path, dense-vs-shift depthwise conv) to rank the levers for the
conformer MFU sprint.  Run on the TPU from bash.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adyolo_tpu.models.resnet_conformer import (ConformerBlock,
                                                    ConformerConvModule,
                                                    FeedForwardModule, MHSA)
    from adyolo_tpu.utils.cache import enable_compilation_cache
    from adyolo_tpu.utils.profiling import benchmark

    enable_compilation_cache()
    B, T, D = 32, 800, 256
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16))

    def bench_module(name, mod, needs_mask=False, train=True):
        kw = {}
        init_args = (jnp.zeros((2, 8, D), jnp.bfloat16), False)
        vs = mod.init(jax.random.PRNGKey(0), *init_args, **kw)

        def fwd(vs, x):
            out = mod.apply(vs, x, train,
                            rngs={"dropout": jax.random.key(1, impl="rbg")},
                            mutable=["batch_stats"])
            return out[0] if isinstance(out, tuple) else out

        jf = jax.jit(fwd)
        t_f = benchmark(jf, vs, x, iters=10)

        def loss(vs, x):
            out = mod.apply(vs, x, train,
                            rngs={"dropout": jax.random.key(1, impl="rbg")},
                            mutable=["batch_stats"])
            y = out[0] if isinstance(out, tuple) else out
            return jnp.sum(y.astype(jnp.float32) ** 2)

        jg = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_g = benchmark(jg, vs, x, iters=10)
        print(f"{name:24s} fwd {t_f * 1e3:7.3f} ms   grad {t_g * 1e3:7.3f} ms",
              flush=True)

    bench_module("FFN (d->4d->d)", FeedForwardModule(D, dtype=jnp.bfloat16))
    bench_module("MHSA (T=800)", MHSA(D, dtype=jnp.bfloat16))
    bench_module("ConvModule dil=1", ConformerConvModule(D, 1, dtype=jnp.bfloat16))
    bench_module("ConvModule dil=128", ConformerConvModule(D, 128, dtype=jnp.bfloat16))
    bench_module("ConformerBlock dil=1", ConformerBlock(D, 1, dtype=jnp.bfloat16))
    # eval-mode block for reference (no dropout RNG work)
    bench_module("ConformerBlock eval", ConformerBlock(D, 1, dtype=jnp.bfloat16),
                 train=False)


if __name__ == "__main__":
    main()
