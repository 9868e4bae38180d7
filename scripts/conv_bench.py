"""Per-stage microbenchmark of conv formulations for the conformer stem.

The ResNet-Conformer strides frequency only: stages run at
(T=800, F=8/4/2/1) with C=64/128/256/512.  Compares, per stage shape:
  plain    — spatial 3x3 conv
  packed   — partial frequency packing (ops/packed_conv.conv3x3_packed)
  fullpack — whole-F-axis packing to a time-only (3,1) conv
for forward and forward+backward.  Run on the TPU from bash.

``--strided`` benches the freq-strided convs instead (stem 7x7 Cin=7->64
at F=64 and the layer-1 entry 3x3 64->64 at F=16, both stride (1, 2)):
plain vs time-axis packing (ops/packed_conv.conv_time_packed).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main_strided():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adyolo_tpu.ops.packed_conv import conv_time_packed
    from adyolo_tpu.utils.cache import enable_compilation_cache
    from adyolo_tpu.utils.profiling import benchmark

    enable_compilation_cache()
    B, T = 32, 800
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    for name, F, cin, cout, kt, kf in (("stem7x7", 64, 7, 64, 7, 7),
                                       ("layer1-entry", 16, 64, 64, 3, 3)):
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((B, T, F, cin)), dt))
        w = jax.device_put(jnp.asarray(
            rng.standard_normal((kt, kf, cin, cout)) * 0.05, dt))
        ref = None
        for pack in (1, 2, 4):
            fn = jax.jit(lambda x, w, pack=pack:
                         conv_time_packed(x, w, pack, f_stride=2))
            got = np.asarray(fn(x, w), np.float32)
            if ref is None:
                ref = got
            err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
            t_f = benchmark(fn, x, w, iters=20)

            def loss(x, w, pack=pack):
                return jnp.sum(conv_time_packed(
                    x, w, pack, f_stride=2).astype(jnp.float32) ** 2)

            gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))
            t_b = benchmark(gfn, x, w, iters=20)
            print(f"{name:13s} tpack={pack} fwd {t_f * 1e3:7.3f} ms  "
                  f"fwd+bwd-ish {t_b * 1e3:7.3f} ms  relerr {err:.1e}",
                  flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adyolo_tpu.ops.packed_conv import (best_pack, conv3x3_fullpack,
                                            conv3x3_packed)
    from adyolo_tpu.utils.cache import enable_compilation_cache
    from adyolo_tpu.utils.profiling import benchmark

    enable_compilation_cache()
    B, T = 32, 800
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    for F, C in ((8, 64), (4, 128), (2, 256), (1, 512)):
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((B, T, F, C)), dt))
        w = jax.device_put(jnp.asarray(
            rng.standard_normal((3, 3, C, C)) * 0.05, dt))

        def plain(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        pack = best_pack(C, F)
        methods = {"plain": plain,
                   f"packed(x{pack})": lambda x, w: conv3x3_packed(x, w, pack),
                   "fullpack": conv3x3_fullpack}
        for nm, fn in methods.items():
            fwd = jax.jit(fn)
            # numerical parity vs plain first
            ref = np.asarray(plain(x, w), np.float32)
            got = np.asarray(fwd(x, w), np.float32)
            err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
            t_f = benchmark(fwd, x, w, iters=20)

            def loss(x, w, fn=fn):
                return jnp.sum(fn(x, w).astype(jnp.float32) ** 2)

            gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))
            t_b = benchmark(gfn, x, w, iters=20)
            print(f"F={F} C={C} {nm:12s} fwd {t_f * 1e3:7.3f} ms  "
                  f"fwd+bwd-ish {t_b * 1e3:7.3f} ms  relerr {err:.1e}",
                  flush=True)


if __name__ == "__main__":
    if "--strided" in sys.argv:
        main_strided()
    else:
        main()
