"""Tune the flash-MHSA kernel at the production conformer shape.

Round-5 (VERDICT r4 next #2): the conformer bf16 train line sits at ~31.6%
MFU while SE-ResNet reaches 45.8%; the r4 attribution shows the attention
kernels at ~15 ms of a 92.8 ms step vs a ~7 ms analytic floor (dh=64
underfills the MXU contraction depth, so the matmul ceiling is ~50% to
begin with).  This sweep isolates the kernel's two cheap levers:

* query-block size bq (VMEM residency vs grid overhead) — via the
  ADYOLO_FLASH_BQ override in ops/flash_mhsa.py::_pick_bq;
* in-kernel dropout PRNG cost — rate 0.0 vs the shipped 0.2.

Prints one line per (bq, rate, mode) with ms/call at B=32 T=800 H=4 dh=64
(the bench train-conformer geometry).  Run from bash on the free chip:

    timeout 1500 python scripts/flash_tune_bench.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from adyolo_tpu.utils.cache import enable_compilation_cache
    from adyolo_tpu.utils.profiling import benchmark

    enable_compilation_cache()
    B, T, H, dh = 32, 800, 4, 64
    rng = np.random.default_rng(0)

    def mk(shape):
        return jax.device_put(jnp.asarray(rng.standard_normal(shape), jnp.bfloat16))

    q, k, v = mk((B, T, H, dh)), mk((B, T, H, dh)), mk((B, T, H, dh))
    key = jax.random.PRNGKey(7)

    from adyolo_tpu.ops.flash_mhsa import flash_mhsa

    results = []
    for bq in (800, 400, 200, 160, 80):
        for rate in (0.0, 0.2):
            def fwd(q, k, v):
                return flash_mhsa(q, k, v, rate=rate,
                                  rng_key=key if rate else None, bq=bq)

            def loss(q, k, v):
                return jnp.sum(fwd(q, k, v).astype(jnp.float32) ** 2)

            grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            jfwd = jax.jit(fwd)
            try:
                dt_f = benchmark(jfwd, q, k, v, iters=30, warmup=3) * 1e3
                dt_g = benchmark(grad, q, k, v, iters=20, warmup=3) * 1e3
            except Exception as e:  # Mosaic rejection etc.
                print(f"bq={bq:4d} rate={rate}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            results.append((bq, rate, dt_f, dt_g))
            print(f"bq={bq:4d} rate={rate}: fwd {dt_f:7.3f} ms  "
                  f"fwd+bwd {dt_g:7.3f} ms", flush=True)

    if results:
        bf = min(results, key=lambda r: r[3])
        print(f"BEST fwd+bwd: bq={bf[0]} rate={bf[1]} {bf[3]:.3f} ms "
              f"(shipped default bq=_pick_bq(800)=400)", flush=True)
        # dropout cost = paired (rate0.2 - rate0.0) at the default bq
        d = {(r[0], r[1]): r for r in results}
        if (400, 0.0) in d and (400, 0.2) in d:
            print(f"dropout PRNG cost at bq=400: "
                  f"fwd +{d[(400, 0.2)][2] - d[(400, 0.0)][2]:.3f} ms, "
                  f"fwd+bwd +{d[(400, 0.2)][3] - d[(400, 0.0)][3]:.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
