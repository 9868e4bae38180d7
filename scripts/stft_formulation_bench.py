"""A/B the STFT input-layout formulations on the real chip.

The serving-forward profile (benchlogs/, prof_step.py --mode forward)
shows the DCASE STFT paying ~1.26 ms/step for a pure device reshape
(stft.py:74: flat (B, L, C) -> (B, n_chunks, hop, C) hop-blocks) before
the two slab einsums — ~8% of the whole 15.3 ms headline step.  The
hop-block layout is a *free* numpy view for any host producer (same
bytes), so the candidate fix is to accept pre-chunked audio and handle
the reflect-pad boundary analytically at frame 0 instead of re-laying
the signal out on device.

Formulations (all numerically identical to librosa center=True up to
f32):
  A flat      : current production path (reflect pad -> chunk reshape
                -> r slab einsums)
  B chunked   : input (B, T, hop, C); i=1 slab consumes the raw chunks
                as-is, i=0 slab consumes chunks shifted by one with the
                reflect chunk concatenated at frame 0 (output-side
                concat, fusible)
  C chunked-t : input (B, T, C, hop) (hop minor / MXU-contraction
                minor); same boundary trick
  D prepadded : input (B, T+1, hop, C) with the reflect chunk already
                in front — pure-slice upper bound

Run:  python scripts/stft_formulation_bench.py [--iters 50]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adyolo_tpu.ops.dsp import analysis_window, dft_matrices
    from adyolo_tpu.ops.stft import _STFT_PRECISION, stft
    from adyolo_tpu.utils.profiling import benchmark

    B, N, C = args.batch, 480000, 4
    n_fft, hop = 1200, 600
    T = N // hop
    w = analysis_window("han", n_fft, n_fft)
    w_re, w_im = dft_matrices(n_fft, w)
    w_re = jnp.asarray(w_re)
    w_im = jnp.asarray(w_im)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((B, N, C)) * 0.1).astype(np.float32)

    def ein(part, slab_w):
        return jnp.einsum("btnc,nk->btkc", part, slab_w,
                          preferred_element_type=jnp.float32,
                          precision=_STFT_PRECISION)

    def ein_t(part, slab_w):
        return jnp.einsum("btcn,nk->btkc", part, slab_w,
                          preferred_element_type=jnp.float32,
                          precision=_STFT_PRECISION)

    # ---- A: production path ------------------------------------------------
    @jax.jit
    def stft_flat(xf):
        return stft(xf, n_fft, hop, n_fft)

    # ---- B: pre-chunked (B, T, hop, C) ------------------------------------
    def refl_chunk(chunks):
        # librosa reflect left pad: padded[i] = x[lpad - i], i in [0, lpad)
        # = flip(x[1 : lpad+1]); with lpad == hop that segment is chunk 0
        # samples 1.. plus chunk 1 sample 0 (tiny, (B, hop, C))
        seg = jnp.concatenate([chunks[:, 0, 1:], chunks[:, 1, :1]], axis=1)
        return jnp.flip(seg, axis=1)[:, None]  # (B, 1, hop, C)

    @jax.jit
    def stft_chunked(chunks):
        refl = refl_chunk(chunks)
        out = []
        for slab_w in (w_re, w_im):
            s0, s1 = slab_w[:hop], slab_w[hop:]
            body = ein(chunks[:, : T - 1], s0)       # frames 1..T-1, i=0 slab
            first = ein(refl, s0)                    # frame 0, i=0 slab
            out.append(jnp.concatenate([first, body], axis=1)
                       + ein(chunks, s1))            # i=1 slab, all frames
        return tuple(out)

    # ---- C: pre-chunked + channel-major (B, T, C, hop) ---------------------
    def refl_chunk_t(chunks):
        seg = jnp.concatenate([chunks[:, 0, :, 1:], chunks[:, 1, :, :1]],
                              axis=-1)
        return jnp.flip(seg, axis=-1)[:, None]  # (B, 1, C, hop)

    @jax.jit
    def stft_chunked_t(chunks):
        refl = refl_chunk_t(chunks)
        out = []
        for slab_w in (w_re, w_im):
            s0, s1 = slab_w[:hop], slab_w[hop:]
            body = ein_t(chunks[:, : T - 1], s0)
            first = ein_t(refl, s0)
            out.append(jnp.concatenate([first, body], axis=1)
                       + ein_t(chunks, s1))
        return tuple(out)

    # ---- D: pre-padded chunks (B, T+1, hop, C) — pure slices ---------------
    @jax.jit
    def stft_prepadded(pchunks):
        out = []
        for slab_w in (w_re, w_im):
            s0, s1 = slab_w[:hop], slab_w[hop:]
            out.append(ein(pchunks[:, :T], s0) + ein(pchunks[:, 1:], s1))
        return tuple(out)

    # host-side views / prep (all free or tiny for a real producer)
    x_chunks = x.reshape(B, T, hop, C)
    x_chunks_t = np.ascontiguousarray(x_chunks.transpose(0, 1, 3, 2))
    refl_np = x[:, 1 : hop + 1][:, ::-1]
    x_pre = np.concatenate([refl_np[:, None], x_chunks], axis=1)

    ref_re, ref_im = jax.tree.map(np.asarray, stft_flat(jnp.asarray(x)))

    results = {}
    for name, fn, arg in (
        ("A flat (prod)", stft_flat, x),
        ("B chunked", stft_chunked, x_chunks),
        ("C chunked-t", stft_chunked_t, x_chunks_t),
        ("D prepadded", stft_prepadded, x_pre),
    ):
        darg = jax.device_put(jnp.asarray(arg))
        re, im = jax.tree.map(np.asarray, fn(darg))
        err = max(np.abs(re - ref_re).max(), np.abs(im - ref_im).max())
        dt = benchmark(fn, darg, iters=args.iters)
        results[name] = (dt, err)
        print(f"{name:16s} {dt * 1e3:7.3f} ms/call   max|err vs A| {err:.2e}",
              flush=True)

    base = results["A flat (prod)"][0]
    for name, (dt, _) in results.items():
        print(f"{name:16s} speedup vs A: {base / dt:6.3f}x")


if __name__ == "__main__":
    main()
