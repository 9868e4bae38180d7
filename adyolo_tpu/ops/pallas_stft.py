"""Pallas TPU kernel: fused framed STFT.

The XLA path (:mod:`adyolo_tpu.ops.stft`) frames the padded signal into a
``(B, T, n_fft, C)`` tensor before the DFT matmul — an intermediate that
costs ~0.5 GB of HBM traffic at the DCASE geometry (batch 16) and exists
only to be contracted away.  This kernel never materializes frames:

* with ``hop | n_fft`` (ratio r), frame ``i`` is the concatenation of r
  consecutive hop-chunks, so the windowed DFT factors into per-chunk
  matmuls against window slices: ``out = sum_j chunks[i + j] @ W[j]``;
* the kernel receives r hop-shifted *views* of the chunked audio (shifted
  on the host — Mosaic DMA slices must be 128-lane aligned, which an
  overlapped in-kernel copy of hop=600 chunks cannot satisfy, while
  BlockSpec blocks may span the full 600-lane dimension) and accumulates
  the r MXU matmuls per frame tile entirely in VMEM;
* Pallas double-buffers the HBM->VMEM block streams automatically.

VMEM per step (DCASE, tile=200): r x (200, 600) chunk blocks ~1 MB +
window matrices (2, 600, 601) x 2 ~ 5.8 MB + outputs ~1 MB ~ 8 MB.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .dsp import analysis_window, dft_matrices

__all__ = ["pallas_stft", "stft_best"]


def _make_kernel(r: int):
    def kernel(*refs):
        audio_refs = refs[:r]
        wre_ref, wim_ref = refs[r], refs[r + 1]
        re_ref, im_ref = refs[r + 2], refs[r + 3]
        re = None
        im = None
        for j in range(r):
            a = audio_refs[j][0]  # (tile, hop)
            dre = jnp.dot(a, wre_ref[j], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            dim = jnp.dot(a, wim_ref[j], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            re = dre if re is None else re + dre
            im = dim if im is None else im + dim
        re_ref[0] = re
        im_ref[0] = im

    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _pallas_stft_impl(shifted, w_re3, w_im3, n_fft, hop, tile):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = n_fft // hop
    BC, n_frames, _ = shifted[0].shape
    n_tiles = n_frames // tile
    K = w_re3.shape[2]

    block = pl.BlockSpec((1, tile, hop), lambda bc, t: (bc, t, 0),
                         memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, tile, K), lambda bc, t: (bc, t, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(r),
        grid=(BC, n_tiles),
        in_specs=[block] * r + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[out_block, out_block],
        out_shape=[
            jax.ShapeDtypeStruct((BC, n_frames, K), jnp.float32),
            jax.ShapeDtypeStruct((BC, n_frames, K), jnp.float32),
        ],
    )(*shifted, w_re3, w_im3)


def pallas_stft(x: jax.Array, n_fft: int, hop: int, win_length: int,
                window: str = "han", tile: int = 200):
    """Drop-in equivalent of :func:`adyolo_tpu.ops.stft.stft` (same padding
    and frame-count conventions) computed by the fused Pallas kernel.

    x: (B, N, C) -> (re, im) each (B, T=N//hop, 1+n_fft//2, C).
    """
    assert n_fft % hop == 0, "pallas path requires hop | n_fft"
    B, N, C = x.shape
    n_frames = N // hop
    assert n_frames % tile == 0, (n_frames, tile)
    r = n_fft // hop

    w = analysis_window(window, win_length, n_fft)
    w_re, w_im = dft_matrices(n_fft, w)
    K = w_re.shape[1]

    lpad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (lpad, 0), (0, 0)), mode="reflect")
    need = (n_frames + r - 1) * hop
    rpad = need - x.shape[1]
    if rpad > 0:
        x = jnp.pad(x, ((0, 0), (0, rpad), (0, 0)))
    elif rpad < 0:
        x = x[:, :need]

    chunks = jnp.transpose(x, (0, 2, 1)).reshape(B * C, n_frames + r - 1, hop)
    shifted = tuple(chunks[:, j : j + n_frames] for j in range(r))
    w_re3 = jnp.asarray(w_re.reshape(r, hop, K))
    w_im3 = jnp.asarray(w_im.reshape(r, hop, K))
    re, im = _pallas_stft_impl(shifted, w_re3, w_im3, n_fft, hop, tile)
    re = jnp.transpose(re.reshape(B, C, n_frames, K), (0, 2, 3, 1))
    im = jnp.transpose(im.reshape(B, C, n_frames, K), (0, 2, 3, 1))
    return re, im


def stft_best(x, n_fft, hop, win_length, window="han"):
    """Benchmarked choice between the two implementations.

    Measured on TPU v5e (B=16, 20 s clips, f32-HIGHEST matmuls): Pallas
    10.02 ms vs XLA 10.18 ms — both compute-bound on the MXU, i.e. XLA
    already fuses the framing into the contraction and the hand-written
    pipeline buys nothing.  The XLA path therefore stays the default (it
    covers arbitrary geometries); the Pallas kernel remains available for
    geometries/backends where the framing materializes.
    """
    from .stft import stft as xla_stft

    return xla_stft(x, n_fft, hop, win_length, window)
