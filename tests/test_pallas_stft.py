"""Pallas fused-STFT kernel tests.

The kernel itself needs a TPU (Mosaic); on the CPU test backend we run it
in interpreter mode to validate the math, and verify the decomposed
per-chunk matmul formulation against the XLA path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adyolo_tpu.ops.stft import stft as xla_stft
from adyolo_tpu.ops import pallas_stft as ps


def test_decomposed_matmul_equals_framed():
    """out = sum_j chunks[i+j] @ W[j] == frames[i] @ W (the kernel's core
    identity, checked in pure numpy)."""
    rng = np.random.default_rng(0)
    hop, n_fft, K, T = 4, 8, 5, 6
    r = n_fft // hop
    audio = rng.standard_normal(((T + r - 1) * hop,))
    W = rng.standard_normal((n_fft, K))
    chunks = audio.reshape(T + r - 1, hop)
    frames = np.stack([audio[i * hop : i * hop + n_fft] for i in range(T)])
    want = frames @ W
    got = sum(chunks[j : j + T] @ W.reshape(r, hop, K)[j] for j in range(r))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_pallas_stft_interpret_matches_xla():
    """Full kernel in Pallas interpreter mode vs the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    B, N, C = 2, 24000 * 5, 4  # 200 frames -> one tile
    audio = jnp.asarray((rng.standard_normal((B, N, C)) * 0.1).astype(np.float32))
    re_x, im_x = xla_stft(audio, 1200, 600, 1200)
    with pltpu.force_tpu_interpret_mode():
        re_p, im_p = ps.pallas_stft(audio, 1200, 600, 1200)
    scale = float(jnp.abs(re_x).max())
    np.testing.assert_allclose(np.asarray(re_p), np.asarray(re_x), atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(im_p), np.asarray(im_x), atol=2e-5 * scale)


def test_stft_best_falls_back():
    rng = np.random.default_rng(2)
    audio = jnp.asarray(rng.standard_normal((1, 24000, 4)).astype(np.float32))
    re, im = ps.stft_best(audio, 1200, 600, 1200)
    re_x, im_x = xla_stft(audio, 1200, 600, 1200)
    np.testing.assert_allclose(np.asarray(re), np.asarray(re_x), atol=1e-6)
