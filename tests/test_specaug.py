"""SpecAugment property tests (behavioral spec from augmentations.py:6-33
+ the torchaudio axis quirk documented in ops/specaug.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from adyolo_tpu.ops.specaug import spec_augment


def _masked_fraction(feat, out):
    return float((np.asarray(out) == 0).mean() - (np.asarray(feat) == 0).mean())


def test_masks_are_bounded_and_blockwise():
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.uniform(0.5, 1.0, (4, 100, 64, 7)).astype(np.float32))
    out = np.asarray(spec_augment(feat, jax.random.PRNGKey(0)))
    assert out.shape == feat.shape
    # masked entries are exactly zero; everything else untouched
    zeros = out == 0
    np.testing.assert_array_equal(out[~zeros], np.asarray(feat)[~zeros])
    # per (clip, block) the time mask can cover at most 40 frames and the
    # freq mask at most 40 bins -> max masked fraction per block is bounded
    for b in range(4):
        for sl in (slice(0, 4), slice(4, 7)):
            frac = zeros[b, :, :, sl].mean()
            bound = 1 - (1 - 40 / 100) * (1 - 40 / 64)
            assert frac <= bound + 1e-6, (b, sl, frac)


def test_mask_probability_half():
    """Each mask applies with p≈0.5 (aug thresh), so over many draws about
    a quarter of (clip, block) slices stay fully unmasked."""
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.uniform(0.5, 1.0, (64, 50, 64, 7)).astype(np.float32))
    out = np.asarray(spec_augment(feat, jax.random.PRNGKey(3)))
    untouched = 0
    total = 0
    for b in range(64):
        for sl in (slice(0, 4), slice(4, 7)):
            total += 1
            if not (out[b, :, :, sl] == 0).any():
                untouched += 1
    # p(no time mask) * p(no freq mask) = 0.25 (± sampling noise; width-0
    # masks push the rate slightly up)
    assert 0.1 < untouched / total < 0.45, untouched / total


def test_blocks_masked_independently():
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.uniform(0.5, 1.0, (32, 60, 64, 7)).astype(np.float32))
    out = np.asarray(spec_augment(feat, jax.random.PRNGKey(7)))
    differs = 0
    for b in range(32):
        mel_mask = (out[b, :, :, :4] == 0).any(axis=-1)
        iv_mask = (out[b, :, :, 4:] == 0).any(axis=-1)
        if not np.array_equal(mel_mask, iv_mask):
            differs += 1
    assert differs > 10  # blocks draw independent masks
