"""Spherical geometry helpers (JAX + numpy twins).

Reproduces the reference's angular math:

* great-circle distance between polar coordinates in degrees
  (``src/datasets.py:858-871`` for decode,
  ``src/models/loss.py:182-187`` for the loss — note they clip the cosine
  to different ranges: decode uses [-1, 1], loss uses [-1+1e-7, 1-1e-7]);
* polar(deg) -> cartesian unit vector (``src/utils/seld_metrics.py:51-66``);
* cartesian -> polar(deg) (``src/utils/seld_metrics.py:68-81``);
* cartesian great-circle distance with vector normalization
  (``src/utils/seld_metrics.py:97-114``).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "gc_distance_deg",
    "polar_to_cartesian",
    "cartesian_to_polar",
    "np_gc_distance_deg",
    "np_cartesian_distance_deg",
]


def gc_distance_deg(uv1, uv2, clip_eps: float = 0.0):
    """Great-circle distance in degrees between two (..., 2) [azi, ele] deg
    arrays (broadcasting).  ``clip_eps=1e-7`` matches the loss's clip
    (loss.py:187); 0 matches the decoder's (datasets.py:871)."""
    a1 = jnp.deg2rad(uv1[..., 0])
    e1 = jnp.deg2rad(uv1[..., 1])
    a2 = jnp.deg2rad(uv2[..., 0])
    e2 = jnp.deg2rad(uv2[..., 1])
    cos = (jnp.sin(e1) * jnp.sin(e2)
           + jnp.cos(e1) * jnp.cos(e2) * jnp.cos(jnp.abs(a1 - a2)))
    cos = jnp.clip(cos, -1.0 + clip_eps, 1.0 - clip_eps)
    return jnp.rad2deg(jnp.arccos(cos))


def polar_to_cartesian(uv):
    """(..., 2) [azi_deg, ele_deg] -> (..., 3) unit xyz
    (x = cos a cos e, y = sin a cos e, z = sin e)."""
    a = jnp.deg2rad(uv[..., 0])
    e = jnp.deg2rad(uv[..., 1])
    ce = jnp.cos(e)
    return jnp.stack([jnp.cos(a) * ce, jnp.sin(a) * ce, jnp.sin(e)], axis=-1)


def cartesian_to_polar(xyz):
    """(..., 3) xyz -> (..., 2) [azi_deg, ele_deg] (elevation w.r.t. the
    horizontal plane, matching seld_metrics.py:74-80)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    azi = jnp.rad2deg(jnp.arctan2(y, x))
    ele = jnp.rad2deg(jnp.arctan2(z, jnp.sqrt(x * x + y * y)))
    return jnp.stack([azi, ele], axis=-1)


# ---- numpy twins (metrics / host post-processing) -------------------------


def np_gc_distance_deg(az1, ele1, az2, ele2):
    """Spherical distance, inputs in **radians**, output degrees
    (seld_metrics.py:83-94 convention)."""
    cos = np.sin(ele1) * np.sin(ele2) + np.cos(ele1) * np.cos(ele2) * np.cos(np.abs(az1 - az2))
    return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))


def np_cartesian_distance_deg(x1, y1, z1, x2, y2, z2):
    """Cartesian great-circle distance in degrees with 1e-10 norm guard
    (seld_metrics.py:97-114)."""
    n1 = np.sqrt(x1 ** 2 + y1 ** 2 + z1 ** 2 + 1e-10)
    n2 = np.sqrt(x2 ** 2 + y2 ** 2 + z2 ** 2 + 1e-10)
    x1, y1, z1 = x1 / n1, y1 / n1, z1 / n1
    x2, y2, z2 = x2 / n2, y2 / n2, z2 / n2
    cos = np.clip(x1 * x2 + y1 * y2 + z1 * z2, -1.0, 1.0)
    return np.degrees(np.arccos(cos))
