"""Participating media: nonscatter Beer-Lambert absorption
(medium.cpp:5-31, medium.h:6-14).

The reference registers exactly one medium, used only by the commented-out
volumetric integrator (integrator.cpp:358-551): absorption coefficient
derived from a target color at a reference distance,
sigma = -log(color) / distance; transmission over t is exp(-sigma * t).
Provided here for API completeness and future volumetric integrators.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class NonScatterMedium(NamedTuple):
    sigma: jnp.ndarray  # (3,) absorption coefficient


def make_nonscatter(color, distance: float = 1.0) -> NonScatterMedium:
    """NonScatterMedium ctor (medium.cpp:7-15): coefficient from the color
    reached after `distance` units."""
    c = jnp.clip(jnp.asarray(color, jnp.float32), 1e-6, 1.0)
    return NonScatterMedium(sigma=-jnp.log(c) / distance)


def transmission(medium: NonScatterMedium, t):
    """Beer-Lambert transmittance over path length t (medium.cpp:20-28)."""
    return jnp.exp(-medium.sigma * jnp.asarray(t)[..., None])


def distance_sample(medium: NonScatterMedium, u):
    """Distance sampling for the mean channel (for future volpath)."""
    sigma_bar = jnp.mean(medium.sigma)
    return -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / sigma_bar
