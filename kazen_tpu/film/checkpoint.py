"""Pass-based render checkpointing (SURVEY §5 'Checkpoint / resume').

The reference has none (a render is all-or-nothing); here the film
accumulation buffer plus the next sample index IS the complete render state,
because sampler streams are counter-based (§3.4): resuming at sample s
regenerates exactly the draws the reference would have produced. Stored as
a plain .npz next to the output.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def save(path: str, film, next_sample: int, seed: int) -> None:
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp,
        film=np.asarray(film),
        next_sample=np.int64(next_sample),
        seed=np.int64(seed),
    )
    # numpy appends .npz to names without it
    actual = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual, path)


def load(path: str) -> Optional[Tuple[np.ndarray, int, int]]:
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return z["film"], int(z["next_sample"]), int(z["seed"])


def render_resumable(
    scene,
    static,
    spec=None,
    spp: Optional[int] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 32,
):
    """render() with periodic film checkpoints; resumes if a checkpoint for
    the same seed exists."""
    import jax.numpy as jnp

    from ..core import rng
    from ..integrate.render import _render_pass, sampler_spec
    from . import film as film_mod

    if spec is None:
        spec = sampler_spec(static)
    n_samples = spp if spp is not None else spec.effective_sample_count

    start = 0
    film = film_mod.make_film(static)
    if checkpoint_path:
        ck = load(checkpoint_path)
        if ck is not None and ck[2] == static.seed and ck[1] <= n_samples:
            film = jnp.asarray(ck[0])
            start = ck[1]

    h, w = static.height, static.width
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
    py = jnp.asarray(ys.reshape(-1).astype(np.uint32))

    for s in range(start, n_samples):
        a, c = rng.advance_constants(s * 65536)
        jump = (
            (jnp.uint32(a >> 32), jnp.uint32(a & 0xFFFFFFFF)),
            (jnp.uint32(c >> 32), jnp.uint32(c & 0xFFFFFFFF)),
        )
        film, _ = _render_pass(
            scene, static, spec, film, px, py, jnp.uint32(s), jump
        )
        done = s + 1
        if checkpoint_path and (
            done % checkpoint_every == 0 or done == n_samples
        ):
            save(checkpoint_path, film, done, static.seed)
    return film_mod.to_bitmap(film)
