"""Counter-based random numbers for the simulation engine.

The reference implementation carries one xoroshiro128p state per CUDA thread
(disimpy/simulations.py:12-17, :1171). On TPU we instead derive a fresh
threefry key per (seed, time step) with ``jax.random.fold_in``; draws are
stateless, replay-safe, and partitionable across device meshes (the same
seed yields the same physics on 1 chip or 256).
"""

import numpy as np
import jax
import jax.numpy as jnp


def step_key(base_key, t):
    """Key for time step ``t`` (``t`` may be a traced integer)."""
    return jax.random.fold_in(base_key, t)


def bounce_key(step_k, bounce_idx):
    """Key for the ``bounce_idx``-th collision iteration within a step."""
    return jax.random.fold_in(step_k, bounce_idx + 1)


def random_unit_steps(key, n, dtype):
    """Draw ``n`` isotropically distributed unit step directions.

    Matches the reference's distribution (a uniform point on the unit
    sphere; the reference normalizes 3 standard normals,
    disimpy/simulations.py:121-138) without matching its RNG stream — no
    test or oracle depends on the exact stream, only on the distribution.
    Sampled via Archimedes' theorem (z uniform in [-1, 1], uniform
    azimuth): 2 uniforms and one sincos instead of 3 gaussians (each an
    erfinv) and a normalization — the cheap path on a TPU vector unit.

    The two uniforms are drawn as separate (n,) arrays from two folded
    keys — NOT one (2, n) array — so spin i's draws depend only on
    (key, i): a (2, n) draw would give row 1's element i the flat counter
    n + i, making every spin's azimuth depend on the ensemble size (and
    the sharded runs' spin padding would silently change the physics).

    Returns
    -------
    jnp.ndarray of shape (3, n): unit columns, components in rows so the
    spin axis is the (128-wide) lane dimension.
    """
    u0 = jax.random.uniform(jax.random.fold_in(key, 0), (n,), dtype=dtype)
    u1 = jax.random.uniform(jax.random.fold_in(key, 1), (n,), dtype=dtype)
    z = 1.0 - 2.0 * u0
    rho = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = (2.0 * np.pi) * u1
    return jnp.stack((rho * jnp.cos(phi), rho * jnp.sin(phi), z))


def uniforms(key, n, dtype):
    """Draw ``n`` uniforms in [0, 1) (permeability decisions)."""
    return jax.random.uniform(key, (n,), dtype=dtype)
