"""Counter-based random numbers for the simulation engine.

The reference implementation carries one xoroshiro128p state per CUDA thread
(disimpy/simulations.py:12-17, :1171). On TPU we instead derive a fresh
threefry key per (seed, time step) with ``jax.random.fold_in``; draws are
stateless, replay-safe, and partitionable across device meshes (the same
seed yields the same physics on 1 chip or 256).
"""

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

    Matches the reference's distribution (3 standard normals, normalized;
    disimpy/simulations.py:121-138) without matching its RNG stream — no
    test or oracle depends on the exact stream, only on the distribution.

    Returns
    -------
    jnp.ndarray of shape (n, 3), unit rows.
    """
    v = jax.random.normal(key, (n, 3), dtype=dtype)
    norm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / norm


def uniforms(key, n, dtype):
    """Draw ``n`` uniforms in [0, 1) (permeability decisions)."""
    return jax.random.uniform(key, (n,), dtype=dtype)
