"""Threefry2x32 counter-based RNG as pure int32 vector ops.

The fused mesh kernel draws per-spin randomness *inside* a Pallas kernel,
keyed by the spin's carried global id — so the stream is independent of the
ensemble's sort order, padding, and device sharding. ``jax.random`` cannot
be called inside a Mosaic kernel, so this module implements the same
Threefry2x32 block cipher (Salmon et al., "Parallel random numbers: as easy
as 1, 2, 3", SC'11) as plain shift/xor/add ops that lower to the TPU's
vector unit both under XLA and inside Pallas.

13 rounds is the paper's recommended minimum for Threefry2x32 (jax uses the
conservative 20); draws here feed Monte Carlo physics, not cryptography.

All functions operate elementwise on int32 arrays of any shape and use
wrapping int32 arithmetic (XLA semantics).
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.int32(np.uint32(0x1BD11BDA).view(np.int32))


def _rotl(x, r):
    # Explicit int32 shift amounts: under jax x64 mode a bare python int
    # would promote to int64 and lax shifts reject mixed types.
    return (x << np.int32(r)) | lax.shift_right_logical(x, np.int32(32 - r))


def threefry2x32(k0, k1, x0, x1, rounds=13):
    """Threefry2x32 block cipher: key (k0, k1), counter (x0, x1).

    Parameters are int32 arrays (broadcastable); returns two int32 arrays
    of the broadcast shape. ``rounds`` in {13, 20}.
    """
    k0 = jnp.asarray(k0, jnp.int32)
    k1 = jnp.asarray(k1, jnp.int32)
    ks = (k0, k1, k0 ^ k1 ^ _PARITY)
    x0 = jnp.asarray(x0, jnp.int32) + ks[0]
    x1 = jnp.asarray(x1, jnp.int32) + ks[1]
    for r in range(rounds):
        x0 = x0 + x1
        x1 = _rotl(x1, _ROTATIONS[r % 8])
        x1 = x1 ^ x0
        if r % 4 == 3:
            g = r // 4 + 1  # key injection after every 4 rounds
            x0 = x0 + ks[g % 3]
            x1 = x1 + ks[(g + 1) % 3] + np.int32(g)
    return x0, x1


def uniform01(bits, dtype=jnp.float32):
    """Map int32 random bits to uniforms in [0, 1) with 24-bit resolution."""
    return lax.shift_right_logical(bits, np.int32(8)).astype(dtype) * jnp.asarray(
        1.0 / (1 << 24), dtype
    )


_uniform01 = uniform01


def step_words(seed, t, ids, draw):
    """Two int32 random words for (seed, time step, spin id, draw index).

    ``ids`` is an int32 array; ``seed``, ``t``, ``draw`` are scalars (may be
    traced). The key is (seed, t) and the counter (id, draw): every
    (spin, step, draw) triple gets an independent block regardless of where
    the spin currently sits in the sorted ensemble.
    """
    return threefry2x32(
        jnp.int32(seed), jnp.asarray(t, jnp.int32), ids, jnp.asarray(draw, jnp.int32)
    )


def unit_directions(seed, t, ids, dtype=jnp.float32):
    """Isotropic unit directions (3, n) keyed per (seed, t, spin id).

    Archimedes sampling: z uniform in [-1, 1], uniform azimuth — the same
    distribution as the engine's host-level sampler (rng.random_unit_steps)
    on an independent, id-keyed stream.
    """
    w0, w1 = step_words(seed, t, ids, 0)
    u0 = _uniform01(w0, dtype)
    u1 = _uniform01(w1, dtype)
    z = 1.0 - 2.0 * u0
    rho = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = (2.0 * np.pi) * u1
    return jnp.stack((rho * jnp.cos(phi), rho * jnp.sin(phi), z))


def bounce_uniform(seed, t, ids, bounce, dtype=jnp.float32):
    """Uniform in [0, 1) for the ``bounce``-th collision resolve."""
    w0, _ = threefry2x32(
        jnp.int32(seed),
        jnp.asarray(t, jnp.int32),
        ids,
        jnp.asarray(bounce, jnp.int32) + jnp.int32(1),
    )
    return _uniform01(w0, dtype)
