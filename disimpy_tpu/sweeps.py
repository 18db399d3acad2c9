"""Batched microstructure sweeps: many substrate variants in one program.

The reference runs one substrate per ``simulation()`` call; sweeping a
model parameter (a cylinder radius map, a sphere size distribution) costs
one GPU launch sequence per value. On TPU the sweep axis becomes a
``jax.vmap`` batch dimension over the compiled scan: all variants advance
in lockstep inside one XLA program, sharing the waveform upload, the MXU
phase contraction, and the device dispatch (BASELINE.json configuration 5).

Waveform sweeps need no machinery: the measurement axis already batches
arbitrary waveforms — concatenate them along axis 0 of ``gradient``.

RNG note: every variant uses the same counter-based streams as a single
:func:`disimpy_tpu.simulations.simulation` run with the same seed, so row
``i`` of a sweep is bit-identical to the corresponding standalone
simulation — and rows are correlated with each other (common random
numbers: ideal for comparing variants, but draw different seeds if you
need independent ensembles).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import utils
from .engine import core as engine_core
from .engine.specs import CylinderSpec, SphereSpec
from .gradients import GAMMA
from .simulations import _effective_epsilon, _fill_circle, _fill_sphere

__all__ = ["sweep_cylinder_radii", "sweep_sphere_radii"]


@partial(jax.jit, static_argnames=("kind",))
def _run_batch(kind, specs, positions, phases, iter_exc, g_eff, ts, key,
               epsilons, max_iter):
    def one(spec, pos, ph, exc, eps):
        (pos, ph, exc), _ = engine_core.run_window(
            kind, spec, pos, ph, exc, g_eff, ts, key, eps, max_iter
        )
        return ph, exc

    return jax.vmap(one)(specs, positions, phases, iter_exc, epsilons)


def _common(gradient, dt, diffusivity):
    n_meas, n_t, _ = gradient.shape
    step_l = float(np.sqrt(6 * diffusivity * dt))
    g_eff = (GAMMA * dt * step_l) * np.transpose(gradient, (1, 0, 2))
    return n_meas, n_t, step_l, g_eff


def sweep_cylinder_radii(
    n_walkers,
    diffusivity,
    gradient,
    dt,
    radii,
    orientation=np.array([1.0, 0.0, 0.0]),
    seed=123,
    max_iter=int(1e3),
    epsilon=1e-13,
    dtype="float32",
):
    """Simulate one experiment inside cylinders of several radii at once.

    Parameters mirror :func:`disimpy_tpu.simulations.simulation`;
    ``radii`` is a sequence of R cylinder radii (metres). Returns an
    (R, n_measurements) signal array computed by a single compiled
    program (vmapped over the radius axis).
    """
    radii = np.asarray(radii, dtype=float)
    dtype = jnp.dtype(dtype)
    n_meas, n_t, step_l, g_eff = _common(gradient, dt, diffusivity)
    scale = 1.0 / step_l

    orientation = np.asarray(orientation, dtype=float)
    if orientation[np.argmax(np.abs(orientation))] < 0:
        orientation = -orientation
    R = utils.vec2vec_rotmat(orientation, np.array([1.0, 0.0, 0.0]))
    frame_to_lab = np.linalg.inv(R)
    g_eff = g_eff @ frame_to_lab

    positions = np.zeros((len(radii), 3, n_walkers))
    for i, r in enumerate(radii):
        np.random.seed(seed)
        positions[i, 1:3] = _fill_circle(n_walkers, r).T * scale
    specs = CylinderSpec(
        radius=jnp.asarray(radii * scale, dtype=dtype),
        perm_prob=jnp.zeros(len(radii), dtype=dtype),
    )
    return _finish(
        "cylinder", specs, positions, radii * scale, g_eff, n_meas, n_t,
        scale, seed, max_iter, epsilon, dtype, bounded=False,
    )


def sweep_sphere_radii(
    n_walkers,
    diffusivity,
    gradient,
    dt,
    radii,
    seed=123,
    max_iter=int(1e3),
    epsilon=1e-13,
    dtype="float32",
):
    """Simulate one experiment inside spheres of several radii at once.

    Returns an (R, n_measurements) signal array; see
    :func:`sweep_cylinder_radii`.
    """
    radii = np.asarray(radii, dtype=float)
    dtype = jnp.dtype(dtype)
    n_meas, n_t, step_l, g_eff = _common(gradient, dt, diffusivity)
    scale = 1.0 / step_l
    positions = np.zeros((len(radii), 3, n_walkers))
    for i, r in enumerate(radii):
        np.random.seed(seed)
        positions[i] = _fill_sphere(n_walkers, r).T * scale
    specs = SphereSpec(
        radius=jnp.asarray(radii * scale, dtype=dtype),
        perm_prob=jnp.zeros(len(radii), dtype=dtype),
    )
    return _finish(
        "sphere", specs, positions, radii * scale, g_eff, n_meas, n_t,
        scale, seed, max_iter, epsilon, dtype, bounded=True,
    )


def _finish(kind, specs, positions, extents, g_eff, n_meas, n_t, scale,
            seed, max_iter, epsilon, dtype, bounded):
    n_batch, _, n_walkers = positions.shape
    # Per-variant epsilon: each row reproduces its standalone simulation
    # bit-for-bit (the effective epsilon depends on the geometry extent).
    eps_eff = np.array([
        _effective_epsilon(epsilon, scale, float(e), n_t, dtype, bounded)
        for e in extents
    ])
    phases, exc = _run_batch(
        kind,
        specs,
        jnp.asarray(positions, dtype=dtype),
        jnp.zeros((n_batch, n_meas, n_walkers), dtype=dtype),
        jnp.zeros((n_batch, n_walkers), dtype=bool),
        jnp.asarray(g_eff, dtype=dtype),
        jnp.arange(n_t),
        jax.random.PRNGKey(seed),
        jnp.asarray(eps_eff, dtype=dtype),
        jnp.asarray(max_iter, jnp.int32),
    )
    cos = jnp.cos(phases)
    signals = jnp.sum(jnp.where(exc[:, None, :], 0.0, cos), axis=2)
    return np.asarray(signals, dtype=float)
