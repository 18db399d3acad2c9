"""The jax compute core of disimpy_tpu.

Layout
------
``geometry``
    Batched (spin-vectorized) geometric primitives: analytic surface
    intersections, Moller-Trumbore ray/triangle tests, reflection and
    permeable-crossing updates.
``rng``
    Counter-based (threefry) random step directions and uniforms. One key per
    (simulation, time step); streams are replay-safe and partitionable, so
    the same seed gives the same physics regardless of device layout.
``specs``
    Substrate pytrees consumed by the engine (geometry rescaled to
    step-length units).
``mesh_accel``
    Padded structure-of-arrays packing of the mesh acceleration grid plus
    the nearest-triangle-hit query.
``stepping``
    One-time-step updates per substrate kind (masked bounce loops).
``core``
    The scan-over-time driver producing phases / signals / trajectories.

The engine replaces the reference's per-step CUDA kernel launches
(disimpy/simulations.py:1189-1400, one launch + host sync per time step)
with a single compiled ``lax.scan``.
"""

from . import core, geometry, mesh_accel, rng, specs, stepping  # noqa: F401
