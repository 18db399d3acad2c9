"""disimpy_tpu: a TPU-native diffusion-MRI Monte Carlo random-walk simulator.

This package generates simulated diffusion-weighted MR signals by simulating
large ensembles of random walkers ("spins") inside geometric substrates
(free space, sphere, infinite cylinder, ellipsoid, or an arbitrary triangular
mesh with a uniform-grid acceleration structure), accruing MR phase from a
user-supplied gradient waveform, and reducing the final per-spin phases to a
signal.

It provides the same capabilities and public API surface as the CUDA-based
Disimpy package (see /root/reference, kerkelae/disimpy), re-designed for TPU
hardware: the whole time loop runs as a single XLA-compiled ``lax.scan``, the
per-spin collision handling is expressed as batched, masked bounce loops, the
mesh acceleration grid is a padded structure-of-arrays, random numbers come
from counter-based threefry keys, and spins shard over a ``jax.sharding.Mesh``
so multi-chip scaling falls out of GSPMD partitioning.

Modules
-------
gradients
    Gradient-waveform toolkit (synthesis, b-value math, rotation, Camino IO).
substrates
    Substrate factories and mesh preprocessing (acceleration grid).
simulations
    The simulation driver and noise utilities.
utils
    Rotation helpers and optional matplotlib visualization.
engine
    The jax/Pallas compute core (internal, but importable).
parallel
    Device-mesh / sharding helpers for multi-chip runs.
"""

from . import gradients, substrates, simulations, utils

__version__ = "0.1.0"

__all__ = ["gradients", "substrates", "simulations", "utils", "__version__"]


def test(args=()):
    """Run the test suite (parity shim for the reference's
    ``disimpy.tests.test_all()``). Requires the repository checkout with
    its ``tests/`` directory."""
    import os
    import pytest

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return pytest.main([os.path.join(repo_root, "tests"), *args])
