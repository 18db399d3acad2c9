"""Sharding spins over a TPU device mesh.

Spins are embarrassingly parallel: every array with a spin axis shards over
a one-dimensional ``jax.sharding.Mesh`` ("spins"), substrate geometry and
the gradient waveform replicate, and the only cross-device communication in
the whole simulation is the final ``sum_spins cos(phi)`` reduction, which
XLA lowers to a single ``psum`` over ICI.

We use GSPMD global-view semantics (sharded inputs into a ``jit``-compiled
program) instead of ``shard_map``: with partitionable threefry keys
(default in current jax), the per-step random draws are computed
shard-locally but are bitwise identical to the single-device run, so the
same seed gives the same physics on any device count.

The reference has no multi-device story at all (single CUDA stream,
disimpy/simulations.py:1163-1166); this module is the TPU-native scaling
path.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPIN_AXIS = "spins"


def spin_mesh(devices=None):
    """Build a 1-D device mesh over the spin axis.

    Parameters
    ----------
    devices : None, int, or sequence of jax.Device
        ``None``: all visible devices. ``int n``: the first n devices.
        A sequence: exactly those devices.

    Returns
    -------
    jax.sharding.Mesh
    """
    if devices is None:
        devices = jax.devices()
    elif isinstance(devices, int):
        devices = jax.devices()[:devices]
    return Mesh(np.array(devices), (SPIN_AXIS,))


def padded_spin_count(n_spins, mesh):
    """Smallest multiple of the mesh size that is >= n_spins."""
    n_dev = mesh.devices.size
    return -(-n_spins // n_dev) * n_dev


def shard_simulation_arrays(mesh, positions, phases, iter_exc):
    """Place the spin-axis state arrays onto the mesh.

    ``positions`` is (3, n_spins), ``phases`` is (n_meas, n_spins),
    ``iter_exc`` is (n_spins,); n_spins must be a multiple of the mesh size
    (use :func:`padded_spin_count`).
    """
    positions = jax.device_put(positions, NamedSharding(mesh, P(None, SPIN_AXIS)))
    phases = jax.device_put(phases, NamedSharding(mesh, P(None, SPIN_AXIS)))
    iter_exc = jax.device_put(iter_exc, NamedSharding(mesh, P(SPIN_AXIS)))
    return positions, phases, iter_exc


def replicate(mesh, *arrays):
    """Replicate waveform / geometry arrays across the mesh."""
    sharding = NamedSharding(mesh, P())
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) != 1 else out[0]
