"""Substrate pytrees consumed by the stepping engine.

The engine works in *step-length units*: all geometry is rescaled by
``1 / step_l`` at setup so a time step always has length 1. This keeps every
coordinate O(1)-O(100) regardless of whether the substrate is micrometres or
metres across, which is what makes float32 (the TPU-native precision) viable
for the geometry while staying inside the reference's signal tolerances.

Array fields are pytree data (traced); shape-determining fields (subvoxel
counts, traversal spans, chunk sizes) are pytree metadata, i.e. static under
``jax.jit`` — recompilation happens per grid configuration, not per radius.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


def _register(cls, data_fields, meta_fields):
    return partial(
        jax.tree_util.register_dataclass,
        data_fields=data_fields,
        meta_fields=meta_fields,
    )(cls)


@partial(_register, data_fields=[], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class FreeSpec:
    """Free diffusion: no geometry."""


@partial(_register, data_fields=["radius", "perm_prob"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class SphereSpec:
    """Sphere of ``radius`` (step-length units), centred at the origin.

    ``perm_prob`` is the probability of crossing the surface per collision
    (TPU-native extension; the reference supports permeability only for
    mesh substrates, disimpy/substrates.py:151).
    """

    radius: jnp.ndarray
    perm_prob: jnp.ndarray


@partial(_register, data_fields=["radius", "perm_prob"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class CylinderSpec:
    """Infinite cylinder along +x of ``radius`` (step-length units).

    The engine simulates in the cylinder frame; the driver rotates the
    waveform into this frame and the trajectories back out, so no per-step
    frame rotations are needed (unlike the reference, which rotates every
    spin into and out of the cylinder frame every step,
    disimpy/simulations.py:784-803).
    """

    radius: jnp.ndarray
    perm_prob: jnp.ndarray


@partial(_register, data_fields=["semiaxes", "perm_prob"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class EllipsoidSpec:
    """Axis-aligned ellipsoid with ``semiaxes`` (3,), in the ellipsoid frame."""

    semiaxes: jnp.ndarray
    perm_prob: jnp.ndarray


@partial(
    _register,
    data_fields=["tri", "cell_counts", "voxel_size", "sv_width", "perm_prob"],
    meta_fields=["n_sv", "spans", "chunk"],
)
@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Triangle mesh packed into its uniform-grid acceleration structure.

    Attributes
    ----------
    tri : jnp.ndarray
        (n_subvoxels, n_chunks, chunk, 12) fused per-slot triangle records:
        9 corner coordinates (step-length units) followed by the unit
        normal. Subvoxel (x, y, z) is row
        ``x * n_sv[1] * n_sv[2] + y * n_sv[2] + z``; padding slots hold
        all-zero (degenerate) triangles that the intersection test rejects
        by construction. Triangles overlapping several subvoxels are stored
        once per subvoxel — the fetch path trades modest duplication for a
        single contiguous row gather per candidate.
    voxel_size : jnp.ndarray
        (3,) voxel extent (step-length units); the periodic tile.
    sv_width : jnp.ndarray
        (3,) subvoxel width per axis.
    perm_prob : jnp.ndarray
        Scalar probability of passing through a triangle on collision.
    n_sv : tuple[int, int, int]
        Static subvoxel counts.
    spans : tuple[int, int, int]
        Static per-axis maximum number of subvoxels a unit step segment can
        overlap; the traversal enumerates the ``prod(spans)`` offsets.
    chunk : int
        Static number of candidate triangles processed per inner iteration.
    """

    tri: jnp.ndarray
    cell_counts: jnp.ndarray
    voxel_size: jnp.ndarray
    sv_width: jnp.ndarray
    perm_prob: jnp.ndarray
    n_sv: tuple
    spans: tuple
    chunk: int
