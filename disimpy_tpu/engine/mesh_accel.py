"""Mesh acceleration: packed grid construction and nearest-hit queries.

The reference stores the acceleration grid as CSR index arrays and walks
them with data-dependent per-thread loops (disimpy/simulations.py:929-983).
On TPU, data-dependent loop bounds defeat vectorization, so the grid is
re-packed into a rectangular padded layout: every subvoxel gets the same
number of (possibly -1-padded) triangle slots, processed in fixed-size
chunks. A spin's candidate subvoxels are enumerated from a *static* set of
grid offsets covering the largest axis-aligned box a unit step segment can
overlap; out-of-range slots and padding are masked rather than branched.

Periodicity is handled exactly like the reference (simulations.py:937-971):
candidate subvoxel indices live on the infinite grid, are wrapped into the
voxel with a whole-voxel shift, and the spin is tested against the wrapped
subvoxel's triangles at its shifted position.
"""

import math

import numpy as np
import jax.numpy as jnp
from jax import lax

from . import geometry
from .specs import MeshSpec


def pack_mesh(substrate, scale, dtype, chunk=None):
    """Build a :class:`MeshSpec` from a host-side mesh substrate.

    Parameters
    ----------
    substrate : disimpy_tpu.substrates._Substrate
        A substrate of type "mesh" (with CSR grid already built).
    scale : float
        Coordinate rescale factor (1 / step length in metres).
    dtype : jnp.dtype
        Engine floating-point dtype.
    chunk : int, optional
        Candidate-triangle chunk size; defaults to a size that balances
        gather width against loop trip count.

    Returns
    -------
    MeshSpec
    """
    vertices = np.asarray(substrate.vertices, dtype=np.float64) * scale
    faces = np.asarray(substrate.faces)
    tri = vertices[faces]  # (n_tris, 3, 3)
    voxel_size = np.asarray(substrate.voxel_size, dtype=np.float64) * scale
    n_sv = tuple(int(x) for x in substrate.n_sv)
    n_subvoxels = n_sv[0] * n_sv[1] * n_sv[2]
    sv_width = voxel_size / np.array(n_sv, dtype=np.float64)

    csr_ranges = np.asarray(substrate.subvoxel_indices)
    tri_ids = np.asarray(substrate.triangle_indices)
    counts = csr_ranges[:, 1] - csr_ranges[:, 0]
    K = max(int(counts.max()) if counts.size else 0, 1)
    if chunk is None:
        chunk = min(128, K)
    n_chunks = -(-K // chunk)
    K_pad = n_chunks * chunk
    sv_tris = np.full((n_subvoxels, K_pad), -1, dtype=np.int32)
    # CSR is subvoxel-major and contiguous, so a single masked assignment
    # scatters every subvoxel's triangle list into its padded row.
    slot_mask = np.arange(K_pad)[None, :] < counts[:, None]
    sv_tris[slot_mask] = tri_ids

    # Static per-axis traversal spans: a segment of length <= 1 step plus
    # epsilon slack overlaps at most floor(1 / w) + 2 subvoxels per axis.
    spans = tuple(int(math.floor(1.0 / w)) + 2 for w in sv_width)

    return MeshSpec(
        tri=jnp.asarray(tri, dtype=dtype),
        sv_tris=jnp.asarray(sv_tris.reshape(n_subvoxels, n_chunks, chunk)),
        voxel_size=jnp.asarray(voxel_size, dtype=dtype),
        sv_width=jnp.asarray(sv_width, dtype=dtype),
        perm_prob=jnp.asarray(substrate.perm_prob, dtype=dtype),
        n_sv=n_sv,
        spans=spans,
        chunk=int(chunk),
    )


def _slot_offsets(spans):
    """All (dx, dy, dz) subvoxel offsets covering the traversal box."""
    ox, oy, oz = np.meshgrid(
        np.arange(spans[0]), np.arange(spans[1]), np.arange(spans[2]), indexing="ij"
    )
    return np.stack((ox.ravel(), oy.ravel(), oz.ravel()), axis=1).astype(np.int32)


def nearest_hit(mesh: MeshSpec, r0, direction, rem):
    """Closest triangle intersection along each spin's remaining segment.

    Parameters
    ----------
    mesh : MeshSpec
    r0 : jnp.ndarray
        (n, 3) spin positions (step-length units, possibly outside the
        voxel when periodic).
    direction : jnp.ndarray
        (n, 3) unit step directions.
    rem : jnp.ndarray
        (n,) remaining step lengths.

    Returns
    -------
    min_d : jnp.ndarray
        (n,) distance to the closest strictly-forward intersection
        (``inf`` when none is found among the candidates).
    best_tri : jnp.ndarray
        (n,) int32 index of the closest triangle (0 when none).
    """
    n = r0.shape[0]
    dtype = r0.dtype
    n_sv = jnp.asarray(mesh.n_sv, dtype=jnp.int32)
    seg_end = r0 + direction * rem[:, None]
    lo = jnp.minimum(r0, seg_end)
    hi = jnp.maximum(r0, seg_end)
    base = jnp.floor(lo / mesh.sv_width).astype(jnp.int32)  # (n, 3)
    upper = jnp.ceil(hi / mesh.sv_width).astype(jnp.int32)
    upper = jnp.maximum(upper, base + 1)  # never an empty range

    offsets = jnp.asarray(_slot_offsets(mesh.spans))  # (S, 3)
    n_chunks = mesh.sv_tris.shape[1]
    row_idx = jnp.arange(n)

    def visit_slot(carry, off):
        min_d, best = carry
        idx = base + off[None, :]  # (n, 3) infinite-grid subvoxel
        in_range = jnp.all(idx < upper, axis=1)
        shift_n = jnp.floor_divide(idx, n_sv)
        wrapped = idx - shift_n * n_sv
        sv = (wrapped[:, 0] * n_sv[1] + wrapped[:, 1]) * n_sv[2] + wrapped[:, 2]
        # Test the spin against the wrapped subvoxel at its shifted position.
        shifted_r0 = r0 - shift_n.astype(dtype) * mesh.voxel_size

        def visit_chunk(carry_c, c):
            min_d_c, best_c = carry_c
            ids = mesh.sv_tris[sv, c]  # (n, chunk)
            tri = mesh.tri[jnp.maximum(ids, 0)]  # (n, chunk, 3, 3)
            t = geometry.ray_triangle_intersection(
                tri, shifted_r0[:, None, :], direction[:, None, :]
            )
            valid = (ids >= 0) & in_range[:, None] & (t > 0)
            t = jnp.where(valid, t, jnp.inf)
            arg = jnp.argmin(t, axis=1)
            d_here = t[row_idx, arg]
            id_here = ids[row_idx, arg]
            better = d_here < min_d_c
            return (
                jnp.where(better, d_here, min_d_c),
                jnp.where(better, id_here, best_c),
            ), None

        if n_chunks == 1:
            (min_d, best), _ = visit_chunk((min_d, best), 0)
        else:
            (min_d, best), _ = lax.scan(
                visit_chunk, (min_d, best), jnp.arange(n_chunks)
            )
        return (min_d, best), None

    init = (jnp.full((n,), jnp.inf, dtype=dtype), jnp.zeros((n,), jnp.int32))
    if offsets.shape[0] == 1:
        (min_d, best), _ = visit_slot(init, offsets[0])
    else:
        (min_d, best), _ = lax.scan(visit_slot, init, offsets)
    return min_d, best
