"""Pallas TPU kernel for the mesh nearest-hit query.

Why this exists: the XLA fallback (mesh_accel.nearest_hit) fetches each
spin's candidate-triangle row with a gather, and per-lane gathers on TPU run
on the scalar core — orders of magnitude below HBM bandwidth. This kernel
removes gathers entirely:

1. Spins are sorted by their (wrapped) grid-cell id with ``lax.sort``
   (a vectorized sorting network; the payload rides along, no gathers).
2. A Pallas kernel walks tiles of the sorted spins. Within a tile, spins
   sharing a cell form contiguous *runs*; for each run the kernel DMAs that
   cell's triangle records (a single uniform HBM row -> VMEM copy) and
   evaluates Moller-Trumbore for the whole tile against the buffered
   triangles, masking lanes outside the run. At production spin densities
   (tens of spins per cell) almost every tile touches only a few rows.
3. Results are restored to walker order with a second ``lax.sort`` keyed by
   the original lane index.

Requires the halo table layout (MeshSpec.spans == (1, 1, 1)): one row per
cell containing every triangle a unit step segment starting in the cell can
reach (see mesh_accel.pack_mesh).

Data layout inside the kernel: spins live in lanes (R = 128 per tile),
triangles in sublanes — all arrays are (K, R) or (rows, R), so K only needs
8-sublane alignment, not 128-lane alignment.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # spins per kernel invocation (one vector lane each)
EDGE_TOL = np.float32(1e-5)  # barycentric leak-proofing tolerance (f32)
_INF = np.float32(np.inf)


def _mt_block(spin_rows, tri_cols):
    """Moller-Trumbore for BLOCK spins (sublanes) x K triangles (lanes).

    spin_rows: (BLOCK, 8) rows [x, y, z, dx, dy, dz, rem, unused], one spin
    per sublane. tri_cols: (16, K) rows [Ax..Cz (9), nx, ny, nz (3), pad].

    Returns (d, nx, ny, nz): (BLOCK, 1) arrays — distance of the closest
    strictly-forward hit (inf if none) and its unoriented unit normal.
    """
    r0 = [spin_rows[:, i][:, None] for i in range(3)]  # (BLOCK, 1) each
    dirn = [spin_rows[:, 3 + i][:, None] for i in range(3)]
    A = [tri_cols[i, :][None, :] for i in range(3)]  # (1, K) each
    B = [tri_cols[3 + i, :][None, :] for i in range(3)]
    C = [tri_cols[6 + i, :][None, :] for i in range(3)]

    E1 = [B[i] - A[i] for i in range(3)]  # (1, K)
    E2 = [C[i] - A[i] for i in range(3)]
    T = [r0[i] - A[i] for i in range(3)]  # (BLOCK, K)

    def cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    P = cross(dirn, E2)  # (BLOCK, K)
    Q = cross(T, E1)
    det = dot(P, E1)
    inv_det = 1.0 / det
    t = inv_det * dot(Q, E2)
    u = inv_det * dot(P, T)
    v = inv_det * dot(Q, dirn)
    # Same barycentric edge tolerance as the XLA path: float32 rounding
    # must not open leak gaps along shared triangle edges.
    lo, hi = -EDGE_TOL, 1.0 + EDGE_TOL
    ok = (
        (det != 0)
        & (u >= lo)
        & (u <= hi)
        & (v >= lo)
        & (v <= hi)
        & (u + v <= hi)
        & (t > 0)
    )
    t = jnp.where(ok, t, _INF)
    # Closest hit over triangles (lane reduction) + its normal.
    d = jnp.min(t, axis=1, keepdims=True)  # (BLOCK, 1)
    is_min = t == d
    # Ties (two adjacent triangles at the same f32 distance, which the
    # edge tolerance makes possible on shared-edge hits) are broken by the
    # lowest lane index among minimizers, so the selected normal is always
    # one single triangle's normal — never a component-wise mix of two.
    lane = lax.broadcasted_iota(jnp.int32, t.shape, 1)
    min_lane = jnp.min(
        jnp.where(is_min, lane, jnp.int32(t.shape[1])), axis=1, keepdims=True
    )
    sel = is_min & (lane == min_lane)

    def pick(row):
        comp = tri_cols[9 + row, :][None, :]  # (1, K)
        return jnp.sum(jnp.where(sel, comp, 0.0), axis=1, keepdims=True)

    hit_any = d != _INF
    nx = jnp.where(hit_any, pick(0), 0.0)
    ny = jnp.where(hit_any, pick(1), 0.0)
    nz = jnp.where(hit_any, pick(2), 0.0)
    return d, nx, ny, nz


KCHUNK = 128  # triangle records per DMA / compute chunk (one lane tile)
BLOCK = 32  # spins per compute block (sublane group within a tile)


def _kernel(cells_ref, next_ref, counts_ref, spins_ref, table_ref, out_ref,
            buf, sem):
    """One tile: walk the cell runs; for each run, stream its triangle
    records in 128-lane chunks (double-buffered DMA) and test only the
    32-sublane spin blocks its run overlaps.

    Runs whose cell has no triangles (count 0) skip both DMA and compute,
    so spins in empty space cost only the loop bookkeeping. The block
    decomposition keeps compute near work-optimal when runs are much
    shorter than the tile (low spins-per-cell density).
    """
    out_ref[...] = jnp.concatenate(
        (
            jnp.full((TILE, 1), _INF, jnp.float32),
            jnp.zeros((TILE, 7), jnp.float32),
        ),
        axis=1,
    )
    row_in_block = lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)

    def run_body(state):
        i = state
        c = cells_ref[0, i]
        count = counts_ref[0, i]
        run_end = jnp.minimum(next_ref[0, i], TILE)
        n_chunks = lax.div(count + jnp.int32(KCHUNK - 1), jnp.int32(KCHUNK))
        b_first = lax.div(i, jnp.int32(BLOCK))
        b_last = lax.div(run_end - 1, jnp.int32(BLOCK))

        def dma(j, slot):
            return pltpu.make_async_copy(
                table_ref.at[c, :, pl.ds(j * KCHUNK, KCHUNK)],
                buf.at[slot],
                sem.at[slot],
            )

        @pl.when(count > 0)
        def _():
            dma(0, 0).start()

            def chunk_body(j, _):
                slot = lax.rem(j, jnp.int32(2))

                @pl.when(j + 1 < n_chunks)
                def _():
                    dma(j + 1, 1 - slot).start()

                dma(j, slot).wait()
                tri_cols = buf[slot]

                def block_body(b, _):
                    start = b * BLOCK
                    rows = spins_ref[pl.ds(start, BLOCK), :]  # (BLOCK, 8)
                    d, tnx, tny, tnz = _mt_block(rows, tri_cols)
                    lane = row_in_block + start
                    in_run = (lane >= i) & (lane < run_end)
                    cur = out_ref[pl.ds(start, BLOCK), :]
                    better = in_run & (d < cur[:, 0:1])
                    new = jnp.concatenate(
                        (d, tnx, tny, tnz, cur[:, 4:8]), axis=1
                    )
                    out_ref[pl.ds(start, BLOCK), :] = jnp.where(
                        better, new, cur
                    )
                    return 0

                lax.fori_loop(b_first, b_last + 1, block_body, 0)
                return 0

            lax.fori_loop(0, n_chunks, chunk_body, 0)

        return run_end

    lax.while_loop(lambda i: i < TILE, run_body, jnp.int32(0))


@partial(jax.jit, static_argnames=("interpret",))
def _run_query(cells, next_start, counts, spin_rows, table, interpret=False):
    """Launch the tile kernel over the sorted arrays.

    cells, next_start, counts: (n_pad,) int32 (sorted cell id, end of its
    run, triangle count of its cell).
    spin_rows: (n_pad, 8) f32 (sorted spin state, one spin per row).
    table: (n_cells, 16, K_pad) f32 triangle records, triangles in lanes,
    K_pad a multiple of 128.
    Returns (n_pad, 8): [min_d, nx, ny, nz, pad x4] rows, in sorted order.
    """
    n_pad = cells.shape[0]
    n_tiles = n_pad // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TILE, 8), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 16, KCHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        interpret=interpret,
    )(cells[None, :], next_start[None, :], counts[None, :], spin_rows, table)


def pallas_table(spec):
    """Re-layout a halo MeshSpec triangle table for the kernel:
    (n_cells, n_chunks, chunk, 12) -> (n_cells, 16, K_pad) f32 with
    triangles in the lane dimension, padded to a multiple of 128 lanes
    (Mosaic requires DMA slices to be lane-tile aligned) and 4 zero pad
    rows (records are 12 wide). Padding slots are all-zero degenerate
    triangles, rejected by the intersection test via det == 0."""
    n_cells = spec.tri.shape[0]
    K = spec.tri.shape[1] * spec.tri.shape[2]
    K_pad = -(-K // 128) * 128
    flat = spec.tri.reshape(n_cells, K, 12).astype(jnp.float32)
    table = jnp.concatenate(
        (flat, jnp.zeros((n_cells, K, 4), jnp.float32)), axis=2
    )
    table = jnp.transpose(table, (0, 2, 1))  # (n_cells, 16, K)
    return jnp.pad(table, ((0, 0), (0, 0), (0, K_pad - K)))


def nearest_hit_pallas(spec, r0, direction, rem, table, interpret=False):
    """Sorted-run nearest-hit query (drop-in for mesh_accel.nearest_hit).

    ``table`` is the kernel layout from :func:`pallas_table` (pass it in so
    XLA hoists the re-layout out of the time loop).
    """
    n = r0.shape[0]
    dtype = r0.dtype
    n_sv = jnp.asarray(spec.n_sv, dtype=jnp.int32)
    seg_end = r0 + direction * rem[:, None]
    lo = jnp.minimum(r0, seg_end)
    base = jnp.floor(lo / spec.sv_width).astype(jnp.int32)  # (n, 3)
    shift_n = jnp.floor_divide(base, n_sv)
    wrapped = base - shift_n * n_sv
    cell = (wrapped[:, 0] * n_sv[1] + wrapped[:, 1]) * n_sv[2] + wrapped[:, 2]
    shifted_r0 = r0 - shift_n.astype(dtype) * spec.voxel_size

    n_pad = -(-n // TILE) * TILE
    pad = n_pad - n
    n_cells = int(np.prod(spec.n_sv))

    def pad1(x, value):
        return jnp.concatenate((x, jnp.full((pad,), value, x.dtype)))

    lane_id = jnp.arange(n_pad, dtype=jnp.int32)
    counts = spec.cell_counts[cell].astype(jnp.int32)  # (n,) tiny gather
    # Pad lanes get a sentinel cell one past the real range with count 0:
    # their runs are skipped in the kernel (never DMA'd) and they cannot
    # interleave with real spins of any cell.
    operands = (
        pad1(cell, n_cells),
        pad1(shifted_r0[:, 0].astype(jnp.float32), 0.0),
        pad1(shifted_r0[:, 1].astype(jnp.float32), 0.0),
        pad1(shifted_r0[:, 2].astype(jnp.float32), 0.0),
        pad1(direction[:, 0].astype(jnp.float32), 0.0),
        pad1(direction[:, 1].astype(jnp.float32), 0.0),
        pad1(direction[:, 2].astype(jnp.float32), 0.0),
        pad1(rem.astype(jnp.float32), 0.0),
        lane_id,
        pad1(counts, 0),
    )
    sorted_ops = lax.sort(operands, num_keys=1)
    cells_s = sorted_ops[0]
    lanes_s = sorted_ops[8]
    counts_s = sorted_ops[9]
    spin_rows = jnp.stack(sorted_ops[1:8] + (sorted_ops[7],), axis=1)

    # next_start[i]: first index after i whose cell differs (end of i's run).
    pos = jnp.arange(n_pad, dtype=jnp.int32)
    diff_next = jnp.concatenate(
        (cells_s[:-1] != cells_s[1:], jnp.ones((1,), bool))
    )
    boundary = jnp.where(diff_next, pos, n_pad)
    next_start = (
        jnp.flip(lax.cummin(jnp.flip(boundary.astype(jnp.int32)))) + 1
    )
    # Make run ends tile-local inside the kernel; absolute index here.
    tile_base = (pos // TILE) * TILE
    next_local = jnp.minimum(next_start - tile_base, TILE).astype(jnp.int32)

    out = _run_query(
        cells_s, next_local, counts_s, spin_rows, table, interpret=interpret
    )

    # Restore walker order with a second sort keyed by the original lane.
    restored = lax.sort(
        (lanes_s, out[:, 0], out[:, 1], out[:, 2], out[:, 3]), num_keys=1
    )
    min_d = restored[1][:n].astype(dtype)
    normal = jnp.stack(restored[2:5], axis=1)[:n].astype(dtype)
    return min_d, normal
