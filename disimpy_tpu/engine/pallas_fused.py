"""Pallas TPU kernel: one full multi-bounce mesh time step per launch.

One kernel invocation advances a TILE-spin tile through an entire time
step: per bounce pass it walks the tile's sorted runs (spins sharing an
anchor cell), copies each run's triangle chunks with a single DMA (issued
one run ahead so transfers overlap compute), evaluates Moller-Trumbore for
the WHOLE tile against each chunk (lanes outside the run are masked — on
TPU, wide masked vector ops beat fine-grained loops: a Mosaic loop
iteration costs ~0.25 us of scalar overhead, so the kernel is structured
for the fewest possible iterations rather than the least arithmetic), then
resolves reflect-or-cross for all lanes in one vector phase with an
in-kernel counter-based uniform (krng threefry keyed by the spin's carried
global id).

This restores the reference's per-thread locality
(disimpy/simulations.py:878-1013: one CUDA thread resolves all of its
walker's bounces with no global synchronization); round 1 paid ~14 XLA
round trips per time step instead.

Layout: spins in sublanes (TILE = 128 rows), triangles in lanes
(KCHUNK = 128 per chunk). Triangle records are (16, 128) chunks holding
A, E1, E2 (corner + edges) and the unit normal. The spins arrive sorted by
anchor cell; run boundaries, per-run chunk starts, and bit-packed per-step
chunk counts are precomputed per epoch (engine/fused.py). Runs with no
triangles skip both DMA and compute.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import krng
from .fused import BITS, CH_MAX as _CH_MAX

TILE = 128
KCHUNK = 128
CH_MAX = _CH_MAX  # max chunks per cell row (pack_fused enforces)
CH_SMALL = 8  # small-row DMA size class
EDGE_TOL = np.float32(1e-5)  # barycentric leak-proofing tolerance (f32)
SLACK = np.float32(1e-5)  # hit-acceptance slack in step lengths (f32)
_INF = np.float32(np.inf)


def _mt_tile(st, tri_cols):
    """Moller-Trumbore for TILE spins (sublanes) x KCHUNK tris (lanes).

    st: (TILE, 8) rows [x, y, z, dx, dy, dz, rem, iters].
    tri_cols: (16, K) rows [A (3), E1 (3), E2 (3), n (3), pad (4)].
    Returns (d, nx, ny, nz): (TILE, 1) closest strictly-forward hit
    distance (inf if none) and its stored unit normal, ties broken by the
    lowest lane index (never a component mix of two normals).
    """
    r0 = [st[:, i][:, None] for i in range(3)]
    dirn = [st[:, 3 + i][:, None] for i in range(3)]
    A = [tri_cols[i, :][None, :] for i in range(3)]
    E1 = [tri_cols[3 + i, :][None, :] for i in range(3)]
    E2 = [tri_cols[6 + i, :][None, :] for i in range(3)]
    T = [r0[i] - A[i] for i in range(3)]

    def cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    P = cross(dirn, E2)
    Q = cross(T, E1)
    det = dot(P, E1)
    inv_det = 1.0 / det
    t = inv_det * dot(Q, E2)
    u = inv_det * dot(P, T)
    v = inv_det * dot(Q, dirn)
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
    d = jnp.min(t, axis=1, keepdims=True)
    is_min = t == d
    lane = lax.broadcasted_iota(jnp.int32, t.shape, 1)
    min_lane = jnp.min(
        jnp.where(is_min, lane, jnp.int32(t.shape[1])), axis=1, keepdims=True
    )
    sel = is_min & (lane == min_lane)

    def pick(row):
        comp = tri_cols[9 + row, :][None, :]
        return jnp.sum(jnp.where(sel, comp, 0.0), axis=1, keepdims=True)

    hit_any = d != _INF
    nx = jnp.where(hit_any, pick(0), 0.0)
    ny = jnp.where(hit_any, pick(1), 0.0)
    nz = jnp.where(hit_any, pick(2), 0.0)
    return d, nx, ny, nz


def _kernel(starts_ref, packed_ref, nexts_ref, pi_ref, pf_ref, rows_ref,
            table_ref, out_ref, arena, sem, st, act, best):
    """One tile: resolve every bounce of one time step for TILE spins."""
    s_step = pi_ref[0, 0]
    t_step = pi_ref[0, 1]
    seed = pi_ref[0, 2]
    max_iter = pi_ref[0, 3]
    eps = pf_ref[0, 0]
    perm = pf_ref[0, 1]
    tile_base = pl.program_id(0) * TILE
    bits_shift = s_step * BITS
    mask = jnp.int32((1 << BITS) - 1)
    max_iter_f = max_iter.astype(jnp.float32)

    st[...] = rows_ref[...]
    st[:, 6:7] = jnp.ones((TILE, 1), jnp.float32)  # rem
    # iters starts at 1: the first collision check is entry #1 (classic
    # stepping counts it the same way); empty-cell lanes keep 1.
    st[:, 7:8] = jnp.ones((TILE, 1), jnp.float32)
    act[...] = jnp.ones((TILE, 1), jnp.float32)
    lanes = lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    ids = pltpu.bitcast(rows_ref[:, 6:7], jnp.int32)

    def n_chunks_at(i):
        return lax.shift_right_logical(packed_ref[0, i], bits_shift) & mask

    def dma(i, slot, size):
        start_c = starts_ref[0, i]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(start_c, size)],
            arena.at[slot, pl.ds(0, size)],
            sem.at[slot],
        )

    def issue(i, slot):
        """One DMA for run i's whole row: two static size classes keep the
        scalar path branch-only (no per-group loop)."""
        nch = n_chunks_at(i)

        @pl.when((nch > 0) & (nch <= CH_SMALL))
        def _():
            dma(i, slot, CH_SMALL).start()

        @pl.when(nch > CH_SMALL)
        def _():
            dma(i, slot, CH_MAX).start()

    def wait(i, slot):
        nch = n_chunks_at(i)

        @pl.when((nch > 0) & (nch <= CH_SMALL))
        def _():
            dma(i, slot, CH_SMALL).wait()

        @pl.when(nch > CH_SMALL)
        def _():
            dma(i, slot, CH_MAX).wait()

    def bounce_cond(carry):
        it, n_active = carry
        return n_active > 0

    def _run_chunks(i, slot, nch, a_mask):
        st_rows = st[...]

        def chunk_fold(j, carry):
            d0, nx0, ny0, nz0 = carry
            d, nx, ny, nz = _mt_tile(st_rows, arena[slot, j])
            better = d < d0
            return (
                jnp.where(better, d, d0),
                jnp.where(better, nx, nx0),
                jnp.where(better, ny, ny0),
                jnp.where(better, nz, nz0),
            )

        init = (
            jnp.full((TILE, 1), _INF, jnp.float32),
            jnp.zeros((TILE, 1), jnp.float32),
            jnp.zeros((TILE, 1), jnp.float32),
            jnp.zeros((TILE, 1), jnp.float32),
        )
        d, nx, ny, nz = lax.fori_loop(0, nch, chunk_fold, init)
        cur = best[...]
        new = jnp.concatenate((d, nx, ny, nz, cur[:, 4:8]), axis=1)
        best[...] = jnp.where(a_mask & (d < cur[:, 0:1]), new, cur)

    def bounce_body(carry):
        it, _ = carry
        best[...] = jnp.concatenate(
            (
                jnp.full((TILE, 1), _INF, jnp.float32),
                jnp.zeros((TILE, 7), jnp.float32),
            ),
            axis=1,
        )
        issue(0, 0)

        def run_cond(state):
            i, _ = state
            return i < TILE

        def run_body(state):
            i, r = state
            slot = lax.rem(r, jnp.int32(2))
            nch = n_chunks_at(i)
            run_end = jnp.minimum(nexts_ref[0, i] - tile_base, TILE)

            @pl.when(run_end < TILE)
            def _():
                issue(run_end, 1 - slot)

            @pl.when(nch > 0)
            def _():
                # Always consume the semaphore (the DMA was issued by the
                # previous run's prefetch), but skip the triangle math when
                # no lane of this run is still active — on bounce passes
                # beyond the second, almost every run is settled.
                wait(i, slot)
                in_run = (lanes >= i) & (lanes < run_end)
                a_mask = in_run & (act[...] > 0)
                n_run_act = jnp.sum(
                    jnp.where(a_mask, 1.0, 0.0)
                ).astype(jnp.int32)

                @pl.when(n_run_act > 0)
                def _():
                    _run_chunks(i, slot, nch, a_mask)

            return (run_end, r + 1)

        lax.while_loop(run_cond, run_body, (jnp.int32(0), jnp.int32(0)))

        # Resolve the whole tile's hits in one vector phase.
        d = best[:, 0:1]
        nrm = best[:, 1:4]
        r0 = st[:, 0:3]
        dirn = st[:, 3:6]
        rem = st[:, 6:7]
        iters = st[:, 7:8]
        a = act[...] > 0
        hit = a & (d <= rem + SLACK)
        u = krng.bounce_uniform(seed, t_step, ids, it)
        go = u < perm
        v = d * dirn
        inter = r0 + v
        dp = jnp.sum(v * nrm, axis=1, keepdims=True)
        n_refl = jnp.where(dp > 0, -nrm, nrm)
        dp_o = -jnp.abs(dp)
        new_dir = v - 2.0 * dp_o * n_refl
        new_dir = new_dir * lax.rsqrt(
            jnp.sum(new_dir * new_dir, axis=1, keepdims=True)
        )
        refl_r = inter + eps * n_refl
        n_cross = jnp.where(dp < 0, -nrm, nrm)
        cross_r = inter + eps * n_cross
        reflected = hit & ~go
        crossed = hit & go
        r_new = jnp.where(reflected, refl_r, jnp.where(crossed, cross_r, r0))
        dir_new = jnp.where(reflected, new_dir, dirn)
        rem_new = jnp.where(hit, rem - d, rem)
        still = hit & (rem_new > 0) & (iters < max_iter_f)
        st[:, 0:3] = jnp.where(a, r_new, r0)
        st[:, 3:6] = jnp.where(a, dir_new, dirn)
        st[:, 6:7] = jnp.where(a, rem_new, rem)
        st[:, 7:8] = jnp.where(still, iters + 1.0, iters)
        act[...] = jnp.where(a, still.astype(jnp.float32), act[...])
        n_active = jnp.sum(act[...]).astype(jnp.int32)
        return (it + 1, n_active)

    lax.while_loop(bounce_cond, bounce_body, (jnp.int32(0), jnp.int32(1)))

    out_ref[:, 0:3] = st[:, 0:3] + st[:, 3:6] * st[:, 6:7]
    out_ref[:, 3:4] = (st[:, 7:8] >= max_iter_f).astype(jnp.float32)
    out_ref[:, 4:8] = jnp.zeros((TILE, 4), jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def _launch(starts, packed, nexts, params_i, params_f, rows, table,
            interpret=False):
    n_pad = rows.shape[0]
    n_tiles = n_pad // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TILE, 8), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CH_MAX, 16, KCHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((TILE, 8), jnp.float32),
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((TILE, 8), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        interpret=interpret,
    )(starts[None, :], packed[None, :], nexts[None, :], params_i, params_f,
      rows, table)


def fused_step(spec, pos_s, direction, ids_s, start_s, packed_s, next_end,
               s, t, seed32, epsilon, max_iter, interpret=False):
    """One fused time step on epoch-sorted state.

    pos_s, direction: (3, n) float32 (positions pre-shifted into the anchor
    cell's home periodic image); ids_s/start_s/packed_s/next_end: (n,)
    int32 in the same order. ``s`` is the step index within the epoch
    (selects the chunk-count bit field), ``t`` the absolute step index.
    Returns (new positions (3, n), iter_exc (n,) bool).
    """
    idf = lax.bitcast_convert_type(ids_s, jnp.float32)
    zeros = jnp.zeros_like(idf)
    rows = jnp.stack(
        (
            pos_s[0], pos_s[1], pos_s[2],
            direction[0], direction[1], direction[2],
            idf, zeros,
        ),
        axis=1,
    )
    params_i = jnp.stack(
        (
            jnp.asarray(s, jnp.int32),
            jnp.asarray(t, jnp.int32),
            jnp.asarray(seed32, jnp.int32),
            jnp.asarray(max_iter, jnp.int32),
        )
    )[None, :]
    params_f = jnp.stack(
        (
            jnp.asarray(epsilon, jnp.float32),
            spec.perm_prob.astype(jnp.float32),
            jnp.float32(0),
            jnp.float32(0),
        )
    )[None, :]
    out = _launch(
        start_s, packed_s, next_end, params_i, params_f, rows, spec.table,
        interpret=interpret,
    )
    new_pos = out[:, 0:3].T
    exc_t = out[:, 3] > 0.5
    return new_pos, exc_t
