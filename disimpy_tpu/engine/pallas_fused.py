"""Pallas TPU kernel: a full J-step epoch of mesh physics per launch.

One kernel invocation advances a TILE-spin tile through all J time steps
of an epoch (spins sorted by anchor cell, engine/fused.py). Design points,
each driven by measurements on the target hardware
(benchmarks/microbench_kernel.py):

- **Resident candidate arena.** Each run's candidate row is DMA'd from HBM
  once per *epoch* (pipelined, ~70 ns/issue) and reused across every step
  and bounce pass; the previous kernel re-streamed rows per pass and the
  ~0.4 us serial DMA latency dominated its fixed floor.

- **Union folds, no masking.** Every table entry is real geometry (periodic
  images are whole-voxel shifts, valid anywhere in wrapped coordinates), so
  the whole tile is tested against the union of its runs' rows with no
  per-run lane masks: extra tests are only wasted lanes, never wrong
  physics, and a spin's own row is always a subset of the union.

- **Feature-form Moller-Trumbore.** The table stores per-triangle vectors
  [N = E1 x E2, A.N, E2, E2 x A, E1, A x E1] so that det, t, u, v are
  pure dot products against per-spin features (d, r0, r0 x d): ~29
  elementwise ops per spin-triangle pair vs ~58 for the corner/edge form.
  Per-tile re-centering (subtracting a nearby origin from both spins and
  the affine table rows) bounds the cancellation error of the triple
  -product differences to ~eps_f32 * tile extent.

- **Deferred argmin.** Per chunk the kernel only min-accumulates distances
  and conditionally latches the winning normal into (TILE, chunk-width)
  accumulators (4 extra ops/pair); the expensive lane reduction + tie-break
  + normal pick runs once per bounce pass, not once per chunk.

Reference behavior matched: disimpy/simulations.py:878-1013
(_cuda_step_mesh resolves all of a walker's bounces locally with no global
synchronization; this kernel restores that locality for J steps at a time
under a data-parallel layout).
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

TILE = 256
KCHUNK = 128
CH_MAX = _CH_MAX  # max chunks per cell row (pack_fused enforces)
ARENA_CH = 64  # resident arena capacity (chunks); windows split bigger demand
EDGE_TOL = np.float32(1e-5)  # barycentric leak-proofing tolerance (f32)
SLACK = np.float32(1e-5)  # hit-acceptance slack in step lengths (f32)
_INF = np.float32(np.inf)
# DMA size classes (chunks): the smallest class >= the row's chunk count is
# transferred in one DMA. Over-read beyond a row lands in the next cell's
# row (real geometry) or the table's zero tail (rejected by det == 0).
_CLASSES = (1, 2, 4, 8, 16, 32)

# Temporary ablation knob for performance debugging (0 = full kernel,
# 1 = window walks only, 2 = + step scaffolding, 3 = + first pass only).
# Threaded into the kernel as a static parameter: module-global reads from
# inside the kernel body are frozen at FIRST trace (pallas caches the
# traced kernel jaxpr per function identity), which silently serves the
# first-compiled variant for every later value.
_DEBUG_ABLATE = 0

# Fold granularity: the tile is split into QFOLD static sub-blocks of
# TILE // QFOLD spins, and each sub-block folds only the runs whose lane
# ranges overlap it (the fill walk records per-sub-block run index ranges;
# runs are lane-ordered, so each sub-block's runs are contiguous in the
# run table). A full-tile fold wastes (TILE - run_length) lanes per chunk
# on geometry those spins can never be near; sub-block folds cut the
# wasted width at the cost of ~0.25 us of Mosaic loop overhead per extra
# (run x sub-block) iteration, so the optimum is a few sub-blocks, not
# per-sublane granularity. Must divide TILE into multiples of 8 rows.
_QFOLD = 4


def _size_class(nch):
    """Smallest DMA size class covering ``nch`` chunks (scalar int32)."""
    c = jnp.int32(_CLASSES[-1])
    for cl in reversed(_CLASSES[:-1]):
        c = jnp.where(nch <= cl, jnp.int32(cl), c)
    return c


def _kernel(starts_ref, packed_ref, nexts_ref, ox_ref, oy_ref, oz_ref,
            pi_ref, pf_ref, rows_ref, dirs_ref, idrow_ref, table_ref,
            out_ref, arena, sem, st, act, ubuf, dacc, nax, nay, naz,
            roffs, rpcks, rsrcs, rcnt, rq0s, rq1s, *, J, ablate=0,
            qfold=1):
    """One tile: J time steps, all bounces, windowed over the arena."""
    seed = pi_ref[0, 0]
    max_iter = pi_ref[0, 1]
    t_base = pi_ref[0, 2]
    n_valid = pi_ref[0, 3]
    eps = pf_ref[0, 0]
    perm = pf_ref[0, 1]
    # per-tile re-centering origin: the tile's first (sorted) spin
    o0 = ox_ref[0, 0]
    o1 = oy_ref[0, 0]
    o2 = oz_ref[0, 0]
    tile_base = pl.program_id(0) * TILE
    QB = TILE // qfold  # fold sub-block height (rows)
    mask6 = jnp.int32((1 << BITS) - 1)
    sh_last = jnp.int32((J - 1) * BITS)
    max_iter_f = max_iter.astype(jnp.float32)
    lanes = lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)

    def run_end_at(i):
        return jnp.minimum(nexts_ref[0, i] - tile_base, TILE)

    def class_op(src, off, nch, start_not_wait):
        """Start (or wait for) a row's static-size-class DMA."""
        for ci, cl in enumerate(_CLASSES):
            lo = 0 if ci == 0 else _CLASSES[ci - 1]

            @pl.when((nch > lo) & (nch <= cl))
            def _():
                cp = pltpu.make_async_copy(
                    table_ref.at[pl.ds(src, cl)],
                    arena.at[pl.ds(off, cl)],
                    sem.at[off],
                )
                if start_not_wait:
                    cp.start()
                else:
                    cp.wait()

    def fill_walk(w_start):
        """Walk runs from lane ``w_start`` while their size classes fit the
        arena: start each non-empty run's DMA and record the window's run
        table (arena offset, packed counts, table source) in SMEM — the
        bounce passes then iterate the flat table instead of re-walking
        the run structure (the walk's scalar class/end arithmetic was a
        measured ~2 us per pass). Returns (w_end, occupancy in chunks)."""

        def cond(state):
            i, off, k, stop = state
            return (i < TILE) & (~stop)

        def body(state):
            i, off, k, _ = state
            pck = packed_ref[0, i]
            nch = lax.shift_right_logical(pck, sh_last) & mask6
            cls = jnp.where(nch == 0, 0, _size_class(nch))
            stop = off + cls > jnp.int32(ARENA_CH)
            rec = (~stop) & (nch > 0)
            end = run_end_at(i)

            @pl.when(rec)
            def _():
                roffs[0, k] = off
                rpcks[0, k] = pck
                rsrcs[0, k] = starts_ref[0, i]
                class_op(starts_ref[0, i], off, nch, True)
                # Runs are lane-ordered, so each fold sub-block's runs are
                # a contiguous [rq0s, rq1s) range of the run table.
                for q in range(qfold):
                    ov = (i < jnp.int32((q + 1) * QB)) & (
                        end > jnp.int32(q * QB)
                    )

                    @pl.when(ov & (rq0s[0, q] > k))
                    def _():
                        rq0s[0, q] = k

                    @pl.when(ov)
                    def _():
                        rq1s[0, q] = k + 1

            nxt = jnp.where(stop, i, end)
            return (
                nxt,
                jnp.where(stop, off, off + cls),
                k + rec.astype(jnp.int32),
                stop,
            )

        for q in range(qfold):
            rq0s[0, q] = jnp.int32(TILE)
            rq1s[0, q] = jnp.int32(0)
        i, off, k, _ = lax.while_loop(
            cond, body, (w_start, jnp.int32(0), jnp.int32(0), False)
        )
        rcnt[0, 0] = k
        return i, off

    def wait_runs():
        def w(kk, _):
            nch = lax.shift_right_logical(rpcks[0, kk], sh_last) & mask6
            class_op(rsrcs[0, kk], roffs[0, kk], nch, False)
            return 0

        lax.fori_loop(0, rcnt[0, 0], w, 0)

    def _fold_half(tri, x, y, z, dx, dy, dz, cx, cy, cz, dcur, nx, ny, nz):
        """Feature-form MT of the whole tile against one 128-tri chunk.

        tri: (16, KCHUNK) feature rows [N(3), A.N, E2(3), E2xA(3), E1(3),
        AxE1(3)]; per-spin columns are (TILE, 1). Returns updated
        (d, nx, ny, nz) (TILE, KCHUNK) accumulators.
        """
        N0 = tri[0][None, :]
        N1 = tri[1][None, :]
        N2 = tri[2][None, :]
        det = -(dx * N0 + dy * N1 + dz * N2)
        tn = (x * N0 + y * N1 + z * N2) - tri[3][None, :]
        un = (cx * tri[4][None, :] + cy * tri[5][None, :]
              + cz * tri[6][None, :]) - (
            dx * tri[7][None, :] + dy * tri[8][None, :]
            + dz * tri[9][None, :]
        )
        vn = -(cx * tri[10][None, :] + cy * tri[11][None, :]
               + cz * tri[12][None, :]) - (
            dx * tri[13][None, :] + dy * tri[14][None, :]
            + dz * tri[15][None, :]
        )
        inv = 1.0 / det
        t = tn * inv
        u = un * inv
        v = vn * inv
        lo, hi = -EDGE_TOL, 1.0 + EDGE_TOL
        ok = (
            (det != 0)
            & (u >= lo)
            & (u <= hi)
            & (v >= lo)
            & (u + v <= hi)
            & (t > 0)
        )
        t = jnp.where(ok, t, _INF)
        better = t < dcur
        return (
            jnp.where(better, t, dcur),
            jnp.where(better, N0, nx),
            jnp.where(better, N1, ny),
            jnp.where(better, N2, nz),
        )

    def _pass(s, it, parts=3):
        """One bounce pass: fold each run's step-s chunk prefix, resolve.

        ``s`` is a static epoch-step index (selects the prefix bit field);
        runs come from the SMEM run table recorded by the fill walk.
        ``parts`` (static, debug): 1 = fold only, 2 = + reduce, 3 = full.
        """
        x = st[:, 0:1] - o0
        y = st[:, 1:2] - o1
        z = st[:, 2:3] - o2
        dx = st[:, 3:4]
        dy = st[:, 4:5]
        dz = st[:, 5:6]
        cx = y * dz - z * dy
        cy = z * dx - x * dz
        cz = x * dy - y * dx

        # Only the distance accumulator needs resetting: a normal lane is
        # read back only where its distance lane won this pass's min.
        dacc[...] = jnp.full((TILE, KCHUNK), _INF, jnp.float32)

        sh_s = jnp.int32(s * BITS)

        # Each fold sub-block q streams only the runs overlapping its lane
        # range [q*QB, (q+1)*QB): a full-tile fold would spend
        # (TILE - run_length) wasted lanes per chunk on geometry those
        # spins can never reach. Straddling runs fold in every sub-block
        # they touch (their chunks stream once per overlapped block).
        for q in range(qfold):
            sl = slice(q * QB, (q + 1) * QB)
            xq, yq, zq = x[sl], y[sl], z[sl]
            dxq, dyq, dzq = dx[sl], dy[sl], dz[sl]
            cxq, cyq, czq = cx[sl], cy[sl], cz[sl]

            def per_run(kk, _, sl=sl, xq=xq, yq=yq, zq=zq, dxq=dxq,
                        dyq=dyq, dzq=dzq, cxq=cxq, cyq=cyq, czq=czq):
                off = roffs[0, kk]
                cnt = lax.shift_right_logical(rpcks[0, kk], sh_s) & mask6

                def fold(g, _):
                    base = off + 2 * g
                    # two 128-wide feature DAGs per iteration; only their
                    # final latch ops serialize on the shared accumulators,
                    # so the instruction streams still interleave. Folding
                    # both chunks into ONE (QB, KCHUNK) accumulator keeps
                    # the once-per-pass reduction half as wide.
                    d0, n0x, n0y, n0z = _fold_half(
                        arena[base], xq, yq, zq, dxq, dyq, dzq,
                        cxq, cyq, czq,
                        dacc[sl], nax[sl], nay[sl], naz[sl],
                    )
                    d1, n1x, n1y, n1z = _fold_half(
                        arena[base + 1], xq, yq, zq, dxq, dyq, dzq,
                        cxq, cyq, czq, d0, n0x, n0y, n0z,
                    )
                    dacc[sl] = d1
                    nax[sl] = n1x
                    nay[sl] = n1y
                    naz[sl] = n1z
                    return 0

                lax.fori_loop(0, (cnt + 1) // 2, fold, 0)
                return 0

            lax.fori_loop(rq0s[0, q], rq1s[0, q], per_run, 0)
        if parts == 1:
            return

        # Final reduce + deterministic tie-break + normal pick (once per
        # pass). Ties across fold groups were already broken
        # earliest-group-first by the strict `better` comparison.
        da = dacc[...]
        d = jnp.min(da, axis=1, keepdims=True)
        is_min = da == d
        lane = lax.broadcasted_iota(jnp.int32, da.shape, 1)
        min_lane = jnp.min(
            jnp.where(is_min, lane, jnp.int32(da.shape[1])),
            axis=1,
            keepdims=True,
        )
        sel = is_min & (lane == min_lane) & (d != _INF)
        nx = jnp.sum(jnp.where(sel, nax[...], 0.0), axis=1, keepdims=True)
        ny = jnp.sum(jnp.where(sel, nay[...], 0.0), axis=1, keepdims=True)
        nz = jnp.sum(jnp.where(sel, naz[...], 0.0), axis=1, keepdims=True)
        # stored N is unnormalized (E1 x E2); reflection needs unit length
        rn = lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
        nx, ny, nz = nx * rn, ny * rn, nz * rn
        if parts == 2:
            # debug: park the reduce results so they are not dead code
            st[:, 7:8] = st[:, 7:8] + 0.0 * (nx + ny + nz + d)
            return

        # Resolve (all lanes in one vector phase).
        r0 = st[:, 0:3]
        dirn = st[:, 3:6]
        rem = st[:, 6:7]
        iters = st[:, 7:8]
        a = act[...] > 0
        hit = a & (d <= rem + SLACK)
        t_abs = t_base + jnp.int32(s)

        # Crossing uniforms are only needed for permeable membranes; the
        # common impermeable case skips the 78-op threefry chain AND the
        # (1, TILE) -> (TILE, 1) relayout every pass (ubuf stays at its
        # 1.0 init, so `go` is all-False under the strict `<`).
        @pl.when(perm > 0)
        def _():
            # threefry on the (1, TILE) id row: the serial chain costs
            # ~78 cycles on one vreg row vs ~TILE/8 x that on columns
            u_row = krng.bounce_uniform(seed, t_abs, idrow_ref[...], it)
            ubuf[...] = u_row.T

        go = ubuf[...] < perm
        nrm = jnp.concatenate((nx, ny, nz), axis=1)
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

    def window(w_start):
        # Fill the arena: issue all DMAs (recording the run table), then
        # wait on each (the transfers overlap).
        w_end, occ = fill_walk(w_start)
        wait_runs()

        # Zero the chunk after the occupancy: a run's last odd fold group
        # reads one chunk past its prefix, which for the final run would
        # otherwise be stale arena content (fake geometry).
        @pl.when(occ < jnp.int32(ARENA_CH))
        def _():
            arena[pl.ds(occ, 1)] = jnp.zeros((1, 16, KCHUNK), jnp.float32)

        # Re-center the affine table rows around the tile origin O:
        # A.N -> (A - O).N, E2 x A -> E2 x (A - O), A x E1 -> (A - O) x E1.
        def adjust(ch, _):
            tri = arena[ch]
            N = tri[0:3]
            E2 = tri[4:7]
            E1 = tri[10:13]
            an = tri[3:4] - (o0 * N[0:1] + o1 * N[1:2] + o2 * N[2:3])
            ea = tri[7:10] - jnp.concatenate(
                (
                    E2[1:2] * o2 - E2[2:3] * o1,
                    E2[2:3] * o0 - E2[0:1] * o2,
                    E2[0:1] * o1 - E2[1:2] * o0,
                )
            )
            ae = tri[13:16] - jnp.concatenate(
                (
                    o1 * E1[2:3] - o2 * E1[1:2],
                    o2 * E1[0:1] - o0 * E1[2:3],
                    o0 * E1[1:2] - o1 * E1[0:1],
                )
            )
            arena[ch] = jnp.concatenate((N, an, E2, ea, E1, ae))
            return 0

        lax.fori_loop(0, occ, adjust, 0)

        wmask = (lanes >= w_start) & (lanes < w_end)

        for s in range(J):
            step_valid = jnp.int32(s) < n_valid

            @pl.when(step_valid)
            def _():
                if ablate == 1:
                    return
                # begin step: fresh direction, full segment, 1 iter entry
                st[:, 3:4] = jnp.where(
                    wmask, dirs_ref[:, 3 * s + 0 : 3 * s + 1], st[:, 3:4]
                )
                st[:, 4:5] = jnp.where(
                    wmask, dirs_ref[:, 3 * s + 1 : 3 * s + 2], st[:, 4:5]
                )
                st[:, 5:6] = jnp.where(
                    wmask, dirs_ref[:, 3 * s + 2 : 3 * s + 3], st[:, 5:6]
                )
                st[:, 6:7] = jnp.where(wmask, 1.0, st[:, 6:7])
                st[:, 7:8] = jnp.where(wmask, 1.0, st[:, 7:8])
                act[...] = jnp.where(wmask, 1.0, 0.0)
                if ablate == 2:
                    return

                if ablate in (4, 5):
                    _pass(s, jnp.int32(0), parts=ablate - 3)
                    return
                _pass(s, jnp.int32(0))
                if ablate == 3:
                    return
                if ablate == 8:
                    # scalar readback of the active count, consumed by a
                    # never-true predicate (isolates the sync cost of the
                    # while loop's data-dependent condition)
                    n0 = jnp.sum(act[...]).astype(jnp.int32)

                    @pl.when(n0 > jnp.int32(1 << 30))
                    def _():
                        act[...] = jnp.zeros((TILE, 1), jnp.float32)

                    return
                if ablate == 7:
                    # one forced extra pass, no data-dependent control
                    _pass(s, jnp.int32(1))
                    return

                # The active count rides the while carry (a ref read inside
                # `cond` observes stale state on some backends).
                def cond(c):
                    return c[1] > 0

                def body(c):
                    it, _ = c
                    _pass(s, it)
                    return (it + 1, jnp.sum(act[...]).astype(jnp.int32))

                n0 = jnp.sum(act[...]).astype(jnp.int32)
                lax.while_loop(cond, body, (jnp.int32(1), n0))

                # settled spins advance by their remaining segment
                adv = st[:, 0:3] + st[:, 3:6] * st[:, 6:7]
                st[:, 0:3] = jnp.where(wmask, adv, st[:, 0:3])

            # Per-step output (positions + iteration-overflow flag); steps
            # beyond the simulated window repeat the current position.
            exc_col = jnp.where(
                step_valid & (st[:, 7:8] >= max_iter_f), 1.0, 0.0
            )
            cur = out_ref[:, 4 * s : 4 * s + 4]
            val = jnp.concatenate((st[:, 0:3], exc_col), axis=1)
            out_ref[:, 4 * s : 4 * s + 4] = jnp.where(wmask, val, cur)
        return w_end

    # ----- main: init state, loop windows ----------------------------
    st[:, 0:3] = rows_ref[:, 0:3]
    st[:, 3:8] = jnp.zeros((TILE, 5), jnp.float32)
    act[...] = jnp.zeros((TILE, 1), jnp.float32)
    ubuf[...] = jnp.ones((TILE, 1), jnp.float32)

    lax.while_loop(lambda w: w < TILE, window, jnp.int32(0))


@partial(jax.jit, static_argnames=("n_steps", "interpret"))
def _launch(starts, packed, nexts, origin, params_i, params_f, rows, dirs,
            ids, table, n_steps, interpret=False):
    n_pad = rows.shape[0]
    n_tiles = n_pad // TILE
    J = n_steps
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 16), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TILE, 4 * J), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((ARENA_CH, 16, KCHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((ARENA_CH,)),
            pltpu.VMEM((TILE, 8), jnp.float32),
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((TILE, KCHUNK), jnp.float32),
            pltpu.VMEM((TILE, KCHUNK), jnp.float32),
            pltpu.VMEM((TILE, KCHUNK), jnp.float32),
            pltpu.VMEM((TILE, KCHUNK), jnp.float32),
            pltpu.SMEM((1, TILE), jnp.int32),
            pltpu.SMEM((1, TILE), jnp.int32),
            pltpu.SMEM((1, TILE), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SMEM((1, max(_QFOLD, 1)), jnp.int32),
            pltpu.SMEM((1, max(_QFOLD, 1)), jnp.int32),
        ],
    )
    return pl.pallas_call(
        partial(_kernel, J=J, ablate=_DEBUG_ABLATE, qfold=_QFOLD),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 4 * J), jnp.float32),
        interpret=interpret,
    )(starts[None, :], packed[None, :], nexts[None, :], origin[0][None, :],
      origin[1][None, :], origin[2][None, :], params_i, params_f, rows,
      dirs, ids[None, :], table)

def fused_epoch(spec, pos_s, dirs, ids_s, start_s, packed_s, next_end,
                t_base, n_valid_steps, seed32, epsilon, max_iter,
                interpret=False):
    """Run one epoch (J steps) of mesh physics on epoch-sorted state.

    pos_s: (3, n) float32 positions wrapped into the home periodic image;
    dirs: (J, 3, n) per-step unit directions; ids_s/start_s/packed_s/
    next_end: (n,) int32 in the same order. ``t_base`` is the epoch's first
    absolute step index, ``n_valid_steps`` how many of the J steps are
    inside the simulated window (trailing steps are no-ops).

    Returns (per-step positions (J, 3, n), iter_exc (n,) bool).
    """
    J = dirs.shape[0]
    n = pos_s.shape[1]
    idf = lax.bitcast_convert_type(ids_s, jnp.float32)
    zeros = jnp.zeros_like(idf)
    rows = jnp.stack(
        (pos_s[0], pos_s[1], pos_s[2], idf, zeros, zeros, zeros, zeros),
        axis=1,
    )
    dirs_in = jnp.concatenate(
        (
            dirs.transpose(2, 0, 1).reshape(n, 3 * J),
            jnp.zeros((n, 16 - 3 * J), jnp.float32),
        ),
        axis=1,
    )
    params_i = jnp.stack(
        (
            jnp.asarray(seed32, jnp.int32),
            jnp.asarray(max_iter, jnp.int32),
            jnp.asarray(t_base, jnp.int32),
            jnp.asarray(n_valid_steps, jnp.int32),
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
        start_s, packed_s, next_end, pos_s, params_i, params_f, rows,
        dirs_in, ids_s, spec.table, n_steps=J, interpret=interpret,
    )
    steps = out.reshape(n, J, 4)
    pos_steps = steps[:, :, 0:3].transpose(1, 2, 0)  # (J, 3, n)
    exc = jnp.any(steps[:, :, 3] > 0.5, axis=1)
    return pos_steps, exc
