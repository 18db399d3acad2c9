"""Pallas TPU kernel: a full J-step epoch of mesh physics per launch.

One kernel invocation advances a TILE-spin tile through all J time steps
of an epoch (spins sorted by anchor cell, engine/fused.py). Design points,
each driven by measurements on the target hardware
(benchmarks/microbench_kernel.py):

- **Row-form state: spins in LANES, everything per-spin is an (r, TILE)
  row.** The previous kernel kept per-spin state as (TILE, 1) columns —
  every resolve/scaffolding op burned TILE/8 vregs at 1/128 lane
  utilization, and the per-pass machinery measured ~8 us/tile vs ~0.1 us
  for the identical math on rows (microbench O). Positions, directions,
  the bounce resolve, the threefry uniforms, and the per-step outputs all
  live on rows; nothing is ever transposed.

- **Triangle-group folds: 8 triangles in SUBLANES.** A table unit packs
  64 triangles as (8, 128) — sublane r, lane 16*g + j = feature j of
  triangle 8*g + r — so one (8, 128) fold tests 8 triangles against a
  128-spin lane block with (8, 1) x (1, 128) broadcasts (measured ~31 ns
  per group, ~70 Gpairs/s sustained; microbench N). The 64-triangle unit
  granularity cuts the wasted fold width ~2-6x vs the previous 128-wide
  chunks on typical cell occupancies.

- **Resident candidate arena, run table built by XLA.** Candidate rows
  are DMA'd from HBM once per *epoch* and reused across every step and
  bounce pass. The run table (run start lanes, arena offsets, window
  partition, per-lane-block run ranges) is a pure function of the sorted
  cell keys, so it is computed VECTORIZED in XLA once per epoch
  (_epoch_run_tables: one batched (n_tiles, TILE) sort + cumsums) and
  passed in as dense SMEM inputs. (Round 3's in-kernel scalar fill walk
  alone cost 11-12 ms/step at 524k spins — the whole point of this
  hoist.) Windows use quantized offsets (CAP = ARENA_U - CH_MAX), so
  every window's rows fit the arena without any sequential packing walk.
  The default ``contig`` mode exploits that spins are globally sorted by
  cell id while rows are stored in cell-id order: a window's rows are one
  contiguous HBM span, fetched by a SINGLE static full-arena DMA — the
  kernel's per-run scalar work drops to zero (the round-3/4 per-run
  size-class dispatch walk cost ~13 ms/step at 524k spins and survives
  only as the ``contig=False`` fallback for sparse occupancies).

- **Feature-form Moller-Trumbore in cell-local frames.** The table stores
  per-triangle vectors [N = E1 x E2, A.N, E2, E2 x A, E1, A x E1] so that
  det, t, u, v are pure dot products against per-spin features
  (d, r0, r0 x d): ~29 elementwise ops per spin-triangle pair vs ~58 for
  the corner/edge form. Rows are packed with the owning cell's corner at
  the origin and the fold re-offsets every lane by its own corner
  (per-lane VMEM corner rows — equal to the run's corner for in-run
  lanes), so the cancellation error of the triple-product differences is
  bounded by ~eps_f32 * (cell width + dilation) regardless of voxel
  extent, and no per-window table adjustment is needed. Fold lanes
  outside a run's [start, end) range are masked — their coordinates live
  in a different cell's frame.

- **Row-hoisted pass machinery.** The cell-local frame, the fold cross
  products, and the runtime ladder LEVEL are per-lane quantities,
  computed once per pass as (1, TILE) rows; the per-run scalar loop
  keeps only the in-run mask, one masked cross-lane max (level of the
  max reach == max of per-lane levels, a monotone step function), the
  prefix-count extraction, and the fold loop.

- **Per-block active gating.** After the first bounce pass of a step only
  a small fraction of spins are still unresolved; each 128-lane block
  re-runs its fold + reduce only while it still has active spins (the
  resolve writes per-block active counts to SMEM, and ``pl.when`` skips
  the whole block body — results land in scratch rows whose distance row
  re-inits to +inf each pass, so skipped blocks resolve as no-hit).

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
from .fused import BITS, CH_MAX as _CH_MAX, TAIL_UNITS as _TAIL_UNITS

TILE = 512  # spins per kernel instance (lanes)
BLK = 128  # fold lane-block width (one vreg of spins)
NBLK = TILE // BLK
UNIT = 64  # triangles per table unit (8 sublane-groups of 8)
CH_MAX = _CH_MAX  # max units per cell row (pack_fused enforces)
# Resident arena capacity (units = 4 KB each): 1 MB of the ~16 MB VMEM.
# Sized so typical tiles fit ONE window — every extra window re-runs the
# whole J-step reduce/resolve machinery for its lane range (e.g. the
# 102k-tri bench at J=4: ~8 runs x 16-unit DMA class = 128 units/tile,
# which a 128-unit arena with CAP = 96 would split in two).
ARENA_U = 256
# Quantized-window capacity: run k goes to window cum_excl(k) // CAP, so a
# window's rows span < CAP + CH_MAX <= ARENA_U arena slots (fused.
# _epoch_run_tables) — vectorizable with a plain cumsum, no greedy walk.
CAP = ARENA_U - _CH_MAX
# The contiguous-window DMA reads a full ARENA_U-unit span from the first
# run's row; the table's zero tail must absorb the worst-case over-read.
assert ARENA_U <= _TAIL_UNITS
EDGE_TOL = np.float32(1e-5)  # barycentric leak-proofing tolerance (f32)
SLACK = np.float32(1e-5)  # hit-acceptance slack in step lengths (f32)
_INF = np.float32(np.inf)
# DMA size classes (units): the smallest class >= the row's unit count is
# transferred in one DMA. Over-read beyond a row lands in the next cell's
# row (real geometry) or the table's zero tail; it is never folded (folds
# use the exact per-step unit count).
_CLASSES = (1, 2, 4, 8, 16, 32)

# The ablation (0 = full kernel, 1 = window walks only, 2 = + step
# scaffolding, 3 = + first pass only, ...) and runtime-level knobs are
# EXPLICIT static arguments of ``_launch``/``fused_epoch`` (and kwargs of
# ``fused.run_window_fused``), keyed into the jit caches — flipping them
# can never silently serve a stale binary. ``runtime_level=True`` makes
# each run fold the smallest distance prefix that covers its active spins'
# actual reach this pass (distance to the anchor-cell box + remaining
# segment) instead of the epoch step's worst-case prefix: late epoch steps
# provision for s+1 steps of drift a typical spin never takes, and
# re-passes have rem << 1, so both fold a fraction of the static prefix.
# Physics is bit-identical: every triangle a segment can reach lies within
# (reach + slack) of the box, and the pack's level assignment guarantees
# such triangles sit in the selected prefix (_build_table dist_lb <= true
# distance).
# Safety margin added to the measured reach before the ladder compare:
# covers the hit-acceptance SLACK and f32 rounding of the reach itself.
_REQ_MARGIN = np.float32(0.05)


def _size_class(nun):
    """Smallest DMA size class covering ``nun`` units (int32, any shape)."""
    c = jnp.int32(_CLASSES[-1])
    for cl in reversed(_CLASSES[:-1]):
        c = jnp.where(nun <= cl, jnp.int32(cl), c)
    return c


def _epoch_run_tables(packed_s, next_end, J, start_s=None):
    """Vectorized run-table construction for one epoch (the XLA hoist).

    A run is a maximal stretch of equal anchor cells within one TILE-lane
    kernel tile. Everything the kernel's scalar core needs to steer DMAs
    and fold loops — run start lanes, arena offsets, the window
    partition, per-lane-block run ranges — is a pure function of the
    sorted keys, so it is built here with one batched (n_tiles, TILE)
    sort plus cumsums instead of the round-3 in-kernel scalar fill walk
    (which alone cost 11-12 ms/step at 524k spins).

    Two windowing modes, both QUANTIZED so a plain cumsum suffices and
    both producing window ids nondecreasing in steps of <= 1 (which the
    kernel's window loop relies on):

    - **Contiguous (``start_s`` given).** Spins are globally sorted by
      cell id and table rows are stored in cell-id order, so a tile's
      runs occupy one (nearly) contiguous HBM range. Run k's position
      relative to the tile's first run, ``rel = start(k) - start(0)``,
      is quantized as ``win_raw = rel // CAP``, ``off = rel mod CAP``;
      the kernel then issues ONE static-size ``ARENA_U``-unit DMA per
      window from ``start(k0) - off(k0)`` instead of a scalar per-run
      class-dispatch walk (which alone cost ~13 ms/step at 524k spins).
      Raw window ids are densified (cumsum of boundaries) so sparse
      tiles cannot produce empty window iterations.
    - **Per-run size classes (``start_s`` None).** Run k joins window
      ``cum_excl(k) // CAP`` where ``cum_excl`` is the exclusive cumsum
      of DMA size classes; each run is DMA'd individually. Fallback for
      very sparse spin occupancy where a contiguous window would span
      many times the arena.

    A window's runs start below CAP and extend at most CH_MAX slots past
    it, so every window fits the arena.

    Returns flat int32 arrays ``(runlane, runoff, winK)`` of shape (n,)
    — per tile, runlane/runoff entries k < R are valid, and winK entry w
    holds window w's first run index (entries >= the window count read R,
    so the kernel's ``k1 = winK[w + 1]`` lookup needs no masking) —
    ``meta`` of shape (n,) packing per tile [R, rq0 x NBLK, rq1 x NBLK,
    W, blkrun x NBLK, 0 pad] in the leading lanes, where [rq0[q], rq1[q])
    is the contiguous range of runs overlapping lane block q (runs are
    lane-ordered), W is the window count, and blkrun[q] is the single run
    overlapping block q (-1 none, -2 several: ragged fallback) — and
    ``bases`` of shape (n_tiles,): each tile's window-0 DMA base row (-1
    when runless).
    """
    n = packed_s.shape[0]
    n_tiles = n // TILE
    mask6 = jnp.int32((1 << BITS) - 1)
    g = jnp.arange(n, dtype=jnp.int32)
    lane = g & jnp.int32(TILE - 1)
    tile_base = g - lane
    prev_end = jnp.concatenate((jnp.zeros((1,), jnp.int32), next_end[:-1]))
    is_start = (lane == 0) | (prev_end == g)
    nun = lax.shift_right_logical(
        packed_s, jnp.int32((J - 1) * BITS)
    ) & mask6
    is_run = is_start & (nun > 0)
    cls = jnp.where(is_run, _size_class(nun), 0)
    end_l = jnp.minimum(next_end - tile_base, jnp.int32(TILE))

    def t2(a):
        return a.reshape(n_tiles, TILE)

    # Compact each tile's runs to the front, preserving lane order
    # (lax.sort is stable; runs carry unique lane keys).
    key = jnp.where(is_run, lane, jnp.int32(TILE))
    aux = cls if start_s is None else start_s
    _, runlane, runaux, runend = lax.sort(
        (t2(key), t2(lane), t2(aux), t2(end_l)), dimension=1, num_keys=1
    )
    R = jnp.sum(t2(is_run).astype(jnp.int32), axis=1)
    if start_s is not None:
        rel = runaux - runaux[:, 0:1]
        win_raw = rel // jnp.int32(CAP)
        off = rel - win_raw * jnp.int32(CAP)
    else:
        cum_excl = jnp.cumsum(runaux, axis=1) - runaux
        win_raw = cum_excl // jnp.int32(CAP)
        off = cum_excl - win_raw * jnp.int32(CAP)
    k_iota = lax.broadcasted_iota(jnp.int32, (n_tiles, TILE), 1)
    valid = k_iota < R[:, None]
    # Window-start flags -> compacted winK row: window w's first run
    # index. Raw window ids are implicitly densified (only the boundaries
    # matter), so sparse tiles that skip raw quanta produce no empty
    # window iterations. Padding entries clamp to R so the kernel's
    # k1 = winK[w + 1] lookup for the last window reads R unmasked.
    neww = jnp.concatenate(
        (
            jnp.ones((n_tiles, 1), bool),
            win_raw[:, 1:] != win_raw[:, :-1],
        ),
        axis=1,
    )
    is_ws = valid & neww
    keyw = jnp.where(is_ws, k_iota, jnp.int32(TILE))
    winK = jnp.minimum(jnp.sort(keyw, axis=1), R[:, None])
    W = jnp.sum(is_ws.astype(jnp.int32), axis=1)
    cols = [R]
    for q in range(NBLK):
        cols.append(jnp.sum(
            (valid & (runend <= q * BLK)).astype(jnp.int32), axis=1
        ))
    for q in range(NBLK):
        cols.append(jnp.sum(
            (valid & (runlane < (q + 1) * BLK)).astype(jnp.int32), axis=1
        ))
    cols.append(W)
    # Per lane block: the SINGLE run overlapping it (fast path: the
    # kernel folds it with no per-run loop), -1 when no run touches the
    # block, -2 when several do (ragged fallback). With gap-aligned
    # epoch layouts nearly every block is single-run.
    for q in range(NBLK):
        ov = valid & (runlane < (q + 1) * BLK) & (runend > q * BLK)
        n_ov = jnp.sum(ov.astype(jnp.int32), axis=1)
        k_only = jnp.sum(jnp.where(ov, k_iota, 0), axis=1)
        cols.append(jnp.where(
            n_ov == 0, jnp.int32(-1),
            jnp.where(n_ov == 1, k_only, jnp.int32(-2)),
        ))
    # Meta rides a fourth (1, TILE)-shaped SMEM row (Pallas SMEM blocks
    # must span the array's leading dim): lane j of tile t holds meta
    # column j, lanes >= 2*NBLK + 2 are padding.
    meta = jnp.stack(cols, axis=1)
    meta_row = jnp.pad(meta, ((0, 0), (0, TILE - meta.shape[1])))
    # Per-tile window-0 DMA base (contig mode): the first run's table row
    # (off(k0) == 0 by construction); -1 sentinel for runless tiles. The
    # kernel's cross-tile pipeline (tile t prefetches tile t+1's window-0
    # span) reads this via scalar prefetch.
    if start_s is not None:
        bases = jnp.where(R > 0, runaux[:, 0], jnp.int32(-1))
    else:
        bases = jnp.full((n_tiles,), -1, jnp.int32)
    return (runlane.reshape(n), off.reshape(n), winK.reshape(n),
            meta_row.reshape(n), bases)


def _kernel(bases_ref, starts_ref, packed_ref, packed2_ref, nexts_ref,
            corner_ref, runlane_ref, runoff_ref, winK_ref,
            meta_ref, pi_ref, pf_ref, pos_ref, dirs_ref, idrow_ref,
            table_ref, out_ref, arena, sem, st, act, ubuf, crs, dn,
            blkact, ucnt, *, J, ablate=0, runtime_level=True,
            count_units=False, fold_unroll=1, contig=True, pipeline=True,
            blkfast=False, passgate=False):
    """One tile: J time steps, all bounces, windowed over the arena.

    Table rows are stored in CELL-LOCAL coordinates (the pack subtracts
    each cell's corner from the affine features): the fold re-offsets
    every lane by ITS OWN cell corner (per-lane VMEM corner rows — equal
    to the run corner for every in-run lane), which bounds the f32
    cancellation error of the feature dot products to ~eps_f32 * (cell
    width + dilation) — independent of the tile or voxel extent — and
    needs no per-window table adjustment. Because coordinate frames
    differ per run, folds mask lanes outside the run's [start, end)
    range instead of union-folding.

    The run table is an INPUT (_epoch_run_tables): ``runlane_ref`` holds
    run k's start lane, ``runoff_ref`` its arena offset, ``winK_ref``
    window w's first run index, and ``meta_ref`` packs [R, rq0 x NBLK,
    rq1 x NBLK, W] (run count, per-lane-block run ranges, window count).
    With ``contig=True`` (spins sorted by cell id, rows stored in cell
    order) each window's rows are one contiguous HBM span fetched by a
    SINGLE static full-arena DMA; otherwise every run is fetched by its
    own size-class DMA. The kernel's scalar core only starts/waits DMAs
    and steers the pass loops.
    """
    seed = pi_ref[0, 0]
    max_iter = pi_ref[0, 1]
    t_base = pi_ref[0, 2]
    n_valid = pi_ref[0, 3]
    eps = pf_ref[0, 0]
    perm = pf_ref[0, 1]
    # Cell widths and the runtime-selection ladders: sub-step FINE
    # thresholds (bounce re-passes have rem << 1 step) then the epoch's
    # dilation ladder. Both must match the pack (prefix-count encodings).
    wcell = (pf_ref[0, 2], pf_ref[0, 3], pf_ref[0, 4])
    dil_vals = [pf_ref[0, 5 + l] for l in range(J)]
    NF = 5
    fine_vals = [pf_ref[0, 10 + k] for k in range(NF)]
    tile_base = pl.program_id(0) * TILE
    mask6 = jnp.int32((1 << BITS) - 1)
    sh_last = jnp.int32((J - 1) * BITS)
    max_iter_f = max_iter.astype(jnp.float32)
    lanes = lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    sub8 = lax.broadcasted_iota(jnp.int32, (8, BLK), 0)
    R = meta_ref[0, 0]
    t_id = pl.program_id(0)

    if pipeline:
        # Cross-tile arena pipeline: the two ARENA_U-unit arena halves
        # alternate per tile, and tile t issues tile t+1's window-0 DMA
        # at entry — before waiting on its own half — so the ~12.6 us
        # transfer hides behind this tile's folds (the synchronous
        # start+wait pair measured 3.2 ms/step on the bundle). Scratch
        # persists across grid steps on a TPU core, which is what makes
        # the handoff possible.
        buf = t_id & 1
        abase = buf * jnp.int32(ARENA_U)
    else:
        abase = jnp.int32(0)

    def _arena_copy(base, ab, b):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(base, ARENA_U)],
            arena.at[pl.ds(ab, ARENA_U)],
            sem.at[b],
        )

    if pipeline:
        def _issue(tt, b):
            base = bases_ref[tt]

            @pl.when(base >= 0)
            def _():
                _arena_copy(base, b * jnp.int32(ARENA_U), b).start()

        @pl.when(t_id == 0)
        def _():
            _issue(jnp.int32(0), jnp.int32(0))

        @pl.when(t_id + 1 < pl.num_programs(0))
        def _():
            _issue(t_id + 1, 1 - buf)

    def class_op(src, off, nun, start_not_wait):
        """Start (or wait for) a row's static-size-class DMA."""
        for ci, cl in enumerate(_CLASSES):
            lo = 0 if ci == 0 else _CLASSES[ci - 1]

            @pl.when((nun > lo) & (nun <= cl))
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

    def run_dma(k, start_not_wait):
        i0 = runlane_ref[0, k]
        nun = lax.shift_right_logical(packed_ref[0, i0], sh_last) & mask6
        class_op(starts_ref[0, i0], runoff_ref[0, k], nun, start_not_wait)

    def _fold_unit(u, inrun, xb, yb, zb, dxb, dyb, dzb, cxb, cyb, czb, acc):
        """Fold one 64-triangle unit (8 sublane-groups) against a 128-lane
        spin block. ``u`` is the (8, 128) unit; a row's trailing zero
        padding is rejected by det == 0, and the unconditional 8-group
        unroll keeps the instruction stream branch-free. ``inrun`` masks
        the lanes outside the run's range (cell-local frames make other
        runs' spins' coordinates meaningless here). Returns updated
        (bd, n0, n1, n2) (8, BLK) accumulators."""
        bd, n0, n1, n2 = acc
        for g in range(8):
            tri = [u[:, g * 16 + j: g * 16 + j + 1] for j in range(16)]
            det = -(dxb * tri[0] + dyb * tri[1] + dzb * tri[2])
            tn = (xb * tri[0] + yb * tri[1] + zb * tri[2]) - tri[3]
            un = (cxb * tri[4] + cyb * tri[5] + czb * tri[6]) - (
                dxb * tri[7] + dyb * tri[8] + dzb * tri[9]
            )
            vn = -(cxb * tri[10] + cyb * tri[11] + czb * tri[12]) - (
                dxb * tri[13] + dyb * tri[14] + dzb * tri[15]
            )
            inv = 1.0 / det
            t = tn * inv
            uu = un * inv
            vv = vn * inv
            lo, hi = -EDGE_TOL, 1.0 + EDGE_TOL
            ok = (
                (det != 0)
                & (uu >= lo)
                & (uu <= hi)
                & (vv >= lo)
                & (uu + vv <= hi)
                & (t > 0)
            )
            t = jnp.where(ok & inrun, t, _INF)
            better = t < bd
            bd = jnp.where(better, t, bd)
            n0 = jnp.where(better, tri[0], n0)
            n1 = jnp.where(better, tri[1], n1)
            n2 = jnp.where(better, tri[2], n2)
        return bd, n0, n1, n2

    def _pass(s, it, k0, k1, parts=3, repass=False):
        """One bounce pass: fold each lane block's runs' step-s unit
        prefix, reduce per block, resolve the whole tile on rows.

        ``s`` is a static epoch-step index (selects the prefix bit field);
        runs [k0, k1) of the precomputed run table are this window's.
        ``parts`` (static, debug): 1 = fold only, 2 = + reduce, 3 = full.

        State rows are sliced from ONE full (8, TILE) register load of
        ``st``: Mosaic assigns sub-sublane ref-slice loads (st[3:4]) a
        replicated layout that its (1, N) -> (8, N) broadcast verifier
        rejects; value slices of a full load carry concrete layouts.

        Everything per-lane is hoisted OUT of the per-run loop onto full
        (1, TILE) rows computed once per pass: the cell-local frame
        (per-lane corner rows), the fold cross products, and the runtime
        ladder LEVEL (level(max reach) == max(per-lane levels), since
        level is a monotone step function of reach — bit-identical
        prefix selection). ``per_run`` keeps only SMEM loads, the
        in-run mask, one masked cross-lane max, the prefix-count
        extraction, and the fold loop; fold + reduce are skipped
        entirely for settled lane blocks (results land in the ``dn``
        scratch rows, whose d row re-inits to +inf each pass so skipped
        blocks resolve as no-hit).
        """
        stv = st[...]
        av = act[...]
        cv = corner_ref[...]

        def _rows(sl):
            """Pass-level per-lane rows on lane range ``sl``: every lane
            in its OWN cell frame (equal to the run frame for in-run
            lanes; out-of-run lanes are masked at fold time), the fold
            cross products, and the runtime ladder LEVEL. All
            elementwise, so evaluating one gated 128-lane block under
            ``repass`` is bit-identical to slicing whole-tile rows."""
            x = stv[0:1, sl]
            y = stv[1:2, sl]
            z = stv[2:3, sl]
            dxr = stv[3:4, sl]
            dyr = stv[4:5, sl]
            dzr = stv[5:6, sl]
            remr = stv[6:7, sl]
            avb = av[:, sl]
            xq = x - cv[0:1, sl]
            yq = y - cv[1:2, sl]
            zq = z - cv[2:3, sl]
            cxq = yq * dzr - zq * dyr
            cyq = zq * dxr - xq * dzr
            czq = xq * dyr - yq * dxr
            if runtime_level:
                # Reach of each active lane this pass: distance to its
                # anchor-cell box plus the remaining segment; the
                # per-lane ladder level counts the thresholds below
                # reach + margin across BOTH ladders — the sub-step FINE
                # thresholds (counts in packed2) then the dilation steps
                # (counts in packed). Inactive lanes carry a -1 sentinel
                # (fold nothing at all when a run has no active lane).
                ex = jnp.maximum(jnp.maximum(-xq, xq - wcell[0]), 0.0)
                ey = jnp.maximum(jnp.maximum(-yq, yq - wcell[1]), 0.0)
                ez = jnp.maximum(jnp.maximum(-zq, zq - wcell[2]), 0.0)
                req = jnp.sqrt(ex * ex + ey * ey + ez * ez) + remr \
                    + _REQ_MARGIN
                lvlr = jnp.zeros_like(req)
                for fv in fine_vals:
                    lvlr = lvlr + (fv < req).astype(jnp.float32)
                for l in range(s):
                    lvlr = lvlr + (dil_vals[l] < req).astype(jnp.float32)
                lvlr = jnp.where(avb > 0, lvlr, -1.0)
            else:
                lvlr = None
            return xq, yq, zq, dxr, dyr, dzr, cxq, cyq, czq, avb, lvlr

        sh_s = jnp.int32(s * BITS)
        liota = lax.broadcasted_iota(jnp.int32, (1, BLK), 1)

        if parts == 0:
            # Ablation anchor (levels 8-10): consume the pass-level rows
            # (frame, cross products, runtime ladder) so they are not
            # dead-code-eliminated; measures the rows-only pass cost.
            xq, _, _, _, _, _, _, cyq, czq, _, lvlr = _rows(slice(0, TILE))
            dn[0:1, :] = jnp.full((1, TILE), _INF, jnp.float32)
            dn[1:2, :] = xq + cyq + (lvlr if runtime_level else czq)
            return

        def _cnt_for(i0, inrun, lvlb, liveb):
            """Selected unit count for one run against one lane block.

            ``liveb`` (diagnostics only): lanes this fold actually serves —
            in-run AND still active this pass. The counting kernel
            accumulates cnt * |liveb| to measure fold lane occupancy
            (live lanes per 128-wide fold issue)."""
            if runtime_level:
                # Smallest ladder prefix covering this (run x block)
                # segment's active lanes: max of the per-lane levels
                # (== the level of the max reach).
                m = jnp.max(jnp.where(inrun, lvlb, -1.0))
                lvl = jnp.maximum(m, 0.0).astype(jnp.int32)
                sh_f = jnp.minimum(
                    lvl, jnp.int32(NF - 1)
                ) * jnp.int32(BITS)
                sh_c = jnp.maximum(
                    lvl - jnp.int32(NF), 0
                ) * jnp.int32(BITS)
                cnt_f = lax.shift_right_logical(
                    packed2_ref[0, i0], sh_f
                ) & mask6
                cnt_c = lax.shift_right_logical(
                    packed_ref[0, i0], sh_c
                ) & mask6
                cnt = jnp.where(lvl < NF, cnt_f, cnt_c)
                cnt = jnp.where(m < 0, jnp.int32(0), cnt)
            else:
                cnt = lax.shift_right_logical(
                    packed_ref[0, i0], sh_s
                ) & mask6
            if count_units:
                ucnt[0, 0] = ucnt[0, 0] + cnt
                ucnt[0, 2] = ucnt[0, 2] + cnt * jnp.sum(
                    liveb.astype(jnp.int32)
                )
            return cnt

        def _fold_cnt(off, cnt, inrun, xb, yb, zb, dxb, dyb, dzb,
                      cxb, cyb, czb, acc):
            """Fold ``cnt`` units of the run at arena offset ``off``."""
            def fold(c, acc):
                return _fold_unit(
                    arena[abase + off + c], inrun, xb, yb, zb,
                    dxb, dyb, dzb, cxb, cyb, czb, acc,
                )

            if fold_unroll == 1:
                return lax.fori_loop(0, cnt, fold, acc)

            # Unrolled: fold_unroll units per loop iteration to amortize
            # the ~0.25 us Mosaic per-iteration overhead. Tail indices
            # clamp to the run's last unit — duplicate folds are
            # idempotent (strict `<` on the min accumulators), so physics
            # is bit-identical and no masking is needed.
            last = jnp.maximum(cnt - 1, 0)

            def fold_u(c, acc):
                for k in range(fold_unroll):
                    acc = fold(
                        jnp.minimum(c * fold_unroll + k, last), acc
                    )
                return acc

            n_it = (cnt + (fold_unroll - 1)) // fold_unroll
            return lax.fori_loop(0, n_it, fold_u, acc)

        def _reduce_write(bd, n0, n1, n2, sl):
            """Sublane reduce: min distance, first-minimal-row tie-break,
            normal pick — all on (8, BLK) -> (1, BLK), written to the dn
            scratch rows."""
            db = jnp.min(bd, axis=0, keepdims=True)
            dn[0:1, sl] = db
            if parts == 1:
                return
            is_min = bd == db
            row = jnp.min(
                jnp.where(is_min, sub8, jnp.int32(8)), axis=0,
                keepdims=True,
            )
            sel = is_min & (sub8 == row) & (db != _INF)
            dn[1:2, sl] = jnp.sum(
                jnp.where(sel, n0, 0.0), axis=0, keepdims=True
            )
            dn[2:3, sl] = jnp.sum(
                jnp.where(sel, n1, 0.0), axis=0, keepdims=True
            )
            dn[3:4, sl] = jnp.sum(
                jnp.where(sel, n2, 0.0), axis=0, keepdims=True
            )

        def _fold_reduce(qbase, sl, rows_b, fast, ragged, kb, lo_q, hi_q):
            """Fold + sublane-reduce one 128-lane block: its window runs
            [lo_q, hi_q) on the ragged path, or the single ``kb`` run on
            the blkfast path."""
            xb, yb, zb, dxb, dyb, dzb, cxb, cyb, czb, avb, lvlb = rows_b

            if blkfast:
                @pl.when(fast)
                def _():
                    i0 = runlane_ref[0, kb]
                    off = runoff_ref[0, kb]
                    end = jnp.minimum(nexts_ref[0, i0] - tile_base, TILE)
                    inrun = (liota >= i0 - qbase) & (liota < end - qbase)
                    cnt = _cnt_for(
                        i0, inrun, lvlb,
                        inrun & (avb > 0) if count_units else None,
                    )
                    inf8 = jnp.full((8, BLK), _INF, jnp.float32)
                    zero8 = jnp.zeros((8, BLK), jnp.float32)
                    bd, n0, n1, n2 = _fold_cnt(
                        off, cnt, inrun, xb, yb, zb, dxb, dyb, dzb,
                        cxb, cyb, czb, (inf8, zero8, zero8, zero8),
                    )
                    _reduce_write(bd, n0, n1, n2, sl)

            @pl.when(ragged)
            def _():
                def per_run(kk, acc):
                    off = runoff_ref[0, kk]
                    i0 = runlane_ref[0, kk]
                    end = jnp.minimum(nexts_ref[0, i0] - tile_base, TILE)
                    inrun = (liota >= i0 - qbase) & (liota < end - qbase)
                    cnt = _cnt_for(
                        i0, inrun, lvlb,
                        inrun & (avb > 0) if count_units else None,
                    )
                    return _fold_cnt(
                        off, cnt, inrun, xb, yb, zb, dxb, dyb, dzb,
                        cxb, cyb, czb, acc,
                    )

                inf8 = jnp.full((8, BLK), _INF, jnp.float32)
                zero8 = jnp.zeros((8, BLK), jnp.float32)
                bd, n0, n1, n2 = lax.fori_loop(
                    lo_q, hi_q, per_run, (inf8, zero8, zero8, zero8)
                )
                _reduce_write(bd, n0, n1, n2, sl)

        def _gating(q, k0, k1, gate):
            """Per-block run-range clip and the fast/ragged dispatch
            conditions (blkfast: meta blkrun >= 0 means a single run
            overlaps the block; -2 means several -> ragged fori)."""
            lo_q = jnp.maximum(k0, meta_ref[0, 1 + q])
            hi_q = jnp.minimum(k1, meta_ref[0, 1 + NBLK + q])
            if blkfast:
                kb = meta_ref[0, 2 + 2 * NBLK + q]
                fast = gate & (kb >= k0) & (kb < k1)
                ragged = gate & (kb == jnp.int32(-2)) & (hi_q > lo_q)
            else:
                kb = None
                fast = None
                ragged = gate & (hi_q > lo_q)
            if count_units:
                gated = ragged if fast is None else (fast | ragged)
                ucnt[0, 1] = ucnt[0, 1] + gated.astype(jnp.int32)
            return lo_q, hi_q, kb, fast, ragged

        def _resolve(sl, blk_sums):
            """Normalize the block-reduced hit rows and resolve the lanes
            in ``sl``: reflect/cross, consume segment, update activity.
            Componentwise on (1, lanes) rows — no (1, N) -> (k, N)
            sublane broadcasts anywhere (see the layout note above).
            ``blk_sums`` lists (lane-block index, local slice) pairs whose
            SMEM active counts this call refreshes."""
            dnv = dn[...]
            d = dnv[0:1, sl]
            nx = dnv[1:2, sl]
            ny = dnv[2:3, sl]
            nz = dnv[3:4, sl]
            # stored N is unnormalized (E1 x E2); reflection needs unit
            # length
            rn = lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
            nx, ny, nz = nx * rn, ny * rn, nz * rn
            if parts == 2:
                st[7:8] = st[7:8] + 0.0 * (nx + ny + nz + d)
                return
            dxr = stv[3:4, sl]
            dyr = stv[4:5, sl]
            dzr = stv[5:6, sl]
            rem = stv[6:7, sl]
            iters = stv[7:8, sl]
            a = av[:, sl] > 0
            hit = a & (d <= rem + SLACK)
            t_abs = t_base + jnp.int32(s)

            # Crossing uniforms are only needed for permeable membranes;
            # the common impermeable case skips the threefry chain every
            # pass (ubuf stays at its 1.0 init, so `go` is all-False
            # under the strict `<`).
            @pl.when(perm > 0)
            def _():
                ubuf[:, sl] = krng.bounce_uniform(
                    seed, t_abs, idrow_ref[...][:, sl], it
                )

            go = ubuf[...][:, sl] < perm

            # Membrane-transit counting for exchange statistics /
            # relaxation (impermeable runs never cross, so the count row
            # is write-free).
            @pl.when(perm > 0)
            def _():
                crs[:, sl] = crs[...][:, sl] + jnp.where(
                    hit & go, 1.0, 0.0
                )

            r0x, r0y, r0z = stv[0:1, sl], stv[1:2, sl], stv[2:3, sl]
            vx, vy, vz = d * dxr, d * dyr, d * dzr
            dp = vx * nx + vy * ny + vz * nz
            flip = jnp.where(dp > 0, -1.0, 1.0)
            nrx, nry, nrz = nx * flip, ny * flip, nz * flip
            dp_o = -jnp.abs(dp)
            ndx = vx - 2.0 * dp_o * nrx
            ndy = vy - 2.0 * dp_o * nry
            ndz = vz - 2.0 * dp_o * nrz
            nd_rn = lax.rsqrt(ndx * ndx + ndy * ndy + ndz * ndz)
            ndx, ndy, ndz = ndx * nd_rn, ndy * nd_rn, ndz * nd_rn
            # crossing keeps the direction and offsets along -n_refl
            ofs = jnp.where(go, -eps, eps)
            reflected = hit & ~go
            r_nx = r0x + vx + ofs * nrx
            r_ny = r0y + vy + ofs * nry
            r_nz = r0z + vz + ofs * nrz
            rem_new = jnp.where(hit, rem - d, rem)
            still = hit & (rem_new > 0) & (iters < max_iter_f)
            upd = a & hit
            st[0:1, sl] = jnp.where(upd, r_nx, r0x)
            st[1:2, sl] = jnp.where(upd, r_ny, r0y)
            st[2:3, sl] = jnp.where(upd, r_nz, r0z)
            st[3:4, sl] = jnp.where(reflected, ndx, dxr)
            st[4:5, sl] = jnp.where(reflected, ndy, dyr)
            st[5:6, sl] = jnp.where(reflected, ndz, dzr)
            st[6:7, sl] = jnp.where(a, rem_new, rem)
            st[7:8, sl] = jnp.where(still, iters + 1.0, iters)
            stf = still.astype(jnp.float32)
            act[:, sl] = jnp.where(a, stf, av[:, sl])
            for q, lsl in blk_sums:
                blkact[0, q] = jnp.sum(stf[:, lsl]).astype(jnp.int32)

        if repass:
            # Gated re-pass (config.fused_passgate): later bounce passes
            # run EVERYTHING per 128-lane block under its active gate —
            # the pass-level rows, the folds, the reduce, AND the row
            # resolve are all skipped for settled blocks, not just
            # fold + reduce. Bit-identical physics: every computation is
            # per-lane elementwise, a settled block has no active lane
            # (the whole-tile resolve would rewrite identical state
            # there), and its dn / blkact entries are never read again
            # this pass.
            for q in range(NBLK):
                sl = slice(q * BLK, (q + 1) * BLK)
                qbase = jnp.int32(q * BLK)
                gate = blkact[0, q] > 0
                lo_q, hi_q, kb, fast, ragged = _gating(q, k0, k1, gate)

                @pl.when(gate)
                def _(q=q, sl=sl, qbase=qbase, lo_q=lo_q, hi_q=hi_q,
                      kb=kb, fast=fast, ragged=ragged):
                    rows_b = _rows(sl)
                    dn[0:1, sl] = jnp.full((1, BLK), _INF, jnp.float32)
                    _fold_reduce(qbase, sl, rows_b, fast, ragged, kb,
                                 lo_q, hi_q)
                    _resolve(sl, [(q, slice(None))])
            return

        rows_t = _rows(slice(0, TILE))
        dn[0:1, :] = jnp.full((1, TILE), _INF, jnp.float32)
        for q in range(NBLK):
            sl = slice(q * BLK, (q + 1) * BLK)
            qbase = jnp.int32(q * BLK)

            # Active gating: pass 0 always folds; later passes skip
            # blocks whose spins all settled (fold + reduce only on this
            # path — re-passes gate the rows and the resolve as well, see
            # ``repass`` above).
            gate = (it == 0) | (blkact[0, q] > 0)
            lo_q, hi_q, kb, fast, ragged = _gating(q, k0, k1, gate)
            rows_b = tuple(
                None if r is None else r[:, sl] for r in rows_t
            )
            _fold_reduce(qbase, sl, rows_b, fast, ragged, kb, lo_q, hi_q)
        if parts == 1:
            return
        _resolve(
            slice(0, TILE),
            [(q, slice(q * BLK, (q + 1) * BLK)) for q in range(NBLK)],
        )

    W = meta_ref[0, 1 + 2 * NBLK]

    def window(w, w_start):
        # One arena window: runs [k0, k1) straight from the precomputed
        # winK row (entries >= W read R, so the k1 lookup is unmasked).
        k0 = winK_ref[0, w]
        k1 = jnp.where(
            w + 1 < jnp.int32(TILE),
            winK_ref[0, jnp.minimum(w + 1, jnp.int32(TILE - 1))],
            R,
        )

        if contig and pipeline:
            # Window 0's span is already in flight into this tile's
            # arena half (issued by the previous tile, or by this one at
            # t == 0) — just wait on it. Later windows (rare: most tiles
            # fit one) fill the same half synchronously, reusing its
            # semaphore after the wait consumed it.
            @pl.when((w == 0) & (bases_ref[t_id] >= 0))
            def _():
                _arena_copy(bases_ref[t_id], abase, buf).wait()

            @pl.when((w > 0) & (k1 > k0))
            def _():
                i0 = runlane_ref[0, k0]
                base = starts_ref[0, i0] - runoff_ref[0, k0]
                cp = _arena_copy(base, abase, buf)
                cp.start()
                cp.wait()
        elif contig:
            # The window's rows occupy one contiguous HBM span starting
            # at start(k0) - off(k0): ONE static full-arena DMA replaces
            # the per-run size-class dispatch walk. Over-read past the
            # table's last row lands in its TAIL_UNITS zero tail.
            @pl.when(k1 > k0)
            def _():
                i0 = runlane_ref[0, k0]
                base = starts_ref[0, i0] - runoff_ref[0, k0]
                cp = _arena_copy(base, jnp.int32(0), jnp.int32(0))
                cp.start()
                cp.wait()
        else:
            # Start every run's size-class DMA, then wait on each
            # (transfers overlap).
            def start_one(k, _):
                run_dma(k, True)
                return 0

            lax.fori_loop(k0, k1, start_one, 0)

            def wait_one(k, _):
                run_dma(k, False)
                return 0

            lax.fori_loop(k0, k1, wait_one, 0)

        # Lane coverage: up to (but not including) the next window's first
        # run's start lane — lanes of empty cells between runs are swept
        # into the surrounding window (they step with no folds).
        w_end = jnp.where(
            k1 < R, runlane_ref[0, jnp.minimum(k1, jnp.int32(TILE - 1))],
            jnp.int32(TILE),
        )
        if ablate in (11, 12):  # walk/DMA only, no step loop
            return w_end

        wmask = (lanes >= w_start) & (lanes < w_end)

        for s in range(J):
            step_valid = jnp.int32(s) < n_valid

            @pl.when(step_valid)
            def _():
                if ablate in (1, 13):
                    return
                # begin step: fresh direction, full segment, 1 iter entry
                # (componentwise rows: full loads + value slices, see the
                # layout note in _pass)
                stv = st[...]
                dv = dirs_ref[...]
                for r in range(3):
                    st[3 + r: 4 + r] = jnp.where(
                        wmask, dv[3 * s + r: 3 * s + r + 1], stv[3 + r: 4 + r]
                    )
                st[6:7] = jnp.where(wmask, 1.0, stv[6:7])
                st[7:8] = jnp.where(wmask, 1.0, stv[7:8])
                act[...] = jnp.where(wmask, 1.0, 0.0)
                crs[...] = jnp.where(wmask, 0.0, crs[...])
                if ablate == 2:
                    return

                if ablate in (4, 5):
                    _pass(s, jnp.int32(0), k0, k1, parts=ablate - 3)
                    return
                _pass(s, jnp.int32(0), k0, k1)
                if ablate == 3:
                    return
                if ablate == 7:
                    # one forced extra pass, no data-dependent control
                    _pass(s, jnp.int32(1), k0, k1)
                    return
                if ablate in (8, 9, 10):
                    # Forced second pass at partial depth — isolates the
                    # re-pass cost slices against level 3 (no 2nd pass)
                    # and level 7 (full 2nd pass): 8 = pass-level rows
                    # only, 9 = + per-block items + folds, 10 = + reduce;
                    # 7 - 10 = the resolve share.
                    _pass(s, jnp.int32(1), k0, k1,
                          parts={8: 0, 9: 1, 10: 2}[ablate])
                    return

                def cond(c):
                    return c[1] > 0

                def body(c):
                    it, _ = c
                    _pass(s, it, k0, k1, repass=passgate)
                    n = blkact[0, 0]
                    for q in range(1, NBLK):
                        n = n + blkact[0, q]
                    return (it + 1, n)

                n0 = jnp.sum(act[...]).astype(jnp.int32)
                lax.while_loop(cond, body, (jnp.int32(1), n0))

                # settled spins advance by their remaining segment
                stv2 = st[...]
                for r in range(3):
                    adv = stv2[r: r + 1] + stv2[3 + r: 4 + r] * stv2[6:7]
                    st[r: r + 1] = jnp.where(wmask, adv, stv2[r: r + 1])

            # Per-step output (positions + an aux row packing the
            # iteration-overflow flag and the step's membrane-transit
            # count as 2*transits + exc — both small exact f32 ints);
            # steps beyond the simulated window repeat the current
            # position and report a zero aux row.
            if ablate == 13:  # 13 = level 1 minus the out writes
                continue
            stv3 = st[...]
            ov = out_ref[...]
            exc_col = jnp.where(
                step_valid & (stv3[7:8] >= max_iter_f), 1.0, 0.0
            )
            aux_col = exc_col + 2.0 * jnp.where(step_valid, crs[...], 0.0)
            for r in range(3):
                out_ref[4 * s + r: 4 * s + r + 1, :] = jnp.where(
                    wmask, stv3[r: r + 1], ov[4 * s + r: 4 * s + r + 1]
                )
            out_ref[4 * s + 3: 4 * s + 4, :] = jnp.where(
                wmask, aux_col, ov[4 * s + 3: 4 * s + 4]
            )
        return w_end

    # ----- main: init state, loop windows ----------------------------
    if ablate == 20:  # XLA/launch floor: the kernel body is a no-op
        out_ref[0:1, :] = pos_ref[0:1, :]
        return
    st[0:3] = pos_ref[...]
    st[3:8] = jnp.zeros((5, TILE), jnp.float32)
    act[...] = jnp.zeros((1, TILE), jnp.float32)
    ubuf[...] = jnp.ones((1, TILE), jnp.float32)
    crs[...] = jnp.zeros((1, TILE), jnp.float32)
    # dn d-row re-inits every pass; the normal rows only need to start
    # finite (skipped blocks' stale values are where-gated on d < inf).
    dn[1:4, :] = jnp.zeros((3, TILE), jnp.float32)
    if count_units:
        ucnt[0, 0] = jnp.int32(0)
        ucnt[0, 1] = jnp.int32(0)
        ucnt[0, 2] = jnp.int32(0)

    # W == 0 (no runs in the tile) still takes one window pass: k0 == k1
    # == 0 skips the DMA and w_end == TILE, so every lane steps (no
    # folds) and writes its output.
    lax.fori_loop(0, jnp.maximum(W, jnp.int32(1)), window, jnp.int32(0))
    if count_units:
        # Diagnostic rows: folded units, gated block-passes, and
        # live-lane-weighted units (unit-lanes actually served) this tile
        # (same scalar broadcast across the row; the host reads lane 0).
        out_ref[4 * J: 4 * J + 1, :] = jnp.full(
            (1, TILE), 1.0, jnp.float32
        ) * ucnt[0, 0].astype(jnp.float32)
        out_ref[4 * J + 1: 4 * J + 2, :] = jnp.full(
            (1, TILE), 1.0, jnp.float32
        ) * ucnt[0, 1].astype(jnp.float32)
        out_ref[4 * J + 2: 4 * J + 3, :] = jnp.full(
            (1, TILE), 1.0, jnp.float32
        ) * ucnt[0, 2].astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_steps", "interpret", "ablate",
                                   "runtime_level", "count_units",
                                   "fold_unroll", "contig", "blkfast",
                                   "passgate"))
def _launch(bases, starts, packed, packed2, nexts, corner, runlane, runoff,
            winK, meta, params_i, params_f, pos, dirs, ids, table,
            n_steps, interpret=False, ablate=0, runtime_level=True,
            count_units=False, fold_unroll=1, contig=True, blkfast=False,
            passgate=False):
    n_pad = pos.shape[1]
    n_tiles = n_pad // TILE
    J = n_steps
    n_out = 4 * J + (3 if count_units else 0)
    # Cross-tile arena prefetch requires scratch that persists across
    # grid steps — a TPU-core property the interpreter does not emulate.
    pipeline = contig and not interpret
    smem_row = pl.BlockSpec(
        (1, TILE), lambda t, b: (0, t), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # bases: per-tile window-0 DMA rows
        grid=(n_tiles,),
        in_specs=[
            smem_row,  # starts
            smem_row,  # packed
            smem_row,  # packed2 (fine-ladder prefix counts)
            smem_row,  # nexts
            pl.BlockSpec((3, TILE), lambda t, b: (0, t),
                         memory_space=pltpu.VMEM),  # per-lane cell corners
            smem_row,  # run start lanes
            smem_row,  # run arena offsets
            smem_row,  # per-window first run index (winK)
            smem_row,  # per-tile meta [R, rq0 x NBLK, rq1 x NBLK, W, pad]
            pl.BlockSpec((1, 4), lambda t, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16), lambda t, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TILE), lambda t, b: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, TILE), lambda t, b: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda t, b: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (n_out, TILE), lambda t, b: (0, t), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * ARENA_U, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((ARENA_U,)),
            pltpu.VMEM((8, TILE), jnp.float32),
            pltpu.VMEM((1, TILE), jnp.float32),
            pltpu.VMEM((1, TILE), jnp.float32),
            pltpu.VMEM((1, TILE), jnp.float32),
            pltpu.VMEM((4, TILE), jnp.float32),  # dn: pass d + normals
            pltpu.SMEM((1, NBLK), jnp.int32),
            # Third diagnostic slot only in the counting variant, so the
            # default binary's trace (and its compile cache entry) is
            # untouched by the occupancy counter.
            pltpu.SMEM((1, 3 if count_units else 2), jnp.int32),
        ],
    )
    return pl.pallas_call(
        partial(_kernel, J=J, ablate=ablate,
                runtime_level=runtime_level, count_units=count_units,
                fold_unroll=fold_unroll, contig=contig,
                pipeline=pipeline, blkfast=blkfast, passgate=passgate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, n_pad), jnp.float32),
        interpret=interpret,
    )(bases,
      starts[None, :], packed[None, :], packed2[None, :], nexts[None, :],
      corner,
      runlane[None, :], runoff[None, :], winK[None, :], meta[None, :],
      params_i, params_f, pos, dirs, ids[None, :], table)


def fused_epoch(spec, pos_s, dirs, ids_s, start_s, packed_s, packed2_s,
                next_end, corner_s, t_base, n_valid_steps, seed32, epsilon,
                max_iter, interpret=False, ablate=0, runtime_level=True,
                count_units=False, fold_unroll=1, contig=True,
                blkfast=False, passgate=False):
    """Run one epoch (J steps) of mesh physics on epoch-sorted state.

    pos_s: (3, n) float32 positions wrapped into the home periodic image;
    dirs: (J, 3, n) per-step unit directions; ids_s/start_s/packed_s/
    next_end: (n,) int32 in the same order; corner_s: (3, n) float32 anchor
    cell corners (the coordinate frame the table rows are stored in).
    ``t_base`` is the epoch's first absolute step index, ``n_valid_steps``
    how many of the J steps are inside the simulated window (trailing
    steps are no-ops).

    Returns (per-step positions (J, 3, n), iter_exc (n,) bool,
    per-step membrane-transit counts (J, n) int32); with
    ``count_units=True`` an extra (folded units, gated block-passes)
    scalar pair is appended (streaming diagnostics, bench only).
    """
    J = dirs.shape[0]
    n = pos_s.shape[1]
    dirs_in = jnp.concatenate(
        (
            dirs.reshape(3 * J, n),
            jnp.zeros((16 - 3 * J, n), jnp.float32),
        ),
        axis=0,
    )
    params_i = jnp.stack(
        (
            jnp.asarray(seed32, jnp.int32),
            jnp.asarray(max_iter, jnp.int32),
            jnp.asarray(t_base, jnp.int32),
            jnp.asarray(n_valid_steps, jnp.int32),
        )
    )[None, :]
    # params_f layout: [eps, perm, cell widths (3), dilation ladder (5,
    # zero-padded past J), FINE_LADDER (5), pad to 16]. The ladder must be
    # the exact one the table was packed with (same eps margin) — runtime
    # level selection compares measured reach against it.
    from .fused import _dilations, EPS_BOUNCES, FINE_LADDER, MAX_J

    assert J <= MAX_J <= 5, "params_f reserves 5 ladder slots"
    assert len(FINE_LADDER) == 5, "params_f reserves 5 fine slots"
    dil = _dilations(J, eps_margin=EPS_BOUNCES * spec.eps_budget)
    dil_pad = jnp.asarray(dil + [0.0] * (5 - J), jnp.float32)
    params_f = jnp.concatenate(
        (
            jnp.stack(
                (
                    jnp.asarray(epsilon, jnp.float32),
                    spec.perm_prob.astype(jnp.float32),
                )
            ),
            spec.sv_width.astype(jnp.float32),
            dil_pad,
            jnp.asarray(FINE_LADDER, jnp.float32),
            jnp.zeros(1, jnp.float32),
        )
    )[None, :]
    runlane, runoff, winK, meta, bases = _epoch_run_tables(
        packed_s, next_end, J, start_s=start_s if contig else None
    )
    out = _launch(
        bases, start_s, packed_s, packed2_s, next_end, corner_s, runlane,
        runoff, winK, meta, params_i, params_f, pos_s, dirs_in, ids_s,
        spec.table, n_steps=J, interpret=interpret, ablate=ablate,
        runtime_level=runtime_level, count_units=count_units,
        fold_unroll=fold_unroll, contig=contig, blkfast=blkfast,
        passgate=passgate,
    )
    steps = out[:4 * J].reshape(J, 4, n)
    pos_steps = steps[:, 0:3, :]  # (J, 3, n)
    aux = steps[:, 3, :]  # 2 * transits + exc, exact small f32 ints
    cross_steps = jnp.floor(aux * 0.5).astype(jnp.int32)
    exc = jnp.any(aux - 2.0 * jnp.floor(aux * 0.5) > 0.5, axis=0)
    if count_units:
        per_tile = out[4 * J:4 * J + 3].reshape(3, n // TILE, TILE)[:, :, 0]
        diag = (
            jnp.sum(per_tile[0]).astype(jnp.int32),
            jnp.sum(per_tile[1]).astype(jnp.int32),
            # Live-lane-weighted units: float (a diagnostic ratio; exact
            # int range would overflow int32 over a long window).
            jnp.sum(per_tile[2]),
        )
        return pos_steps, exc, cross_steps, diag
    return pos_steps, exc, cross_steps
