"""Per-(run x block x pass) ITEM cost decomposition (round 5).

The round-4 decomposition attributes ~1.4 us to every run-block-pass
item of the fused kernel's pass loop (`pallas_fused._pass.per_run`):
Mosaic fori mechanics, the SMEM scalar chain (runlane/runoff/nexts
loads), the masked cross-lane max -> SREG runtime-level selection, and
the inner fold fori. At ~6.4 items x ~2.5 effective passes per
tile-step that chain is the LARGEST slice of the 38 us/tile-step
budget — bigger than the fold ALU work itself (~3 us/pass). These
kernels isolate the slices to decide the round-5 restructuring:

  I0  item fori + SMEM scalar chain only
  I1  + in-run lane mask (vector cmp ops)
  I2  + masked cross-lane max -> SREG + ladder cnt extraction
  I3  + inner fold fori over cnt units (production fold math, unroll 2)
  I3b I3 with the per-item masked max replaced by ONE per-pass max
      (upper bound on vectorizing level selection out of the item loop)
  I4  I3 software-pipelined: item k+1's scalar chain + masked max are
      computed before item k's folds (loop-carried), so the scalar-unit
      latency chain can hide behind the VPU fold work
  I5  I3 with cnt read from a precomputed per-lane VMEM row by dynamic
      lane index (feasibility + cost of segmented-max vectorization)

Run: python benchmarks/microbench_item.py > /tmp/mbi.log 2>&1
Methodology follows microbench_kernel.py (dispatch floor subtraction,
carry-dependent bodies against loop-invariant code motion).
"""

import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLOOR = [0.0]
BLK = 128
TILE = 512
NRUNS = 8  # synthetic runs in the window table
NI = 6  # items (run x block segments) per simulated pass
BITS = 6
MASK6 = (1 << BITS) - 1
_INF = np.float32(np.inf)


def bench(name, fn, *args, items_per_call=None):
    try:
        out = fn(*args)
        float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        dt = max(best - FLOOR[0], 1e-9)
        msg = f"{name:52s} {best*1e3:9.2f} ms ({dt*1e3:9.2f} net)"
        if items_per_call:
            msg += f"  {dt/items_per_call*1e9:8.1f} ns/item"
        print(msg, flush=True)
        return dt
    except Exception:
        print(f"{name:52s} FAILED", flush=True)
        traceback.print_exc()
        return None


def floor_bench():
    def kern(o_ref):
        o_ref[...] = jnp.full((8, 128), 1.0, jnp.float32)

    @jax.jit
    def run():
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )()

    dt = bench("floor: trivial kernel dispatch", run)
    FLOOR[0] = dt or 0.0


def _fold_unit(u, inrun, xb, yb, zb, dxb, dyb, dzb, cxb, cyb, czb, acc):
    """Production fold body (pallas_fused._fold_unit op structure)."""
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
        lo, hi = np.float32(-1e-5), np.float32(1.0 + 1e-5)
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


def _mk_inputs():
    rng = np.random.RandomState(0)
    # Run table: NRUNS runs of ~64 lanes; per-item kk cycles over them.
    runlane = np.arange(NRUNS, dtype=np.int32) * 64
    runoff = (np.arange(NRUNS, dtype=np.int32) * 3) % 16
    nexts = np.zeros(TILE, np.int32)
    for k in range(NRUNS):
        nexts[runlane[k]: runlane[k] + 64] = min(runlane[k] + 64, TILE)
    # Packed ladder counts: level fields of ~2 units each.
    packed = np.zeros(TILE, np.int32)
    for lvl in range(5):
        packed |= min(2 + lvl, MASK6) << (BITS * lvl)
    lvlrow = rng.randint(0, 3, size=(1, TILE)).astype(np.float32)
    arena = rng.random_sample((32, 8, 128)).astype(np.float32) * 2 - 1
    rows = rng.random_sample((12, TILE)).astype(np.float32)
    return (
        jnp.asarray(runlane.reshape(1, -1)),
        jnp.asarray(runoff.reshape(1, -1)),
        jnp.asarray(nexts.reshape(1, -1)),
        jnp.asarray(packed.reshape(1, -1)),
        jnp.asarray(lvlrow),
        jnp.asarray(arena),
        jnp.asarray(rows),
    )


def _smem_spec(n):
    return pl.BlockSpec((1, n), lambda: (0, 0), memory_space=pltpu.SMEM)


def _launch(kern, reps, label, nscratch_arena=True):
    runlane, runoff, nexts, packed, lvlrow, arena, rows = _mk_inputs()

    @jax.jit
    def run():
        return pl.pallas_call(
            kern,
            in_specs=[
                _smem_spec(NRUNS),  # runlane
                _smem_spec(NRUNS),  # runoff
                _smem_spec(TILE),  # nexts
                _smem_spec(TILE),  # packed
                pl.BlockSpec((1, TILE), lambda: (0, 0),
                             memory_space=pltpu.VMEM),  # lvl row
                pl.BlockSpec(memory_space=pl.ANY),  # arena table
                pl.BlockSpec((12, TILE), lambda: (0, 0),
                             memory_space=pltpu.VMEM),  # state rows
            ],
            out_shape=jax.ShapeDtypeStruct((8, BLK), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((32, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(runlane, runoff, nexts, packed, lvlrow, arena, rows)

    bench(label, run, items_per_call=reps * NI)


def _body_parts(runlane_ref, runoff_ref, nexts_ref, packed_ref,
                lvl_ref, rows_ref, varena, level):
    """Shared item-body pieces; ``level`` selects how much of the
    production chain each variant includes."""
    liota = lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
    stv = rows_ref[...]
    xb, yb, zb = stv[0:1, :BLK], stv[1:2, :BLK], stv[2:3, :BLK]
    dxb, dyb, dzb = stv[3:4, :BLK], stv[4:5, :BLK], stv[5:6, :BLK]
    cxb, cyb, czb = stv[6:7, :BLK], stv[7:8, :BLK], stv[8:9, :BLK]
    lvlb = lvl_ref[0:1, :BLK]

    def scalar_chain(kk, qbase):
        i0 = runlane_ref[0, kk]
        off = runoff_ref[0, kk]
        end = jnp.minimum(nexts_ref[0, i0], jnp.int32(TILE))
        inrun = (liota >= i0 - qbase) & (liota < end - qbase)
        return i0, off, inrun

    def cnt_chain(i0, inrun):
        m = jnp.max(jnp.where(inrun, lvlb, -1.0))
        lvl = jnp.maximum(m, 0.0).astype(jnp.int32)
        sh = jnp.minimum(lvl, jnp.int32(4)) * jnp.int32(BITS)
        cnt = lax.shift_right_logical(packed_ref[0, i0], sh) & MASK6
        return jnp.where(m < 0, jnp.int32(0), cnt)

    def fold_cnt(off, cnt, inrun, acc):
        last = jnp.maximum(cnt - 1, 0)

        def fold_u(c, acc):
            for k in range(2):
                u = varena[jnp.minimum(c * 2 + k, last) + off]
                acc = _fold_unit(u, inrun, xb, yb, zb, dxb, dyb, dzb,
                                 cxb, cyb, czb, acc)
            return acc

        n_it = (cnt + 1) // 2
        return lax.fori_loop(0, n_it, fold_u, acc)

    return scalar_chain, cnt_chain, fold_cnt, lvlb


def variant(level, reps):
    """level: 0 = scalar chain, 1 = + inrun handed to acc, 2 = + masked
    max/cnt, 3 = + folds, 4 = pipelined, 5 = vector-row cnt,
    6 = per-pass max (I3b)."""

    def kern(runlane_ref, runoff_ref, nexts_ref, packed_ref, lvl_ref,
             table_ref, rows_ref, o_ref, varena, sem):
        # Arena preloaded once up front (not part of the measured path).
        cp = pltpu.make_async_copy(table_ref, varena, sem)
        cp.start()
        cp.wait()
        va = varena
        scalar_chain, cnt_chain, fold_cnt, lvlb = _body_parts(
            runlane_ref, runoff_ref, nexts_ref, packed_ref, lvl_ref,
            rows_ref, va, level,
        )
        inf8 = jnp.full((8, BLK), _INF, jnp.float32)
        zero8 = jnp.zeros((8, BLK), jnp.float32)

        if level == 6:
            mblk = jnp.max(jnp.where(lvl_ref[0:1, :BLK] > -10.0, lvlb,
                                     -1.0))
            lvl_s = jnp.maximum(mblk, 0.0).astype(jnp.int32)
            sh_blk = jnp.minimum(lvl_s, jnp.int32(4)) * jnp.int32(BITS)
        else:
            sh_blk = None

        def pass_body(r, carry):
            acc = (carry, zero8, zero8, zero8)
            qbase = lax.rem(r, jnp.int32(2)) * jnp.int32(0)

            if level == 4:
                # Software-pipelined: compute item k+1's scalars before
                # item k's folds.
                i0_0, off_0, inrun_0 = scalar_chain(
                    lax.rem(r, jnp.int32(NRUNS)), qbase
                )
                cnt_0 = cnt_chain(i0_0, inrun_0)

                def item(k, c):
                    acc, off_p, cnt_p, inrun_p = c
                    kk = lax.rem(r + k + 1, jnp.int32(NRUNS))
                    i0_n, off_n, inrun_n = scalar_chain(kk, qbase)
                    cnt_n = cnt_chain(i0_n, inrun_n)
                    acc = fold_cnt(off_p, cnt_p, inrun_p, acc)
                    return acc, off_n, cnt_n, inrun_n

                acc, off_l, cnt_l, inrun_l = lax.fori_loop(
                    0, NI - 1, item, (acc, off_0, cnt_0, inrun_0)
                )
                acc = fold_cnt(off_l, cnt_l, inrun_l, acc)
                return acc[0]

            def item(k, acc):
                kk = lax.rem(r + k, jnp.int32(NRUNS))
                i0, off, inrun = scalar_chain(kk, qbase)
                if level == 0:
                    bd = acc[0]
                    bd = bd + jnp.float32(1e-12) * (
                        off + i0
                    ).astype(jnp.float32)
                    return (bd, acc[1], acc[2], acc[3])
                if level == 1:
                    bd = acc[0] + jnp.where(inrun, 1e-12, 0.0)
                    return (bd, acc[1], acc[2], acc[3])
                if level == 2:
                    cnt = cnt_chain(i0, inrun)
                    bd = acc[0] + jnp.float32(1e-12) * cnt.astype(
                        jnp.float32
                    )
                    return (bd, acc[1], acc[2], acc[3])
                if level == 6:
                    cnt = lax.shift_right_logical(
                        packed_ref[0, i0], sh_blk
                    ) & MASK6
                else:
                    cnt = cnt_chain(i0, inrun)
                if level == 5:
                    # cnt from the precomputed per-lane row by dynamic
                    # lane read (feasibility probe).
                    cnt = lvl_ref[0, i0].astype(jnp.int32) + jnp.int32(1)
                return fold_cnt(off, cnt, inrun, acc)

            acc = lax.fori_loop(0, NI, item, acc)
            return acc[0]

        bd = lax.fori_loop(0, reps, pass_body, inf8)
        o_ref[...] = bd

    return kern


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    print(f"devices: {jax.devices()}", flush=True)
    floor_bench()
    names = {
        0: "I0 item fori + SMEM scalar chain",
        1: "I1 + in-run lane mask",
        2: "I2 + masked max -> SREG + ladder cnt",
        3: "I3 + fold fori (cnt~2-3, unroll 2) [production]",
        6: "I3b per-pass max instead of per-item max",
        4: "I4 software-pipelined scalar chain",
        5: "I5 cnt via dynamic VMEM lane read",
    }
    reps = {0: 200_000, 1: 200_000, 2: 100_000, 3: 30_000, 6: 30_000,
            4: 30_000, 5: 30_000}
    for lvl in (0, 1, 2, 3, 6, 4, 5):
        _launch(variant(lvl, reps[lvl]), reps[lvl], names[lvl])


if __name__ == "__main__":
    main()
