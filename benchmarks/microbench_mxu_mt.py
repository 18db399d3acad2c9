"""MXU-matmul Moller-Trumbore fold vs the VPU 8-group fold (round 4).

The round-4 cost fit puts the 64-triangle-unit folds at ~2/3 of device
time (~0.26 us/unit all-in on the VPU). det/tn/un/vn are LINEAR in 10
per-spin features, so a unit can instead be folded as four
(64, 16) @ (16, 128) MXU matmuls (shared triangle-record matrix,
per-output spin-feature matrices) plus a VPU epilogue (divides,
barycentric compares, 64-row min-reduce) and one (3, 64) @ (64, 128)
matmul selecting the argmin triangle's normal. This microbench times
both folds on synthetic resident-arena data inside one Pallas kernel.

Usage: python benchmarks/microbench_mxu_mt.py [units_per_call] [reps]
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_POS = [a for a in sys.argv[1:] if a != "t"]
UNITS = int(_POS[0]) if len(_POS) > 0 else 64
REPS = int(_POS[1]) if len(_POS) > 1 else 200
_INF = np.float32(np.inf)
EDGE_TOL = np.float32(1e-5)


def _vpu_kernel(table_ref, feat_ref, out_ref, *, units, reps):
    """Current production fold: 8 sublane-groups of (8, 128) broadcasts."""
    fv = feat_ref[...]
    xb, yb, zb = fv[0:1], fv[1:2], fv[2:3]
    dxb, dyb, dzb = fv[3:4], fv[4:5], fv[5:6]
    cxb = fv[6:7]
    cyb = fv[7:8]
    czb = fv[8:9]
    inrun = fv[9:10] > 0

    def fold(i, acc):
        c = i - (i // units) * units  # reps * units iterations in-kernel
        bd, n0, n1, n2 = acc
        u = table_ref[c]
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
                (det != 0) & (uu >= lo) & (uu <= hi) & (vv >= lo)
                & (uu + vv <= hi) & (t > 0)
            )
            t = jnp.where(ok & inrun, t, _INF)
            better = t < bd
            bd = jnp.where(better, t, bd)
            n0 = jnp.where(better, tri[0], n0)
            n1 = jnp.where(better, tri[1], n1)
            n2 = jnp.where(better, tri[2], n2)
        return bd, n0, n1, n2

    inf8 = jnp.full((8, 128), _INF, jnp.float32)
    z8 = jnp.zeros((8, 128), jnp.float32)
    bd, n0, n1, n2 = lax.fori_loop(
        0, units * reps, fold, (inf8, z8, z8, z8)
    )
    out_ref[0:1, :] = jnp.min(bd, axis=0, keepdims=True)
    out_ref[1:2, :] = jnp.sum(n0, axis=0, keepdims=True)
    out_ref[2:3, :] = jnp.sum(n1 + n2, axis=0, keepdims=True)


def _mxu_kernel(rec_ref, rec3_ref, g_ref, out_ref, *, units, reps):
    """Matmul fold: OUT_k (64, 128) = rec (64, 16) @ G_k (16, 128)."""
    gv = g_ref[...]  # (4, 16, 128) spin-feature matrices
    inrun = gv[0, 9:10, :] > 0  # ones row doubles as the lane mask
    iota64 = lax.broadcasted_iota(jnp.int32, (64, 128), 0)
    lo, hi = -EDGE_TOL, 1.0 + EDGE_TOL

    def fold(i, acc):
        c = i - (i // units) * units
        bd, nx, ny, nz = acc
        rec = rec_ref[c]  # (64, 16)
        det = jnp.dot(rec, gv[0], preferred_element_type=jnp.float32)
        tn = jnp.dot(rec, gv[1], preferred_element_type=jnp.float32)
        un = jnp.dot(rec, gv[2], preferred_element_type=jnp.float32)
        vn = jnp.dot(rec, gv[3], preferred_element_type=jnp.float32)
        inv = 1.0 / det
        t = tn * inv
        uu = un * inv
        vv = vn * inv
        ok = (
            (det != 0) & (uu >= lo) & (uu <= hi) & (vv >= lo)
            & (uu + vv <= hi) & (t > 0)
        )
        t = jnp.where(ok & inrun, t, _INF)
        d = jnp.min(t, axis=0, keepdims=True)  # (1, 128)
        is_min = t == d
        row = jnp.min(
            jnp.where(is_min, iota64, jnp.int32(64)), axis=0, keepdims=True
        )
        sel = (is_min & (iota64 == row) & (d != _INF)).astype(jnp.float32)
        nsel = jnp.dot(
            rec3_ref[c], sel, preferred_element_type=jnp.float32
        )  # (3, 64) @ (64, 128)
        better = d < bd
        bd = jnp.where(better, d, bd)
        nx = jnp.where(better, nsel[0:1], nx)
        ny = jnp.where(better, nsel[1:2], ny)
        nz = jnp.where(better, nsel[2:3], nz)
        return bd, nx, ny, nz

    inf1 = jnp.full((1, 128), _INF, jnp.float32)
    z1 = jnp.zeros((1, 128), jnp.float32)
    bd, nx, ny, nz = lax.fori_loop(
        0, units * reps, fold, (inf1, z1, z1, z1)
    )
    out_ref[0:1, :] = bd
    out_ref[1:2, :] = nx
    out_ref[2:3, :] = ny + nz


def _mxu_t_kernel(recT_ref, g_ref, out_ref, *, units, reps,
                  precision=None):
    """Production v11 formulation: the unit is stored TRANSPOSED
    (16, 128) — features in sublanes, triangles in lanes, DMA-aligned —
    and the fold contracts dim 0 of both operands in ONE dot_general
    against a (16, 4*128) det/tn/un/vn column-grouped feature matrix."""
    gv = g_ref[...]  # (16, 512)
    inrun = gv[9:10, 0:128] > 0
    iota = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lo, hi = -EDGE_TOL, 1.0 + EDGE_TOL

    def fold(i, acc):
        c = i - (i // units) * units
        bd, nx, ny, nz = acc
        u = recT_ref[c]  # (16, 128)
        o = lax.dot_general(
            u, gv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # (128 tris, 512)
        det = o[:, 0:128]
        inv = 1.0 / det
        t = o[:, 128:256] * inv
        uu = o[:, 256:384] * inv
        vv = o[:, 384:512] * inv
        ok = (
            (det != 0) & (uu >= lo) & (uu <= hi) & (vv >= lo)
            & (uu + vv <= hi) & (t > 0)
        )
        t = jnp.where(ok & inrun, t, _INF)
        d = jnp.min(t, axis=0, keepdims=True)
        is_min = t == d
        row = jnp.min(
            jnp.where(is_min, iota, jnp.int32(128)), axis=0, keepdims=True
        )
        sel = (is_min & (iota == row) & (d != _INF)).astype(jnp.float32)
        nsel = jnp.dot(u[0:3, :], sel, preferred_element_type=jnp.float32,
                       precision=precision)
        better = d < bd
        bd = jnp.where(better, d, bd)
        nx = jnp.where(better, nsel[0:1], nx)
        ny = jnp.where(better, nsel[1:2], ny)
        nz = jnp.where(better, nsel[2:3], nz)
        return bd, nx, ny, nz

    inf1 = jnp.full((1, 128), _INF, jnp.float32)
    z1 = jnp.zeros((1, 128), jnp.float32)
    bd, nx, ny, nz = lax.fori_loop(
        0, units * reps, fold, (inf1, z1, z1, z1)
    )
    out_ref[0:1, :] = bd
    out_ref[1:2, :] = nx
    out_ref[2:3, :] = ny + nz


def timed(call, args, label, vary=1):
    """One dispatch; the REPS loop runs INSIDE the kernel (a scan of
    per-rep pallas_calls re-stages the inputs every iteration and an
    unvaried call gets hoisted out entirely — both measured wrong)."""

    @jax.jit
    def run(*args):
        return call(*args)[0, 0]

    t0 = time.time()
    float(run(*args))
    comp = time.time() - t0
    t0 = time.time()
    float(run(*args))
    el = time.time() - t0
    print(
        f"{label}: {el / REPS / UNITS * 1e9:.0f} ns/unit "
        f"({el:.3f}s / {REPS} calls x {UNITS} units; compile {comp:.0f}s)",
        flush=True,
    )


def main():
    # "t" argv: only the production transposed-unit variants (the VPU
    # baseline pays a ~200 s remote compile; its number is recorded in
    # benchmarks/README.md).
    t_only = "t" in sys.argv[1:]
    rng = np.random.RandomState(0)
    table = rng.randn(UNITS, 8, 128).astype(np.float32)
    feat = rng.randn(10, 128).astype(np.float32)
    feat[9] = 1.0
    feat16 = np.zeros((4, 16, 128), np.float32)
    feat16[:, :10, :] = feat[None]
    rec = rng.randn(UNITS, 64, 16).astype(np.float32)
    rec3 = rng.randn(UNITS, 3, 64).astype(np.float32)

    vmem = lambda shape: pl.BlockSpec(
        shape, lambda: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    vpu = None if t_only else pl.pallas_call(
        partial(_vpu_kernel, units=UNITS, reps=REPS),
        in_specs=[vmem(table.shape), vmem(feat.shape)],
        out_specs=vmem((3, 128)),
        out_shape=jax.ShapeDtypeStruct((3, 128), jnp.float32),
    )
    if not t_only:
        timed(vpu, (jnp.asarray(table), jnp.asarray(feat)),
              "VPU 8-group fold")

    mxu = None if t_only else pl.pallas_call(
        partial(_mxu_kernel, units=UNITS, reps=REPS),
        in_specs=[vmem(rec.shape), vmem(rec3.shape), vmem(feat16.shape)],
        out_specs=vmem((3, 128)),
        out_shape=jax.ShapeDtypeStruct((3, 128), jnp.float32),
    )
    if not t_only:
        timed(
            mxu,
            (jnp.asarray(rec), jnp.asarray(rec3), jnp.asarray(feat16)),
            "MXU matmul fold",
            vary=2,
        )

    # Production v11 form: (16, 128) transposed units, one dot per 128
    # triangles — 2x the triangles per fold of the variants above, so
    # compare ns/unit at HALF the unit count.
    recT = rng.randn(UNITS, 16, 128).astype(np.float32)
    g512 = np.zeros((16, 512), np.float32)
    g512[:10] = rng.randn(10, 512)
    g512[9, :] = 1.0
    # Precision.HIGH is NOT supported by the Mosaic dot lowering (only
    # DEFAULT -> one bf16 pass and HIGHEST -> fp32 contract), measured
    # 2026-08-19.
    for prec in (None, jax.lax.Precision.HIGHEST):
        mxu_t = pl.pallas_call(
            partial(_mxu_t_kernel, units=UNITS, reps=REPS, precision=prec),
            in_specs=[vmem(recT.shape), vmem(g512.shape)],
            out_specs=vmem((3, 128)),
            out_shape=jax.ShapeDtypeStruct((3, 128), jnp.float32),
        )
        timed(
            mxu_t, (jnp.asarray(recT), jnp.asarray(g512)),
            f"MXU transposed-unit fold (128 tris/unit, precision={prec})",
        )


if __name__ == "__main__":
    main()
