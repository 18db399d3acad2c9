"""In-kernel (Mosaic) microbenchmarks driving the round-3 kernel design.

Each variant is an isolated Pallas kernel timed on the real TPU. Run:

    python benchmarks/microbench_kernel.py > /tmp/mbk.log 2>&1

Methodology notes (this box):
- one dispatch costs ~25-30 ms on the axon relay, so every kernel loops
  enough reps internally that the in-kernel time dominates; the trivial
  kernel ("floor") measures the dispatch cost to subtract.
- every loop body is data-dependent on the carry (anti-hoist): Mosaic
  performs loop-invariant code motion, which silently turns a naive
  benchmark body into a no-op.
"""

import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLOOR = [0.0]  # measured dispatch floor (s)


def bench(name, fn, *args, pairs_per_call=None, iters_per_call=None,
          flops_per_call=None):
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
        msg = f"{name:46s} {best*1e3:9.2f} ms ({dt*1e3:9.2f} net)"
        if pairs_per_call:
            msg += f"  {pairs_per_call/dt/1e9:8.2f} Gpairs/s"
        if iters_per_call:
            msg += f"  {dt/iters_per_call*1e9:8.1f} ns/iter"
        if flops_per_call:
            msg += f"  {flops_per_call/dt/1e12:8.2f} Tflop/s"
        print(msg, flush=True)
        return dt
    except Exception:
        print(f"{name:46s} FAILED", flush=True)
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


# --------------------------------------------------------------- A: grid
def a_grid_empty(n_tiles=65536):
    def kern(o_ref):
        o_ref[...] = jnp.full((8, 128), 1.0, jnp.float32)

    @jax.jit
    def run():
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            out_specs=pl.BlockSpec((8, 128), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32),
        )()

    bench(f"A grid empty ({n_tiles} tiles)", run, iters_per_call=n_tiles)


# --------------------------------------------------------------- B: loop
def b_loop_vec(nv, reps=1_000_000):
    def kern(x_ref, o_ref):
        def body(i, acc):
            return acc * 1.0000001 + 0.5

        o_ref[...] = lax.fori_loop(0, reps, body, x_ref[...])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8 * nv, 128), jnp.float32),
        )(x)

    x = jnp.ones((8 * nv, 128), jnp.float32)
    bench(f"B fori_loop {nv}-vreg-FMA body x{reps}", run, x,
          iters_per_call=reps)


# --------------------------------------------------------------- C: DMA loop
def c_loop_dma(reps=100_000):
    def kern(tab_ref, o_ref, arena, sem):
        def body(i, acc):
            slot = lax.rem(i, jnp.int32(2))
            row = lax.rem(i * 7, jnp.int32(64))
            cp = pltpu.make_async_copy(
                tab_ref.at[pl.ds(row * 16, 16)], arena.at[slot], sem.at[slot]
            )
            cp.start()
            cp.wait()
            return acc + arena[slot, 0, 0]

        acc = lax.fori_loop(0, reps, body, jnp.float32(0.0))
        o_ref[...] = jnp.full((8, 128), acc, jnp.float32)

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 16, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(tab)

    tab = jnp.ones((64 * 16, 128), jnp.float32)
    bench(f"C fori_loop DMA-8KB body x{reps}", run, tab, iters_per_call=reps)


# --------------------------------------------------------------- D: VPU MT
def _mt_cols(st, tri_cols, width):
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
    ok = (
        (det != 0)
        & (u >= 0)
        & (u <= 1)
        & (v >= 0)
        & (v <= 1)
        & (u + v <= 1)
        & (t > 0)
    )
    t = jnp.where(ok, t, jnp.float32(np.inf))
    return jnp.min(t, axis=1, keepdims=True)


def d_mt_vpu(width, reps=20_000):
    def kern(st_ref, tri_ref, o_ref):
        def body(i, carry):
            st, acc = carry
            d = _mt_cols(st, tri_ref[...], width)
            # anti-hoist: the next iteration's positions depend on d
            st = st + 1e-7 * jnp.minimum(d, 1.0)
            return (st, jnp.minimum(acc, d))

        st0 = st_ref[...]
        acc0 = jnp.full((128, 1), np.inf, jnp.float32)
        st, acc = lax.fori_loop(0, reps, body, (st0, acc0))
        o_ref[...] = acc + st[:, 0:1]

    @jax.jit
    def run(st, tri):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32),
        )(st, tri)

    st = jax.random.uniform(jax.random.PRNGKey(0), (128, 8))
    tri = jax.random.uniform(jax.random.PRNGKey(1), (16, width))
    bench(
        f"D MT VPU cross-form 128x{width} x{reps}",
        run,
        st,
        tri,
        pairs_per_call=128 * width * reps,
    )


# --------------------------------------------------------------- F: MXU MT
def f_mt_mxu(nt, reps=20_000, with_pick=True):
    """Feature-form: G_T (4*nt, 16) x F (16, 128) on the MXU + accept."""

    def kern(f_ref, g_ref, n_ref, o_ref):
        NT3 = n_ref[...]  # (8, nt) rows 0-2 = normal components

        def body(i, carry):
            F, best, bn = carry
            out = jnp.dot(
                g_ref[...], F, preferred_element_type=jnp.float32
            )  # (4*nt, 128)
            det = out[0 * nt : 1 * nt, :]
            tn = out[1 * nt : 2 * nt, :]
            un = out[2 * nt : 3 * nt, :]
            vn = out[3 * nt : 4 * nt, :]
            inv = 1.0 / det
            t = tn * inv
            u = un * inv
            v = vn * inv
            ok = (
                (det != 0)
                & (u >= 0)
                & (u <= 1)
                & (v >= 0)
                & (u + v <= 1)
                & (t > 0)
            )
            t = jnp.where(ok, t, jnp.float32(np.inf))
            d = jnp.min(t, axis=0, keepdims=True)  # (1, 128)
            if with_pick:
                sel = (t == d) & ok  # (nt, 128)
                pick = jnp.dot(
                    NT3,
                    sel.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )  # (8, 128)
            else:
                pick = bn
            better = d < best
            F = F + 1e-7 * jnp.minimum(d, 1.0)  # anti-hoist
            return (
                F,
                jnp.where(better, d + 1e-6, best),
                jnp.where(better, pick, bn),
            )

        best0 = jnp.full((1, 128), np.inf, jnp.float32)
        bn0 = jnp.zeros((8, 128), jnp.float32)
        F, best, bn = lax.fori_loop(0, reps, body, (f_ref[...], best0, bn0))
        o_ref[...] = bn + best + F[0:1, :]

    @jax.jit
    def run(F, G, N):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(F, G, N)

    F = jax.random.uniform(jax.random.PRNGKey(0), (16, 128))
    G = jax.random.uniform(jax.random.PRNGKey(1), (4 * nt, 16))
    N = jax.random.uniform(jax.random.PRNGKey(2), (8, nt))
    tag = "pick" if with_pick else "nopick"
    bench(
        f"F MT MXU feature-form nt={nt} {tag} x{reps}",
        run,
        F,
        G,
        N,
        pairs_per_call=nt * 128 * reps,
    )


# --------------------------------------------------------------- H: threefry
def _tf_rounds(x0, x1, rounds=13):
    rots = (13, 15, 26, 6, 17, 29, 16, 24)
    for r in range(rounds):
        x0 = x0 + x1
        ro = rots[r % 8]
        x1 = (x1 << np.int32(ro)) | lax.shift_right_logical(
            x1, np.int32(32 - ro)
        )
        x1 = x1 ^ x0
    return x0, x1


def h_threefry(shape, reps=100_000):
    def kern(x_ref, o_ref):
        x = x_ref[...]

        def body(i, acc):
            a, b = _tf_rounds(acc, acc ^ 0x1BD11BDA)
            return a + b

        o_ref[...] = lax.fori_loop(0, reps, body, x)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        )(x)

    x = jnp.ones(shape, jnp.int32)
    n = int(np.prod(shape))
    dt = bench(f"H threefry13 chained on {shape} x{reps}", run, x,
               iters_per_call=reps)
    if dt:
        print(f"   -> {n*reps/dt/1e9:.2f} Gdraws/s", flush=True)


# --------------------------------------------------------------- I: transpose
def i_transpose(reps=200_000):
    def kern(x_ref, o_ref):
        def body(i, acc):
            t = x_ref[...].T + acc[0, 0]
            return t

        o_ref[...] = lax.fori_loop(
            0, reps, body, jnp.zeros((128, 16), jnp.float32)
        )

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 16), jnp.float32),
        )(x)

    x = jnp.ones((16, 128), jnp.float32)
    bench(f"I transpose (16,128)->(128,16) x{reps}", run, x,
          iters_per_call=reps)


# --------------------------------------------------------------- J: raw MXU
def j_mxu(m, k, n, reps=50_000):
    def kern(a_ref, b_ref, o_ref):
        def body(i, acc):
            o = jnp.dot(a_ref[...], b_ref[...] + acc[0, 0],
                        preferred_element_type=jnp.float32)
            return acc + o[0:1, :n] * 1e-6

        o_ref[...] = lax.fori_loop(
            0, reps, body, jnp.zeros((1, n), jnp.float32)
        )

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )(a, b)

    a = jax.random.uniform(jax.random.PRNGKey(0), (m, k)) * 1e-2
    b = jax.random.uniform(jax.random.PRNGKey(1), (k, n)) * 1e-2
    bench(
        f"J MXU f32 ({m},{k})x({k},{n}) x{reps}",
        run,
        a,
        b,
        flops_per_call=2 * m * k * n * reps,
        iters_per_call=reps,
    )


# ------------------------------------------------------- K: strobe cost
def k_strobe(reps=20_000):
    """while_loop whose condition reads a vector reduction (the per-pass
    'any spin still active' check): cost of the vector->scalar strobe."""

    def kern(x_ref, o_ref):
        def cond(carry):
            i, acc = carry
            return (i < reps) & (jnp.sum(acc) > 0)

        def body(carry):
            i, acc = carry
            return (i + 1, acc * 1.0000001)

        _, acc = lax.while_loop(cond, body, (jnp.int32(0), x_ref[...]))
        o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    x = jnp.ones((8, 128), jnp.float32)
    bench(f"K while_loop vector-sum cond x{reps}", run, x,
          iters_per_call=reps)


# ------------------------------------------------- L: full fold (realistic)
def l_fold_full(width, reps=200_000):
    """Wide MT fold with the full accept DAG + best-d + normal pick update,
    exactly the per-fold work of the v2 kernel."""

    def kern(st_ref, tri_ref, o_ref):
        TILE = 128

        def body(i, carry):
            st, bd, bn1, bn2, bn3 = carry
            r0 = [st[:, j][:, None] for j in range(3)]
            dirn = [st[:, 3 + j][:, None] for j in range(3)]
            tri = tri_ref[...]
            A = [tri[j, :][None, :] for j in range(3)]
            E1 = [tri[3 + j, :][None, :] for j in range(3)]
            E2 = [tri[6 + j, :][None, :] for j in range(3)]
            T = [r0[j] - A[j] for j in range(3)]

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
            inv = 1.0 / det
            t = inv * dot(Q, E2)
            u = inv * dot(P, T)
            v = inv * dot(Q, dirn)
            ok = (
                (det != 0)
                & (u >= -1e-5)
                & (u <= 1 + 1e-5)
                & (v >= -1e-5)
                & (u + v <= 1 + 1e-5)
                & (t > 0)
            )
            t = jnp.where(ok, t, jnp.float32(np.inf))
            d = jnp.min(t, axis=1, keepdims=True)
            is_min = t == d
            lane = lax.broadcasted_iota(jnp.int32, t.shape, 1)
            min_lane = jnp.min(
                jnp.where(is_min, lane, jnp.int32(t.shape[1])),
                axis=1,
                keepdims=True,
            )
            sel = is_min & (lane == min_lane)

            def pick(row):
                comp = tri[9 + row, :][None, :]
                return jnp.sum(
                    jnp.where(sel, comp, 0.0), axis=1, keepdims=True
                )

            better = d < bd
            bd = jnp.where(better, d, bd)
            bn1 = jnp.where(better, pick(0), bn1)
            bn2 = jnp.where(better, pick(1), bn2)
            bn3 = jnp.where(better, pick(2), bn3)
            st = st + 1e-7 * jnp.minimum(bd, 1.0)  # anti-hoist
            return (st, bd, bn1, bn2, bn3)

        z = jnp.zeros((128, 1), jnp.float32)
        init = (st_ref[...], jnp.full((128, 1), np.inf, jnp.float32), z, z, z)
        st, bd, bn1, bn2, bn3 = lax.fori_loop(0, reps, body, init)
        o_ref[...] = bd + bn1 + bn2 + bn3 + st[:, 0:1]

    @jax.jit
    def run(st, tri):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32),
        )(st, tri)

    st = jax.random.uniform(jax.random.PRNGKey(0), (128, 8))
    tri = jax.random.uniform(jax.random.PRNGKey(1), (16, width))
    bench(
        f"L full fold 128x{width} x{reps}",
        run,
        st,
        tri,
        pairs_per_call=128 * width * reps,
    )


# ------------------------------------------------- M: pipelined DMA issue
def m_dma_pipelined(reps=100_000, depth=4):
    """DMA loop with issue running `depth` ahead of wait: per-iteration cost
    when transfers overlap (the v2 arena-fill pattern)."""
    def kern(tab_ref, o_ref, arena, sem):
        def issue(i):
            slot = lax.rem(i, jnp.int32(depth))
            row = lax.rem(i * 7, jnp.int32(64))
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(row * 16, 16)], arena.at[slot], sem.at[slot]
            ).start()

        def wait(i):
            slot = lax.rem(i, jnp.int32(depth))
            row = lax.rem(i * 7, jnp.int32(64))
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(row * 16, 16)], arena.at[slot], sem.at[slot]
            ).wait()

        def prime(i, _):
            issue(i)
            return 0

        lax.fori_loop(0, depth - 1, prime, 0)

        def body(i, acc):
            issue(i + depth - 1)
            wait(i)
            slot = lax.rem(i, jnp.int32(depth))
            return acc + arena[slot, 0, 0]

        acc = lax.fori_loop(0, reps - depth + 1, body, jnp.float32(0.0))

        def drain(i, acc):
            wait(reps - depth + 1 + i)
            return acc

        acc = lax.fori_loop(0, depth - 1, drain, acc)
        o_ref[...] = jnp.full((8, 128), acc, jnp.float32)

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((depth, 16, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
        )(tab)

    tab = jnp.ones((64 * 16, 128), jnp.float32)
    bench(f"M DMA-8KB pipelined depth={depth} x{reps}", run, tab,
          iters_per_call=reps)


# ------------------------------------------------- N: flipped (row-form) fold
def n_flip_fold(n_lanes, groups, reps=200_000):
    """Row-form MT fold: spins in LANES, an 8-triangle group in SUBLANES.

    Per iteration: fold ``groups`` 8-tri groups against (1, n_lanes) spin
    rows with the full feature-form accept DAG and (8, n_lanes) best-d /
    normal latch accumulators. Triangle features are (8, 1) column slices
    of a pre-packed (8, 16*groups) chunk — the layout the flipped kernel
    would DMA. Tests the two risky lowerings at once: (8,1) lane-broadcast
    and (1,N) sublane-broadcast meeting in one (8,N) expression.
    """

    def kern(st_ref, tri_ref, o_ref):
        def body(i, carry):
            st, bd, bn0, bn1, bn2 = carry
            x = st[0:1]
            y = st[1:2]
            z = st[2:3]
            dx = st[3:4]
            dy = st[4:5]
            dz = st[5:6]
            cx = y * dz - z * dy
            cy = z * dx - x * dz
            cz = x * dy - y * dx
            for g in range(groups):
                tri = [
                    tri_ref[:, g * 16 + j : g * 16 + j + 1] for j in range(16)
                ]
                det = -(dx * tri[0] + dy * tri[1] + dz * tri[2])
                tn = (x * tri[0] + y * tri[1] + z * tri[2]) - tri[3]
                un = (cx * tri[4] + cy * tri[5] + cz * tri[6]) - (
                    dx * tri[7] + dy * tri[8] + dz * tri[9]
                )
                vn = -(cx * tri[10] + cy * tri[11] + cz * tri[12]) - (
                    dx * tri[13] + dy * tri[14] + dz * tri[15]
                )
                inv = 1.0 / det
                t = tn * inv
                u = un * inv
                v = vn * inv
                ok = (
                    (det != 0)
                    & (u >= -1e-5)
                    & (u <= 1 + 1e-5)
                    & (v >= -1e-5)
                    & (u + v <= 1 + 1e-5)
                    & (t > 0)
                )
                t = jnp.where(ok, t, jnp.float32(np.inf))
                better = t < bd
                bd = jnp.where(better, t, bd)
                bn0 = jnp.where(better, tri[0], bn0)
                bn1 = jnp.where(better, tri[1], bn1)
                bn2 = jnp.where(better, tri[2], bn2)
            st = st + 1e-7 * jnp.minimum(bd[0:1], 1.0)  # anti-hoist
            return (st, bd, bn0, bn1, bn2)

        inf = jnp.full((8, n_lanes), np.inf, jnp.float32)
        z = jnp.zeros((8, n_lanes), jnp.float32)
        st, bd, bn0, bn1, bn2 = lax.fori_loop(
            0, reps, body, (st_ref[...], inf, z, z, z)
        )
        o_ref[...] = bd + bn0 + bn1 + bn2 + st[0:1]

    @jax.jit
    def run(st, tri):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, n_lanes), jnp.float32),
        )(st, tri)

    st = jax.random.uniform(jax.random.PRNGKey(0), (8, n_lanes))
    tri = jax.random.uniform(jax.random.PRNGKey(1), (8, 16 * groups))
    bench(
        f"N flip fold {groups}x8tri x {n_lanes}sp x{reps}",
        run,
        st,
        tri,
        pairs_per_call=8 * groups * n_lanes * reps,
        iters_per_call=reps,
    )


# ------------------------------------------------- O: row-form pass machinery
def o_row_machinery(n_lanes, reps=200_000):
    """Per-pass machinery in row form: sublane-reduce the (8, N) best-d +
    normal accumulators to (1, N) rows (min + tie-broken pick), then the
    full resolve DAG on (1..3, N) rows. The flipped kernel pays this once
    per bounce pass; compare against the measured ~8 us column-form pass."""

    def kern(st_ref, acc_ref, o_ref):
        sub = lax.broadcasted_iota(jnp.int32, (8, n_lanes), 0)

        def body(i, carry):
            st, bd = carry
            # sublane-reduce: min distance + first-minimal-row pick
            d = jnp.min(bd, axis=0, keepdims=True)
            is_min = bd == d
            row = jnp.min(
                jnp.where(is_min, sub, jnp.int32(8)), axis=0, keepdims=True
            )
            sel = is_min & (sub == row) & (d != np.inf)
            nx = jnp.sum(jnp.where(sel, acc_ref[...], 0.0), axis=0,
                         keepdims=True)
            ny = jnp.sum(jnp.where(sel, acc_ref[...] + 1.0, 0.0), axis=0,
                         keepdims=True)
            nz = jnp.sum(jnp.where(sel, acc_ref[...] + 2.0, 0.0), axis=0,
                         keepdims=True)
            rn = lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
            nx, ny, nz = nx * rn, ny * rn, nz * rn
            # resolve on rows
            x, y, zc = st[0:1], st[1:2], st[2:3]
            dxr, dyr, dzr = st[3:4], st[4:5], st[5:6]
            rem = st[6:7]
            iters = st[7:8]
            a = iters < 100.0
            hit = a & (d <= rem + 1e-5)
            vx, vy, vz = d * dxr, d * dyr, d * dzr
            dp = vx * nx + vy * ny + vz * nz
            s = jnp.where(dp > 0, -1.0, 1.0)
            nxs, nys, nzs = nx * s, ny * s, nz * s
            dpo = -jnp.abs(dp)
            ndx = vx - 2.0 * dpo * nxs
            ndy = vy - 2.0 * dpo * nys
            ndz = vz - 2.0 * dpo * nzs
            rninv = lax.rsqrt(ndx * ndx + ndy * ndy + ndz * ndz)
            ndx, ndy, ndz = ndx * rninv, ndy * rninv, ndz * rninv
            rx = x + vx + 1e-6 * nxs
            ry = y + vy + 1e-6 * nys
            rz = zc + vz + 1e-6 * nzs
            nst = jnp.concatenate(
                (
                    jnp.where(hit, rx, x),
                    jnp.where(hit, ry, y),
                    jnp.where(hit, rz, zc),
                    jnp.where(hit, ndx, dxr),
                    jnp.where(hit, ndy, dyr),
                    jnp.where(hit, ndz, dzr),
                    jnp.where(hit, rem - d, rem),
                    iters + jnp.where(hit, 1.0, 0.0),
                ),
                axis=0,
            )
            return (nst, bd * 1.0000001)  # anti-hoist

        st, bd = lax.fori_loop(
            0, reps, body, (st_ref[...], acc_ref[...] * 1.0)
        )
        o_ref[...] = st + bd

    @jax.jit
    def run(st, acc):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, n_lanes), jnp.float32),
        )(st, acc)

    st = jax.random.uniform(jax.random.PRNGKey(0), (8, n_lanes))
    acc = jax.random.uniform(jax.random.PRNGKey(1), (8, n_lanes)) + 0.5
    bench(
        f"O row machinery reduce+resolve {n_lanes}sp x{reps}",
        run,
        st,
        acc,
        iters_per_call=reps,
    )


if __name__ == "__main__":
    import sys
    print(f"backend: {jax.default_backend()}", flush=True)
    floor_bench()
    if "--flip" in sys.argv:
        n_flip_fold(128, 1)
        n_flip_fold(128, 4, reps=100_000)
        n_flip_fold(256, 4, reps=100_000)
        n_flip_fold(512, 4, reps=50_000)
        o_row_machinery(128)
        o_row_machinery(512, reps=100_000)
        sys.exit(0)
    if "--quick" in sys.argv:
        sys.exit(0)
    if "--round3" in sys.argv:
        k_strobe()
        l_fold_full(512)
        l_fold_full(1024, reps=100_000)
        m_dma_pipelined()
        sys.exit(0)
    a_grid_empty()
    b_loop_vec(1)
    b_loop_vec(8, reps=400_000)
    c_loop_dma()
    d_mt_vpu(128, reps=2_000_000)
    d_mt_vpu(512, reps=500_000)
    d_mt_vpu(1024, reps=250_000)
    f_mt_mxu(32, reps=2_000_000)
    f_mt_mxu(32, reps=2_000_000, with_pick=False)
    f_mt_mxu(128, reps=500_000)
    h_threefry((1, 128), reps=5_000_000)
    h_threefry((8, 128), reps=5_000_000)
    i_transpose()
    j_mxu(128, 128, 128, reps=1_000_000)
    j_mxu(128, 16, 128, reps=2_000_000)
    j_mxu(512, 16, 128, reps=1_000_000)
    j_mxu(2048, 16, 128, reps=500_000)