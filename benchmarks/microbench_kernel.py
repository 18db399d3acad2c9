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


if __name__ == "__main__":
    import sys
    print(f"backend: {jax.default_backend()}", flush=True)
    floor_bench()
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