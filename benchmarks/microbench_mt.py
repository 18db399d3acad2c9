import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

def timed(name, body, init, reps):
    @jax.jit
    def run(carry):
        return lax.scan(lambda c, _: (body(c), None), carry, None, length=reps)[0]
    out = run(init)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    out = run(init)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))
    tot = time.perf_counter() - t0
    print(f"{name:50s} {tot/reps*1e3:9.4f} ms/iter", flush=True)
    return tot / reps

key = jax.random.PRNGKey(0)

# MT-shaped workload: Moller-Trumbore of 512k spins x 128 triangles,
# stored A/E1/E2: spins in sublane blocks of 32, tris in lanes.
NS = 524288
B = 32
nblk = NS // B
spin = jax.random.uniform(key, (nblk, B, 8))   # rows: x,y,z,dx,dy,dz,rem,pad
tri = jax.random.uniform(key, (16, 128))       # A(3), E1(3), E2(3), n(3), pad

def mt_pass(c):
    spin, acc = c
    r0 = [spin[:, :, i:i+1] for i in range(3)]
    d =  [spin[:, :, 3+i:4+i] for i in range(3)]
    A =  [tri[i][None, None, :] for i in range(3)]
    E1 = [tri[3+i][None, None, :] for i in range(3)]
    E2 = [tri[6+i][None, None, :] for i in range(3)]
    T = [r0[i] - A[i] for i in range(3)]
    def cross(a, b):
        return (a[1]*b[2]-a[2]*b[1], a[2]*b[0]-a[0]*b[2], a[0]*b[1]-a[1]*b[0])
    def dot(a, b):
        return a[0]*b[0]+a[1]*b[1]+a[2]*b[2]
    P = cross(d, E2)
    Q = cross(T, E1)
    det = dot(P, E1)
    inv = 1.0 / det
    t = inv * dot(Q, E2)
    u = inv * dot(P, T)
    v = inv * dot(Q, d)
    ok = (det != 0) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 0)
    t = jnp.where(ok, t, np.inf)
    dmin = jnp.min(t, axis=2, keepdims=True)
    return (spin, acc + dmin[..., 0])

acc0 = jnp.zeros((nblk, B))
dt = timed("MT 512k spins x 128 tris (XLA, f32)", mt_pass, (spin, acc0), 30)
print(f"   -> {NS*128/dt/1e9:.1f} Gpairs/s -> per chunk-pass {dt*1e3:.2f} ms", flush=True)

# threefry2x32-ish cost for (1, N) draws
def tf_mix(c):
    x0, x1, acc = c
    for r in (13, 15, 26, 6, 17, 29, 16, 24, 13, 15, 26, 6, 17, 29, 16, 24, 13, 15, 26, 6):
        x0 = x0 + x1
        x1 = (x1 << r) | lax.shift_right_logical(x1, 32 - r)
        x1 = x1 ^ x0
    return (x0 + 1, x1, acc + x0)

x = jnp.arange(NS, dtype=jnp.int32)
dt = timed("threefry-20rounds on (N,) int32", tf_mix, (x, x ^ 7, jnp.zeros(NS, jnp.int32)), 100)
print(f"   -> {NS/dt/1e9:.2f} Gdraws(2x32)/s", flush=True)
