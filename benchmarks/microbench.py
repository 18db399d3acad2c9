import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 524288

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
    print(f"{name:50s} {tot/reps*1e3:9.4f} ms/iter  (total {tot*1e3:.1f} ms, reps={reps})", flush=True)
    return tot / reps

key = jax.random.PRNGKey(0)

# baseline: trivial body
timed("baseline x+1 on (8,128)", lambda c: c + 1.0, jnp.ones((8, 128)), 400)

# VPU ceiling
def chain100(x):
    for _ in range(100):
        x = x * 1.000001 + 0.3
    return x
dt = timed("100x fma on (8, N)", chain100, jax.random.uniform(key, (8, N)), 50)
print(f"   -> VPU f32 ~{8*N*100*2/dt/1e12:.2f} Tflop/s", flush=True)

# int32 ops ceiling (threefry-ish mix)
def ichain(x):
    for _ in range(50):
        x = (x + (x << 13)) ^ lax.shift_right_logical(x, 7)
    return x
dt = timed("50x int mix (add/shl/shr/xor) on (8, N)", ichain,
           jnp.arange(8 * N, dtype=jnp.int32).reshape(8, N), 50)
print(f"   -> int ~{8*N*50*4/dt/1e12:.2f} Top/s", flush=True)

# transcendentals
def trans(x):
    for _ in range(10):
        x = jnp.cos(x) + 1e-7
    return x
dt = timed("10x cos on (8, N)", trans, jax.random.uniform(key, (8, N)), 50)
print(f"   -> cos ~{8*N*10/dt/1e9:.2f} G/s", flush=True)

# free step again with high reps
g = jax.random.uniform(key, (32, 3))
def free_new(c):
    pos, ph, k = c
    k = jax.random.fold_in(k, 1)
    u = jax.random.uniform(k, (2, N))
    zc = 1.0 - 2.0 * u[0]
    rho = jnp.sqrt(jnp.maximum(0.0, 1.0 - zc * zc))
    phi = (2 * np.pi) * u[1]
    d = jnp.stack((rho * jnp.cos(phi), rho * jnp.sin(phi), zc))
    pos = pos + d
    ph = ph + lax.dot(g, pos, preferred_element_type=ph.dtype)
    return (pos, ph, k)
ph0 = jnp.zeros((32, N))
pos0 = jax.random.uniform(key, (3, N))
dt = timed("free step (3,N)", free_new, (pos0, ph0, key), 200)
print(f"   -> {N/dt/1e6:.1f}M spin-steps/s free", flush=True)

# pieces: uniforms alone; matmul alone
def uni(c):
    k, acc = c
    k = jax.random.fold_in(k, 1)
    u = jax.random.uniform(k, (2, N))
    return (k, acc + u[0, 0])
timed("uniform (2,N) alone", uni, (key, jnp.float32(0)), 200)

def mm(ph):
    return ph * 0.999 + lax.dot(g, pos0, preferred_element_type=ph.dtype)
timed("phase matmul (32,3)@(3,N)", mm, ph0, 200)

# sorts with high reps
keys_i = jax.random.randint(key, (N,), 0, 6859, dtype=jnp.int32)
f32s = [jax.random.uniform(jax.random.fold_in(key, i), (N,)) for i in range(9)]
for n_ops in (2, 5, 10):
    ops = (keys_i,) + tuple(f32s[: n_ops - 1])
    def sort_body(c):
        out = lax.sort(c, num_keys=1)
        return (out[0] ^ jnp.int32(12345),) + out[1:]
    timed(f"lax.sort 512k x{n_ops}", sort_body, ops, 50)
