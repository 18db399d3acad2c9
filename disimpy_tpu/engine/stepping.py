"""One-time-step position updates per substrate kind.

Each ``step_*`` function advances the whole spin ensemble by one time step of
unit length (the engine works in step-length units): draw an isotropic unit
direction per spin, resolve surface collisions, return new positions plus a
per-spin flag for spins that exhausted the collision-iteration budget.

State layout: positions and directions are (3, n) arrays — components in
rows, the spin axis in the TPU's 128-wide lane dimension. The (n, 3) layout
the reference uses (one walker per CUDA thread) would put the 3-wide axis in
lanes and waste 125/128 of every vector op on TPU.

The reference resolves collisions with a per-thread ``while`` loop
(disimpy/simulations.py:705-1013). Here the loop is a *batched*
``lax.while_loop``: the body updates every spin with masked selects and the
loop runs until no spin is still colliding — so the trip count is the
ensemble's maximum bounce count (typically 0-3), not the per-spin worst case
padded to a fixed unroll.

``iter_exc`` semantics match the reference exactly (simulations.py:742-743,
:999-1000): a spin is flagged when it has entered the collision check
``max_iter`` times, and flagged spins are excluded from the signal by the
driver.
"""

import jax.numpy as jnp
from jax import lax

from . import config, geometry, mesh_accel, rng
from .specs import CylinderSpec, EllipsoidSpec, FreeSpec, MeshSpec, SphereSpec


def _make_mesh_query(spec, dtype, sharded=False):
    """Pick the nearest-hit implementation for this spec/backend and return
    a ``query(r0, direction, rem) -> (min_d, normal)`` closure operating on
    (n, 3) arrays (the mesh query's internal layout).

    The collision path widens the triangle test by a barycentric tolerance
    scaled to the dtype's rounding error so adjacent triangles overlap
    rather than gap: without it, a ~1e-7 relative float32 error lets rare
    spins slip through shared mesh edges (observed as ~1-per-1e7-spin-steps
    leaks through closed surfaces)."""
    edge_tol = 1e-5 if jnp.dtype(dtype) == jnp.float32 else 1e-12
    if config.mesh_query_backend(spec, dtype, sharded=sharded) == "pallas":
        from . import pallas_mesh

        table = pallas_mesh.pallas_table(spec)

        def query(r0, direction, rem):
            return pallas_mesh.nearest_hit_pallas(
                spec, r0, direction, rem, table,
                interpret=config.pallas_interpret,
            )

        return query
    return lambda r0, direction, rem: mesh_accel.nearest_hit(
        spec, r0, direction, rem, edge_tol=edge_tol
    )


def step_free(positions, key, spec: FreeSpec, epsilon, max_iter):
    """Free diffusion: unit step, no collisions (reference :682-702)."""
    direction = rng.random_unit_steps(key, positions.shape[1], positions.dtype)
    exc = jnp.zeros(positions.shape[1], dtype=bool)
    crossings = jnp.zeros(positions.shape[1], dtype=jnp.int32)
    return positions + direction, exc, crossings


def _hit_slack(dtype):
    """Collision-acceptance slack (step-length units).

    The computed hit distance carries the dtype's rounding error; when a
    step ends within that error of a surface, ``d`` can come out just past
    ``rem`` and the un-reflected final move penetrates the wall by up to
    ~eps(dtype) * |coords|. Accepting hits up to ``rem + slack`` reflects
    such steps slightly early instead; the residual backward move after the
    reflection is smaller than the surface offset, so the walker ends
    strictly inside. The slack (9e-12 m at typical step lengths in float32)
    is far below any signal tolerance.
    """
    return 1e-5 if jnp.dtype(dtype) == jnp.float32 else 1e-12


def _smallest_positive_root(A, B, C, perm_prob, dtype):
    """Forward collision root of ``A d^2 + B d + C = 0`` (+inf when none).

    Impermeable compartment (``perm_prob == 0``): always the *far* root —
    exactly the pre-permeability behavior. This is deliberate, not just
    conservative: float32 tangential grazes routinely strand a walker up
    to ~1e-2 step lengths *outside* the wall (the confinement tests pin
    that bound), and the far root makes such a walker traverse to the far
    wall and reflect back *inside* (recapture), whereas a near-root
    exterior bounce would exile it permanently.

    Permeable compartment: outside walkers are legitimate, so both roots
    compete and the nearest forward one wins (an outside walker moving
    away has none and diffuses freely; ``A <= 0`` — direction parallel to
    a cylinder axis — means no intersection). The near root must clear
    the dtype's hit slack so a walker sitting on the surface within
    rounding (spurious near root of rounding magnitude) falls through to
    the far root; artifact-outside grazers here are recaptured within a
    few crossing trials instead, which permeable statistics can't see.
    """
    disc = B * B - 4.0 * A * C
    ok = (disc >= 0) & (A > 0)
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    inv = 0.5 / jnp.where(ok, A, 1.0)
    r1 = (-B - sq) * inv  # r1 <= r2 since A > 0
    r2 = (-B + sq) * inv
    inf = jnp.asarray(jnp.inf, dtype)
    far = jnp.where(r2 > 0, r2, inf)
    near_first = jnp.where(r1 > _hit_slack(dtype), r1, far)
    d = jnp.where(perm_prob > 0, near_first, far)
    return jnp.where(ok, d, inf)


def _bounce_analytic(positions, key, perm_prob, epsilon, max_iter,
                     distance_and_normal):
    """Shared masked bounce loop for the analytic substrates.

    ``distance_and_normal(r0, direction) -> (d, normal)`` returns the (n,)
    distance to the surface along the direction (+inf when the ray misses)
    and a (3, n) surface normal at the hit point (either orientation; the
    reflect/cross helpers orient it against / along the motion).

    ``perm_prob`` extends the reference semantics of mesh membranes
    (disimpy/simulations.py:984-998) to the analytic compartments: on each
    collision the walker crosses the surface with probability
    ``perm_prob`` (keeping its direction, offset ``epsilon`` past the
    wall) and reflects otherwise. The crossing decision uses the strict
    ``u < perm_prob`` so 0 is exactly impermeable (see
    :func:`_resolve_mesh_hits`).
    """
    n = positions.shape[1]
    dtype = positions.dtype
    slack = _hit_slack(dtype)
    direction = rng.random_unit_steps(key, n, dtype)
    rem = jnp.ones(n, dtype=dtype)
    iters = jnp.zeros(n, dtype=jnp.int32)
    active = jnp.ones(n, dtype=bool)
    crossings = jnp.zeros(n, dtype=jnp.int32)

    def cond(state):
        return jnp.any(state[4])

    def body(state):
        r0, direction, rem, iters, active, crossings, bounce_idx = state
        iters = iters + active
        d, normal = distance_and_normal(r0, direction)
        hit = active & (d > 0) & (d < rem + slack)
        u = rng.uniforms(rng.bounce_key(key, bounce_idx), n, dtype)
        go_through = u < perm_prob
        refl_r0, refl_dir = geometry.reflect_rows(
            r0, direction, d, normal, epsilon
        )
        cross_r0 = geometry.crossing_rows(r0, direction, d, normal, epsilon)
        reflected = hit & ~go_through
        crossed = hit & go_through
        r0 = jnp.where(
            reflected[None, :],
            refl_r0,
            jnp.where(crossed[None, :], cross_r0, r0),
        )
        direction = jnp.where(reflected[None, :], refl_dir, direction)
        rem = jnp.where(hit, rem - (d + epsilon), rem)
        crossings = crossings + crossed.astype(jnp.int32)
        active = hit & (rem > 0) & (iters < max_iter)
        return (r0, direction, rem, iters, active, crossings, bounce_idx + 1)

    state = (positions, direction, rem, iters, active, crossings,
             jnp.asarray(0, jnp.int32))
    r0, direction, rem, iters, _, crossings, _ = lax.while_loop(
        cond, body, state
    )
    exc = iters >= max_iter
    return r0 + direction * rem[None, :], exc, crossings


def step_sphere(positions, key, spec: SphereSpec, epsilon, max_iter):
    """Diffusion inside (or, with permeability, around) a sphere
    (reference :705-756)."""

    def distance_and_normal(r0, direction):
        B = 2.0 * geometry.dot_rows(direction, r0)
        C = geometry.dot_rows(r0, r0) - spec.radius**2
        d = _smallest_positive_root(
            jnp.ones_like(B), B, C, spec.perm_prob, positions.dtype
        )
        normal = geometry.normalize_rows(-(r0 + d[None, :] * direction))
        return d, normal

    return _bounce_analytic(
        positions, key, spec.perm_prob, epsilon, max_iter, distance_and_normal
    )


def step_cylinder(positions, key, spec: CylinderSpec, epsilon, max_iter):
    """Diffusion inside an infinite cylinder along +x (reference :759-816).

    Runs in the cylinder frame (the driver rotates the waveform / outputs),
    so the collision test is a 2D circle test on the y/z components.
    """

    def distance_and_normal(r0, direction):
        ryz, dyz = r0[1:3], direction[1:3]
        A = jnp.sum(dyz * dyz, axis=0)
        B = 2.0 * jnp.sum(ryz * dyz, axis=0)
        C = jnp.sum(ryz * ryz, axis=0) - spec.radius**2
        d = _smallest_positive_root(A, B, C, spec.perm_prob, positions.dtype)
        hit_yz = -(ryz + d[None, :] * dyz)
        normal = jnp.concatenate((jnp.zeros((1, d.shape[0]), r0.dtype), hit_yz))
        return d, geometry.normalize_rows(normal)

    return _bounce_analytic(
        positions, key, spec.perm_prob, epsilon, max_iter, distance_and_normal
    )


def step_ellipsoid(positions, key, spec: EllipsoidSpec, epsilon, max_iter):
    """Diffusion inside an axis-aligned ellipsoid (reference :819-875).

    Runs in the ellipsoid frame (the driver rotates the waveform / outputs).
    """

    def distance_and_normal(r0, direction):
        inv2 = (1.0 / (spec.semiaxes * spec.semiaxes))[:, None]
        A = jnp.sum(direction * direction * inv2, axis=0)
        B = 2.0 * jnp.sum(direction * r0 * inv2, axis=0)
        C = jnp.sum(r0 * r0 * inv2, axis=0) - 1.0
        d = _smallest_positive_root(A, B, C, spec.perm_prob, positions.dtype)
        normal = -(r0 + d[None, :] * direction) * inv2
        return d, geometry.normalize_rows(normal)

    return _bounce_analytic(
        positions, key, spec.perm_prob, epsilon, max_iter, distance_and_normal
    )


def _resolve_mesh_hits(spec, r0, direction, rem, d, normal, hit, u, epsilon):
    """Apply reflect-or-cross to the spins flagged ``hit`` ((n, 3) layout —
    the mesh query's internal orientation). Also returns the ``crossed``
    mask (membrane transits, used for exchange/relaxation tracking).

    The crossing decision uses a strict ``u < perm_prob`` so that
    ``perm_prob = 0`` is exactly impermeable for every possible uniform
    draw (the reference's ``perm_prob < u`` comparison lets a walker
    through when the RNG returns exactly 0, simulations.py:988).
    """
    go_through = u < spec.perm_prob
    refl_r0, refl_dir = geometry.reflect(r0, direction, d, normal, epsilon)
    cross_r0 = geometry.crossing(r0, direction, d, normal, epsilon)
    reflected = hit & ~go_through
    crossed = hit & go_through
    r0 = jnp.where(
        reflected[:, None], refl_r0, jnp.where(crossed[:, None], cross_r0, r0)
    )
    direction = jnp.where(reflected[:, None], refl_dir, direction)
    rem = jnp.where(hit, rem - d, rem)
    return r0, direction, rem, crossed


def step_mesh(positions, key, spec: MeshSpec, epsilon, max_iter, sharded=False):
    """Diffusion restricted by a triangle mesh (reference :878-1013).

    Per bounce: query the acceleration grid for the closest forward
    triangle hit within the remaining segment, then either reflect off it
    or (with probability ``perm_prob``) cross it.

    Execution is work-efficient: the first collision query runs on the full
    ensemble (every spin needs it), but subsequent bounce iterations — which
    concern only the minority of spins that actually hit a wall — run on a
    fixed-capacity *compacted* buffer of still-active spins. This avoids the
    reference pattern (and a naive batched port) of paying a full-ensemble
    traversal per bounce iteration when 90% of lanes are idle.

    The query/bounce machinery works in the (n, 3) layout the acceleration
    tables are built for; positions transpose at entry/exit.
    """
    n = positions.shape[1]
    dtype = positions.dtype
    slack = _hit_slack(dtype)
    query = _make_mesh_query(spec, dtype, sharded=sharded)
    direction = rng.random_unit_steps(rng.bounce_key(key, 0), n, dtype).T
    positions = positions.T
    rem = jnp.ones(n, dtype=dtype)

    # First pass: full-batch query and resolve.
    d, normal = query(positions, direction, rem)
    hit = d <= rem + slack
    u = rng.uniforms(rng.bounce_key(key, 1), n, dtype)
    r0, direction, rem, crossed = _resolve_mesh_hits(
        spec, positions, direction, rem, d, normal, hit, u, epsilon
    )
    crossings = crossed.astype(jnp.int32)
    iters = jnp.ones(n, dtype=jnp.int32)
    active = hit & (rem > 0) & (1 < max_iter)

    # Compacted bounce loop: retire up to `capacity` pending bounces per
    # iteration; spins beyond capacity stay active and are picked up on a
    # later iteration, so any capacity value is correct. (n // 8 measured
    # best on the axon TPU backend: larger capacities destabilize the
    # runtime, smaller ones multiply the fixed per-iteration costs.)
    capacity = min(n, max(128, n // 8))

    def cond(state):
        return jnp.any(state[4])

    def body(state):
        r0, direction, rem, iters, active, crossings, bounce_idx = state
        idx = jnp.nonzero(active, size=capacity, fill_value=n)[0]
        valid = idx < n
        idx_c = jnp.minimum(idx, n - 1)
        r0_s = r0[idx_c]
        dir_s = direction[idx_c]
        rem_s = jnp.where(valid, rem[idx_c], 0.0)
        iters_s = iters[idx_c] + valid
        d, normal = query(r0_s, dir_s, rem_s)
        hit = valid & (d <= rem_s + slack)
        u = rng.uniforms(rng.bounce_key(key, bounce_idx), capacity, dtype)
        r0_s, dir_s, rem_s, crossed = _resolve_mesh_hits(
            spec, r0_s, dir_s, rem_s, d, normal, hit, u, epsilon
        )
        cross_s = crossings[idx_c] + crossed.astype(jnp.int32)
        still = hit & (rem_s > 0) & (iters_s < max_iter)
        # Scatter the subset back; fill slots (index n) drop out-of-bounds.
        r0 = r0.at[idx].set(r0_s, mode="drop")
        direction = direction.at[idx].set(dir_s, mode="drop")
        rem = rem.at[idx].set(rem_s, mode="drop")
        iters = iters.at[idx].set(iters_s, mode="drop")
        crossings = crossings.at[idx].set(cross_s, mode="drop")
        active = active.at[idx].set(still, mode="drop")
        return (r0, direction, rem, iters, active, crossings, bounce_idx + 1)

    state = (r0, direction, rem, iters, active, crossings,
             jnp.asarray(2, jnp.int32))
    r0, direction, rem, iters, _, crossings, _ = lax.while_loop(
        cond, body, state
    )
    exc = iters >= max_iter
    return (r0 + direction * rem[:, None]).T, exc, crossings


STEP_FUNCTIONS = {
    "free": step_free,
    "sphere": step_sphere,
    "cylinder": step_cylinder,
    "ellipsoid": step_ellipsoid,
    "mesh": step_mesh,
}
