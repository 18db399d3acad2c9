"""Batched geometric primitives for the stepping engine.

Every function here is vectorized over an arbitrary leading batch of spins
(``...`` below); there is no per-spin scalar code anywhere in the engine.
The math mirrors the reference's device helpers (disimpy/simulations.py:
23-343) but is expressed as masked array operations: misses are encoded as
``inf``/``nan`` distances and "do nothing" updates are selected with
``jnp.where`` instead of branches, which is what the TPU's vector units and
XLA's fusion want.
"""

import jax.numpy as jnp


def dot3(a, b):
    """Dot product over the last axis (length 3)."""
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]


def cross3(a, b):
    """Cross product over the last axis (length 3)."""
    return jnp.stack(
        (
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ),
        axis=-1,
    )


def normalize(v):
    """Scale vectors on the last axis to unit length."""
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def triangle_normals(triangles):
    """Unit normals of triangles given as (..., 3 points, 3 coords).

    Normal direction follows the reference convention
    (disimpy/simulations.py:77-97): ``(A - B) x (A - C)``, normalized. The
    sign is irrelevant downstream — reflection/crossing orient it per spin.
    """
    v = triangles[..., 0, :] - triangles[..., 1, :]
    k = triangles[..., 0, :] - triangles[..., 2, :]
    return normalize(cross3(v, k))


def line_circle_intersection(r0, step, radius):
    """Distance along ``step`` from an interior point to a circle.

    2D version (last axis length 2) of the sphere case; used for the
    infinite cylinder in its own frame. ``step`` need not be unit length in
    2D — it is the y/z projection of a 3D unit step, and the returned
    distance is in units of the 3D step (reference:
    disimpy/simulations.py:163-182).
    """
    A = jnp.sum(step * step, axis=-1)
    B = 2.0 * jnp.sum(r0 * step, axis=-1)
    C = jnp.sum(r0 * r0, axis=-1) - radius**2
    return (-B + jnp.sqrt(B * B - 4.0 * A * C)) / (2.0 * A)


def line_sphere_intersection(r0, step, radius):
    """Distance along unit ``step`` from an interior point to a sphere.

    NaN (treated as a miss downstream) when the discriminant is negative,
    matching the reference (disimpy/simulations.py:185-202).
    """
    dp = dot3(step, r0)
    return -dp + jnp.sqrt(dp * dp - (dot3(r0, r0) - radius**2))


def line_ellipsoid_intersection(r0, step, semiaxes):
    """Distance along unit ``step`` from an interior point to an ellipsoid.

    The ellipsoid is axis-aligned with semiaxes ``semiaxes`` (broadcast over
    the batch). Reference: disimpy/simulations.py:205-231.
    """
    inv2 = 1.0 / (semiaxes * semiaxes)
    A = jnp.sum(step * step * inv2, axis=-1)
    B = 2.0 * jnp.sum(step * r0 * inv2, axis=-1)
    C = jnp.sum(r0 * r0 * inv2, axis=-1) - 1.0
    return (-B + jnp.sqrt(B * B - 4.0 * A * C)) / (2.0 * A)


def ray_triangle_intersection(triangles, r0, step, edge_tol=0.0):
    """Moller-Trumbore signed ray/triangle intersection distance.

    Parameters
    ----------
    triangles : jnp.ndarray
        Shape (..., 3, 3): triangle corner points.
    r0 : jnp.ndarray
        Shape (..., 3): ray origins (broadcastable against triangles).
    step : jnp.ndarray
        Shape (..., 3): ray directions; the returned distance is in units of
        ``|step|``.
    edge_tol : float, optional
        Barycentric tolerance: hits with ``u, v in [-edge_tol,
        1 + edge_tol]`` count. The collision path uses a small positive
        tolerance in float32 so rounding cannot open a gap along shared
        triangle edges (a spin "slipping" between two adjacent triangles is
        a leak); extra near-edge hits only cause a harmless extra
        reflection. Parity ray-casting (point seeding) uses 0 — a widened
        band there would double-count shared edges and flip the parity.

    Returns
    -------
    jnp.ndarray
        Signed distance ``t`` where the ray's supporting line crosses the
        triangle's interior (including behind the origin, t < 0), or NaN
        for a miss / degenerate (det = 0) configuration — matching the
        reference's convention (disimpy/simulations.py:234-275), whose
        callers keep only ``t > 0``.
    """
    A = triangles[..., 0, :]
    B = triangles[..., 1, :]
    C = triangles[..., 2, :]
    T = r0 - A
    E1 = B - A
    E2 = C - A
    P = cross3(step, E2)
    Q = cross3(T, E1)
    det = dot3(P, E1)
    inv_det = 1.0 / det
    t = inv_det * dot3(Q, E2)
    u = inv_det * dot3(P, T)
    v = inv_det * dot3(Q, step)
    lo = -edge_tol
    hi = 1.0 + edge_tol
    ok = (det != 0) & (u >= lo) & (u <= hi) & (v >= lo) & (v <= hi)
    ok = ok & (u + v <= hi)
    return jnp.where(ok, t, jnp.nan)


# ---------------------------------------------------------------------------
# Row-layout variants: vectors as (3, n) arrays (components in sublanes, the
# spin axis in lanes). This is the engine's hot-path layout — a (n, 3) array
# puts the 3-wide axis in the 128-wide lane dimension and wastes 125/128 of
# every vector op, which is what capped the round-1 free path at ~2e8
# spin-steps/s.
# ---------------------------------------------------------------------------


def dot_rows(a, b):
    """Dot product of (3, n) vector bundles -> (n,)."""
    return jnp.sum(a * b, axis=0)


def normalize_rows(v):
    """Scale (3, n) columns to unit length."""
    return v / jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))


def reflect_rows(r0, step, d, normal, epsilon):
    """Row-layout specular reflection (see :func:`reflect`).

    All vector arguments are (3, n); ``d`` is (n,). Returns updated
    ``(r0, step)`` as (3, n).
    """
    v = d[None, :] * step
    intersection = r0 + v
    dp = jnp.sum(v * normal, axis=0, keepdims=True)
    normal = jnp.where(dp > 0, -normal, normal)
    dp = -jnp.abs(dp)
    new_step = normalize_rows(v - 2.0 * dp * normal)
    new_r0 = intersection + epsilon * normal
    return new_r0, new_step


def crossing_rows(r0, step, d, normal, epsilon):
    """Row-layout permeable crossing (see :func:`crossing`)."""
    v = d[None, :] * step
    intersection = r0 + v
    dp = jnp.sum(v * normal, axis=0, keepdims=True)
    normal = jnp.where(dp < 0, -normal, normal)
    return intersection + epsilon * normal


def reflect(r0, step, d, normal, epsilon):
    """Specular reflection of a step at a surface hit.

    Orients ``normal`` against the incoming direction, mirrors the
    direction, and offsets the new origin ``epsilon`` off the surface along
    the (oriented) normal. Pure function: returns updated ``(r0, step)``;
    callers select which spins actually reflected with ``jnp.where``.

    Reference: disimpy/simulations.py:278-311.
    """
    d = d[..., None]
    intersection = r0 + d * step
    v = d * step
    dp = dot3(v, normal)[..., None]
    normal = jnp.where(dp > 0, -normal, normal)
    dp = -jnp.abs(dp)  # dot with the oriented normal
    new_step = normalize(v - 2.0 * dp * normal)
    new_r0 = intersection + epsilon * normal
    return new_r0, new_step


def crossing(r0, step, d, normal, epsilon):
    """Permeable crossing of a surface: move epsilon past the hit point.

    Orients ``normal`` toward the far side of the surface (along the
    incoming direction) and places the walker ``epsilon`` past the
    intersection; the step direction is unchanged.

    Reference: disimpy/simulations.py:314-343.
    """
    d = d[..., None]
    intersection = r0 + d * step
    dp = dot3(d * step, normal)[..., None]
    normal = jnp.where(dp < 0, -normal, normal)
    return intersection + epsilon * normal
