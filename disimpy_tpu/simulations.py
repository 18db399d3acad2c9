"""Diffusion-weighted MR simulation driver.

Public API parity with the reference ``disimpy/simulations.py``:
``simulation(...)`` (reference :1051-1429) and ``add_noise_to_data``
(:1016-1040), plus the host-side samplers (``_fill_circle`` :353-366,
``_fill_sphere`` :369-382, ``_fill_ellipsoid`` :385-399,
``_initial_positions_cylinder`` :402-409, ``_initial_positions_ellipsoid``
:412-418, ``_fill_mesh`` :505-579) and trajectory writing (:1043-1048).

TPU-native differences from the reference driver:

- The whole time loop is one compiled ``lax.scan`` (or a few windowed scans
  when trajectories are being written) instead of one kernel launch plus a
  host synchronization per time step.
- All geometry is rescaled to step-length units so float32 — the TPU-native
  precision — holds the reference's signal tolerances; ``dtype="float64"``
  is available when ``jax_enable_x64`` is set.
- Randomness is counter-based (threefry), keyed per (seed, time step): the
  same seed reproduces the same simulation bit-for-bit on any device layout.
- Spins shard across a ``jax.sharding.Mesh`` (``devices=`` argument); the
  only collective is the final signal reduction.
"""

import math
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from . import substrates, utils
from .engine import core as engine_core
from .engine import mesh_accel
from .engine.specs import (
    CylinderSpec,
    EllipsoidSpec,
    FreeSpec,
    MeshSpec,
    SphereSpec,
)
from .gradients import GAMMA
from .parallel import sharding as par
from .substrates import _aabb_to_mesh  # noqa: F401  (reference API parity)

__all__ = ["simulation", "add_noise_to_data"]

# Streaming diagnostics of the last fused run with
# engine.config.fused_count_units = True: [folded 64-triangle units,
# gated block-passes, live-lane-weighted units (sum over folds of
# units x lanes that are in-run AND still active — the fold's useful
# fraction is diag[2] / (diag[0] * 128))], summed over every kernel
# tile/step/pass. Bench-only instrumentation (single-device fused runs);
# see bench.py --stream.
_STREAM_DIAG = [0, 0, 0.0]


# ---------------------------------------------------------------------------
# Host-side initial-position samplers (NumPy, seeded via np.random.seed for
# behavioral parity with the reference's host RNG use).
# ---------------------------------------------------------------------------


def _rejection_fill(n, proposal, accept):
    """Vectorized rejection sampling: draw batches with ``proposal(k)``,
    keep rows passing ``accept``, until ``n`` accepted points exist.
    Batch sizes adapt to the observed acceptance rate (which can be <1%
    when seeding thin compartments such as the interior of a neuron mesh).
    """
    accepted = []
    got = 0
    proposed = 0
    kept = 0
    while got < n:
        if proposed == 0:
            k = max(n - got, 1) * 2
        else:
            rate = max(kept / proposed, 1.0 / proposed, 1e-4)
            k = int(min(max((n - got) / rate * 1.2, 1024), 2**21))
        batch = proposal(k)
        keep = batch[accept(batch)]
        proposed += k
        kept += len(keep)
        accepted.append(keep)
        got += len(keep)
    return np.concatenate(accepted, axis=0)[:n]


def _fill_ellipsoid(n, semiaxes):
    """Sample n points uniformly inside an axis-aligned ellipsoid."""
    semiaxes = np.asarray(semiaxes, dtype=float)
    return _rejection_fill(
        n,
        lambda k: (np.random.random((k, 3)) - 0.5) * 2 * semiaxes,
        lambda p: np.sum((p / semiaxes) ** 2, axis=1) < 1,
    )


def _fill_sphere(n, radius):
    """Sample n points uniformly inside a sphere of the given radius.

    Implemented as the equal-semiaxes ellipsoid case so that sphere and
    ellipsoid simulations with the same seed draw identical initial
    positions (the reference's samplers share their acceptance sequence the
    same way, simulations.py:369-399).
    """
    return _fill_ellipsoid(n, np.array([radius, radius, radius]))


def _fill_circle(n, radius):
    """Sample n points uniformly inside a circle of the given radius."""
    return _rejection_fill(
        n,
        lambda k: (np.random.random((k, 2)) - 0.5) * 2 * radius,
        lambda p: np.linalg.norm(p, axis=1) < radius,
    )


def _initial_positions_cylinder(n_walkers, radius, R):
    """Uniform points on the x=0 disc of a cylinder, rotated to the lab
    frame by R (cylinder frame -> lab frame)."""
    positions = np.zeros((n_walkers, 3))
    positions[:, 1:3] = _fill_circle(n_walkers, radius)
    return positions @ np.asarray(R).T


def _initial_positions_ellipsoid(n_walkers, semiaxes, R):
    """Uniform points inside an ellipsoid, rotated to the lab frame by R
    (ellipsoid frame -> lab frame)."""
    return _fill_ellipsoid(n_walkers, semiaxes) @ np.asarray(R).T


# ---------------------------------------------------------------------------
# Mesh point seeding: inside/outside classification by ray-crossing parity.
# ---------------------------------------------------------------------------


@jax.jit
def _count_crossings_x(points, triangles, candidates):
    """Number of candidate triangles crossed by the +x ray from each point.

    ``points`` (n, 3); ``triangles`` (m, 3, 3); ``candidates`` (n, K) int
    triangle indices per point, -1-padded. Each id appears at most once per
    point, so parity needs no dedup. Runs as one fused XLA program (the
    classification sweep is memory-bound; fusion keeps the Moller-Trumbore
    intermediates out of memory).
    """
    from .engine import geometry

    sel = triangles[jnp.maximum(candidates, 0)]  # (n, K, 3, 3)
    ray = jnp.zeros_like(points).at[:, 0].set(1.0)
    t = geometry.ray_triangle_intersection(sel, points[:, None, :], ray[:, None, :])
    hit = (candidates >= 0) & (t > 0)
    return jnp.sum(hit, axis=1)


def _ray_crossings_x(points, triangles, tri_subset=None):
    """Number of triangles crossed by the +x ray from each point.

    ``points`` is (n, 3); ``triangles`` is (m, 3, 3). If ``tri_subset`` is
    given — an (n, K) int array of candidate triangle indices per point,
    -1-padded — only those triangles are tested.
    """
    points = np.asarray(points, dtype=np.float32)
    if tri_subset is None:
        tri_subset = np.broadcast_to(
            np.arange(len(triangles))[None, :], (len(points), len(triangles))
        )
    # Seeding is host-side preprocessing: pin it to the CPU backend so the
    # (chunk, K, 3, 3) candidate gather never lands in (and can exceed)
    # accelerator memory.
    with jax.default_device(jax.devices("cpu")[0]):
        counts = _count_crossings_x(
            jnp.asarray(points),
            jnp.asarray(np.asarray(triangles), dtype=jnp.float32),
            jnp.asarray(tri_subset),
        )
    return np.asarray(counts)


def _column_candidates(substrate, n_faces):
    """Per-(y, z)-grid-column candidate triangle lists for +x parity rays.

    A +x ray from any point only crosses triangles that overlap its (y, z)
    column of the acceleration grid, so the per-point candidate set shrinks
    from all triangles to the column's deduplicated union (built from the
    CSR arrays the substrate already carries). Triangle ids >= ``n_faces``
    (the appended voxel-wall triangles of non-periodic substrates) are
    excluded. Returns an (n_columns, K) -1-padded int array addressed by
    ``column = y * n_sv[2] + z``.
    """
    n_sv = np.asarray(substrate.n_sv).astype(int)
    ranges = np.asarray(substrate.subvoxel_indices)
    ids = np.asarray(substrate.triangle_indices)
    n_cols = int(n_sv[1] * n_sv[2])
    # CSR entries are subvoxel-major and contiguous: entry e belongs to the
    # subvoxel whose [start, end) slice contains it, and a subvoxel's
    # column is its index modulo n_cols (x is the leading axis).
    counts = ranges[:, 1] - ranges[:, 0]
    col_of_entry = (np.repeat(np.arange(len(counts)), counts) % n_cols)
    keep = ids < n_faces
    key = col_of_entry[keep] * np.int64(max(n_faces, 1)) + ids[keep]
    uniq = np.unique(key)
    cols_u = uniq // max(n_faces, 1)
    ids_u = uniq % max(n_faces, 1)
    per_col = np.bincount(cols_u, minlength=n_cols)
    K = max(1, int(per_col.max()) if per_col.size else 1)
    table = np.full((n_cols, K), -1, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(per_col)[:-1]))
    slot = np.arange(len(uniq)) - offsets[cols_u]
    table[cols_u, slot] = ids_u
    return table


def _make_intra_classifier(substrate):
    """Build ``classify(points) -> bool (n,)``: True where the point lies
    inside the closed surface (odd +x-ray crossing parity), points in
    metres. For non-periodic substrates the 12 voxel-wall triangles
    appended at construction are excluded from the parity test, as in the
    reference (simulations.py:531-546).
    """
    vertices = substrate.vertices
    faces = substrate.faces
    if not substrate.periodic:
        vertices = vertices[:-8]
        faces = faces[:-12]
    triangles = vertices[faces]
    columns = _column_candidates(substrate, len(faces))
    n_sv = np.asarray(substrate.n_sv).astype(int)
    voxel_size = np.asarray(substrate.voxel_size)
    sv_width = voxel_size / n_sv
    # Fixed chunk size so the jitted crossing counter compiles once.
    chunk = max(512, int(2e7) // max(columns.shape[1], 1))

    def classify(p):
        p = np.asarray(p, dtype=float)
        n_pad = -(-len(p) // chunk) * chunk
        padded = np.concatenate((p, np.broadcast_to(p[-1], (n_pad - len(p), 3))))
        inside = np.empty(n_pad, dtype=bool)
        for s in range(0, n_pad, chunk):
            q = padded[s : s + chunk]
            cy = np.clip((q[:, 1] / sv_width[1]).astype(int), 0, n_sv[1] - 1)
            cz = np.clip((q[:, 2] / sv_width[2]).astype(int), 0, n_sv[2] - 1)
            candidates = columns[cy * n_sv[2] + cz]
            inside[s : s + chunk] = (
                _ray_crossings_x(q, triangles, candidates) % 2
            ).astype(bool)
        return inside[: len(p)]

    return classify


def _fill_mesh(n_points, substrate, intra, seed, cuda_bs=None):
    """Sample points uniformly inside ("intra") or outside ("extra") the
    closed surface defined by a mesh substrate's triangles.

    Points are proposed uniformly over the voxel and classified by the
    parity of +x ray crossings (odd = inside). For non-periodic substrates
    the 12 voxel-wall triangles appended at construction are excluded from
    the parity test, as in the reference (simulations.py:531-546).

    Parameters
    ----------
    n_points : int
    substrate : disimpy_tpu.substrates._Substrate
    intra : bool
        True to sample inside the surface, False outside.
    seed : int
    cuda_bs : ignored
        Accepted for drop-in compatibility with the reference signature.

    Returns
    -------
    numpy.ndarray of shape (n_points, 3)
    """
    classify = _make_intra_classifier(substrate)
    rng = np.random.RandomState(seed)
    voxel_size = np.asarray(substrate.voxel_size)

    def proposal(k):
        return rng.random_sample((k, 3)) * voxel_size

    def accept(p):
        inside = classify(p)
        return inside if intra else ~inside

    return _rejection_fill(n_points, proposal, accept)


# ---------------------------------------------------------------------------
# Noise and trajectory output.
# ---------------------------------------------------------------------------


def add_noise_to_data(data, sigma, seed=None):
    """Add Rician noise: ``|data + N(0, sigma) + i N(0, sigma)|``.

    Parameters
    ----------
    data : numpy.ndarray
    sigma : float
        Noise standard deviation per channel.
    seed : int, optional

    Returns
    -------
    noisy_data : numpy.ndarray
    """
    if seed:
        np.random.seed(seed)
    data = np.asarray(data)
    return np.abs(
        data
        + np.random.normal(size=data.shape, scale=sigma, loc=0)
        + 1j * np.random.normal(size=data.shape, scale=sigma, loc=0)
    )


def _write_traj(traj, mode, positions):
    """Append one line with all walker positions to the trajectories file."""
    with open(traj, mode) as f:
        np.savetxt(f, np.asarray(positions, dtype=float).reshape(1, -1))


# ---------------------------------------------------------------------------
# Substrate preparation: host substrate -> engine spec + frame handling.
# ---------------------------------------------------------------------------


def _prepare_substrate(substrate, n_walkers, seed, scale, dtype, quiet,
                       mesh_engine="classic"):
    """Build the engine spec, initial positions (substrate frame, scaled),
    the frame->lab rotation (or None), and a geometry-extent estimate.

    ``mesh_engine`` selects the acceleration structure built for mesh
    substrates: "classic" (per-bounce query path) or "fused" (the
    fused-step engine, engine/fused.py)."""
    if substrate.type == "free":
        # Seeded on device (all walkers at the origin): no host->device
        # position upload.
        return FreeSpec(), None, None, 1.0, "classic"

    if substrate.type == "sphere":
        r = substrate.radius
        positions = _fill_sphere(n_walkers, r) * scale
        return (
            SphereSpec(
                radius=jnp.asarray(r * scale, dtype=dtype),
                perm_prob=jnp.asarray(substrate.perm_prob, dtype=dtype),
            ),
            positions, None, r * scale, "classic",
        )

    if substrate.type == "cylinder":
        r = substrate.radius
        # A cylinder is symmetric under orientation sign flip; canonicalize
        # so that antiparallel orientations produce identical simulations.
        orientation = np.asarray(substrate.orientation, dtype=float)
        if orientation[np.argmax(np.abs(orientation))] < 0:
            orientation = -orientation
        # Engine runs in the cylinder frame (axis = +x).
        R = utils.vec2vec_rotmat(orientation, np.array([1.0, 0.0, 0.0]))
        frame_to_lab = np.linalg.inv(R)
        positions = np.zeros((n_walkers, 3))
        positions[:, 1:3] = _fill_circle(n_walkers, r)
        spec = CylinderSpec(
            radius=jnp.asarray(r * scale, dtype=dtype),
            perm_prob=jnp.asarray(substrate.perm_prob, dtype=dtype),
        )
        return spec, positions * scale, frame_to_lab, r * scale, "classic"

    if substrate.type == "ellipsoid":
        semiaxes = np.asarray(substrate.semiaxes, dtype=float)
        frame_to_lab = np.asarray(substrate.R, dtype=float)
        positions = _fill_ellipsoid(n_walkers, semiaxes) * scale
        spec = EllipsoidSpec(
            semiaxes=jnp.asarray(semiaxes * scale, dtype=dtype),
            perm_prob=jnp.asarray(substrate.perm_prob, dtype=dtype),
        )
        return (
            spec, positions, frame_to_lab, float(np.max(semiaxes)) * scale,
            "classic",
        )

    if substrate.type == "mesh":
        if isinstance(substrate.init_pos, np.ndarray):
            if n_walkers != substrate.init_pos.shape[0]:
                raise ValueError(
                    "n_walkers must be equal to the number of initial positions"
                )
            positions = np.asarray(substrate.init_pos, dtype=float)
        elif substrate.init_pos == "uniform":
            # Uniform-in-voxel seeding happens ON DEVICE (threefry from the
            # simulation seed): at production spin counts the host-side
            # sampling + ~8 MB/s position upload cost ~0.43 s per call
            # (~7% of a 150-step run) and capped the ensemble size.
            positions = None
        else:
            if not quiet:
                print("Calculating initial positions")
            positions = _fill_mesh(
                n_walkers, substrate, substrate.init_pos == "intra", seed
            )
            if not quiet:
                print("Finished calculating initial positions")
        spec = None
        if mesh_engine == "fused":
            from .engine import config as engine_config
            from .engine import fused

            cache_key = (
                "fused",
                float(scale),
                engine_config.fused_resort_every,
                engine_config.fused_cell_steps,
                fused.quantize_n_hint(n_walkers),
            )
            if cache_key in substrate._accel_cache:
                spec = substrate._accel_cache[cache_key]
            else:
                try:
                    spec = fused.pack_fused(
                        substrate,
                        scale,
                        resort_every=engine_config.fused_resort_every,
                        cell_steps=engine_config.fused_cell_steps,
                        n_hint=float(n_walkers),
                    )
                except ValueError:
                    # Geometry too dense for any fused configuration
                    # (e.g. step length comparable to the voxel): the
                    # classic per-bounce path handles it.
                    spec = None
                substrate._accel_cache[cache_key] = spec
            if spec is None:
                mesh_engine = "classic"
        if mesh_engine == "classic" or spec is None:
            cache_key = (float(scale), str(dtype))
            spec = substrate._accel_cache.get(cache_key)
            if spec is None:
                spec = mesh_accel.pack_mesh(substrate, scale, dtype)
                substrate._accel_cache[cache_key] = spec
        extent = float(np.max(substrate.voxel_size)) * scale
        if positions is not None:
            positions = positions * scale
        return spec, positions, None, extent, mesh_engine

    raise ValueError("Incorrect value (%s) for substrate" % substrate)


def _effective_epsilon(epsilon, scale, extent, n_t, dtype, bounded):
    """Surface-offset magnitude in step-length units.

    The user value (metres, reference default 1e-13) is honored, but floored
    at ~64 ulps of the largest coordinate magnitude the simulation will
    visit, so the offset survives rounding in float32: an offset below one
    ulp would leave walkers exactly on the surface and re-collide forever.
    The floor is ~1e-5 of the geometry size in float32 — far below the
    reference's signal tolerances — and is no-op in float64.

    For substrates whose coordinates stay within ``extent`` (sphere,
    ellipsoid, non-periodic mesh) the floor uses the extent only; the
    ``sqrt(n_t)`` diffusion-growth term applies only when coordinates are
    unbounded (cylinder axis, periodic mesh), so long bounded simulations
    don't inflate the offset beyond what rounding actually requires.
    """
    magnitude = max(float(extent), 1.0)
    if not bounded:
        magnitude = max(magnitude, math.sqrt(n_t) * 3.0)
    floor = 64.0 * float(jnp.finfo(dtype).eps) * magnitude
    return max(float(epsilon) * scale, floor)


# ---------------------------------------------------------------------------
# The driver.
# ---------------------------------------------------------------------------


def simulation(
    n_walkers,
    diffusivity,
    gradient,
    dt,
    substrate,
    seed=123,
    traj=None,
    final_pos=False,
    all_signals=False,
    quiet=False,
    cuda_bs=128,
    max_iter=int(1e3),
    epsilon=1e-13,
    dtype="float32",
    devices=None,
    relaxation=None,
    exchange_stats=False,
):
    """Simulate a diffusion-weighted MR experiment and return the signal.

    Parameters
    ----------
    n_walkers : int
        Number of random walkers (spins).
    diffusivity : float
        Diffusivity in SI units (m^2/s).
    gradient : numpy.ndarray
        Floating-point array of shape (number of measurements, number of
        time points, 3): gradient magnitude per time point per axis (T/m).
    dt : float
        Duration of a time step (s).
    substrate : disimpy_tpu.substrates._Substrate
        Substrate object describing the microstructure.
    seed : int, optional
        Seed for random number generation. The same seed reproduces the
        same simulation on any device layout.
    traj : str, optional
        Path of a file in which to save walker trajectories (one line per
        time point: ``walker_1_x walker_1_y walker_1_z walker_2_x ...``).
        The file can become very large.
    final_pos : bool, optional
        If True, return ``(signals, final_positions)``.
    all_signals : bool, optional
        If True, return each walker's signal instead of the total.
    quiet : bool, optional
        If True, do not print progress.
    cuda_bs : int, optional
        Accepted for drop-in compatibility with the reference API; the TPU
        engine has no thread blocks, so the value is ignored.
    max_iter : int, optional
        Collision-iteration budget per time step; walkers that exhaust it
        are flagged, warned about, and excluded from the signal.
    epsilon : float, optional
        Distance (m) by which a walker is moved off a surface after a
        collision. Floored internally at the engine dtype's resolution (see
        notes in the source).
    dtype : str or numpy dtype, optional
        Engine precision: "float32" (default; TPU-native) or "float64"
        (requires jax x64 mode; matches the reference's precision).
    devices : None, int, sequence of jax.Device, or jax.sharding.Mesh
        Shard spins over multiple devices. Default: jax's default device.
    relaxation : float or (T2_intra, T2_extra) pair, optional
        T2 relaxation weighting (TPU-native extension; the reference has
        none). A single float T2 (s) weights every spin's signal by
        ``exp(-n_t * dt / T2)``. A pair applies per-compartment weighting
        for substrates with a surface (mesh or a permeable analytic
        compartment): each spin accrues ``exp(-dt / T2(c_t))`` per
        step, where its compartment ``c_t`` (intra/extra the closed
        surface) is tracked through membrane transits.
    exchange_stats : bool, optional
        If True, additionally return a dict of per-walker exchange
        statistics: ``crossings`` (membrane transits), ``intra_steps``
        (steps dwelt inside), and ``intra_fraction``. Appended after the
        other return values.

    Returns
    -------
    signal : numpy.ndarray
        Simulated signal per measurement, ``Re sum_spins exp(i phi)``; or
        per-walker signals if ``all_signals``; optionally with final walker
        positions as a tuple if ``final_pos``; optionally with the
        exchange-statistics dict last if ``exchange_stats``.
    """
    # --- Validation (parity with reference simulations.py:1127-1153).
    if not isinstance(n_walkers, int) or n_walkers <= 0:
        raise ValueError("Incorrect value (%s) for n_walkers" % n_walkers)
    if not isinstance(diffusivity, float) or diffusivity <= 0:
        raise ValueError("Incorrect value (%s) for diffusivity" % diffusivity)
    if (
        not isinstance(gradient, np.ndarray)
        or gradient.ndim != 3
        or gradient.shape[2] != 3
        or not np.issubdtype(gradient.dtype, np.floating)
    ):
        raise ValueError("Incorrect value (%s) for gradient" % gradient)
    if not isinstance(dt, float) or dt <= 0:
        raise ValueError("Incorrect value (%s) for dt" % dt)
    if not isinstance(substrate, substrates._Substrate):
        raise ValueError("Incorrect value (%s) for substrate" % substrate)
    if not isinstance(seed, int) or seed < 0:
        raise ValueError("Incorrect value (%s) for seed" % seed)
    if traj:
        if not isinstance(traj, str):
            raise ValueError("Incorrect value (%s) for traj" % traj)
    if not isinstance(quiet, bool):
        raise ValueError("Incorrect value (%s) for quiet" % quiet)
    if not isinstance(cuda_bs, int) or cuda_bs <= 0:
        raise ValueError("Incorrect value (%s) for cuda_bs" % cuda_bs)
    if not isinstance(max_iter, int) or max_iter < 1:
        raise ValueError("Incorrect value (%s) for max_iter" % max_iter)
    if not isinstance(exchange_stats, bool):
        raise ValueError("Incorrect value (%s) for exchange_stats" % exchange_stats)
    relax_pair = None
    relax_scalar = None
    if relaxation is not None:
        if isinstance(relaxation, (tuple, list)) and len(relaxation) == 2:
            t2_intra, t2_extra = (float(relaxation[0]), float(relaxation[1]))
            if t2_intra <= 0 or t2_extra <= 0:
                raise ValueError(
                    "Incorrect value (%s) for relaxation" % (relaxation,)
                )
            if substrate.type not in ("mesh", "sphere", "cylinder",
                                      "ellipsoid"):
                raise ValueError(
                    "Two-compartment relaxation requires a substrate with "
                    "a surface (mesh, sphere, cylinder, or ellipsoid)"
                )
            relax_pair = (t2_intra, t2_extra)
        elif isinstance(relaxation, (int, float)) and not isinstance(
            relaxation, bool
        ) and relaxation > 0:
            relax_scalar = float(relaxation)
        else:
            raise ValueError(
                "Incorrect value (%s) for relaxation" % (relaxation,)
            )
    # Per-spin compartment tracking rides the stepping scan; needed for
    # exchange statistics and for two-compartment relaxation.
    track = exchange_stats or relax_pair is not None
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64 and not jax.config.jax_enable_x64:
        raise ValueError(
            "dtype='float64' requires jax x64 mode; set jax_enable_x64=True"
        )

    if not quiet:
        print("Starting simulation")
        if traj:
            print(
                "The trajectories file will be up to %s GB"
                % (gradient.shape[1] * n_walkers * 3 * 25 / 1e9)
            )

    n_meas, n_t, _ = gradient.shape
    step_l = np.sqrt(6 * diffusivity * dt)
    scale = 1.0 / step_l

    if not quiet:
        print("Number of random walkers = %s" % n_walkers)
        print("Number of steps = %s" % n_t)
        print("Step length = %s m" % step_l)
        print("Step duration = %s s" % dt)

    # Host RNG for initial-position sampling (parity: simulations.py:1169).
    np.random.seed(seed)

    from .engine import config as engine_config

    mesh_engine = "classic"
    if substrate.type == "mesh":
        mesh_engine = engine_config.mesh_engine(
            dtype, needs_traj=bool(traj), sharded=devices is not None
        )
    spec, positions_np, frame_to_lab, extent, mesh_engine = _prepare_substrate(
        substrate, n_walkers, seed, scale, dtype, quiet,
        mesh_engine=mesh_engine,
    )
    kind = substrate.type

    # Phase coefficients: phi += GAMMA * dt * g . r with r in step-length
    # units -> g_eff[t, m, :] = GAMMA * dt * step_l * g[m, t, :], rotated
    # into the substrate frame when the engine runs in one.
    g_eff = (GAMMA * dt * step_l) * np.transpose(gradient, (1, 0, 2))
    if frame_to_lab is not None:
        # g . r_lab = g . (A r_frame) = (A^T g) . r_frame
        g_eff = g_eff @ frame_to_lab  # == einsum('tmj,jk->tmk', g_eff, A)

    bounded = kind in ("sphere", "ellipsoid") or (
        kind == "mesh" and not substrate.periodic
    )
    eps_eff = _effective_epsilon(epsilon, scale, extent, n_t, dtype, bounded)

    # The fused table's dilation margin provisions for a bounded per-bounce
    # epsilon drift (engine/fused.py EPS_BOUNCES); a larger effective
    # epsilon (very long periodic runs, large user epsilon) could let a
    # many-bounce spin drift past its candidate row, so such runs use the
    # classic engine, whose per-bounce query has no drift budget.
    if mesh_engine == "fused" and eps_eff > float(spec.eps_budget):
        mesh_engine = "classic"
        cache_key = (float(scale), str(dtype))
        classic_spec = substrate._accel_cache.get(cache_key)
        if classic_spec is None:
            classic_spec = mesh_accel.pack_mesh(substrate, scale, dtype)
            substrate._accel_cache[cache_key] = classic_spec
        spec = classic_spec

    # --- Device placement / sharding.
    if isinstance(devices, jax.sharding.Mesh):
        mesh = devices
    elif devices is not None:
        mesh = par.spin_mesh(devices)
    else:
        mesh = None
    n_padded = n_walkers if mesh is None else par.padded_spin_count(n_walkers, mesh)
    if positions_np is not None and n_padded != n_walkers:
        pad = np.repeat(positions_np[:1], n_padded - n_walkers, axis=0)
        positions_np = np.concatenate((positions_np, pad), axis=0)

    # Engine layout: (3, n) — components in rows, spins in the lane axis.
    if positions_np is None:
        # Device-side seeding (free: origin; mesh "uniform": uniform in the
        # voxel from a threefry stream keyed by the simulation seed) — no
        # host sampling, no position upload through the ~8 MB/s link.
        if kind == "free":
            positions = jnp.zeros((3, n_padded), dtype=dtype)
        else:
            vox = jnp.asarray(
                np.asarray(substrate.voxel_size) * scale, dtype=dtype
            )
            # Draw exactly (3, n_walkers) so the ensemble is identical on
            # any device layout; sharding pad lanes clone spin 0 (as the
            # host path does).
            positions = (
                jax.random.uniform(
                    jax.random.PRNGKey(seed), (3, n_walkers), dtype=dtype
                )
                * vox[:, None]
            )
            if n_padded != n_walkers:
                positions = jnp.concatenate(
                    (
                        positions,
                        jnp.repeat(
                            positions[:, :1], n_padded - n_walkers, axis=1
                        ),
                    ),
                    axis=1,
                )
    else:
        positions = jnp.asarray(positions_np.T, dtype=dtype)
    phases = jnp.zeros((n_meas, n_padded), dtype=dtype)
    iter_exc = jnp.zeros(n_padded, dtype=bool)
    g_eff_dev = jnp.asarray(g_eff, dtype=dtype)
    if mesh is not None:
        positions, phases, iter_exc = par.shard_simulation_arrays(
            mesh, positions, phases, iter_exc
        )
        g_eff_dev, spec = par.replicate(mesh, g_eff_dev, spec)

    compartments = None
    if track:
        if substrate.type == "mesh":
            ip = substrate.init_pos
            if isinstance(ip, str) and ip == "intra":
                parity_np = np.ones(n_padded, dtype=bool)
            elif isinstance(ip, str) and ip == "extra":
                parity_np = np.zeros(n_padded, dtype=bool)
            else:
                # Classify arbitrary starting points by ray-crossing parity
                # (mesh frame == lab frame; engine units -> metres). Device-
                # seeded positions are fetched once for the host classifier.
                if positions_np is None:
                    positions_np = np.asarray(positions, dtype=float).T
                parity_np = _make_intra_classifier(substrate)(
                    positions_np * step_l
                )
        else:
            # Analytic substrates confine their walkers: label them intra
            # (free diffusion has no membrane; label extra).
            parity_np = np.full(n_padded, substrate.type != "free", bool)
        crossings = jnp.zeros(n_padded, jnp.int32)
        parity = jnp.asarray(parity_np)
        intra_steps = jnp.zeros(n_padded, jnp.int32)
        if mesh is not None:
            spin_sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(par.SPIN_AXIS)
            )
            crossings = jax.device_put(crossings, spin_sharding)
            parity = jax.device_put(parity, spin_sharding)
            intra_steps = jax.device_put(intra_steps, spin_sharding)
        compartments = (crossings, parity, intra_steps)

    key = jax.random.PRNGKey(seed)
    epsilon_dev = jnp.asarray(eps_eff, dtype=dtype)
    max_iter_dev = jnp.asarray(max_iter, dtype=jnp.int32)

    def to_lab(pos_scaled):
        """(3, n) engine positions -> (n, 3) lab-frame positions (metres)."""
        pos = np.asarray(pos_scaled, dtype=float).T * step_l
        if frame_to_lab is not None:
            pos = pos @ frame_to_lab.T
        return pos

    if traj:
        _write_traj(traj, "w", to_lab(positions[:, :n_walkers]))
        # Windowed execution keeps the collected-trajectory buffer bounded.
        window = max(1, min(n_t, int(3e7) // max(3 * n_padded, 1)))
    else:
        window = n_t

    seed32 = jnp.asarray(seed & 0x7FFFFFFF, jnp.int32)

    count_units = bool(
        getattr(engine_config, "fused_count_units", False)
    ) and mesh is None and mesh_engine == "fused"
    if count_units:
        _STREAM_DIAG[0] = _STREAM_DIAG[1] = 0
        _STREAM_DIAG[2] = 0.0

    t0 = 0
    while t0 < n_t:
        t1 = min(t0 + window, n_t)
        if mesh_engine == "fused":
            from .engine import fused

            if mesh is not None:
                out = fused.run_window_fused_sharded(
                    mesh,
                    spec,
                    positions,
                    phases,
                    iter_exc,
                    g_eff_dev[t0:t1],
                    jnp.arange(t0, t1),
                    seed32,
                    epsilon_dev,
                    max_iter_dev,
                    interpret=engine_config.pallas_interpret,
                    track=track,
                    compartments=compartments,
                    ablate=engine_config.fused_ablate,
                    runtime_level=engine_config.fused_runtime_level,
                    fold_unroll=engine_config.fused_fold_unroll,
                    contig=engine_config.fused_dma_mode == "contig",
                    blkfast=engine_config.fused_blkfast,
                    align=engine_config.fused_align,
                    passgate=engine_config.fused_passgate,
                )
            else:
                out = fused.run_window_fused(
                    spec,
                    positions,
                    phases,
                    iter_exc,
                    g_eff_dev[t0:t1],
                    jnp.arange(t0, t1),
                    seed32,
                    epsilon_dev,
                    max_iter_dev,
                    interpret=engine_config.pallas_interpret,
                    track=track,
                    compartments=compartments,
                    ablate=engine_config.fused_ablate,
                    runtime_level=engine_config.fused_runtime_level,
                    count_units=count_units,
                    fold_unroll=engine_config.fused_fold_unroll,
                    contig=engine_config.fused_dma_mode == "contig",
                    blkfast=engine_config.fused_blkfast,
                    align=engine_config.fused_align,
                    passgate=engine_config.fused_passgate,
                )
            if count_units:
                diag = out[-1]
                out = out[:-1]
                _STREAM_DIAG[0] += int(diag[0])
                _STREAM_DIAG[1] += int(diag[1])
                _STREAM_DIAG[2] += float(diag[2])
            if track:
                (positions, phases, iter_exc), collected, compartments = out
            else:
                (positions, phases, iter_exc), collected = out
        else:
            out = engine_core.run_window(
                kind,
                spec,
                positions,
                phases,
                iter_exc,
                g_eff_dev[t0:t1],
                jnp.arange(t0, t1),
                key,
                epsilon_dev,
                max_iter_dev,
                collect_positions=bool(traj),
                sharded=mesh is not None,
                track="exchange" if track else None,
                compartments=compartments,
            )
            if track:
                (positions, phases, iter_exc), collected, compartments = out
            else:
                (positions, phases, iter_exc), collected = out
        if traj:
            collected = np.asarray(collected)
            for step_positions in collected:
                _write_traj(traj, "a", to_lab(step_positions[:, :n_walkers]))
        if not quiet and n_t > window:
            print(f"\r{np.round(t1 / n_t * 100, 1)}%", end="", flush=True)
        t0 = t1

    # Signal reduction happens on device: fetching the full (n_meas, n)
    # phase matrix through the host link costs seconds at production spin
    # counts, while the reduced signal is n_meas floats. The full matrix is
    # fetched only for ``all_signals`` (whose contract is per-walker data)
    # and the exceeded-walker indices only when any walker overflowed.
    if bool(np.asarray(jnp.any(iter_exc[:n_walkers]))):
        iter_exc_np = np.asarray(iter_exc[:n_walkers])
        warnings.warn(
            "Maximum number of iterations was exceeded in the intersection "
            + "check algorithm for walkers %s" % np.where(iter_exc_np)[0]
        )

    # Relaxation weighting: per-spin weights from compartment dwell times
    # (pair), or one global scalar (uniform T2).
    weights = None
    if relax_pair is not None:
        k_intra = compartments[2].astype(dtype)
        lw = (dt / relax_pair[0]) * k_intra + (dt / relax_pair[1]) * (
            jnp.asarray(float(n_t), dtype) - k_intra
        )
        weights = jnp.exp(-lw)

    if all_signals:
        # Per-walker signals are inherently an (n_meas, n_walkers) fetch;
        # compute Re exp(i phi) and the NaN masking on device so the
        # transfer is the final engine-dtype matrix, not float64 phases.
        fetch_bytes = n_meas * n_walkers * jnp.dtype(dtype).itemsize
        if fetch_bytes > 256e6:
            warnings.warn(
                "all_signals=True fetches the full per-walker signal "
                f"matrix ({fetch_bytes / 1e9:.1f} GB) from the device; "
                "consider fewer walkers or the total signal instead"
            )
        signals = np.asarray(
            engine_core.per_spin_signal(phases, iter_exc, weights=weights)[
                :, :n_walkers
            ],
            dtype=float,
        )
    else:
        signals = np.asarray(
            engine_core.reduce_signal(
                phases, iter_exc, n_valid=n_walkers, weights=weights
            ),
            dtype=float,
        )
    if relax_scalar is not None:
        signals = signals * np.exp(-n_t * dt / relax_scalar)
    if not quiet:
        print("\rSimulation finished")
    ret = [signals]
    if final_pos:
        ret.append(to_lab(positions[:, :n_walkers]))
    if exchange_stats:
        intra_steps_np = np.asarray(compartments[2][:n_walkers])
        ret.append(
            {
                "crossings": np.asarray(compartments[0][:n_walkers]),
                "intra_steps": intra_steps_np,
                "intra_fraction": intra_steps_np / float(n_t),
            }
        )
    return tuple(ret) if len(ret) > 1 else signals
