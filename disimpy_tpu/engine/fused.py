"""Fused-step mesh engine: anchor-keyed sorted runs + multi-bounce kernel.

Round-1 resolved each bounce with a full XLA round trip (sort, compact,
query, scatter) costing ~14 x 24 ms of fixed overhead per time step. This
module restructures the mesh hot path around three ideas:

1. **Anchor-keyed epochs.** Spins are sorted by grid cell once per
   ``resort_every`` (J) steps. The sort key is the *anchor* cell (the cell
   at sort time), so runs stay exactly contiguous for the whole epoch —
   re-keying by current cell would shatter the runs after a single step
   (measured: ~70-100 runs per 128-spin tile after one un-resorted step).
   Correctness comes from dilation: a cell's candidate row holds every
   triangle reachable within ``s + 1`` steps of the cell for step ``s`` of
   the epoch (a spin ``s`` steps after the sort has drifted at most ``s``
   steps from its anchor cell, and its next step's bounce segments extend
   at most 1 + epsilon further).

2. **Distance-ordered rows.** Each cell's candidate triangles are stored
   nearest-first, with per-step chunk counts (6 bits per step, packed into
   one int32): step 0 streams only the triangles within 1 step of the
   cell, step J-1 the full dilation. Early epoch steps — the common case —
   do a fraction of the worst-case work.

3. **One kernel per epoch, all steps and bounces inside** (pallas_fused.py):
   candidate rows are DMA'd into a resident arena once per epoch and reused
   across every step and bounce pass; permeability uniforms come from an
   in-kernel counter-based threefry keyed by the spin's carried global id
   (krng.py), so physics is independent of sort order, padding, and
   sharding. The kernel returns per-step positions and the epoch's phase
   delta is two matmuls.

Positions, ids and the iter_exc flag ride the epoch sort; phase
accumulators stay in canonical spin order the whole window (the kernel's
per-step positions are permuted back with a cheap (1 + 3J)-operand sort
and contracted against the waveform in one matmul per epoch).

Reference behavior matched: disimpy/simulations.py:878-1013 (_cuda_step_mesh
resolves all of a walker's bounces locally in one kernel launch — the
fused kernel restores exactly that locality under a data-parallel layout).
"""

import dataclasses
import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import krng
from .specs import _register

# Per-step unit-count bit width and the maximum epoch length it allows.
BITS = 6
MAX_J = 5
# Sub-step distance thresholds (step-length units) for the FINE runtime
# ladder: bounce re-passes have remaining segments << 1 step, but the
# coarse ladder's smallest prefix is the full 1-step dilation set. Rows
# are stored distance-ordered within each cell (pack v10), so the count
# of units covering each fine threshold is a valid fold prefix; 5 slots
# of BITS bits pack into one extra int32 next to cell_packed.
FINE_LADDER = (0.15, 0.3, 0.5, 0.7, 0.9)
# Triangles per table unit: one (8, 128) record block — 8 sublane-groups
# of 8 triangles, lane 16*g + j = feature j of triangle 8*g + r at
# sublane r (the fold granularity of pallas_fused._fold_unit).
UNIT_TRIS = 64
# Max units per cell row: the kernel's per-run VMEM arena size. Configs
# needing more fall through to a coarser epoch / finer grid (or, at the
# driver level, to the classic path).
CH_MAX = 32
# Zero tail appended to the table at FusedMeshSpec construction: must
# absorb the kernel's worst-case over-read — a full-arena contiguous
# window DMA (pallas_fused.ARENA_U units) starting at the last row.
# Cached packs store only a CH_MAX tail (the on-disk format predates the
# contiguous mode); _with_tail tops them up on load.
TAIL_UNITS = 256
TABLE_BYTES_LIMIT = int(1.5e9)
# Configuration-search version, stored in cached *failure* entries: a
# failure only proves no configuration fit THIS search (width ladder,
# CH_MAX, cost model), so a newer search ignores cached failures and
# retries, while expensive successful packs (hours for the neuron mesh)
# stay valid across search improvements.
SEARCH_VERSION = 2


def _with_tail(table):
    """Extend a packed table's CH_MAX zero tail to TAIL_UNITS units."""
    table = np.asarray(table)
    return np.concatenate(
        (table, np.zeros((TAIL_UNITS - CH_MAX, 8, 128), np.float32)),
        axis=0,
    )


@partial(
    _register,
    data_fields=["table", "cell_start", "cell_packed", "cell_packed2",
                 "voxel_size", "sv_width", "perm_prob"],
    meta_fields=["n_sv", "resort_every", "seed_salt", "eps_budget"],
)
@dataclasses.dataclass(frozen=True)
class FusedMeshSpec:
    """Mesh acceleration structure for the fused-step kernel.

    Attributes
    ----------
    table : jnp.ndarray
        (total_units, 8, 128) float32 feature-form triangle records
        (step-length units, pre-shifted by the periodic image offset and
        translated into the owning cell's local frame — corner at the
        origin).
        A unit holds UNIT_TRIS = 64 triangles: sublane r, lane 16*g + j
        = feature j of triangle 8*g + r, with features [N = E1 x E2 (0-2),
        A.N (3), E2 (4-6), E2 x A (7-9), E1 (10-12), A x E1 (13-15)] — the
        exact coefficients that turn the Moller-Trumbore det/t/u/v into
        dot products (pallas_fused._fold_unit). All-zero padding slots are
        rejected by det == 0.
    cell_start : jnp.ndarray
        (n_cells,) int32: first unit index of each cell's row.
    cell_packed : jnp.ndarray
        (n_cells,) int32: per-step unit counts, BITS bits per epoch step
        (step s count = (packed >> (BITS*s)) & (2**BITS - 1)).
    cell_packed2 : jnp.ndarray
        (n_cells,) int32: unit counts covering each FINE_LADDER distance
        threshold, BITS bits per slot (same encoding). Legacy (pre-v10)
        cached packs synthesize this as the replicated step-0 count,
        which degrades the fine selection to the coarse behavior without
        affecting physics.
    voxel_size, sv_width : jnp.ndarray
        (3,) voxel extent / cell width (step-length units).
    perm_prob : jnp.ndarray
        Scalar transmission probability per collision.
    n_sv : tuple[int, int, int]
        Static cell counts.
    resort_every : int
        Epoch length J (steps between sorts); also the dilation depth the
        table was built for.
    seed_salt : int
        Mixed into the in-kernel RNG key so mesh draws are independent of
        the host-level threefry streams.
    eps_budget : float
        Largest per-collision surface offset (step-length units) whose
        worst-case accumulated drift the table's dilation margin still
        covers; the driver falls back to the classic engine when the run's
        effective epsilon exceeds it.
    """

    table: jnp.ndarray
    cell_start: jnp.ndarray
    cell_packed: jnp.ndarray
    cell_packed2: jnp.ndarray
    voxel_size: jnp.ndarray
    sv_width: jnp.ndarray
    perm_prob: jnp.ndarray
    n_sv: tuple
    resort_every: int
    seed_salt: int
    eps_budget: float


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------


# Per-step collision-bounce budget the dilation margin provisions for:
# each reflection can offset a spin by up to eps along the surface normal,
# so a pathological grazing spin drifts up to EPS_BOUNCES * eps per step
# beyond its path length. 64 covers every bounce count observed in the
# physics tests by a wide margin; runs whose eps exceeds the provisioned
# budget fall back to the classic engine (see the driver).
EPS_BOUNCES = 64


def _dilations(resort_every, eps_margin=0.0):
    """Dilation radius (step-length units) covering epoch step s.

    A spin is at most s steps from its anchor cell when step s starts and
    its bounce segments extend at most one more step; the 3% + 0.1 term
    absorbs float32 rounding, and ``eps_margin`` (= EPS_BOUNCES * the
    provisioned per-bounce offset) absorbs the accumulated per-bounce
    epsilon drift, which scales with geometry extent in float32.
    """
    return [(s + 1) * (1.03 + eps_margin) + 0.1 for s in range(resort_every)]


def _candidate_pairs(tri_aabb_min, tri_aabb_max, n_sv, sv_width, voxel_size,
                     dilation, periodic):
    """(triangle, periodic shift, cell) candidates by AABB overlap.

    Returns int arrays (tri_idx, shift (k, 3), cell_idx) for every pair
    whose AABBs overlap at the maximum dilation.
    """
    n_sv = np.asarray(n_sv)
    tris = []
    shifts = []
    cells = []
    if periodic:
        s_max = [1 + int(math.floor(dilation / voxel_size[a])) for a in range(3)]
        ranges = [np.arange(-s_max[a], s_max[a] + 1) for a in range(3)]
    else:
        ranges = [np.array([0])] * 3
    for sx in ranges[0]:
        for sy in ranges[1]:
            for sz in ranges[2]:
                shift = np.array([sx, sy, sz], dtype=np.float64) * voxel_size
                lo = tri_aabb_min + shift - dilation
                hi = tri_aabb_max + shift + dilation
                # Shifted triangle must reach into the voxel at all.
                ok = np.all(lo < voxel_size, axis=1) & np.all(hi > 0, axis=1)
                idx = np.nonzero(ok)[0]
                if idx.size == 0:
                    continue
                lo_c = np.clip(
                    np.floor(lo[idx] / sv_width).astype(np.int64), 0, n_sv - 1
                )
                hi_c = np.clip(
                    np.floor(hi[idx] / sv_width).astype(np.int64), 0, n_sv - 1
                )
                spans = hi_c - lo_c + 1
                count = spans.prod(axis=1)
                total = int(count.sum())
                rep = np.repeat(np.arange(idx.size), count)
                local = np.arange(total) - np.repeat(
                    np.concatenate(([0], np.cumsum(count)[:-1])), count
                )
                sy_z = spans[rep, 1] * spans[rep, 2]
                cx = lo_c[rep, 0] + local // sy_z
                rem = local % sy_z
                cy = lo_c[rep, 1] + rem // spans[rep, 2]
                cz = lo_c[rep, 2] + rem % spans[rep, 2]
                cell = (cx * n_sv[1] + cy) * n_sv[2] + cz
                tris.append(idx[rep])
                shifts.append(np.broadcast_to(
                    np.array([sx, sy, sz]), (total, 3)).copy())
                cells.append(cell)
    if not tris:
        z = np.zeros(0, dtype=np.int64)
        return z, np.zeros((0, 3), dtype=np.int64), z
    return (
        np.concatenate(tris),
        np.concatenate(shifts, axis=0),
        np.concatenate(cells),
    )


# Host-side caps for the packing search: skip grid configurations whose
# AABB-level (triangle, cell) pair count would blow pack time / RAM.
PAIR_LIMIT = int(15e6)


def quantize_n_hint(n):
    """Round an ensemble-size hint to the nearest power of two (>= 1024).

    ``pack_fused``'s cost model only needs the order of magnitude, and the
    quantization keeps the disk/driver cache keys stable across small
    changes in ``n_walkers``.
    """
    return float(2 ** round(math.log2(max(float(n), 1024.0))))


def pack_fused(substrate, scale, resort_every=4, cell_steps=None,
               bytes_limit=TABLE_BYTES_LIMIT, seed_salt=0x6D657368,
               quiet=True, cache_path=None, n_hint=2.0e5):
    """Build a :class:`FusedMeshSpec` from a host-side mesh substrate.

    Searches (epoch length J descending from ``resort_every``, cell width
    over a wide-to-narrow candidate ladder) for the cheapest configuration
    that fits the unit-count and memory budgets. The cost model mirrors
    the row-form kernel's measured per-pass cost: each 128-lane fold block
    streams the units of the runs overlapping it, so per-spin cost
    ~ (L/BLK + 1) * (c_run + units_per_cell * c_unit) / L with L the run
    length (spins per cell, capped at TILE) and c_run/c_unit the measured
    per-run and per-unit fold costs.

    Parameters
    ----------
    substrate : disimpy_tpu.substrates._Substrate (type "mesh")
    scale : float
        1 / step length (metres^-1): converts coordinates to step units.
    resort_every : int
        Maximum epoch length J in [1, MAX_J]; reduced automatically when
        the geometry is too dense for the implied dilation.
    cell_steps : float, optional
        If given, only this cell width (in step lengths) is tried.
    n_hint : float
        Expected ensemble size: sets the runs-per-fold-block penalty
        (quantized to the nearest power of two for disk-cache stability).
    """
    import hashlib
    import os
    import pickle

    from ..substrates import _triangle_box_overlap_batch

    n_hint_q = quantize_n_hint(n_hint)
    legacy_path = None
    if cache_path is None:
        # Content-keyed disk cache: packing is a pure (and expensive)
        # function of the geometry, the step scale, and the epoch length —
        # a fresh process (e.g. the benchmark driver) reuses prior work.
        # v10 = distance-ordered rows + FINE_LADDER counts; v9 entries are
        # still loadable (fine counts synthesized, see FusedMeshSpec),
        # which keeps hour-scale legacy packs (neuron meshes) usable.
        def content_hash(version):
            h = hashlib.sha256()
            h.update(np.ascontiguousarray(substrate.vertices).tobytes())
            h.update(np.ascontiguousarray(substrate.faces).tobytes())
            h.update(np.asarray(
                [scale, resort_every, float(substrate.perm_prob),
                 float(substrate.periodic),
                 -1.0 if cell_steps is None else float(cell_steps),
                 float(bytes_limit), n_hint_q, version]
            ).tobytes())
            return h.hexdigest()[:24]

        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "disimpy_tpu"
        )
        try:
            os.makedirs(cache_dir, exist_ok=True)
            cache_path = os.path.join(
                cache_dir, f"fused-{content_hash(10.0)}.pkl"
            )
            legacy_path = os.path.join(
                cache_dir, f"fused-{content_hash(9.0)}.pkl"
            )
        except OSError:
            cache_path = None

    load_path = None
    if cache_path is not None and os.path.exists(cache_path):
        load_path = cache_path
    elif legacy_path is not None and os.path.exists(legacy_path):
        load_path = legacy_path
    if load_path is not None:
        with open(load_path, "rb") as f:
            parts = pickle.load(f)
        if parts.get("failed"):
            # Cached exhaustive-search failure: the (geometry, scale, J)
            # combination fits no fused configuration. Re-searching costs
            # tens of minutes of host SAT work (e.g. the neuron mesh at
            # step lengths comparable to its features), so the negative
            # result is cached too — but only for the SAME search (an
            # improved width ladder / cost model / CH_MAX may succeed
            # where the recorded one failed, so a version mismatch
            # falls through to a fresh search).
            if parts.get("search_version") == SEARCH_VERSION:
                raise ValueError(
                    "fused mesh table does not fit the chunk/memory "
                    "budgets for any (epoch, cell width) configuration "
                    "(cached result)"
                )
            parts = None
        if parts is not None:
            arrays = dict(parts["arrays"])
            if "cell_packed2" not in arrays:
                # Legacy v9 pack: rows are level-ordered but not distance-
                # ordered, so the only valid prefix for every fine
                # threshold is the full step-0 prefix — replicate it
                # (coarse behavior).
                c0 = np.asarray(arrays["cell_packed"]) & ((1 << BITS) - 1)
                p2 = np.zeros_like(c0)
                for k in range(len(FINE_LADDER)):
                    p2 = p2 | (c0 << (BITS * k))
                arrays["cell_packed2"] = p2.astype(np.int32)
            arrays["table"] = _with_tail(arrays["table"])
            return FusedMeshSpec(
                **{k: jnp.asarray(v) for k, v in arrays.items()},
                **parts["meta"],
            )

    assert 1 <= resort_every <= MAX_J
    vertices = np.asarray(substrate.vertices, dtype=np.float64) * scale
    faces = np.asarray(substrate.faces)
    tri = vertices[faces]  # (T, 3, 3)
    voxel_size = np.asarray(substrate.voxel_size, dtype=np.float64) * scale
    aabb_min = tri.min(axis=1)
    aabb_max = tri.max(axis=1)

    # Per-bounce epsilon the dilation margin provisions for: the f32 floor
    # at the geometry's own extent, or at ~200 step-lengths of coordinate
    # magnitude (covering periodic runs up to ~4e3 steps), whichever is
    # larger. Runs with a larger effective epsilon (longer periodic runs,
    # huge user-supplied epsilon) fall back to the classic engine.
    extent_steps = float(np.max(voxel_size))
    eps_budget = 64.0 * float(np.finfo(np.float32).eps) * max(extent_steps, 200.0)

    if cell_steps is not None:
        widths = [float(cell_steps)]
    else:
        # Wide-to-narrow: the modeled cost is unimodal in the width
        # (chunks-per-cell falls, runs-per-block rises), so the search
        # walks downhill from wide cells and stops one step past the
        # minimum. Wide widths are also the cheap ones to SAT-build.
        widths = [30.0, 20.0, 13.5, 9.0, 6.0, 4.0, 2.83, 2.0, 1.41,
                  1.0, 0.71, 0.5]
    periodic = substrate.periodic

    for J in range(resort_every, 0, -1):
        dil = _dilations(J, eps_margin=EPS_BOUNCES * eps_budget)
        best = None
        worsened = 0
        seen_n_sv = set()
        for width in widths:
            n_sv = np.maximum(1, np.floor(voxel_size / width).astype(int))
            # Several wide widths clamp to the same grid; the table only
            # depends on n_sv, so re-evaluating is pure waste (and an
            # equal score must not count as "past the minimum").
            key = tuple(int(x) for x in n_sv)
            if key in seen_n_sv:
                continue
            seen_n_sv.add(key)
            est = _pair_estimate(
                aabb_min, aabb_max, n_sv, voxel_size / n_sv, voxel_size,
                dil[-1], periodic,
            )
            if est > PAIR_LIMIT:
                continue
            built = _build_table(
                tri, aabb_min, aabb_max, n_sv, voxel_size / n_sv,
                voxel_size, dil, periodic, J, _triangle_box_overlap_batch,
            )
            if built is None:  # a per-cell chunk count overflowed
                continue
            table, cell_start, cell_packed, _ = built
            if table.nbytes > bytes_limit:
                continue
            # Kernel cost model (device ns per spin-step), refit to the
            # round-4 width sweep on the bundle (benchmarks/README.md):
            #   cost = (1/L + 1/BLK) * (I + U * curve) + C
            # where (1/L + 1/BLK) is each spin's share of run-block
            # iterations (runs/tile ~ TILE/L, blocks/run ~ L/BLK + 1),
            # I = 141 ns of per-iteration scalar machinery x effective
            # passes, U = 434 ns per STATIC prefix unit (folding the
            # runtime-SELECTED subset, whose size tracks curve), and
            # C = 20 ns of per-spin fixed cost (launch, window DMA, step
            # scaffolding, XLA epoch machinery). Fit residual < 3% on
            # widths {3.2, 4.2, 5.5, 6.3}: 92.7/64.6/64.4/67.0 measured
            # vs 92.7/64.4/64.0/68.9 modeled ns/spin-step.
            curve = np.mean([
                float(np.mean((cell_packed >> (BITS * s)) & ((1 << BITS) - 1)))
                for s in range(J)
            ])
            from .pallas_fused import TILE as _TILE, BLK as _BLK
            lam = max(n_hint_q / float(np.prod(n_sv)), 1.0)
            L = min(lam, float(_TILE))
            score = (1.0 / L + 1.0 / _BLK) * (141.0 + curve * 434.0) + 20.0
            if not quiet:
                print(
                    f"pack_fused: J={J} width={width} n_sv={tuple(n_sv)} "
                    f"ns/spin-step={score:.2f} {table.nbytes/1e6:.0f}MB"
                )
            cand = (score, table.nbytes, built, key)
            if best is None or cand[:2] < best[:2]:
                best = cand
                worsened = 0
            elif score > best[0]:
                # Strictly past the (unimodal) minimum: stop the walk.
                worsened += 1
                if worsened >= 1:
                    break
        if best is not None:
            _, _, (table, cell_start, cell_packed, cell_packed2), n_sv_t = best
            if cache_path is not None:
                parts = {
                    "arrays": {
                        "table": table,
                        "cell_start": cell_start,
                        "cell_packed": cell_packed,
                        "cell_packed2": cell_packed2,
                        "voxel_size": voxel_size.astype(np.float32),
                        "sv_width": (
                            voxel_size / np.array(n_sv_t)
                        ).astype(np.float32),
                        "perm_prob": np.float32(substrate.perm_prob),
                    },
                    "meta": {
                        "n_sv": n_sv_t,
                        "resort_every": int(J),
                        "seed_salt": int(seed_salt),
                        "eps_budget": float(eps_budget),
                    },
                }
                with open(cache_path, "wb") as f:
                    pickle.dump(parts, f)
            return FusedMeshSpec(
                table=jnp.asarray(_with_tail(table)),
                cell_start=jnp.asarray(cell_start),
                cell_packed=jnp.asarray(cell_packed),
                cell_packed2=jnp.asarray(cell_packed2),
                voxel_size=jnp.asarray(voxel_size, jnp.float32),
                sv_width=jnp.asarray(
                    voxel_size / np.array(n_sv_t), jnp.float32
                ),
                perm_prob=jnp.asarray(substrate.perm_prob, jnp.float32),
                n_sv=n_sv_t,
                resort_every=int(J),
                seed_salt=int(seed_salt),
                eps_budget=float(eps_budget),
            )
    if cache_path is not None:
        with open(cache_path, "wb") as f:
            pickle.dump(
                {"failed": True, "search_version": SEARCH_VERSION}, f
            )
    raise ValueError(
        "fused mesh table does not fit the chunk/memory budgets for any "
        "(epoch, cell width) configuration"
    )


def _pair_estimate(aabb_min, aabb_max, n_sv, sv_width, voxel_size, dilation,
                   periodic):
    """AABB-level (triangle image, cell) pair count (cheap upper bound).

    Mirrors _candidate_pairs' reachability masking: a periodic image only
    contributes the triangles whose shifted AABB actually reaches the
    dilated voxel (for dilation << voxel, that's a thin boundary shell,
    not the whole mesh 27 times over).
    """
    total = 0.0
    if periodic:
        s_max = [1 + int(math.floor(dilation / voxel_size[a])) for a in range(3)]
        if np.prod([2 * m + 1 for m in s_max]) > 4096:
            # The dilation spans many periodic tiles (step length comparable
            # to the voxel): no grid configuration is viable, and even
            # estimating it image-by-image would take minutes.
            return float("inf")
        ranges = [np.arange(-s_max[a], s_max[a] + 1) for a in range(3)]
    else:
        ranges = [np.array([0])] * 3
    for sx in ranges[0]:
        for sy in ranges[1]:
            for sz in ranges[2]:
                shift = np.array([sx, sy, sz], dtype=np.float64) * voxel_size
                lo = aabb_min + shift - dilation
                hi = aabb_max + shift + dilation
                ok = np.all(lo < voxel_size, axis=1) & np.all(hi > 0, axis=1)
                if not np.any(ok):
                    continue
                lo_c = np.clip(np.floor(lo[ok] / sv_width), 0, n_sv - 1)
                hi_c = np.clip(np.floor(hi[ok] / sv_width), 0, n_sv - 1)
                total += float(np.prod(hi_c - lo_c + 1, axis=1).sum())
    return total


def _build_table(tri, aabb_min, aabb_max, n_sv, sv_width, voxel_size, dil,
                 periodic, J, sat_batch):
    """Distance-ordered per-cell rows; None if a count overflows BITS."""
    tri_i, shift_i, cell_i = _candidate_pairs(
        aabb_min, aabb_max, n_sv, sv_width, voxel_size, dil[-1], periodic
    )
    n_cells = int(np.prod(n_sv))
    if len(tri_i) == 0:
        table = np.zeros((1, 8, 128), np.float32)
        z = np.zeros(n_cells, np.int32)
        return table, z, z.copy(), z.copy()

    # Membership: exact SAT against the largest dilated cell box (one
    # pass). Level (which epoch step first needs the triangle): from the
    # AABB distance between triangle and cell box — a lower bound on the
    # true distance, so a triangle can only land in an *earlier* chunk
    # than strictly necessary (superset per step = no leaks), while the
    # exact per-level SAT cascade would cost J passes of host time.
    cell_xyz = np.stack(
        np.unravel_index(cell_i, tuple(n_sv)), axis=1
    ).astype(np.float64)
    box_lo = cell_xyz * sv_width
    box_hi = box_lo + sv_width
    tri_shifted = tri[tri_i] + (shift_i * voxel_size)[:, None, :]
    keep = np.empty(len(tri_i), dtype=bool)
    for c0 in range(0, len(tri_i), 2_000_000):
        sl = slice(c0, c0 + 2_000_000)
        boxes = np.stack(
            (box_lo[sl] - dil[-1], box_hi[sl] + dil[-1]), axis=1
        )
        keep[sl] = sat_batch(tri_shifted[sl], boxes)
    tri_i, cell_i = tri_i[keep], cell_i[keep]
    tri_shifted = tri_shifted[keep]
    box_lo, box_hi = box_lo[keep], box_hi[keep]
    amin = tri_shifted.min(axis=1)
    amax = tri_shifted.max(axis=1)
    gap = np.maximum(np.maximum(box_lo - amax, amin - box_hi), 0.0)
    dist_lb = np.linalg.norm(gap, axis=1)
    level = np.searchsorted(np.asarray(dil), dist_lb, side="left")
    level = np.minimum(level, J - 1).astype(np.int32)

    # Rows inside a cell are DISTANCE-ordered (nearest-first). Sorting by
    # the exact dist_lb (a refinement of sorting by level, since level is
    # monotone in dist_lb) makes the unit count covering ANY distance
    # threshold a valid fold prefix — the step ladder and the sub-step
    # FINE_LADDER both index prefixes of the same stream.
    order = np.lexsort((dist_lb, cell_i))
    cell_i, level, tri_shifted = cell_i[order], level[order], tri_shifted[order]
    dist_lb = dist_lb[order]
    per_cell = np.bincount(cell_i, minlength=n_cells)

    # Per-cell, per-step unit counts (UNIT_TRIS triangles per unit).
    counts = np.zeros((n_cells, J), np.int64)
    for s in range(J):
        c = np.bincount(cell_i[level <= s], minlength=n_cells)
        counts[:, s] = -(-c // UNIT_TRIS)
        # a row's step-s stream must include every earlier-step unit
        if s:
            counts[:, s] = np.maximum(counts[:, s], counts[:, s - 1])
    if counts.max() > CH_MAX:
        return None
    packed = np.zeros(n_cells, np.int64)
    for s in range(J):
        packed |= counts[:, s] << (BITS * s)
    # Fine (sub-step) prefix counts: units covering each FINE_LADDER
    # distance; always a subset of the step-0 prefix (dist < dil[0]).
    packed2 = np.zeros(n_cells, np.int64)
    for k, fk in enumerate(FINE_LADDER):
        c = np.bincount(cell_i[dist_lb <= fk], minlength=n_cells)
        packed2 |= (-(-c // UNIT_TRIS)) << (BITS * k)

    n_units_cell = counts[:, J - 1]
    cell_start = np.concatenate(([0], np.cumsum(n_units_cell)[:-1]))
    total_units = max(int(n_units_cell.sum()), 1)
    if total_units * 8 * 128 * 4 > 4 * TABLE_BYTES_LIMIT:
        # Don't even allocate tables that can't fit any budget (the caller
        # checks the exact limit on the returned table).
        return None

    # Feature-form records (see pallas_fused._fold_unit): det, t, u, v of
    # Moller-Trumbore become dot products of per-spin features against
    # [N = E1 x E2 (raw), A.N, E2, E2 x A, E1, A x E1] — 16 values exactly.
    # All-zero padding slots give N = 0 => det = 0 => rejected.
    # CELL-LOCAL frame: the affine features subtract the owning cell's
    # corner so their magnitudes are bounded by the cell width plus the
    # dilation (f32-safe for any voxel extent); the kernel re-offsets each
    # run's spins by the same corner (pallas_fused._kernel docstring).
    # Recomputed from the SORTED cell_i (box_lo predates the lexsort).
    corner = np.stack(
        np.unravel_index(cell_i, tuple(n_sv)), axis=1
    ).astype(np.float64) * sv_width
    tri_local = tri_shifted - corner[:, None, :]
    A = tri_local[:, 0, :]
    E1 = tri_local[:, 1, :] - A
    E2 = tri_local[:, 2, :] - A
    N = np.cross(E1, E2)
    AN = np.sum(A * N, axis=1, keepdims=True)
    EA = np.cross(E2, A)
    AE = np.cross(A, E1)
    rec = np.concatenate((N, AN, E2, EA, E1, AE), axis=1).astype(np.float32)

    row_start = np.concatenate(([0], np.cumsum(per_cell)[:-1]))
    slot = np.arange(len(cell_i)) - row_start[cell_i]
    flat = cell_start[cell_i] * UNIT_TRIS + slot  # slot in the unit stream
    flat_arr = np.zeros((total_units * UNIT_TRIS, 16), np.float32)
    flat_arr[flat] = rec
    # Unit layout (pallas_fused._fold_unit): local triangle t = 8*g + r
    # lands at sublane r, lanes [16*g, 16*g + 16).
    table = np.ascontiguousarray(
        flat_arr.reshape(total_units, 8, 8, 16)
        .transpose(0, 2, 1, 3)
        .reshape(total_units, 8, 128)
    )
    # Trailing zero units (on-disk format: CH_MAX; _with_tail extends to
    # TAIL_UNITS at spec construction for the contiguous window DMA).
    table = np.concatenate(
        (table, np.zeros((CH_MAX, 8, 128), np.float32)), axis=0
    )
    return (table, cell_start.astype(np.int32), packed.astype(np.int32),
            packed2.astype(np.int32))


# ---------------------------------------------------------------------------
# Window execution
# ---------------------------------------------------------------------------


def _cell_keys(spec, positions):
    """Anchor keys and per-spin row metadata from true (3, n) positions."""
    n_sv = jnp.asarray(spec.n_sv, jnp.int32)
    base = jnp.floor(positions / spec.sv_width[:, None]).astype(jnp.int32)
    shift = jnp.floor_divide(base, n_sv[:, None])
    wrapped = base - shift * n_sv[:, None]
    cell = (wrapped[0] * spec.n_sv[1] + wrapped[1]) * spec.n_sv[2] + wrapped[2]
    shiftvox = shift.astype(positions.dtype) * spec.voxel_size[:, None]
    return (cell, spec.cell_start[cell], spec.cell_packed[cell],
            spec.cell_packed2[cell], shiftvox)


def _run_ends(keys):
    """First index after each position whose key differs (run end)."""
    n = keys.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    diff_next = jnp.concatenate((keys[:-1] != keys[1:], jnp.ones((1,), bool)))
    boundary = jnp.where(diff_next, pos, n)
    return jnp.flip(lax.cummin(jnp.flip(boundary.astype(jnp.int32)))) + 1


# Lane-block width runs are aligned to (must match pallas_fused.BLK) and
# the reservoir-lane key sentinel (sorts after every real cell id; real
# ids are bounded by prod(n_sv) << 2**30).
ALIGN_BLK = 128
_BIGKEY = 2 ** 30


def _align_reserve(n, n_sv, tile):
    """Static reservoir size (gap-filler lanes) for BLK-aligned layouts.

    Expected total pad = occupied cells x E[pad per run], estimated with a
    normal approximation of the per-cell occupancy Poisson(n / n_cells).
    Underestimates are safe: ``_align_dest`` clamps once the reservoir is
    exhausted and the remaining runs simply fall back to the ragged
    (unaligned) kernel path.
    """
    C = float(np.prod(n_sv))
    lam = n / C
    sig = max(math.sqrt(lam), 1.0)
    Ls = np.arange(max(1.0, lam - 6 * sig), lam + 6 * sig + 2)
    w = np.exp(-0.5 * ((Ls - lam) / sig) ** 2)
    w = w / w.sum()
    pad = (-Ls) % ALIGN_BLK
    D = C * (1 - math.exp(-lam)) * float((w * pad).sum())
    D = int(min(n, 1.3 * D + 2 * tile))
    return -(-D // tile) * tile


def _align_dest(key, n_real):
    """Sort keys realizing a BLK-aligned run layout.

    ``key`` is (na,) int32: each of the ``n_real`` real lanes carries its
    anchor cell id; the na - n_real reservoir lanes carry ``_BIGKEY``.
    Returns (na,) int32 ``dest`` such that ``lax.sort`` keyed by it places
    every anchor-cell run at a lane index that is a multiple of ALIGN_BLK
    (so each 128-lane fold block is overlapped by exactly one run — the
    kernel's ``blkfast`` case) with reservoir lanes filling the pad slots,
    until the reservoir runs out (later runs stay dense = ragged path).

    Fully vectorized — segment machinery is cummax/cumsum over the sorted
    order plus two tiny merge sorts; no gathers, no scatters (XLA per-lane
    gathers run on the TPU scalar core).
    """
    na = key.shape[0]
    D = na - n_real
    i = jnp.arange(na, dtype=jnp.int32)
    keys_s, src = lax.sort((key, i), num_keys=1)
    # Reservoir lanes (key _BIGKEY, stable sort) occupy exactly [n_real, na).
    real_s = i < n_real
    is_start = jnp.concatenate(
        (jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1])
    )
    run_start = lax.cummax(jnp.where(is_start, i, 0))
    next_end = _run_ends(keys_s)
    is_end = next_end == i + 1
    len_end = i + 1 - run_start
    pad_end = jnp.where(
        is_end & real_s, (-len_end) % jnp.int32(ALIGN_BLK), 0
    )
    P = jnp.cumsum(pad_end)
    # Pads of runs strictly before lane i's own run (constant per run).
    G = P - jnp.where(is_end, pad_end, 0)
    totpad = jnp.minimum(P[-1], jnp.int32(D))
    dest_real = i + jnp.minimum(G, totpad)

    # Gap-slot keys for the reservoir: run r (ending at sorted lane e with
    # G = Q pads before it) owns gap slots dest(e) + 1 .. dest(e) + pad =
    # (e + 1 + Q) .. (e + Q + pad), i.e. reservoir lane k in [Q, Q + pad)
    # gets key (e + 1) + k. A 2-operand merge sort interleaves each k
    # between its run's entry (Q keys) and the next; the payload e + 1 is
    # monotone along the merge, so a cummax fill-forward recovers it.
    entry = is_end & (pad_end > 0) & real_s & (G < totpad)
    kidx = jnp.arange(D, dtype=jnp.int32)
    mkey = jnp.concatenate((jnp.where(entry, G, jnp.int32(_BIGKEY)), kidx))
    pay = jnp.concatenate(
        (jnp.where(entry, i + 1, 0), jnp.zeros(D, jnp.int32))
    )
    mks, pays = lax.sort((mkey, pay), num_keys=1)
    dv = lax.cummax(pays) + mks  # valid at reservoir rows (pays == 0)
    _, dv_k = lax.sort(
        (jnp.where(pays == 0, mks, jnp.int32(_BIGKEY)), dv), num_keys=1
    )
    # Unused reservoir lanes key past every real dest (max real dest is
    # n_real - 1 + totpad < na), preserving k order at the tail.
    dumv = jnp.where(kidx < totpad, dv_k[:D], jnp.int32(na) + kidx)
    dest_sorted = jnp.concatenate((dest_real[:n_real], dumv))
    _, dest = lax.sort((src, dest_sorted), num_keys=1)
    return dest


@partial(jax.jit, static_argnames=("interpret", "track", "ablate",
                                   "runtime_level", "count_units",
                                   "fold_unroll", "contig", "blkfast",
                                   "align", "passgate"))
def run_window_fused(spec, positions, phases, iter_exc, g_eff, ts, seed32,
                     epsilon, max_iter, interpret=False, id_base=0,
                     track=False, compartments=None, ablate=0,
                     runtime_level=True, count_units=False, fold_unroll=1,
                     contig=True, blkfast=False, align=False,
                     passgate=False):
    """Advance the ensemble through the window ``ts`` with the fused engine.

    Arguments mirror engine.core.run_window (positions (3, n) true
    unwrapped coordinates; phases (n_meas, n)); trajectory collection is
    not supported here (the driver uses the classic path for traj output).
    ``seed32`` is an int32 derived from the simulation seed; the in-kernel
    RNG is keyed by (seed32 ^ salt, t, spin id) — no jax PRNG key
    threading. ``id_base`` offsets the spin ids (a sharded run passes each
    shard's global offset so every walker keeps its global RNG stream).

    With ``track=True``, ``compartments`` must be the driver's
    ``(crossings, parity, intra_steps)`` tuple (engine/core.run_window
    docstring); the kernel reports per-step membrane-transit counts and
    the epoch body folds them into the trackers (parity rides the packed
    ``2*crossings + parity`` sort operand; intra dwell follows the
    classic rule — a spin dwells the step in the compartment it ends it
    in). The window then returns an extra compartments element.

    Phase accumulators stay in ORIGINAL spin order for the whole window:
    each epoch's kernel returns per-step positions in epoch order, one
    (1 + 3J)-operand sort permutes them back to canonical order, and the
    epoch's phase delta is a single (n_meas, 3J) x (3J, n) matmul. (The
    XLA TPU sort lowering's compile time explodes beyond ~21 operands;
    3J + 1 <= 16 stays well below.)
    """
    from . import pallas_fused
    from .pallas_fused import TILE

    J = spec.resort_every
    n_true = positions.shape[1]
    n_t = int(ts.shape[0])
    t0_val = ts[0]
    n_epochs = -(-n_t // J)
    dtype = positions.dtype
    m = phases.shape[0]

    # Pad the spin axis to a whole number of kernel tiles; pad spins copy
    # spin 0 (valid physics, ids beyond n_true) and are sliced off after
    # the final unsort (they sort last). With ``align``, a further static
    # reservoir of gap-filler lanes is appended: each epoch they are
    # re-keyed (engine-side only — they belong to no run, fold nothing,
    # and settle after one pass) to pad every anchor-cell run to an
    # ALIGN_BLK lane boundary, which makes the kernel's single-run
    # fast path (``blkfast``) the dominant case.
    n = -(-n_true // TILE) * TILE
    na = n + (_align_reserve(n, spec.n_sv, TILE) if align else 0)
    if track:
        crossings, parity, intra = compartments
    if na != n_true:
        reps = na - n_true
        positions = jnp.concatenate(
            (positions, jnp.repeat(positions[:, :1], reps, axis=1)), axis=1
        )
        phases = jnp.concatenate(
            (phases, jnp.zeros((m, reps), phases.dtype)), axis=1
        )
        iter_exc = jnp.concatenate((iter_exc, jnp.zeros(reps, bool)))
        if track:
            zpad = jnp.zeros(reps, jnp.int32)
            crossings = jnp.concatenate((crossings, zpad))
            parity = jnp.concatenate((parity, jnp.zeros(reps, bool)))
            intra = jnp.concatenate((intra, zpad))

    n_real, n = n, na  # n: kernel ensemble size (incl. any reservoir)
    ids = jnp.asarray(id_base, jnp.int32) + jnp.arange(n, dtype=jnp.int32)
    idexc = (ids << 1) | iter_exc.astype(jnp.int32)
    # Transit trackers ride the epoch sorts next to idexc; the current
    # compartment is the low bit of the packed crossings operand. The
    # untracked path carries no extra sort operands at all.
    if track:
        cr2 = (crossings << 1) | parity.astype(jnp.int32)
    else:
        cr2 = intra = jnp.zeros((0,), jnp.int32)

    # Pad the window's phase coefficients to n_epochs * J steps (zero
    # rows accumulate zero delta for the trailing partial epoch).
    g_pad = jnp.pad(g_eff, ((0, n_epochs * J - n_t), (0, 0), (0, 0)))
    g_epochs = g_pad.reshape(n_epochs, J, m, 3)

    seed_k = jnp.asarray(seed32, jnp.int32) ^ jnp.int32(spec.seed_salt)

    def epoch(carry, xs):
        positions, phases, idexc, cr2, intra, diag = carry
        e_idx, g_e = xs
        t_base = t0_val + e_idx * J

        cell, start, packed, packed2, shiftvox = _cell_keys(spec, positions)
        shifted = positions - shiftvox
        if align:
            # Reservoir lanes (ids >= id_base + n_real) are engine-side
            # gap fillers: key them past every real cell id, void their
            # row metadata (packed == 0 means they can never form a run,
            # so the kernel folds nothing for them and they settle after
            # one pass), and sort by the gap-inserting dest keys so every
            # anchor-cell run lands on an ALIGN_BLK lane boundary.
            gap = (
                lax.shift_right_logical(idexc, jnp.int32(1))
                - jnp.asarray(id_base, jnp.int32)
            ) >= jnp.int32(n_real)
            cell = jnp.where(gap, jnp.int32(_BIGKEY), cell)
            start = jnp.where(gap, 0, start)
            packed = jnp.where(gap, 0, packed)
            packed2 = jnp.where(gap, 0, packed2)
            key_ops = (_align_dest(cell, n_real),)
        else:
            key_ops = ()
        ops = lax.sort(
            key_ops
            + (
                cell,
                start,
                packed,
                packed2,
                shifted[0],
                shifted[1],
                shifted[2],
                shiftvox[0],
                shiftvox[1],
                shiftvox[2],
                idexc,
            )
            + ((cr2, intra) if track else ()),
            num_keys=1,
        )
        o = len(key_ops)
        cell_s, start_s = ops[o], ops[o + 1]
        packed_s, packed2_s = ops[o + 2], ops[o + 3]
        pos_s = jnp.stack(ops[o + 4:o + 7])
        shiftvox_s = jnp.stack(ops[o + 7:o + 10])
        idexc_s = ops[o + 10]
        if track:
            cr2, intra = ops[o + 11], ops[o + 12]
        next_end = _run_ends(cell_s)
        ids_s = idexc_s >> 1
        # Anchor-cell corners (the table rows' coordinate frame), from the
        # sorted flat cell ids — cheaper than 3 extra sort operands.
        n1n2 = jnp.int32(spec.n_sv[1] * spec.n_sv[2])
        cxi = cell_s // n1n2
        rem_c = cell_s - cxi * n1n2
        cyi = rem_c // jnp.int32(spec.n_sv[2])
        czi = rem_c - cyi * jnp.int32(spec.n_sv[2])
        corner_s = (
            jnp.stack((cxi, cyi, czi)).astype(jnp.float32)
            * spec.sv_width[:, None]
        )

        # Per-step unit directions for the whole epoch (id-keyed streams:
        # identical values wherever the spin sits in the sorted ensemble).
        dirs = jax.vmap(
            lambda s: krng.unit_directions(seed_k, t_base + s, ids_s, dtype)
        )(jnp.arange(J))

        # One kernel launch resolves all J steps' bounces (pallas_fused).
        n_valid_steps = jnp.minimum(t0_val + n_t - t_base, J)
        eout = pallas_fused.fused_epoch(
            spec, pos_s, dirs, ids_s, start_s, packed_s, packed2_s,
            next_end, corner_s, t_base, n_valid_steps, seed_k, epsilon,
            max_iter, interpret=interpret, ablate=ablate,
            runtime_level=runtime_level, count_units=count_units,
            fold_unroll=fold_unroll, contig=contig, blkfast=blkfast,
            passgate=passgate,
        )
        pos_steps, exc_bits, cross_steps = eout[:3]
        if count_units:
            diag = (diag[0] + eout[3][0], diag[1] + eout[3][1],
                    diag[2] + eout[3][2])
        pos_s = pos_steps[-1]
        idexc_s = idexc_s | exc_bits.astype(jnp.int32)
        if track:
            # Fold the kernel's per-step transit counts into the trackers
            # (classic rule, engine/core.py: a spin dwells step s in the
            # compartment it ENDS step s in). Steps beyond n_valid report
            # zero counts from the kernel; the dwell sum masks them too.
            parity0 = cr2 & 1
            ctot = lax.shift_right_logical(cr2, jnp.int32(1))
            prefix = jnp.cumsum(cross_steps, axis=0)  # (J, n) inclusive
            valid = (
                jnp.arange(J, dtype=jnp.int32)[:, None] < n_valid_steps
            )
            par_after = (parity0[None, :] + prefix) & 1
            intra = intra + jnp.sum(
                jnp.where(valid, par_after, 0), axis=0, dtype=jnp.int32
            )
            ctot = ctot + prefix[-1]
            cr2 = (ctot << 1) | ((parity0 + prefix[-1]) & 1)

        # Permute the epoch's per-step TRUE positions back to canonical
        # spin order (1 + 3J sort operands — far below the ~21-operand
        # compile cliff, and much cheaper than permuting n_meas phase
        # rows), then the epoch's phase accrual is a single
        # (m, 3J) x (3J, n) matmul; phases never change order at all.
        P_true = (pos_steps + shiftvox_s[None]).reshape(3 * J, n)
        perm = lax.sort(
            (ids_s,) + tuple(P_true[r] for r in range(3 * J)), num_keys=1
        )
        P_canon = jnp.stack(perm[1:])
        g_flat = g_e.transpose(1, 0, 2).reshape(m, 3 * J).astype(dtype)
        phases = phases + lax.dot(
            g_flat, P_canon, preferred_element_type=phases.dtype
        )

        # idexc travels with positions (epoch order); phases stay original.
        positions = pos_s + shiftvox_s
        return (positions, phases, idexc_s, cr2, intra, diag), None

    diag0 = (jnp.int32(0), jnp.int32(0), jnp.float32(0))
    (positions, phases, idexc, cr2, intra, diag), _ = lax.scan(
        epoch,
        (positions, phases, idexc, cr2, intra, diag0),
        (jnp.arange(n_epochs), g_epochs),
    )

    # Restore original spin order once per window.
    ops = lax.sort(
        (idexc, positions[0], positions[1], positions[2])
        + ((cr2, intra) if track else ()),
        num_keys=1,
    )
    idexc = ops[0][:n_true]
    positions = jnp.stack(ops[1:4])[:, :n_true]
    phases = phases[:m, :n_true]
    iter_exc = (idexc & 1).astype(bool)
    extra = (diag,) if count_units else ()
    if track:
        cr2_c, intra_c = ops[4][:n_true], ops[5][:n_true]
        compartments = (
            lax.shift_right_logical(cr2_c, jnp.int32(1)),
            (cr2_c & 1).astype(bool),
            intra_c,
        )
        return ((positions, phases, iter_exc), None, compartments) + extra
    return ((positions, phases, iter_exc), None) + extra


def run_window_fused_sharded(device_mesh, spec, positions, phases, iter_exc,
                             g_eff, ts, seed32, epsilon, max_iter,
                             interpret=False, track=False, compartments=None,
                             ablate=0, runtime_level=True, fold_unroll=1,
                             contig=True, blkfast=False, align=False,
                             passgate=False):
    """Shard-mapped fused window: per-shard sorts and kernel launches.

    Spins are embarrassingly parallel, so the whole fused pipeline (epoch
    sort, kernel, phase matmul, transit tracking) runs shard-locally under
    ``shard_map`` with zero cross-device communication; the walker ids are
    offset per shard so every spin keeps the global RNG stream it would
    have on one device, making the physics independent of the device
    count. (The reference is strictly single-GPU:
    disimpy/simulations.py:1163-1166.)
    """
    from jax import shard_map
    from ..parallel.sharding import SPIN_AXIS
    from jax.sharding import PartitionSpec as P

    n_global = positions.shape[1]
    n_local = n_global // device_mesh.devices.size

    def local(spec_l, pos, ph, exc, g_l, ts_l, seed_l, eps_l, mi_l, *comp):
        id_base = lax.axis_index(SPIN_AXIS) * jnp.int32(n_local)
        out = run_window_fused(
            spec_l, pos, ph, exc, g_l, ts_l, seed_l, eps_l, mi_l,
            interpret=interpret, id_base=id_base, track=track,
            compartments=comp if track else None, ablate=ablate,
            runtime_level=runtime_level, fold_unroll=fold_unroll,
            contig=contig, blkfast=blkfast, align=align,
            passgate=passgate,
        )
        (p2, ph2, e2) = out[0]
        return (p2, ph2, e2) + (out[2] if track else ())

    col = P(None, SPIN_AXIS)
    row = P(SPIN_AXIS)
    comp_in = (row, row, row) if track else ()
    out = shard_map(
        local,
        mesh=device_mesh,
        in_specs=(P(), col, col, row, P(), P(), P(), P(), P()) + comp_in,
        out_specs=(col, col, row) + comp_in,
        check_vma=False,
    )(spec, positions, phases, iter_exc, g_eff, ts, seed32, epsilon,
      max_iter, *(compartments if track else ()))
    positions, phases, iter_exc = out[0], out[1], out[2]
    if track:
        return (positions, phases, iter_exc), None, tuple(out[3:6])
    return (positions, phases, iter_exc), None
