"""Fused-step mesh engine tests (Pallas kernel in interpret mode on CPU).

Covers the counter-based kernel RNG (exact Random123 known-answer vectors
and distributional checks), the packing invariants (coverage of every
triangle reachable within each epoch step's dilation), and end-to-end
physics equivalence with the classic per-bounce path.
"""

import pickle

import numpy as np
import numpy.testing as npt
import pytest
from scipy.stats import kstest

import jax
import jax.numpy as jnp

from disimpy_tpu import gradients, meshes, simulations, substrates
from disimpy_tpu.engine import config, fused, krng

SEED = 123


# ---------------------------------------------------------------------------
# Kernel RNG
# ---------------------------------------------------------------------------


def _u32(x):
    return np.array([x], dtype=np.uint32).view(np.int32)[0]


def _run_tf(ctr, key, rounds):
    x0, x1 = krng.threefry2x32(
        _u32(key[0]), _u32(key[1]), np.array([_u32(ctr[0])]),
        np.array([_u32(ctr[1])]), rounds=rounds,
    )
    return (
        int(np.asarray(x0).view(np.uint32)[0]),
        int(np.asarray(x1).view(np.uint32)[0]),
    )


def test_threefry2x32_known_answer_vectors():
    # Random123 kat_vectors (Salmon et al., SC'11).
    assert _run_tf((0, 0), (0, 0), 20) == (0x6B200159, 0x99BA4EFE)
    assert _run_tf(
        (0xFFFFFFFF, 0xFFFFFFFF), (0xFFFFFFFF, 0xFFFFFFFF), 20
    ) == (0x1CB996FC, 0xBB002BE7)
    assert _run_tf(
        (0x243F6A88, 0x85A308D3), (0x13198A2E, 0x03707344), 20
    ) == (0xC4923A9C, 0x483DF7A0)
    assert _run_tf((0, 0), (0, 0), 13) == (0x9D1C5EC6, 0x8BD50731)
    assert _run_tf(
        (0xFFFFFFFF, 0xFFFFFFFF), (0xFFFFFFFF, 0xFFFFFFFF), 13
    ) == (0xFD36D048, 0x2D17272C)


def test_kernel_rng_distributions():
    n = int(1e5)
    ids = jnp.arange(n, dtype=jnp.int32)
    d = np.asarray(krng.unit_directions(1, 0, ids))
    assert d.shape == (3, n)
    npt.assert_almost_equal(np.linalg.norm(d, axis=0), np.ones(n), 6)
    npt.assert_almost_equal(np.abs(d.mean(axis=1)).max(), 0, 2)
    for comp in d:  # uniform marginals of a uniform unit vector
        _, p = kstest(comp, "uniform", args=(-1, 2))
        assert p > 1e-3
    u = np.asarray(krng.bounce_uniform(1, 0, ids, 0))
    _, p = kstest(u, "uniform")
    assert p > 1e-3
    # Independence across steps / draws / seeds.
    d2 = np.asarray(krng.unit_directions(1, 1, ids))
    d3 = np.asarray(krng.unit_directions(2, 0, ids))
    assert np.all(d != d2) and np.all(d != d3)
    # Keyed by id: the draw for spin i is the same wherever it sits.
    sub = np.asarray(krng.unit_directions(1, 0, ids[::7]))
    npt.assert_equal(sub, d[:, ::7])


# ---------------------------------------------------------------------------
# Packing invariants
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def packed_sphere():
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=2)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, n_sv=np.array([4, 4, 4]), quiet=True
    )
    step_l = float(np.sqrt(6 * 2e-9 * 8e-5))
    spec = fused.pack_fused(substrate, 1 / step_l, resort_every=4)
    return substrate, spec, step_l


def test_pack_fused_counts_monotone(packed_sphere):
    _, spec, _ = packed_sphere
    packed = np.asarray(spec.cell_packed)
    mask = (1 << fused.BITS) - 1
    prev = np.zeros_like(packed)
    for s in range(spec.resort_every):
        c = (packed >> (fused.BITS * s)) & mask
        assert np.all(c >= prev)
        prev = c
    # Fine sub-step prefix counts: nondecreasing in the threshold and
    # never exceeding the step-0 prefix they subset.
    packed2 = np.asarray(spec.cell_packed2)
    c0 = packed & mask
    prev = np.zeros_like(packed2)
    for k in range(len(fused.FINE_LADDER)):
        c = (packed2 >> (fused.BITS * k)) & mask
        assert np.all(c >= prev) and np.all(c <= c0)
        prev = c


def _triangle_box_distance(tri, lo, hi, n_grid=120):
    """Euclidean distance between triangles (k, 3, 3) and the AABB [lo, hi],
    by dense barycentric sampling (the point-to-box distance is 1-Lipschitz,
    so the sampling error is bounded by the sample spacing)."""
    a = np.linspace(0.0, 1.0, n_grid)
    u, v = np.meshgrid(a, a)
    keep = (u + v) <= 1.0
    u, v = u[keep], v[keep]
    pts = (
        tri[:, None, 0, :]
        + u[None, :, None] * (tri[:, 1, :] - tri[:, 0, :])[:, None, :]
        + v[None, :, None] * (tri[:, 2, :] - tri[:, 0, :])[:, None, :]
    )  # (k, m, 3)
    gap = np.maximum(np.maximum(lo - pts, pts - hi), 0.0)
    return np.linalg.norm(gap, axis=2).min(axis=1)


def test_pack_fused_coverage(packed_sphere):
    """Every triangle within Euclidean step-s dilation of a cell box must
    appear in that cell's first counts[s] chunks (superset = no leaks):
    a spin anchored in the cell stays within dil[s] of the cell box during
    epoch step s, so every wall it can reach lies in that neighborhood."""
    substrate, spec, step_l = packed_sphere
    J = spec.resort_every
    scale = 1 / step_l
    verts = np.asarray(substrate.vertices) * scale
    tri = verts[np.asarray(substrate.faces)]
    voxel = np.asarray(substrate.voxel_size) * scale
    sv_width = np.asarray(spec.sv_width)
    n_sv = np.array(spec.n_sv)
    table = np.asarray(spec.table)
    start = np.asarray(spec.cell_start)
    packed = np.asarray(spec.cell_packed)
    # Same dilation ladder the pack was built with (incl. the eps margin).
    dil = fused._dilations(J, eps_margin=fused.EPS_BOUNCES * spec.eps_budget)

    rng = np.random.RandomState(0)
    for cell in rng.choice(int(n_sv.prod()), size=8, replace=False):
        cxyz = np.array(np.unravel_index(cell, tuple(n_sv)))
        lo = cxyz * sv_width
        hi = lo + sv_width
        for s in (0, J - 1):
            n_units = (packed[cell] >> (fused.BITS * s)) & (
                (1 << fused.BITS) - 1
            )
            rows = table[start[cell]:start[cell] + n_units]
            # stored records are 16-float feature vectors per triangle:
            # unit layout (u, sublane r, lane 16g + j) -> triangle 8g + r
            stored = (
                rows.reshape(-1, 8, 8, 16).transpose(0, 2, 1, 3)
                .reshape(-1, 16)
            )
            stored = stored[np.abs(stored).sum(axis=1) > 0]
            # brute force: every (triangle, periodic image) whose true
            # Euclidean distance to the cell box is below dil[s] (slightly
            # shrunk: the 0.05 slack dodges boundary ties and absorbs the
            # distance-sampling error) must be in the step-s chunk prefix.
            margin = dil[s] - 0.05
            box = np.stack((lo - margin, hi + margin))  # (2, 3)
            for sx in (-1, 0, 1):
                for sy in (-1, 0, 1):
                    for sz in (-1, 0, 1):
                        shift = np.array([sx, sy, sz]) * voxel
                        t_img = tri + shift
                        amin = t_img.min(axis=1)
                        amax = t_img.max(axis=1)
                        near = np.all(amin <= box[1], axis=1) & np.all(
                            amax >= box[0], axis=1
                        )
                        cand = np.nonzero(near)[0]
                        if not len(cand):
                            continue
                        dist = _triangle_box_distance(t_img[cand], lo, hi)
                        for ti in cand[dist <= margin]:
                            # table rows are stored in the owning cell's
                            # local frame (corner at the origin)
                            A, B, C = t_img[ti] - lo
                            E1, E2 = B - A, C - A
                            N = np.cross(E1, E2)
                            feat = np.concatenate(
                                (N, [A @ N], E2, np.cross(E2, A), E1,
                                 np.cross(A, E1))
                            )
                            tol = 1e-4 * max(1.0, np.abs(feat).max())
                            match = (
                                np.abs(stored - feat[None]).max(axis=1).min()
                                if len(stored)
                                else np.inf
                            )
                            assert match < tol, (cell, s, ti, (sx, sy, sz))


# ---------------------------------------------------------------------------
# XLA run-table construction (the round-4 hoist)
# ---------------------------------------------------------------------------


def _random_run_structure(rng, n_tiles, J):
    """Synthetic sorted-epoch metadata: random runs per tile plus a
    consistent global row layout (cell_start values for contig mode)."""
    from disimpy_tpu.engine import pallas_fused as pf

    TILE = pf.TILE
    n = n_tiles * TILE
    packed = np.empty(n, np.int64)
    nxt = np.empty(n, np.int64)
    start = np.empty(n, np.int64)
    row = 0
    for t in range(n_tiles):
        pos = t * TILE
        while pos < (t + 1) * TILE:
            ln = int(rng.randint(1, 90))
            end = min(pos + ln, (t + 1) * TILE)
            nun = int(rng.choice([0, 0, 1, 2, 3, 5, 9, 17, 31]))
            packed[pos:end] = nun << (fused.BITS * (J - 1))
            nxt[pos:end] = end
            start[pos:end] = row
            # Occasional row gap: a populated cell none of this tile's
            # spins anchor to (exercises contig-window quantization).
            row += nun + int(rng.choice([0, 0, 0, 7, 40]))
            pos = end
    return packed, nxt, start


@pytest.mark.parametrize("contig", [False, True])
def test_epoch_run_tables_invariants(contig):
    """The vectorized run table must cover every non-empty run exactly
    once, in lane order, with arena-safe offsets, a winK row that
    partitions [0, R) into contiguous windows, and per-block ranges that
    exactly bracket the runs overlapping each 128-lane block. In contig
    mode every run's arena offset must equal its HBM distance from the
    window's DMA base (one full-arena transfer serves the window)."""
    from disimpy_tpu.engine import pallas_fused as pf

    TILE, BLK, NBLK = pf.TILE, pf.BLK, pf.NBLK
    J = 4
    rng = np.random.RandomState(3)
    n_tiles = 3
    packed, nxt, start = _random_run_structure(rng, n_tiles, J)
    runlane, runoff, winK, meta, bases = jax.tree_util.tree_map(
        np.asarray,
        pf._epoch_run_tables(
            jnp.asarray(packed, jnp.int32), jnp.asarray(nxt, jnp.int32), J,
            start_s=jnp.asarray(start, jnp.int32) if contig else None,
        ),
    )
    runlane = runlane.reshape(n_tiles, TILE)
    runoff = runoff.reshape(n_tiles, TILE)
    winK = winK.reshape(n_tiles, TILE)
    meta = meta.reshape(n_tiles, TILE)
    mask = (1 << fused.BITS) - 1
    for t in range(n_tiles):
        base = t * TILE
        R = int(meta[t, 0])
        W = int(meta[t, 1 + 2 * NBLK])
        # Expected runs: non-empty-cell run starts within the tile.
        exp = []
        for l in range(TILE):
            g = base + l
            nun = (packed[g] >> (fused.BITS * (J - 1))) & mask
            if (l == 0 or nxt[g - 1] == g) and nun > 0:
                exp.append(l)
        assert R == len(exp)
        npt.assert_array_equal(runlane[t, :R], exp)
        # winK: strictly increasing window-start run indices partitioning
        # [0, R); padding entries read R (the kernel's unmasked k1 lookup).
        ks = [int(winK[t, w]) for w in range(W)]
        assert ks == sorted(set(ks))
        assert (W >= 1 and ks[0] == 0) if R else W == 0
        npt.assert_array_equal(winK[t, W:], R)
        win_of = np.zeros(R, int)
        for w in range(W):
            k1 = ks[w + 1] if w + 1 < W else R
            win_of[ks[w]:k1] = w
        # Arena safety: every run's [off, off + class) fits, and runs in
        # the same window never overlap.
        occupied = {}
        for k in range(R):
            g = base + runlane[t, k]
            nun = (packed[g] >> (fused.BITS * (J - 1))) & mask
            cls = next(c for c in pf._CLASSES if c >= nun)
            off, win = int(runoff[t, k]), int(win_of[k])
            assert 0 <= off < pf.CAP and off + cls <= pf.ARENA_U
            for s in range(off, off + nun if contig else off + cls):
                assert (win, s) not in occupied
                occupied[(win, s)] = k
        if contig:
            # One full-arena DMA from base = start(k0) - off(k0) must put
            # every run of the window at its recorded arena offset.
            for k in range(R):
                k0 = ks[win_of[k]]
                dma_base = (
                    start[base + runlane[t, k0]] - int(runoff[t, k0])
                )
                assert start[base + runlane[t, k]] - dma_base == int(
                    runoff[t, k]
                )
            # The cross-tile prefetch base is window 0's DMA row.
            if R:
                assert bases[t] == start[base + runlane[t, 0]]
            else:
                assert bases[t] == -1
        else:
            assert bases[t] == -1
        # Per-block ranges bracket exactly the overlapping runs.
        for q in range(NBLK):
            lo, hi = int(meta[t, 1 + q]), int(meta[t, 1 + NBLK + q])
            ov = []
            for k in range(R):
                l0 = int(runlane[t, k])
                end = min(int(nxt[base + l0]) - base, TILE)
                overlaps = l0 < (q + 1) * BLK and end > q * BLK
                assert (lo <= k < hi) == overlaps, (t, q, k)
                if overlaps:
                    ov.append(k)
            # blkrun: the single overlapping run (kernel fast path), -1
            # when none, -2 when several (ragged fallback).
            kb = int(meta[t, 2 + 2 * NBLK + q])
            if len(ov) == 0:
                assert kb == -1, (t, q)
            elif len(ov) == 1:
                assert kb == ov[0], (t, q)
            else:
                assert kb == -2, (t, q)


# ---------------------------------------------------------------------------
# End-to-end physics
# ---------------------------------------------------------------------------


def _misst_like_setup(oracles_dir, n_s, n_t, n_b):
    with open(oracles_dir / "cylinder_mesh_closed.pkl", "rb") as f:
        m = pickle.load(f)
    bs = np.linspace(1, 3e9, n_b)
    T = 70e-3
    gradient = np.zeros((1, 700, 3))
    gradient[0, 1:300, 0] = 1
    gradient[0, -300:-1, 0] = -1
    gradient = np.concatenate([gradient for _ in bs], axis=0)
    gradient, dt = gradients.interpolate_gradient(gradient, T / 699, n_t)
    gradient = gradients.set_b(gradient, dt, bs)
    substrate = substrates.mesh(
        m["vertices"], m["faces"], True, init_pos="intra",
        n_sv=np.array([10, 10, 10]), quiet=True,
    )
    return gradient, dt, substrate


def test_fused_matches_classic_physics(oracles_dir):
    n_s, n_t = 1500, 60
    gradient, dt, substrate = _misst_like_setup(oracles_dir, n_s, n_t, 6)
    try:
        config.use_fused = True
        config.pallas_interpret = True
        s_f, p_f = simulations.simulation(
            n_s, 2e-9, gradient, dt, substrate, final_pos=True, quiet=True
        )
    finally:
        config.use_fused = None
        config.pallas_interpret = False
    try:
        config.use_fused = False
        s_c, p_c = simulations.simulation(
            n_s, 2e-9, gradient, dt, substrate, final_pos=True, quiet=True
        )
    finally:
        config.use_fused = None
    # Different RNG streams -> statistical agreement at MC tolerance.
    npt.assert_allclose(s_f / n_s, s_c / n_s, atol=4 / np.sqrt(n_s))
    # Leak-proofness: the cylinder surface confines both paths radially.
    c = np.asarray(substrate.voxel_size) / 2
    r_f = np.linalg.norm((p_f - c)[:, :2], axis=1)
    assert r_f.max() < 5e-6 * (1 + 1e-3)


def test_fused_transit_tracking_permeable():
    """Fused-kernel membrane-transit counting (exchange stats/relaxation):
    with b = 0 the signal must exactly equal the sum of the per-walker
    weights implied by the reported intra dwell steps, and the tracked
    parity must agree with geometric re-classification of the final
    positions (same invariants as the classic-path tests in
    test_exchange.py)."""
    n_s, n_t = 300, 50
    dt = 2e-4
    gradient = np.zeros((1, n_t, 3))
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=2)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([4, 4, 4]), quiet=True, perm_prob=0.5,
    )
    t2_intra, t2_extra = 25e-3, 150e-3
    try:
        config.use_fused = True
        config.pallas_interpret = True
        signals, pos, stats = simulations.simulation(
            n_s, 2e-9, gradient, dt, substrate, quiet=True, seed=11,
            final_pos=True, relaxation=(t2_intra, t2_extra),
            exchange_stats=True,
        )
    finally:
        config.use_fused = None
        config.pallas_interpret = False
    assert stats["crossings"].max() > 0
    assert 0.0 < stats["intra_fraction"].mean() < 1.0
    k = stats["intra_steps"].astype(float)
    w = np.exp(-(dt / t2_intra) * k - (dt / t2_extra) * (n_t - k))
    npt.assert_allclose(signals[0], w.sum(), rtol=1e-5)
    # Parity check: inside <=> even transit count (started intra).
    voxel = np.asarray(substrate.voxel_size)
    wrapped = pos - np.floor(pos / voxel) * voxel
    inside = simulations._make_intra_classifier(substrate)(wrapped)
    expected = (stats["crossings"] % 2) == 0
    assert float((inside != expected).mean()) < 0.01


def test_fused_transit_tracking_impermeable_zeros():
    """Impermeable mesh through the fused tracking path: zero transits,
    pure intra dwell (kernel counting is gated off at perm == 0)."""
    n_s, n_t = 128, 20
    gradient = np.zeros((1, n_t, 3))
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=2)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([4, 4, 4]), quiet=True,
    )
    try:
        config.use_fused = True
        config.pallas_interpret = True
        signals, stats = simulations.simulation(
            n_s, 2e-9, gradient, 2e-4, substrate, quiet=True,
            exchange_stats=True,
        )
    finally:
        config.use_fused = None
        config.pallas_interpret = False
    npt.assert_array_equal(stats["crossings"], 0)
    npt.assert_array_equal(stats["intra_steps"], n_t)
    npt.assert_allclose(signals[0], n_s, rtol=1e-6)


def test_runtime_level_selection_bit_identical():
    """Runtime dilation-level selection must be a pure work-saving: every
    triangle a segment can reach lies within (reach + margin) of the
    anchor box, so folding the selected prefix instead of the epoch step's
    worst-case prefix yields bit-identical physics. The knob is a STATIC
    jit argument (config.fused_runtime_level -> run_window_fused ->
    _launch), so both variants compile and run fresh — no cache clearing."""
    n_s, n_t = 200, 20
    gradient = np.zeros((1, n_t, 3))
    gradient[:, 1:-1, 0] = 1e-3
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([2, 2, 2]), quiet=True, perm_prob=0.3,
    )

    def run():
        return simulations.simulation(
            n_s, 2e-9, gradient, 2e-4, substrate, quiet=True, seed=9,
            final_pos=True,
        )

    try:
        config.use_fused = True
        config.pallas_interpret = True
        config.fused_runtime_level = True
        s_on, p_on = run()
        config.fused_runtime_level = False
        s_off, p_off = run()
    finally:
        config.fused_runtime_level = True
        config.use_fused = None
        config.pallas_interpret = False
    npt.assert_array_equal(p_on, p_off)
    npt.assert_array_equal(s_on, s_off)


def test_fold_unroll_bit_identical():
    """Fold-loop unrolling re-folds the run's last unit for odd tails; the
    strict `<` on the min accumulators makes duplicate folds idempotent,
    so unroll 2 and 4 must match unroll 1 bit for bit."""
    n_s, n_t = 200, 16
    gradient = np.zeros((1, n_t, 3))
    gradient[:, 1:-1, 0] = 1e-3
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([2, 2, 2]), quiet=True,
    )

    def run():
        return simulations.simulation(
            n_s, 2e-9, gradient, 2e-4, substrate, quiet=True, seed=9,
            final_pos=True,
        )

    prior_unroll = config.fused_fold_unroll
    try:
        config.use_fused = True
        config.pallas_interpret = True
        config.fused_fold_unroll = 1
        s1, p1 = run()
        config.fused_fold_unroll = 2
        s2, p2 = run()
        config.fused_fold_unroll = 4
        s4, p4 = run()
    finally:
        config.fused_fold_unroll = prior_unroll
        config.use_fused = None
        config.pallas_interpret = False
    npt.assert_array_equal(p1, p2)
    npt.assert_array_equal(s1, s2)
    npt.assert_array_equal(p1, p4)
    npt.assert_array_equal(s1, s4)


def test_dma_mode_bit_identical():
    """The contiguous-window DMA and the per-run size-class DMA fill the
    arena with the same rows at the same offsets, so the two modes must
    produce bit-identical physics."""
    n_s, n_t = 200, 16
    gradient = np.zeros((1, n_t, 3))
    gradient[:, 1:-1, 0] = 1e-3
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([2, 2, 2]), quiet=True,
    )

    def run():
        return simulations.simulation(
            n_s, 2e-9, gradient, 2e-4, substrate, quiet=True, seed=9,
            final_pos=True,
        )

    try:
        config.use_fused = True
        config.pallas_interpret = True
        s_c, p_c = run()
        config.fused_dma_mode = "runs"
        s_r, p_r = run()
    finally:
        config.fused_dma_mode = "contig"
        config.use_fused = None
        config.pallas_interpret = False
    npt.assert_array_equal(p_c, p_r)
    npt.assert_array_equal(s_c, s_r)


def test_passgate_bit_identical():
    """Gated re-passes (config.fused_passgate: rows + folds + reduce +
    resolve all skipped per settled 128-lane block) must be bit-identical
    to the whole-tile re-pass resolve, on a bouncy intra geometry —
    impermeable and permeable (the permeable path exercises the sliced
    ubuf/crs threefry rows in the gated resolve)."""
    n_s, n_t = 200, 16
    gradient = np.zeros((1, n_t, 3))
    gradient[:, 1:-1, 0] = 1e-3
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)

    def run(perm):
        substrate = substrates.mesh(
            vertices, faces, periodic=True, init_pos="intra",
            n_sv=np.array([2, 2, 2]), quiet=True,
            **({"perm_prob": 0.4} if perm else {}),
        )
        return simulations.simulation(
            n_s, 2e-9, gradient, 2e-4, substrate, quiet=True, seed=9,
            final_pos=True, exchange_stats=perm,
        )

    try:
        config.use_fused = True
        config.pallas_interpret = True
        base = [run(False), run(True)]
        config.fused_passgate = True
        gated = [run(False), run(True)]
    finally:
        config.fused_passgate = False
        config.use_fused = None
        config.pallas_interpret = False
    for b, g in zip(base, gated):
        for xb, xg in zip(jax.tree_util.tree_leaves(b),
                          jax.tree_util.tree_leaves(g)):
            npt.assert_array_equal(np.asarray(xb), np.asarray(xg))


def test_counting_kernel_diagnostics():
    """The counting kernel variant (config.fused_count_units) reports
    [folded units, gated block-passes, live-lane-weighted units] in
    simulations._STREAM_DIAG without perturbing the physics. Fold lane
    occupancy (live lanes per 128-wide fold) must land in (0, 1]."""
    n_s, n_t = 200, 16
    gradient = np.zeros((1, n_t, 3))
    gradient[:, 1:-1, 0] = 1e-3
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([2, 2, 2]), quiet=True,
    )

    def run():
        return simulations.simulation(
            n_s, 2e-9, gradient, 2e-4, substrate, quiet=True, seed=9,
            final_pos=True,
        )

    try:
        config.use_fused = True
        config.pallas_interpret = True
        s_base, p_base = run()
        config.fused_count_units = True
        s_cnt, p_cnt = run()
    finally:
        config.fused_count_units = False
        config.use_fused = None
        config.pallas_interpret = False
    npt.assert_array_equal(p_base, p_cnt)
    npt.assert_array_equal(s_base, s_cnt)
    units, bpasses, lanes = simulations._STREAM_DIAG
    assert units > 0 and bpasses > 0
    occupancy = lanes / units / 128
    assert 0.0 < occupancy <= 1.0


def test_blkfast_bit_identical():
    """The single-run-per-block fast path (config.fused_blkfast) must be
    bit-identical to the per-run ragged loop, on a constructed layout
    that forces BOTH fast (meta blkrun >= 0) and ragged (-2) blocks in
    the same window."""
    from disimpy_tpu.engine import fused as fz
    from disimpy_tpu.engine import pallas_fused as pf

    n_t = 16
    gradient = np.zeros((1, n_t, 3))
    gradient[:, 1:-1, 0] = 1e-3
    dt, diffusivity = 2e-4, 2e-9
    step_l = float(np.sqrt(6 * diffusivity * dt))
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)

    # Pack at a pinned cell width so the constructed layout below uses
    # the same grid the simulation will run on.
    probe = substrates.mesh(
        vertices, faces, periodic=True, n_sv=np.array([2, 2, 2]), quiet=True,
    )
    spec = fz.pack_fused(probe, 1.0 / step_l, cell_steps=2.0, n_hint=512)
    n_sv = np.array(spec.n_sv)
    assert n_sv[0] >= 2 and n_sv[2] >= 2
    sv_w = np.asarray(spec.sv_width) * step_l  # metres

    # One 512-lane tile: 256 spins in one cell -> blocks 0-1 single-run
    # (fast), 64 + 64 spins in two further cells -> block 2 two runs
    # (ragged), 128 in a fourth cell -> block 3 single-run (fast). Cell
    # ids must be ascending in flat (x, y, z) order so the epoch sort
    # keeps the groups in construction order.
    rng = np.random.RandomState(7)

    def cell_pts(c, k):
        lo = np.array(c) * sv_w
        return lo + rng.uniform(0.15, 0.85, size=(k, 3)) * sv_w

    init = np.concatenate([
        cell_pts((0, 0, 0), 256),
        cell_pts((0, 0, 1), 64),
        cell_pts((0, 1, 0) if n_sv[1] >= 2 else (0, 0, 2), 64),
        cell_pts((1, 0, 0), 128),
    ])

    # Verify the constructed epoch-0 layout really has both block kinds.
    pos_steps = jnp.asarray(init.T / step_l, jnp.float32)
    cell, start, packed, packed2, _ = fz._cell_keys(spec, pos_steps)
    order = np.argsort(np.asarray(cell), kind="stable")
    next_end = fz._run_ends(jnp.asarray(np.asarray(cell)[order]))
    _, _, _, meta, _ = pf._epoch_run_tables(
        jnp.asarray(np.asarray(packed)[order]), next_end,
        spec.resort_every,
        start_s=jnp.asarray(np.asarray(start)[order]),
    )
    blkrun = np.asarray(meta)[2 + 2 * pf.NBLK: 2 + 3 * pf.NBLK]
    assert np.any(blkrun >= 0) and np.any(blkrun == -2), blkrun

    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos=init,
        n_sv=np.array([2, 2, 2]), quiet=True,
    )

    def run():
        return simulations.simulation(
            512, diffusivity, gradient, dt, substrate, quiet=True, seed=9,
            final_pos=True,
        )

    prior_width = config.fused_cell_steps
    try:
        config.use_fused = True
        config.pallas_interpret = True
        config.fused_cell_steps = 2.0
        s_r, p_r = run()
        config.fused_blkfast = True
        s_f, p_f = run()
    finally:
        config.fused_blkfast = False
        config.fused_cell_steps = prior_width
        config.use_fused = None
        config.pallas_interpret = False
    npt.assert_array_equal(p_r, p_f)
    npt.assert_array_equal(s_r, s_f)


def test_fused_iter_exc_flagging(oracles_dir):
    n_s, n_t = 256, 12
    gradient, dt, substrate = _misst_like_setup(oracles_dir, n_s, n_t, 2)
    try:
        config.use_fused = True
        config.pallas_interpret = True
        with pytest.warns(UserWarning, match="Maximum number"):
            simulations.simulation(
                n_s, 2e-9, gradient, dt, substrate, quiet=True, max_iter=1
            )
    finally:
        config.use_fused = None
        config.pallas_interpret = False


# ---------------------------------------------------------------------------
# BLK-aligned epoch layout (config.fused_align)
# ---------------------------------------------------------------------------


def test_align_dest_layout():
    """_align_dest must place every run at an ALIGN_BLK lane boundary
    (until the reservoir is exhausted), keep dest a permutation, and put
    gap/reservoir lanes exactly in the pad slots."""
    rng = np.random.RandomState(0)
    B = fused.ALIGN_BLK
    n_real = 1024
    for D, lens in [
        (1024, [100, 3, 128, 129, 200, 50, 414]),     # ample reservoir
        (256, [100, 3, 128, 129, 200, 50, 414]),      # clamps mid-stream
        (512, [1024]),                                # one giant run
        (512, [1] * 1024),                            # all singletons
    ]:
        assert sum(lens) == n_real
        cells = np.repeat(np.arange(len(lens)), lens).astype(np.int32)
        key = np.concatenate(
            (cells, np.full(D, fused._BIGKEY, np.int32))
        )
        # Shuffle the real lanes (dest must not depend on input order
        # beyond stability); reservoir lanes stay at the tail.
        perm = rng.permutation(n_real)
        key[:n_real] = key[:n_real][perm]
        dest = np.asarray(fused._align_dest(jnp.asarray(key), n_real))
        # dest values are unique (any tie would silently shift ranks) and
        # the aligned region [0, n_real + totpad) is exactly dense (every
        # gap slot is filled by a reservoir lane).
        assert len(set(dest.tolist())) == n_real + D, "unique"
        totpad = min(int(sum((-l) % B for l in lens)), D)
        dense = np.sort(dest)[: n_real + totpad]
        npt.assert_array_equal(dense, np.arange(n_real + totpad))
        # Emulate the epoch sort: order lanes by dest, read off cells.
        order = np.argsort(dest, kind="stable")
        laid = key[order]
        # Every run's first lane must sit at a BLK boundary while
        # reservoir remains; afterwards runs may be dense (ragged).
        pads_needed = np.cumsum([(-l) % B for l in lens])
        starts = np.flatnonzero(
            np.concatenate(([True], laid[1:] != laid[:-1]))
        )
        for r, s in enumerate(starts):
            if laid[s] == fused._BIGKEY:
                continue
            run_id = laid[s]
            before = pads_needed[run_id - 1] if run_id > 0 else 0
            if before <= D:
                assert s % B == 0, (D, lens, run_id, s)
        # Real lanes keep cell order; within-gap lanes are _BIGKEY.
        real_laid = laid[laid != fused._BIGKEY]
        assert np.all(np.diff(real_laid) >= 0)


def test_align_bit_identical():
    """The BLK-aligned epoch layout (config.fused_align) is engine-side
    only: signals and positions must be bit-identical with the knob on or
    off (and with the blkfast kernel fast path it is designed to feed),
    on a ragged layout spanning multiple cells and epochs."""
    n_s, n_t = 333, 16
    gradient = np.zeros((1, n_t, 3))
    gradient[:, 1:-1, 0] = 1e-3
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([2, 2, 2]), quiet=True,
    )

    def run():
        return simulations.simulation(
            n_s, 2e-9, gradient, 2e-4, substrate, quiet=True, seed=9,
            final_pos=True,
        )

    try:
        config.use_fused = True
        config.pallas_interpret = True
        s0, p0 = run()
        config.fused_align = True
        s_a, p_a = run()
        config.fused_blkfast = True
        s_ab, p_ab = run()
    finally:
        config.fused_align = False
        config.fused_blkfast = False
        config.use_fused = None
        config.pallas_interpret = False
    npt.assert_array_equal(p0, p_a)
    npt.assert_array_equal(s0, s_a)
    npt.assert_array_equal(p0, p_ab)
    npt.assert_array_equal(s0, s_ab)


def test_align_sharded_matches_single_device():
    """Aligned + sharded: per-shard alignment must reproduce the
    single-device aligned run exactly (walker ids key the RNG; reservoir
    lanes are shard-local)."""
    n_s, n_t = 222, 8
    gradient = np.zeros((1, n_t, 3))
    gradient[:, 1:-1, 0] = 1e-3
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([2, 2, 2]), quiet=True,
    )
    n_dev = jax.device_count()
    if n_dev < 2:
        pytest.skip("needs a multi-device (virtual CPU) mesh")

    def run(devices=None):
        return simulations.simulation(
            n_s, 2e-9, gradient, 2e-4, substrate, quiet=True, seed=11,
            final_pos=True, devices=devices,
        )

    try:
        config.use_fused = True
        config.pallas_interpret = True
        config.fused_align = True
        config.fused_blkfast = True
        s1, p1 = run()
        s2, p2 = run(devices=n_dev)
    finally:
        config.fused_align = False
        config.fused_blkfast = False
        config.use_fused = None
        config.pallas_interpret = False
    npt.assert_allclose(p1, p2, rtol=0, atol=0)
    npt.assert_allclose(s1, s2, rtol=0, atol=0)


def test_pack_failure_cache_versioned(tmp_path):
    """A cached pack-search FAILURE only binds the search version that
    recorded it: newer searches retry instead of re-raising, while a
    same-version failure entry short-circuits (the expensive negative
    result stays cached)."""
    import pickle

    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=1)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, n_sv=np.array([2, 2, 2]), quiet=True
    )
    step_l = float(np.sqrt(6 * 2e-9 * 2e-4))
    cache = tmp_path / "pack.pkl"

    # Stale failure (recorded by an older search): must fall through to a
    # fresh search, which succeeds on this geometry.
    with open(cache, "wb") as f:
        pickle.dump({"failed": True}, f)
    spec = fused.pack_fused(
        substrate, 1.0 / step_l, cell_steps=2.0, n_hint=512,
        cache_path=str(cache),
    )
    assert spec.table.shape[0] > 0

    # Same-version failure: short-circuits with the cached ValueError.
    with open(cache, "wb") as f:
        pickle.dump(
            {"failed": True, "search_version": fused.SEARCH_VERSION}, f
        )
    with pytest.raises(ValueError, match="cached result"):
        fused.pack_fused(
            substrate, 1.0 / step_l, cell_steps=2.0, n_hint=512,
            cache_path=str(cache),
        )
