"""Engine runtime configuration.

``use_pallas``: None (auto — use the Pallas sorted-run mesh query on TPU
backends when the substrate has a halo-layout grid and the engine runs in
float32), True (force, e.g. with ``pallas_interpret`` for CPU testing), or
False (always use the XLA gather-based query). Applies to the *classic*
per-bounce mesh path.

``use_fused``: None (auto — use the fused-step mesh engine on TPU backends
in float32 when no trajectory output is requested), True (force; combine
with ``pallas_interpret`` on CPU), or False (always use the classic path).

``fused_resort_every``: epoch length J of the fused engine (steps between
spin re-sorts; the packed table's dilation depth). 1..engine.fused.MAX_J.
The epoch kernel folds each step's distance-ordered chunk prefix, so a
longer epoch amortizes the sort/back-permute and the arena fill without
paying the full last-step dilation on early steps.

``fused_cell_steps``: grid cell width (in step lengths) for the fused
table, or None to let ``pack_fused`` search its width ladder. Each
128-lane fold block streams the 64-triangle units of the runs overlapping
it every bounce pass, so the best width balances units-per-cell (grows
with width) against runs-per-block (shrinks with width); see the cost
model in ``fused.pack_fused``.
"""

use_pallas = None
pallas_interpret = False
use_fused = None
fused_resort_every = 4
fused_cell_steps = None

# A/B knobs for the fused kernel. Read OUTSIDE jit by the driver and
# passed down as STATIC jit arguments (they key the compile caches), so a
# flipped knob can never silently serve a stale binary — no cache-clear
# ritual needed. ``fused_ablate``: 0 = full kernel; debug levels carve the
# kernel down (see pallas_fused._kernel). ``fused_runtime_level``: per-run
# runtime dilation-level selection (bit-identical physics, work-saving
# only).
fused_ablate = 0
fused_runtime_level = True
# Arena fill strategy: "contig" (default) fetches each window's rows —
# one contiguous HBM span, since spins are sorted by cell id and table
# rows are stored in cell order — with a SINGLE static full-arena DMA;
# "runs" issues one size-class DMA per run (scalar dispatch walk, ~13
# ms/step at 524k spins — fallback for very sparse spin occupancy where
# a contiguous window would span many times the arena).
fused_dma_mode = "contig"
# Units folded per fold-loop iteration (1, 2 or 4). Mosaic loop iterations
# cost ~0.25 us of fixed overhead; unrolling amortizes it over several
# 64-triangle unit folds. Odd tails re-fold the run's last unit (the
# min-accumulators make duplicate folds idempotent — bit-identical
# physics), so no masking is needed. Measured on the bundle (J=4, 524k
# spins): 1 -> 43.05, 2 -> 40.94, 4 -> 43.13 ms/step (mean selected
# prefix is ~2.2 units, so unroll 4 mostly re-folds the last unit).
fused_fold_unroll = 2
# Single-run-per-block fast path: a 128-lane block overlapped by exactly
# one run folds it with no per-run fori loop (meta blkrun >= 0); blocks
# overlapped by several runs take the ragged per-run fallback. Pays off
# only when most blocks are single-run (block-aligned epoch layouts);
# on ragged layouts the extra branch + meta loads measured as a net
# regression (round-4 snapshot: 5.71 -> 6.27 s on the 150-step bundle),
# so the default is off unless alignment is on.
fused_blkfast = False
# BLK-aligned epoch layout: pad every anchor-cell run to a 128-lane
# boundary with engine-side reservoir lanes (fused._align_dest) so each
# fold block is overlapped by exactly one run. Pairs with fused_blkfast
# (the kernel fast path that alignment makes fire); costs a static
# reservoir of extra lanes (fused._align_reserve) plus the gap-key
# machinery per epoch, so it pays off at coarse cell widths where the
# padding inflation is small. Static jit argument like the other knobs.
fused_align = False
# Gated re-passes: bounce passes after the first run the pass-level rows,
# folds, reduce AND the row resolve per 128-lane block under its active
# gate, so settled blocks pay nothing at all (the round-4 kernel gated
# only fold + reduce and paid the whole-tile resolve every pass). The
# round-5 ablation (benchmarks/README.md) puts the re-pass resolve at
# ~1.9 ms/step on the bundle. Bit-identical physics; static jit argument.
fused_passgate = False
# When True (single-device fused runs only), the kernel counts folded
# 64-triangle units and gated block-passes; the driver accumulates them in
# simulations._STREAM_DIAG. Costs one extra kernel variant compile.
fused_count_units = False


def _on_tpu():
    import jax

    # Gate on actual TPU platforms: the Mosaic kernels cannot compile for
    # GPU or other accelerators ("axon" is this image's remote-TPU plugin).
    return jax.default_backend() in ("tpu", "axon")


def mesh_query_backend(spec, dtype, sharded=False):
    """Resolve which nearest-hit implementation the classic path uses.

    Sharded runs always use the XLA query: the Pallas sorted-run query
    sorts the whole ensemble by grid cell, and under GSPMD that global
    ``lax.sort`` would shuffle spins across devices every bounce — a
    combination that is neither tested nor performant, so it is not
    selectable at all.
    """
    import jax.numpy as jnp

    if sharded:
        return "xla"
    halo = tuple(spec.spans) == (1, 1, 1)
    if use_pallas is False:
        return "xla"
    if use_pallas is True:
        return "pallas" if halo else "xla"
    if _on_tpu() and halo and jnp.dtype(dtype) == jnp.float32:
        return "pallas"
    return "xla"


def mesh_engine(dtype, needs_traj, sharded):
    """Resolve the mesh stepping engine: "fused" or "classic".

    The fused engine requires float32 and runs without per-step trajectory
    output; the classic path covers the rest. Sharded runs use the
    shard-mapped fused window (fused.run_window_fused_sharded).
    """
    import jax.numpy as jnp

    if needs_traj or jnp.dtype(dtype) != jnp.float32:
        return "classic"
    if use_fused is False:
        return "classic"
    if use_fused is True:
        return "fused"
    return "fused" if _on_tpu() else "classic"
