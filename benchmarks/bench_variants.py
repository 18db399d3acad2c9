"""Decompose the fused-engine step time on the real TPU.

Runs the headline bench workload under controlled variants to attribute
per-step time: full physics, zero-candidate floor (no folds/DMA), single
bounce pass (max_iter=1), and a different epoch length J.

    python benchmarks/bench_variants.py > /tmp/variants.log 2>&1
"""

import dataclasses
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, ".")
import bench as bench_mod


def run_one(tag, substrate, gradient, dt, n_spins, n_t, max_iter=1000):
    from disimpy_tpu import simulations

    t0 = time.time()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        simulations.simulation(
            n_spins, 2e-9, gradient, dt, substrate, seed=1, quiet=True,
            max_iter=max_iter,
        )
    warm = time.time() - t0
    t0 = time.time()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        simulations.simulation(
            n_spins, 2e-9, gradient, dt, substrate, seed=2, quiet=True,
            max_iter=max_iter,
        )
    el = time.time() - t0
    print(
        f"{tag:34s} {el:7.2f}s = {el / n_t * 1e3:7.2f} ms/step "
        f"({n_spins * n_t / el / 1e6:7.2f} M spin-steps/s; warm {warm:.0f}s)",
        flush=True,
    )
    return el


def main():
    bench_mod.enable_compilation_cache()
    from disimpy_tpu import gradients
    from disimpy_tpu.engine import config as engine_config

    n_spins, n_t, n_meas = 524288, 30, 32
    dt = 1.3e-5
    step_l = float(np.sqrt(6 * 2e-9 * dt))
    substrate, n_tris = bench_mod.build_substrate(step_l)
    print(f"substrate: {n_tris} tris, n_sv={substrate.n_sv}", flush=True)
    bvals = np.linspace(1e8, 3e9, n_meas)
    bvecs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n_meas, 1))
    gradient, g_dt = gradients.pgse(1e-3, dt * n_t - 1e-3, n_t, bvals, bvecs)

    J0 = engine_config.fused_resort_every
    run_one(f"baseline J={J0}", substrate, gradient, g_dt, n_spins, n_t)
    run_one("single pass (max_iter=1)", substrate, gradient, g_dt, n_spins,
            n_t, max_iter=1)

    # zero-candidate floor: same table, all per-cell chunk counts zero.
    # The key mirrors simulations._prepare_substrate's driver cache key.
    from disimpy_tpu.engine import fused

    scale = 1.0 / step_l
    cache_key = (
        "fused", float(scale), engine_config.fused_resort_every,
        engine_config.fused_cell_steps, fused.quantize_n_hint(n_spins),
    )
    spec = substrate._accel_cache.get(cache_key)
    if spec is None:
        spec = fused.pack_fused(
            substrate, scale,
            resort_every=engine_config.fused_resort_every,
            cell_steps=engine_config.fused_cell_steps,
            n_hint=float(n_spins),
        )
    zero_spec = dataclasses.replace(
        spec, cell_packed=np.zeros_like(np.asarray(spec.cell_packed))
    )
    substrate._accel_cache[cache_key] = zero_spec
    run_one("zero-candidate floor", substrate, gradient, g_dt, n_spins, n_t)
    substrate._accel_cache[cache_key] = spec

    alt_J = 2 if J0 != 2 else 4
    engine_config.fused_resort_every = alt_J
    try:
        run_one(f"J={alt_J}", substrate, gradient, g_dt, n_spins, n_t)
    finally:
        engine_config.fused_resort_every = J0


if __name__ == "__main__":
    main()
