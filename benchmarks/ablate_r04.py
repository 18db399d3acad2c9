"""Round-4 kernel decomposition on the real TPU (contig-DMA kernel).

Times the bundle workload (bench.py geometry, 524k spins) at a series of
static ablation levels threaded through ``config.fused_ablate`` (cache-safe
static jit arguments since round 4 — no cache-clear ritual):

  11  window DMAs only (no step loop)          -> launch + arena-fill floor
  13  + per-step gating (no writes)
  1   + per-step output writes
  2   + step scaffolding (dirs, state init)
  4   + first-pass folds (no reduce/resolve)
  5   + first-pass reduce (no resolve)
  3   + first-pass resolve (= full first pass)
  7   two forced passes (no while-loop)
  0   full kernel (data-dependent re-passes)

Each level is a separate kernel compile (~2-4 min remote). Run levels
selectively: ``python benchmarks/ablate_r04.py 11 2 3 0``. One line of
JSON per level goes to stdout; keep the box otherwise idle (1 core —
concurrent work inflates every number, see benchmarks/README.md round-3
lesson).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402  (repo-root bench.py: shared workload builder)
from disimpy_tpu import gradients, simulations  # noqa: E402
from disimpy_tpu.engine import config as engine_config  # noqa: E402


def main(levels, n_spins=524288, n_t=60, n_meas=32):
    bench.enable_compilation_cache()
    diffusivity = 2e-9
    dt = 1.3e-5
    step_l = float(np.sqrt(6 * diffusivity * dt))
    substrate, n_tris = bench.build_substrate(step_l)
    bvals = np.linspace(1e8, 3e9, n_meas)
    bvecs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n_meas, 1))
    gradient, _ = gradients.pgse(1e-3, dt * n_t - 1e-3, n_t, bvals, bvecs)

    for lvl in levels:
        engine_config.fused_ablate = lvl
        try:
            t0 = time.time()
            simulations.simulation(
                n_spins, diffusivity, gradient, dt, substrate, seed=1,
                quiet=True,
            )
            warm = time.time() - t0
            t0 = time.time()
            simulations.simulation(
                n_spins, diffusivity, gradient, dt, substrate, seed=2,
                quiet=True,
            )
            elapsed = time.time() - t0
        finally:
            engine_config.fused_ablate = 0
        print(
            json.dumps(
                {
                    "level": lvl,
                    "ms_per_step": 1e3 * elapsed / n_t,
                    "warm_s": warm,
                    "n_spins": n_spins,
                    "n_t": n_t,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [11, 2, 3, 0])
