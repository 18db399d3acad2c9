"""Config-knob A/B driver for the bundle workload (round 4).

Runs bench.py's workload with engine-config overrides taken from argv,
printing ms/step. Every distinct knob combination is its own kernel
compile (static jit args); run combinations one at a time on an
otherwise-idle box.

Usage:
  python benchmarks/sweep_r04.py [--fold-unroll N] [--cell-steps W]
      [--resort-every J] [--dma-mode contig|runs] [--n-t N]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402
from disimpy_tpu import gradients, simulations  # noqa: E402
from disimpy_tpu.engine import config as engine_config  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold-unroll", type=int, default=None)
    ap.add_argument("--cell-steps", type=float, default=None)
    ap.add_argument("--resort-every", type=int, default=None)
    ap.add_argument("--dma-mode", default=None)
    ap.add_argument("--runtime-level", type=int, default=None,
                    help="0 disables runtime dilation-level selection")
    ap.add_argument("--n-t", type=int, default=60)
    ap.add_argument("--n-spins", type=int, default=524288)
    args = ap.parse_args()

    bench.enable_compilation_cache()
    if args.fold_unroll is not None:
        engine_config.fused_fold_unroll = args.fold_unroll
    if args.cell_steps is not None:
        engine_config.fused_cell_steps = args.cell_steps
    if args.resort_every is not None:
        engine_config.fused_resort_every = args.resort_every
    if args.dma_mode is not None:
        engine_config.fused_dma_mode = args.dma_mode
    if args.runtime_level is not None:
        engine_config.fused_runtime_level = bool(args.runtime_level)

    diffusivity = 2e-9
    dt = 1.3e-5
    step_l = float(np.sqrt(6 * diffusivity * dt))
    substrate, _ = bench.build_substrate(step_l)
    n_meas = 32
    bvals = np.linspace(1e8, 3e9, n_meas)
    bvecs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n_meas, 1))
    gradient, _ = gradients.pgse(
        1e-3, dt * args.n_t - 1e-3, args.n_t, bvals, bvecs
    )

    t0 = time.time()
    simulations.simulation(
        args.n_spins, diffusivity, gradient, dt, substrate, seed=1,
        quiet=True,
    )
    warm = time.time() - t0
    t0 = time.time()
    simulations.simulation(
        args.n_spins, diffusivity, gradient, dt, substrate, seed=2,
        quiet=True,
    )
    elapsed = time.time() - t0
    knobs = {
        k: v
        for k, v in vars(args).items()
        if v is not None and k not in ("n_t", "n_spins")
    }
    print(
        f"{knobs}: {1e3 * elapsed / args.n_t:.2f} ms/step "
        f"({args.n_spins} spins x {args.n_t} steps; warm {warm:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
