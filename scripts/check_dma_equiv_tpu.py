"""Real-TPU bit-equivalence check of the arena DMA modes.

The cross-tile pipelined contiguous-window DMA path only exists on real
hardware (interpret mode falls back to the synchronous fill because the
interpreter does not persist scratch across grid steps), so CPU tests
cannot cover it. This script runs the same seeded simulation under
``fused_dma_mode`` "contig" (pipelined) and "runs" (per-run size-class
DMAs, a long-validated independent fill path) and requires bit-identical
signals and final positions.

Usage: python scripts/check_dma_equiv_tpu.py  (two kernel compiles)
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from disimpy_tpu import gradients, meshes, simulations, substrates, utils
from disimpy_tpu.engine import config


def main():
    utils.enable_compilation_cache()
    n_s, n_t, n_meas = 65536, 24, 8
    vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=3)
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([12, 12, 12]), quiet=True,
    )
    bvals = np.linspace(1e8, 2e9, n_meas)
    bvecs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n_meas, 1))
    dt = 1.3e-5
    gradient, _ = gradients.pgse(1e-4, dt * n_t - 2e-4, n_t, bvals, bvecs)

    def run():
        return simulations.simulation(
            n_s, 2e-9, gradient, dt, substrate, seed=77, quiet=True,
            final_pos=True,
        )

    try:
        config.fused_dma_mode = "contig"
        s_c, p_c = run()
        config.fused_dma_mode = "runs"
        s_r, p_r = run()
    finally:
        config.fused_dma_mode = "contig"
    sig_ok = bool(np.array_equal(np.asarray(s_c), np.asarray(s_r)))
    pos_ok = bool(np.array_equal(np.asarray(p_c), np.asarray(p_r)))
    print(f"signals bit-identical: {sig_ok}")
    print(f"final positions bit-identical: {pos_ok}")
    if not (sig_ok and pos_ok):
        print(f"max |ds| = {np.abs(np.asarray(s_c) - np.asarray(s_r)).max()}")
        raise SystemExit(1)
    print("PASS")


if __name__ == "__main__":
    main()
