"""Ablate the row-form fused kernel level by level on the real TPU.

Levels (config.fused_ablate): 1 = window fill/DMA/adjust + out writes
only, 2 = + step scaffolding, 4 = + first-pass folds, 5 = + per-block
reduce, 3 = + full resolve (one pass), 0 = full multi-pass kernel.
Re-pass slices (forced second pass after the full first pass): 8 =
pass-level rows only, 9 = + per-block items + folds, 10 = + sublane
reduce, 7 = + whole-tile resolve (a full forced re-pass); see the
round-5 re-pass decomposition in README.md.

The knob is a STATIC jit argument threaded config -> run_window_fused ->
_launch: each level compiles and runs its own binary — no cache-clear
ritual (the round-3 stale-jit failure mode is structurally gone).

    python benchmarks/ablate_flip.py [levels...] > /tmp/ablate_flip.log 2>&1
"""

import sys
import time
import warnings

import numpy as np

sys.path.insert(0, ".")
import bench as bench_mod


def main():
    bench_mod.enable_compilation_cache()
    from disimpy_tpu import gradients, simulations
    from disimpy_tpu.engine import config

    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 5, 3, 0]
    n_spins, n_t, n_meas = 524288, 30, 32
    dt = 1.3e-5
    step_l = float(np.sqrt(6 * 2e-9 * dt))
    substrate, n_tris = bench_mod.build_substrate(step_l)
    print(f"substrate: {n_tris} tris, n_sv={substrate.n_sv}", flush=True)
    bvals = np.linspace(1e8, 3e9, n_meas)
    bvecs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n_meas, 1))
    gradient, g_dt = gradients.pgse(1e-3, dt * n_t - 1e-3, n_t, bvals, bvecs)

    for lv in levels:
        config.fused_ablate = lv
        try:
            t0 = time.time()
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                simulations.simulation(
                    n_spins, 2e-9, gradient, dt, substrate, seed=1,
                    quiet=True,
                )
            warm = time.time() - t0
            t0 = time.time()
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                s = simulations.simulation(
                    n_spins, 2e-9, gradient, dt, substrate, seed=2,
                    quiet=True,
                )
            el = time.time() - t0
            sig = float(np.asarray(s)[0]) / n_spins
            print(
                f"level {lv}: {el/n_t*1e3:7.2f} ms/step (sig {sig:.4f}, "
                f"warm {warm:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"level {lv}: FAILED {e!r}", flush=True)
    config.fused_ablate = 0
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
