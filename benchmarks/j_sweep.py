"""Sweep the fused-engine epoch length J on the bench workload (real TPU).

J trades sort/back-permute amortization (fewer epochs) against table
provisioning (deeper dilation rows -> bigger DMA classes). With runtime
dilation-level selection the FOLD cost is nearly J-independent (each pass
folds the prefix covering its measured reach), so larger J should win
until the DMA volume or the arena window split bites.

    python benchmarks/j_sweep.py [J values...] > /tmp/jsweep.log 2>&1
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402
from disimpy_tpu import gradients, simulations  # noqa: E402
from disimpy_tpu.engine import config as engine_config  # noqa: E402
from disimpy_tpu.engine import fused  # noqa: E402


def main():
    bench.enable_compilation_cache()
    js = [int(x) for x in sys.argv[1:]] or [2, 3, 4, 5]
    n_spins, n_t, n_meas = 524288, 150, 32
    diffusivity = 2e-9
    dt = 1.3e-5
    step_l = float(np.sqrt(6 * diffusivity * dt))
    substrate, n_tris = bench.build_substrate(step_l)

    bvals = np.linspace(1e8, 3e9, n_meas)
    bvecs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n_meas, 1))
    gradient, g_dt = gradients.pgse(1e-3, dt * n_t - 1e-3, n_t, bvals, bvecs)

    prev = engine_config.fused_resort_every
    for J in js:
        engine_config.fused_resort_every = J
        try:
            spec = fused.pack_fused(
                substrate, 1.0 / step_l, resort_every=J,
                cell_steps=engine_config.fused_cell_steps,
                n_hint=float(n_spins),
            )
            packed = np.asarray(spec.cell_packed)
            mask = (1 << fused.BITS) - 1
            worst = np.mean((packed >> (fused.BITS * (spec.resort_every - 1)))
                            & mask)
            print(
                f"J={J}: packed J={spec.resort_every} n_sv={spec.n_sv} "
                f"worst-step units/cell={worst:.2f} "
                f"table={spec.table.nbytes/1e6:.0f}MB",
                flush=True,
            )
            t0 = time.time()
            simulations.simulation(
                n_spins, diffusivity, gradient, dt, substrate, seed=1,
                quiet=True,
            )
            warm = time.time() - t0
            t0 = time.time()
            s = simulations.simulation(
                n_spins, diffusivity, gradient, dt, substrate, seed=2,
                quiet=True,
            )
            el = time.time() - t0
            sig = float(np.asarray(s)[0]) / n_spins
            print(
                f"J={J}: {el/n_t*1e3:7.2f} ms/step "
                f"({n_spins*n_t/el/1e6:.1f}M sp-st/s, sig {sig:.4f}, "
                f"warm {warm:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"J={J}: FAILED {e!r}", flush=True)
        finally:
            engine_config.fused_resort_every = prev
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
