"""Sweep fused-table cell widths on the bench workload (real TPU).

Calibrates pack_fused's cost model against measured step times: each
width builds its own table (disk-cached), traces its own kernel (table
shapes differ, so there is no stale-jit hazard — unlike the _DEBUG_ABLATE
module-global knob, see CLAUDE.md), and times the same simulation.

    python benchmarks/width_sweep.py [widths...] > /tmp/wsweep.log 2>&1
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
    widths = [float(w) for w in sys.argv[1:]] or [None, 4.2, 6.0, 9.0]
    n_spins, n_t, n_meas = 524288, 150, 32
    diffusivity = 2e-9
    dt = 1.3e-5
    step_l = float(np.sqrt(6 * diffusivity * dt))
    substrate, n_tris = bench.build_substrate(step_l)

    bvals = np.linspace(1e8, 3e9, n_meas)
    bvecs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n_meas, 1))
    gradient, g_dt = gradients.pgse(1e-3, dt * n_t - 1e-3, n_t, bvals, bvecs)

    for w in widths:
        engine_config.fused_cell_steps = w
        try:
            # Pack stats for the cost-model calibration.
            spec = fused.pack_fused(
                substrate, 1.0 / step_l,
                resort_every=engine_config.fused_resort_every,
                cell_steps=w, n_hint=float(n_spins),
            )
            J = spec.resort_every
            packed = np.asarray(spec.cell_packed)
            curve = np.mean([
                np.mean((packed >> (fused.BITS * s)) & ((1 << fused.BITS) - 1))
                for s in range(J)
            ])
            lam = n_spins / float(np.prod(spec.n_sv))
            print(
                f"width={w}: n_sv={spec.n_sv} J={J} units/cell={curve:.2f} "
                f"spins/cell={lam:.1f} table={spec.table.nbytes/1e6:.0f}MB",
                flush=True,
            )

            t0 = time.time()
            s = simulations.simulation(
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
                f"width={w}: {el/n_t*1e3:7.2f} ms/step "
                f"({n_spins*n_t/el/1e6:.1f}M sp-st/s, sig {sig:.4f}, "
                f"warm {warm:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"width={w}: FAILED {e!r}", flush=True)
        finally:
            engine_config.fused_cell_steps = None
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
