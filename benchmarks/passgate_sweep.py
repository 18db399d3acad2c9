"""Measure gated re-passes (config.fused_passgate) on real TPU.

Physics is bit-identical with the knob on or off (the gated re-pass
computes per-lane elementwise work on exactly the blocks that still have
active lanes), so the printed signal doubles as a hardware correctness
check across variants.

    python benchmarks/passgate_sweep.py 0 1 [--stream] [--nt 60] \
        > /tmp/passgate.log 2>&1

Keep the box otherwise idle (1 core; see benchmarks/README.md).
"""

import sys
import time
import zlib

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402
from disimpy_tpu import gradients, simulations  # noqa: E402
from disimpy_tpu.engine import config as engine_config  # noqa: E402


def main():
    bench.enable_compilation_cache()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    stream = "--stream" in sys.argv
    n_t = 60
    for a in sys.argv[1:]:
        if a.startswith("--nt="):
            n_t = int(a.split("=")[1])
    variants = [bool(int(a)) for a in args] or [False, True]

    n_spins, n_meas = 524288, 32
    diffusivity = 2e-9
    dt = 1.3e-5
    step_l = float(np.sqrt(6 * diffusivity * dt))
    substrate, n_tris = bench.build_substrate(step_l)
    bvals = np.linspace(1e8, 3e9, n_meas)
    bvecs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n_meas, 1))
    gradient, _ = gradients.pgse(1e-3, dt * n_t - 1e-3, n_t, bvals, bvecs)

    for pg in variants:
        tag = f"passgate={int(pg)}"
        engine_config.fused_passgate = pg
        engine_config.fused_count_units = stream
        try:
            t0 = time.time()
            s = simulations.simulation(
                n_spins, diffusivity, gradient, dt, substrate, seed=2,
                quiet=True,
            )
            warm = time.time() - t0
            if stream:
                simulations._STREAM_DIAG[:] = [0, 0, 0.0]
            t0 = time.time()
            s = simulations.simulation(
                n_spins, diffusivity, gradient, dt, substrate, seed=2,
                quiet=True,
            )
            el = time.time() - t0
            sv = np.asarray(s)
            sig = float(sv[0]) / n_spins
            digest = zlib.crc32(sv.tobytes())
            print(
                f"{tag}: {el / n_t * 1e3:7.2f} ms/step "
                f"({n_spins * n_t / el / 1e6:.1f}M sp-st/s, sig {sig:.6f}, "
                f"sig32 {digest:08x}, warm {warm:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {e!r}", flush=True)
        finally:
            engine_config.fused_passgate = False
            engine_config.fused_count_units = False


if __name__ == "__main__":
    main()
