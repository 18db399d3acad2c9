"""Measure the BLK-aligned epoch layout (config.fused_align) on real TPU.

Each variant is (cell width, align, blkfast); every combination compiles
its own kernel/program (static knobs + table shapes key the jit caches).
Physics is bit-identical across ALL variants — the kernel RNG is keyed by
walker id and the fold prefixes are supersets of every reachable triangle
— so the printed signal doubles as a hardware correctness check.

    python benchmarks/align_sweep.py 4.2:1:1 5.5:1:1 5.5:0:0 ... \
        [--stream] [--nt 60] > /tmp/align_sweep.log 2>&1

Keep the box otherwise idle (1 core; see benchmarks/README.md).
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402
from disimpy_tpu import gradients, simulations  # noqa: E402
from disimpy_tpu.engine import config as engine_config  # noqa: E402
from disimpy_tpu.engine import fused  # noqa: E402
from disimpy_tpu.engine.pallas_fused import TILE, NBLK, UNIT  # noqa: E402


def main():
    bench.enable_compilation_cache()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    stream = "--stream" in sys.argv
    n_t = 60
    for a in sys.argv[1:]:
        if a.startswith("--nt="):
            n_t = int(a.split("=")[1])
    variants = []
    for a in args:
        w, al, bf = a.split(":")
        variants.append(
            (None if w in ("auto", "") else float(w), al == "1", bf == "1")
        )
    if not variants:
        variants = [(None, False, False), (None, True, True)]

    n_spins, n_meas = 524288, 32
    diffusivity = 2e-9
    dt = 1.3e-5
    step_l = float(np.sqrt(6 * diffusivity * dt))
    substrate, n_tris = bench.build_substrate(step_l)
    bvals = np.linspace(1e8, 3e9, n_meas)
    bvecs = np.tile(np.array([[1.0, 0.0, 0.0]]), (n_meas, 1))
    gradient, _ = gradients.pgse(1e-3, dt * n_t - 1e-3, n_t, bvals, bvecs)

    for w, al, bf in variants:
        tag = f"w={w or 'auto'} align={int(al)} blkfast={int(bf)}"
        engine_config.fused_cell_steps = w
        engine_config.fused_align = al
        engine_config.fused_blkfast = bf
        engine_config.fused_count_units = stream
        try:
            spec = fused.pack_fused(
                substrate, 1.0 / step_l,
                resort_every=engine_config.fused_resort_every,
                cell_steps=w, n_hint=float(n_spins),
            )
            lam = n_spins / float(np.prod(spec.n_sv))
            n_pad = -(-n_spins // TILE) * TILE
            res = fused._align_reserve(n_pad, spec.n_sv, TILE) if al else 0
            print(
                f"{tag}: n_sv={spec.n_sv} spins/cell={lam:.1f} "
                f"reserve={res} (+{res / n_pad * 100:.1f}%)",
                flush=True,
            )
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
            sig = float(np.asarray(s)[0]) / n_spins
            line = (
                f"{tag}: {el / n_t * 1e3:7.2f} ms/step "
                f"({n_spins * n_t / el / 1e6:.1f}M sp-st/s, sig {sig:.6f}, "
                f"warm {warm:.0f}s)"
            )
            if stream:
                units, bp, lanes = simulations._STREAM_DIAG
                n_tiles = (n_pad + res) // TILE
                line += (
                    f" units/orig-tile-step="
                    f"{units / (n_spins / TILE * n_t):.1f}"
                    f" gated-bp/step={bp / (n_tiles * NBLK * n_t):.2f}"
                    f" tris/spin-step={units * UNIT / (n_spins * n_t):.1f}"
                    f" fold-occupancy={lanes / max(units, 1) / 128:.3f}"
                )
            print(line, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {e!r}", flush=True)
        finally:
            engine_config.fused_cell_steps = None
            engine_config.fused_align = False
            engine_config.fused_blkfast = False
            engine_config.fused_count_units = False


if __name__ == "__main__":
    main()
