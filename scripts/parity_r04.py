"""Full-size accuracy parity on the real TPU — round-4 kernel + extensions.

Re-proves the round-2 oracle matrix (BASELINE.md) on the shipped default
engine (now with the XLA-hoisted run tables and quantized windowing), and
extends it with the round-3 physics features at full size:

- fused-kernel exchange statistics: with b = 0 the signal must equal the
  sum of the per-walker weights implied by the reported intra dwell,
- permeable analytic compartments: escape under perm_prob > 0 plus the
  same b = 0 weight-consistency identity on the classic engine,
- uniform T2: exact global exp(-T/T2) scaling.

Writes PARITY_r04.json by default; pass an output name to re-prove the
matrix at a later HEAD (e.g. ``python scripts/parity_r04.py
PARITY_r05.json``). Takes ~30-60 min incl. compiles on the remote TPU.
The output records the kernel commit it ran at.
"""

import json
import pathlib
import pickle
import subprocess
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from disimpy_tpu import gradients, simulations, substrates  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parents[1]
ORACLES = ROOT / "tests" / "oracles"
D = 2e-9
results = {}


def record(name, value, threshold, extra=None):
    ok = bool(value < threshold)
    results[name] = {"value": float(value), "threshold": threshold, "pass": ok}
    if extra:
        results[name].update(extra)
    print(f"{name}: {value:.5f} (< {threshold}) {'PASS' if ok else 'FAIL'}",
          flush=True)


def misst_protocol(small_delta_ms, bs, n_t=int(1e3)):
    if small_delta_ms == 30:
        T, n0, lobe = 70e-3, 700, 300
    else:
        T, n0, lobe = 41e-3, 410, 10
    g = np.zeros((1, n0, 3))
    g[0, 1:lobe, 0] = 1
    g[0, -lobe:-1, 0] = -1
    g = np.concatenate([g for _ in bs], axis=0)
    g, dt = gradients.interpolate_gradient(g, T / (n0 - 1), n_t)
    return gradients.set_b(g, dt, bs), dt


def main():
    t_start = time.time()
    bs = np.linspace(1, 3e9, 100)

    # Free diffusion vs analytic (1e5 spins, 1e3 steps).
    bfree = np.linspace(1, 2e9, 100)
    g, dt = gradients.pgse(
        20e-3, 40e-3, int(1e3), bfree, np.tile([[1.0, 0, 0]], (100, 1))
    )
    s = simulations.simulation(int(1e5), D, g, dt, substrates.free(), quiet=True)
    record("free_vs_exp", np.abs(s / 1e5 - np.exp(-bfree * D)).max(), 0.01)

    # Analytic cylinder + sphere vs MISST, both timings, 1e5 spins.
    for delta in (30, 1):
        g, dt = misst_protocol(delta, bs)
        misst = np.loadtxt(
            ORACLES / f"misst_cylinder_signal_smalldelta_{delta}ms_bigdelta_40ms_radius_5um.txt"
        )
        sub = substrates.cylinder(radius=5e-6, orientation=np.array([0, 0, 1.0]))
        s = simulations.simulation(int(1e5), D, g, dt, sub, quiet=True)
        record(f"cylinder_misst_{delta}ms", np.abs(s / 1e5 - misst).max(), 0.01)
        misst = np.loadtxt(
            ORACLES / f"misst_sphere_signal_smalldelta_{delta}ms_bigdelta_40ms_radius_5um.txt"
        )
        s = simulations.simulation(int(1e5), D, g, dt, substrates.sphere(5e-6), quiet=True)
        record(f"sphere_misst_{delta}ms", np.abs(s / 1e5 - misst).max(), 0.01)

    # Mesh cylinder vs MISST: the reference's full matrix
    # {periodic} x {padding} x {n_sv}, 1e4 spins, 1e3 steps.
    with open(ORACLES / "cylinder_mesh_closed.pkl", "rb") as f:
        m = pickle.load(f)
    g, dt = misst_protocol(30, bs)
    misst = np.loadtxt(
        ORACLES / "misst_cylinder_signal_smalldelta_30ms_bigdelta_40ms_radius_5um.txt"
    )
    for periodic in (True, False):
        for pad_scale in (0.0, 1.0):
            padding = np.zeros(3) if pad_scale == 0 else np.array([2e-6] * 3)
            for n_sv in ([1, 1, 1], [1, 5, 20], [10, 10, 10]):
                sub = substrates.mesh(
                    m["vertices"], m["faces"], periodic, padding=padding,
                    init_pos="intra", n_sv=np.array(n_sv), quiet=True,
                )
                s, pos = simulations.simulation(
                    int(1e4), D, g, dt, sub, final_pos=True, quiet=True
                )
                name = (
                    f"mesh_misst_p{int(periodic)}_pad{int(pad_scale)}"
                    f"_nsv{'x'.join(map(str, n_sv))}"
                )
                record(name, np.abs(s / 1e4 - misst).max(), 0.015)
                # radial leak check (cylinder axis = z through voxel centre)
                c = np.asarray(sub.voxel_size) / 2
                r = np.linalg.norm((pos - c)[:, :2], axis=1)
                record(name + "_leak", float(r.max() / 5e-6) - 1.0, 1e-3)

    # Neuron mesh (29,688 triangles): no leaks across three step sizes.
    with open(ORACLES / "neuron-model.pkl", "rb") as f:
        nm = pickle.load(f)
    for dt_n in (1e-5, 1e-3, 1e-1):
        sub = substrates.mesh(
            nm["vertices"], nm["faces"], False, init_pos="intra",
            n_sv=np.array([20, 20, 20]), quiet=True,
        )
        g = np.zeros((1, 100, 3))
        s, pos = simulations.simulation(
            int(2e3), D, g, dt_n, sub, final_pos=True, quiet=True
        )
        inside = np.all(
            (pos >= -1e-12) & (pos <= np.asarray(sub.voxel_size) + 1e-12),
            axis=1,
        )
        record(f"neuron_leak_dt{dt_n:g}", float((~inside).sum()), 1.0)

    # --- Round-3 extensions at full size --------------------------------

    # Fused-kernel transit counting (compiled Mosaic path): b = 0 signal
    # must equal the weight sum implied by the reported intra dwell, and
    # the membrane must actually exchange.
    n_s, n_t_x = int(1e5), 200
    dt_x = 2e-4
    g0 = np.zeros((1, n_t_x, 3))
    sub = substrates.mesh(
        m["vertices"], m["faces"], True, init_pos="intra",
        n_sv=np.array([10, 10, 10]), quiet=True, perm_prob=0.2,
    )
    t2i, t2e = 25e-3, 150e-3
    sig, stats = simulations.simulation(
        n_s, D, g0, dt_x, sub, quiet=True, seed=7,
        relaxation=(t2i, t2e), exchange_stats=True,
    )
    k = stats["intra_steps"].astype(float)
    w = np.exp(-(dt_x / t2i) * k - (dt_x / t2e) * (n_t_x - k))
    record("fused_exchange_weight_consistency",
           abs(float(sig[0]) - w.sum()) / w.sum(), 1e-4,
           {"mean_crossings": float(stats["crossings"].mean())})
    record("fused_exchange_rate_nonzero",
           1.0 / max(float(stats["crossings"].mean()), 1e-9), 10.0)

    # Permeable analytic sphere (classic engine): walkers escape, and the
    # same b = 0 weight-consistency identity holds.
    sub = substrates.sphere(5e-6, perm_prob=0.3)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sig, pos, stats = simulations.simulation(
            int(1e5), D, g0, dt_x, sub, quiet=True, seed=7,
            final_pos=True, relaxation=(t2i, t2e), exchange_stats=True,
        )
    k = stats["intra_steps"].astype(float)
    w = np.exp(-(dt_x / t2i) * k - (dt_x / t2e) * (n_t_x - k))
    record("perm_sphere_weight_consistency",
           abs(float(sig[0]) - w.sum()) / w.sum(), 1e-4)
    frac_out = float((np.linalg.norm(pos, axis=1) > 5e-6).mean())
    record("perm_sphere_escape", 1.0 - frac_out, 1.0,
           {"frac_outside": frac_out})

    # Uniform T2: exact global scaling (free substrate, real waveform).
    g, dt = gradients.pgse(
        20e-3, 40e-3, 500, bfree[:10], np.tile([[1.0, 0, 0]], (10, 1))
    )
    base = simulations.simulation(int(2e4), D, g, dt, substrates.free(),
                                  quiet=True, seed=3)
    t2 = 80e-3
    weighted = simulations.simulation(int(2e4), D, g, dt, substrates.free(),
                                      quiet=True, seed=3, relaxation=t2)
    record("uniform_t2_exact",
           np.abs(weighted / base - np.exp(-500 * dt / t2)).max(), 1e-5)

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True,
            text=True, check=True,
        ).stdout.strip()
        dirty = bool(subprocess.run(
            ["git", "status", "--porcelain", "disimpy_tpu"], cwd=ROOT,
            capture_output=True, text=True, check=True,
        ).stdout.strip())
    except Exception:  # noqa: BLE001
        commit, dirty = "unknown", True
    results["_meta"] = {
        "backend": "tpu-v5e (axon)",
        "elapsed_s": round(time.time() - t_start, 1),
        "commit": commit,
        "package_dirty": dirty,
        "all_pass": all(
            v["pass"] for k, v in results.items() if not k.startswith("_")
        ),
    }
    out = sys.argv[1] if len(sys.argv) > 1 else "PARITY_r04.json"
    with open(ROOT / out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"{out} written;",
          "ALL PASS" if results["_meta"]["all_pass"] else "FAILURES PRESENT")


if __name__ == "__main__":
    main()
