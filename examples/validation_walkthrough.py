"""Validation walkthrough: reproduce the reference's validation studies.

Mirrors disimpy's ``docs/source/validation.ipynb`` (see cells 1-11 of the
reference notebook) with the TPU-native engine:

1. Free diffusion against the analytic signal ``exp(-b D)``.
2. Restricted diffusion inside an analytic cylinder against MISST
   matrix-method signals (two PGSE timings).
3. The same cylinder built as a closed triangular mesh.
4. The diffraction experiment: for PGSE with short pulses inside a
   cylinder of radius r, the signal's first minimum falls at
   ``q = 0.61 * 2 pi / r`` (Callaghan's classic result; reference
   validation.ipynb cells 10-11).

Run ``python examples/validation_walkthrough.py`` for a quick pass
(reduced sizes, minutes on CPU) or ``--full`` for the reference's sizes
(use a TPU). Figures are written next to this script as
``validation_*.png``.
"""

import argparse
import pathlib

import numpy as np

from disimpy_tpu import gradients, simulations, substrates

HERE = pathlib.Path(__file__).parent
ORACLES = HERE.parent / "tests" / "oracles"
D = 2e-9


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def misst_protocol(small_delta_ms, bs, n_t):
    if small_delta_ms == 30:
        T, n0, lobe = 70e-3, 700, 300
    else:  # 1 ms
        T, n0, lobe = 41e-3, 410, 10
    g = np.zeros((1, n0, 3))
    g[0, 1:lobe, 0] = 1
    g[0, -lobe:-1, 0] = -1
    g = np.concatenate([g for _ in bs], axis=0)
    g, dt = gradients.interpolate_gradient(g, T / (n0 - 1), n_t)
    return gradients.set_b(g, dt, bs), dt


def free_diffusion(n_s, n_t, plt):
    bs = np.linspace(1, 3e9, 50)
    bvecs = np.tile([[1.0, 0, 0]], (len(bs), 1))
    g, dt = gradients.pgse(20e-3, 40e-3, n_t, bs, bvecs)
    s = simulations.simulation(n_s, D, g, dt, substrates.free(), quiet=True)
    fig, ax = plt.subplots()
    ax.semilogy(bs / 1e9, s / n_s, ".", label="simulated")
    ax.semilogy(bs / 1e9, np.exp(-bs * D), "-", label=r"$e^{-bD}$")
    ax.set_xlabel(r"b (ms/$\mu$m$^2$)")
    ax.set_ylabel("S / S$_0$")
    ax.legend()
    fig.savefig(HERE / "validation_free.png", dpi=120)
    err = np.abs(s / n_s - np.exp(-bs * D)).max()
    print(f"free diffusion: max |S/S0 - exp(-bD)| = {err:.4f}")
    return err


def cylinder_vs_misst(n_s, n_t, plt, mesh_too=True):
    import pickle

    bs = np.linspace(1, 3e9, 100)
    fig, axes = plt.subplots(1, 2, figsize=(9, 4), sharey=True)
    worst = 0.0
    for ax, delta in zip(axes, (30, 1)):
        g, dt = misst_protocol(delta, bs, n_t)
        misst = np.loadtxt(
            ORACLES
            / f"misst_cylinder_signal_smalldelta_{delta}ms_bigdelta_40ms_radius_5um.txt"
        )
        sub = substrates.cylinder(radius=5e-6, orientation=np.array([0, 0, 1.0]))
        s = simulations.simulation(n_s, D, g, dt, sub, quiet=True)
        ax.plot(bs / 1e9, misst, "-", label="MISST")
        ax.plot(bs / 1e9, s / n_s, ".", ms=3, label="analytic cylinder")
        worst = max(worst, np.abs(s / n_s - misst).max())
        if mesh_too:
            with open(ORACLES / "cylinder_mesh_closed.pkl", "rb") as f:
                m = pickle.load(f)
            msub = substrates.mesh(
                m["vertices"], m["faces"], True, init_pos="intra",
                n_sv=np.array([10, 10, 10]), quiet=True,
            )
            sm = simulations.simulation(n_s, D, g, dt, msub, quiet=True)
            ax.plot(bs / 1e9, sm / n_s, "x", ms=3, label="mesh cylinder")
            worst = max(worst, np.abs(sm / n_s - misst).max())
        ax.set_title(rf"$\delta$ = {delta} ms")
        ax.set_xlabel(r"b (ms/$\mu$m$^2$)")
        ax.legend()
    axes[0].set_ylabel("S / S$_0$")
    fig.tight_layout()
    fig.savefig(HERE / "validation_misst.png", dpi=120)
    print(f"cylinder vs MISST: max |diff| = {worst:.4f}")
    return worst


def diffraction(n_s, n_t, plt):
    """Signal minimum at q = 0.61 * 2 pi / r for a PGSE short-pulse
    experiment in a cylinder (reference validation.ipynb cells 10-11)."""
    radius = 10e-6
    delta, DELTA = 1e-3, 0.15  # DELTA >> r^2/D = 50 ms (long-time regime)
    q_target = 0.61 * 2 * np.pi / radius
    bs = np.linspace(0.1e9, 25e9, 96)
    bvecs = np.tile([[1.0, 0, 0]], (len(bs), 1))
    g, dt = gradients.pgse(delta, DELTA, n_t, bs, bvecs)
    qs = np.max(np.linalg.norm(gradients.calc_q(g, dt), axis=2), axis=1)
    sub = substrates.cylinder(radius=radius, orientation=np.array([0, 0, 1.0]))
    s = simulations.simulation(n_s, D, g, dt, sub, quiet=True)
    s = np.abs(s) / n_s
    # the first diffraction minimum is the deepest point in the band
    # q r / 2 pi in [0.35, 1.0] (a raw local-minimum scan is fragile
    # against Monte Carlo noise)
    x = qs * radius / (2 * np.pi)
    band = (x > 0.35) & (x < 1.0)
    i_min = np.flatnonzero(band)[np.argmin(s[band])]
    fig, ax = plt.subplots()
    ax.semilogy(x, s, ".-")
    ax.axvline(0.61, color="k", ls="--", label=r"$qr/2\pi = 0.61$")
    ax.set_xlabel(r"$q r / 2\pi$")
    ax.set_ylabel("|S| / S$_0$")
    ax.legend()
    fig.savefig(HERE / "validation_diffraction.png", dpi=120)
    rel = qs[i_min] / q_target - 1
    print(
        f"diffraction: first minimum at q = {qs[i_min]:.1f} 1/m, "
        f"0.61*2pi/r = {q_target:.1f} 1/m (rel. err {rel:+.2%})"
    )
    return abs(rel)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="reference-size runs (use a TPU)")
    args = ap.parse_args()
    plt = _plt()
    if args.full:
        n_s, n_s_diff, n_t, n_t_diff = int(1e5), int(1e6), int(1e3), int(4e3)
    else:
        n_s, n_s_diff, n_t, n_t_diff = int(2e4), int(4e4), 300, 1500
    assert free_diffusion(n_s, n_t, plt) < 0.02
    assert cylinder_vs_misst(n_s, n_t, plt) < 0.03
    assert diffraction(n_s_diff, n_t_diff, plt) < 0.06
    print("validation walkthrough passed; figures written to", HERE)


if __name__ == "__main__":
    main()
