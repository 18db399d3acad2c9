"""Membrane exchange and T2 relaxation: physics-extension walkthrough.

Demonstrates the TPU-native extensions the reference package does not
have (its kernels track nothing per compartment,
disimpy/simulations.py:878-1013 resolves collisions but discards transit
information):

1. Exchange statistics on a permeable spherical membrane: the intra
   fraction decays from 1 toward the volume equilibrium as perm_prob
   grows, and per-walker transit counts follow the collision rate.
2. Two-compartment T2 weighting: at b = 0, the weighted signal exactly
   equals the ensemble mean of ``exp(-t_intra/T2i - t_extra/T2e)``
   implied by the tracked dwell times (the internal consistency check
   used by the test suite, tests/test_exchange.py).
3. Permeable *analytic* compartments: the same physics without a mesh
   (two-sided quadric collisions, disimpy_tpu/engine/stepping.py).

Run ``python examples/exchange_relaxation_example.py`` (a couple of
minutes on CPU). Writes ``exchange_intra_fraction.png`` next to this
script when matplotlib is available.
"""

import pathlib

import numpy as np

from disimpy_tpu import meshes, simulations, substrates

HERE = pathlib.Path(__file__).parent
D = 2e-9
RADIUS = 5e-6


def main():
    n_s, n_t, dt = 2000, 100, 2e-4
    gradient = np.zeros((1, n_t, 3))  # b = 0: isolate the tracking physics
    vertices, faces = meshes.icosphere(radius=RADIUS, subdivisions=2)

    print("== exchange statistics vs membrane permeability ==")
    perms = [0.0, 0.01, 0.05, 0.2, 0.5]
    fractions = []
    for p in perms:
        substrate = substrates.mesh(
            vertices, faces, periodic=True, init_pos="intra",
            n_sv=np.array([4, 4, 4]), quiet=True, perm_prob=p,
        )
        _, stats = simulations.simulation(
            n_s, D, gradient, dt, substrate, quiet=True, seed=1,
            exchange_stats=True,
        )
        fractions.append(float(stats["intra_fraction"].mean()))
        print(
            f"perm_prob={p:5.2f}: mean transits "
            f"{stats['crossings'].mean():6.2f}, intra fraction "
            f"{fractions[-1]:.3f}"
        )

    print("\n== two-compartment T2 weighting consistency (b = 0) ==")
    t2i, t2e = 25e-3, 150e-3
    substrate = substrates.mesh(
        vertices, faces, periodic=True, init_pos="intra",
        n_sv=np.array([4, 4, 4]), quiet=True, perm_prob=0.2,
    )
    sig, stats = simulations.simulation(
        n_s, D, gradient, dt, substrate, quiet=True, seed=1,
        relaxation=(t2i, t2e), exchange_stats=True,
    )
    k = stats["intra_steps"].astype(float)
    w = np.exp(-(dt / t2i) * k - (dt / t2e) * (n_t - k))
    print(
        f"signal {float(sig[0]):.3f} vs dwell-implied weight sum "
        f"{w.sum():.3f} (rel err {abs(float(sig[0]) - w.sum()) / w.sum():.2e})"
    )

    print("\n== permeable analytic sphere (no mesh) ==")
    leaky = substrates.sphere(RADIUS, perm_prob=0.2)
    sig, pos, stats = simulations.simulation(
        n_s, D, gradient, dt, leaky, quiet=True, seed=1,
        final_pos=True, exchange_stats=True,
    )
    outside = float((np.linalg.norm(pos, axis=1) > RADIUS).mean())
    print(
        f"mean transits {stats['crossings'].mean():.2f}, "
        f"{outside:.0%} of walkers end outside"
    )

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(5, 3.2))
        ax.plot(perms, fractions, "o-")
        ax.set_xlabel("perm_prob")
        ax.set_ylabel("mean intra fraction")
        ax.set_title(f"Membrane exchange over {n_t} steps")
        fig.tight_layout()
        out = HERE / "exchange_intra_fraction.png"
        fig.savefig(out, dpi=120)
        print(f"\nwrote {out}")
    except Exception:  # matplotlib is optional
        pass


if __name__ == "__main__":
    main()
