"""Generate the tutorial and validation notebooks (docs/notebooks/*.ipynb).

The reference ships executable Sphinx notebooks
(/root/reference/docs/source/tutorial.ipynb, validation.ipynb); this repo
documents the same material as markdown (docs/tutorial.md) and as runnable
scripts (examples/validation_walkthrough.py). This script emits the same
content in notebook form so reference users keep the form factor they know:

    python docs/make_notebooks.py   # writes docs/notebooks/*.ipynb

The committed notebooks carry executed outputs (plots included), matching
the reference's baked form. To refresh them after regenerating, run every
cell on CPU (minutes at the default reduced sizes):

    PYTHONPATH=. JAX_PLATFORMS=cpu jupyter nbconvert --to notebook \
        --execute --inplace docs/notebooks/*.ipynb

or at the reference's full sizes by flipping FULL = True in the first code
cell (use a TPU). NOTE: regenerating overwrites the baked outputs —
re-execute before committing.
"""

import pathlib

import nbformat as nbf

HERE = pathlib.Path(__file__).parent
OUT = HERE / "notebooks"


def _nb(cells):
    nb = nbf.v4.new_notebook()
    nb.cells = [
        nbf.v4.new_markdown_cell(src) if kind == "md"
        else nbf.v4.new_code_cell(src)
        for kind, src in cells
    ]
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    return nb


TUTORIAL = [
    ("md", """\
# disimpy_tpu tutorial

`disimpy_tpu` generates simulated diffusion-weighted MR signals with
massively parallel Monte Carlo random-walk simulations, re-designed for
TPUs with JAX/XLA/Pallas. The public API mirrors
[Disimpy](https://github.com/kerkelae/disimpy) (reference
`docs/source/tutorial.ipynb`): if you have used Disimpy, everything is
where you expect it; runs execute on a TPU when one is attached and fall
back to CPU otherwise.

This notebook walks the same path as the reference tutorial: build a
gradient waveform, define substrates, run simulations, and look at
trajectories."""),
    ("code", """\
import numpy as np
import matplotlib.pyplot as plt

from disimpy_tpu import gradients, simulations, substrates, utils

FULL = False  # True = reference sizes (use a TPU)
n_walkers = int(1e5) if FULL else int(2e4)
n_t = int(1e3) if FULL else 300
diffusivity = 2e-9  # m^2/s"""),
    ("md", """\
## Gradient waveforms

A gradient array has shape `(n_measurements, n_timepoints, 3)` in SI
units (T/m). `gradients.pgse` synthesizes a classic Stejskal–Tanner
pulsed-gradient spin-echo waveform for a set of b-values and directions;
`calc_b`, `set_b`, `interpolate_gradient`, `rotate_gradient`, and
`load_camino_scheme_file` cover the rest of the toolkit."""),
    ("code", """\
bvals = np.linspace(1, 3e9, 20)  # s/m^2
bvecs = np.tile([[1.0, 0.0, 0.0]], (len(bvals), 1))
gradient, dt = gradients.pgse(
    delta=20e-3, DELTA=40e-3, n_t=n_t, bvals=bvals, bvecs=bvecs
)
print(gradient.shape, dt)
plt.plot(np.arange(n_t) * dt * 1e3, gradient[-1, :, 0] * 1e3)
plt.xlabel("time (ms)"); plt.ylabel("g_x (mT/m)");"""),
    ("md", """\
## Free diffusion

`substrates.free()` defines unrestricted diffusion; the simulated signal
must follow `S/S0 = exp(-b D)`."""),
    ("code", """\
substrate = substrates.free()
signals = simulations.simulation(
    n_walkers, diffusivity, gradient, dt, substrate, quiet=True
)
plt.semilogy(bvals / 1e9, signals / n_walkers, ".", label="simulated")
plt.semilogy(bvals / 1e9, np.exp(-bvals * diffusivity), label="$e^{-bD}$")
plt.xlabel("b (ms/\\u03bcm$^2$)"); plt.ylabel("S/S$_0$"); plt.legend();"""),
    ("md", """\
## Restricted diffusion: analytic substrates

Spheres, infinite cylinders, and ellipsoids are collision-resolved
analytically. Substrate factories validate their inputs exactly like the
reference (`radius` a positive float, orientations normalized, rotation
matrices checked)."""),
    ("code", """\
cyl = substrates.cylinder(radius=5e-6, orientation=np.array([0., 0., 1.]))
s_cyl = simulations.simulation(
    n_walkers, diffusivity, gradient, dt, cyl, quiet=True
)
plt.semilogy(bvals / 1e9, s_cyl / n_walkers, ".-")
plt.xlabel("b (ms/\\u03bcm$^2$)"); plt.ylabel("S/S$_0$");
plt.title("restricted, gradient \\u22a5 cylinder axis");"""),
    ("md", """\
## Triangular-mesh substrates

Arbitrary geometries are triangular meshes. `substrates.mesh` shifts the
mesh into its bounding voxel, optionally makes the walk periodic, seeds
walkers `"uniform"`/`"intra"`/`"extra"` (ray-parity classification), and
builds the acceleration grid. `perm_prob` makes membranes permeable;
`relaxation=` adds T2 weighting; `exchange_stats=True` reports
per-walker membrane transits and intra dwell."""),
    ("code", """\
from disimpy_tpu import meshes

vertices, faces = meshes.icosphere(radius=5e-6, subdivisions=3)
mesh_sub = substrates.mesh(
    vertices, faces, periodic=True, init_pos="intra", quiet=True
)
s_mesh = simulations.simulation(
    n_walkers, diffusivity, gradient, dt, mesh_sub, quiet=True
)
plt.semilogy(bvals / 1e9, s_mesh / n_walkers, ".-")
plt.xlabel("b (ms/\\u03bcm$^2$)"); plt.ylabel("S/S$_0$");
plt.title("icosphere mesh, intra-axonal walkers");"""),
    ("md", """\
## Trajectories

Pass `traj=<path>` to record every walker position at every time step
(ASCII, one line per step — the reference's format; there is also
Camino-format export via `utils.save_camino_traj`). Keep the sizes tiny:
the file grows as `n_t * n_walkers * 3` floats."""),
    ("code", """\
traj_file = "example_traj.txt"
_ = simulations.simulation(
    50, diffusivity, gradient[:1], dt, mesh_sub, traj=traj_file, quiet=True
)
utils.show_traj(traj_file)"""),
    ("md", """\
## Noise and final positions

`add_noise_to_data` adds Rician noise; `final_pos=True` returns final
walker positions, which can seed a follow-up run via `init_pos` (a manual
checkpoint, exactly like the reference). See `docs/sharding.md` for
multi-chip execution (`devices=`) and `docs/performance.md` for the
TPU engine's tuning notes."""),
    ("code", """\
noisy = simulations.add_noise_to_data(signals, sigma=20, seed=1)
plt.plot(bvals / 1e9, signals / n_walkers, label="clean")
plt.plot(bvals / 1e9, noisy / n_walkers, ".", label="Rician noise")
plt.xlabel("b (ms/\\u03bcm$^2$)"); plt.ylabel("S/S$_0$"); plt.legend();"""),
]


VALIDATION = [
    ("md", """\
# Validation

Reproduces the reference's validation studies
(`docs/source/validation.ipynb` cells 1-11) with the TPU-native engine:

1. free diffusion against `exp(-bD)`;
2. restricted diffusion in an analytic cylinder against MISST
   matrix-method signals (two PGSE timings);
3. the same cylinder as a closed triangular mesh;
4. the diffraction experiment — the PGSE signal minimum at
   `q = 0.61 * 2π / r` (Callaghan).

The script form of this notebook (same code, committed figures) is
`examples/validation_walkthrough.py`."""),
    ("code", """\
import pathlib
import pickle

import numpy as np
import matplotlib.pyplot as plt

from disimpy_tpu import gradients, simulations, substrates

ORACLES = pathlib.Path("..") / ".." / "tests" / "oracles"
D = 2e-9
FULL = False  # True = reference sizes (use a TPU)
n_s = int(1e5) if FULL else int(2e4)
n_t = int(1e3) if FULL else 300"""),
    ("md", "## 1. Free diffusion vs `exp(-bD)`"),
    ("code", """\
bs = np.linspace(1, 3e9, 50)
bvecs = np.tile([[1.0, 0, 0]], (len(bs), 1))
g, dt = gradients.pgse(20e-3, 40e-3, n_t, bs, bvecs)
s = simulations.simulation(n_s, D, g, dt, substrates.free(), quiet=True)
plt.semilogy(bs / 1e9, s / n_s, ".", label="simulated")
plt.semilogy(bs / 1e9, np.exp(-bs * D), label="$e^{-bD}$")
plt.xlabel("b (ms/\\u03bcm$^2$)"); plt.ylabel("S/S$_0$"); plt.legend()
print("max error:", np.abs(s / n_s - np.exp(-bs * D)).max())"""),
    ("md", """\
## 2-3. Cylinder vs MISST (analytic and mesh)

The MISST matrix-method signals are vendored under `tests/oracles/`
(the reference's own fixtures). Both PGSE timings
(δ = 30 ms and δ = 1 ms, Δ = 40 ms, r = 5 μm) must
match to ~1%."""),
    ("code", """\
def misst_protocol(small_delta_ms, bs, n_t):
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

bs = np.linspace(1, 3e9, 100)
fig, axes = plt.subplots(1, 2, figsize=(9, 4), sharey=True)
for ax, delta in zip(axes, (30, 1)):
    g, dt = misst_protocol(delta, bs, n_t)
    misst = np.loadtxt(
        ORACLES / f"misst_cylinder_signal_smalldelta_{delta}ms"
                  f"_bigdelta_40ms_radius_5um.txt"
    )
    sub = substrates.cylinder(5e-6, np.array([0, 0, 1.0]))
    s = simulations.simulation(n_s, D, g, dt, sub, quiet=True)
    with open(ORACLES / "cylinder_mesh_closed.pkl", "rb") as f:
        m = pickle.load(f)
    msub = substrates.mesh(
        m["vertices"], m["faces"], True, init_pos="intra",
        n_sv=np.array([10, 10, 10]), quiet=True,
    )
    sm = simulations.simulation(n_s, D, g, dt, msub, quiet=True)
    ax.plot(bs / 1e9, misst, "-", label="MISST")
    ax.plot(bs / 1e9, s / n_s, ".", ms=3, label="analytic")
    ax.plot(bs / 1e9, sm / n_s, "x", ms=3, label="mesh")
    ax.set_title(f"$\\\\delta$ = {delta} ms")
    ax.set_xlabel("b (ms/\\u03bcm$^2$)")
    ax.legend()
    print(delta, "ms: analytic err", np.abs(s / n_s - misst).max(),
          "mesh err", np.abs(sm / n_s - misst).max())
axes[0].set_ylabel("S/S$_0$");"""),
    ("md", """\
## 4. Diffraction minimum

Short-pulse PGSE in a cylinder of radius r: the first signal minimum
falls at `q r / 2π = 0.61` in the long-time regime."""),
    ("code", """\
radius = 10e-6
n_s_d = int(1e6) if FULL else int(4e4)
n_t_d = int(4e3) if FULL else 1500
bs_d = np.linspace(0.1e9, 25e9, 96)
bvecs_d = np.tile([[1.0, 0, 0]], (len(bs_d), 1))
g, dt = gradients.pgse(1e-3, 0.15, n_t_d, bs_d, bvecs_d)
qs = np.max(np.linalg.norm(gradients.calc_q(g, dt), axis=2), axis=1)
sub = substrates.cylinder(radius, np.array([0, 0, 1.0]))
s = np.abs(simulations.simulation(n_s_d, D, g, dt, sub, quiet=True)) / n_s_d
x = qs * radius / (2 * np.pi)
band = (x > 0.35) & (x < 1.0)
i_min = np.flatnonzero(band)[np.argmin(s[band])]
plt.semilogy(x, s, ".-")
plt.axvline(0.61, color="k", ls="--", label="$qr/2\\\\pi = 0.61$")
plt.xlabel("$q r / 2\\\\pi$"); plt.ylabel("|S|/S$_0$"); plt.legend()
print(f"first minimum at qr/2pi = {x[i_min]:.3f} (expect 0.61)")"""),
]


def main():
    OUT.mkdir(exist_ok=True)
    for name, cells in (("tutorial", TUTORIAL), ("validation", VALIDATION)):
        path = OUT / f"{name}.ipynb"
        nbf.write(_nb(cells), str(path))
        print("wrote", path)


if __name__ == "__main__":
    main()
