"""Validation example: free diffusion against the analytic signal.

Monte Carlo signal for free diffusion must follow S/S0 = exp(-b D).
Equivalent of the first validation in the reference's validation notebook.

Run: python examples/validation_free_diffusion.py
"""

import numpy as np

from disimpy_tpu import gradients, simulations, substrates


def main():
    n_walkers = int(1e5)
    diffusivity = 2e-9
    bvals = np.linspace(0.1e9, 3e9, 50)
    bvecs = np.tile([[1.0, 0.0, 0.0]], (50, 1))
    gradient, dt = gradients.pgse(20e-3, 40e-3, 1000, bvals, bvecs)

    signals = simulations.simulation(
        n_walkers, diffusivity, gradient, dt, substrates.free(), quiet=True
    )
    analytic = np.exp(-bvals * diffusivity)
    err = np.abs(signals / n_walkers - analytic)
    print(f"max |simulated - exp(-bD)| = {err.max():.2e}")
    assert err.max() < 0.01


if __name__ == "__main__":
    main()
