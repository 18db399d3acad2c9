"""The scan-over-time simulation core.

One compiled XLA program advances the whole ensemble through a window of
time steps with ``lax.scan``: the carry is (positions, phases, iter_exc),
the scanned inputs are the per-step phase-coefficient vectors. This replaces
the reference's n_t separate kernel launches with per-step host
synchronization (disimpy/simulations.py:1198-1216) — the single biggest
structural difference between the CUDA design and the TPU design.

Phase accrual is the MR physics: after step t each spin gains
``phi += GAMMA * dt * g(t) . r(t)`` (reference simulations.py:692-701). With
positions in step-length units and ``g_eff = GAMMA * dt * step_l * g``, the
per-step update is the matrix product ``phases += g_eff[t] @ positions``,
an (n_meas, 3) x (3, n_spins) contraction that XLA fuses into the scan body.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import rng
from .stepping import STEP_FUNCTIONS


@partial(
    jax.jit,
    static_argnames=("kind", "collect_positions", "sharded", "track"),
)
def run_window(
    kind,
    spec,
    positions,
    phases,
    iter_exc,
    g_eff,
    ts,
    key,
    epsilon,
    max_iter,
    collect_positions=False,
    sharded=False,
    track=None,
    compartments=None,
):
    """Advance the ensemble through the time steps ``ts``.

    Parameters
    ----------
    kind : str
        Substrate kind ("free", "sphere", "cylinder", "ellipsoid", "mesh");
        static.
    spec : engine.specs pytree
        Substrate geometry in step-length units.
    positions : jnp.ndarray
        (3, n_spins) positions in step-length units (substrate frame);
        components in rows so the spin axis is the TPU lane dimension.
    phases : jnp.ndarray
        (n_meas, n_spins) accumulated phases (rad).
    iter_exc : jnp.ndarray
        (n_spins,) bool: spins that have exceeded the collision-iteration
        budget so far.
    g_eff : jnp.ndarray
        (len(ts), n_meas, 3) per-step phase coefficients
        ``GAMMA * dt * step_l * g``.
    ts : jnp.ndarray
        (len(ts),) absolute time-step indices (used to derive per-step RNG
        keys, so windowed execution reproduces a single full scan).
    key : jax.random key
        Base key for the whole simulation.
    epsilon : jnp.ndarray
        Scalar surface offset after collisions (step-length units).
    max_iter : jnp.ndarray
        Scalar collision-iteration budget.
    collect_positions : bool
        If True, also return the positions after every step of the window
        (for trajectory output).
    sharded : bool
        True when the arrays are sharded over a device mesh; gates the
        mesh query off backends that are unsafe under GSPMD.
    track : None or "exchange" (static)
        "exchange" additionally carries per-spin membrane-crossing state
        through the scan; ``compartments`` must then be a tuple
        ``(crossings, parity, intra_steps)`` of ((n,) int32 cumulative
        transits, (n,) bool current compartment (True = intra), (n,) int32
        steps dwelt intra so far). The TPU-native extension behind
        ``simulation(relaxation=..., exchange_stats=...)``; the reference
        tracks nothing per-compartment.

    Returns
    -------
    (positions, phases, iter_exc), trajectory [, compartments]
        Updated state; ``trajectory`` is (len(ts), 3, n_spins) when
        ``collect_positions`` else None. With ``track="exchange"`` a third
        element returns the updated (crossings, parity, intra_steps).
    """
    step_fn = STEP_FUNCTIONS[kind]
    if kind == "mesh":
        step_fn = partial(step_fn, sharded=sharded)

    def body(carry, xs):
        if track == "exchange":
            positions, phases, iter_exc, crossings, parity, intra_steps = carry
        else:
            positions, phases, iter_exc = carry
        t, g_t = xs
        step_k = rng.step_key(key, t)
        positions, exc_t, cross_t = step_fn(
            positions, step_k, spec, epsilon, max_iter
        )
        phases = phases + lax.dot(
            g_t.astype(positions.dtype),
            positions,
            preferred_element_type=phases.dtype,
        )
        iter_exc = iter_exc | exc_t
        out = positions if collect_positions else None
        if track == "exchange":
            # Compartment parity flips on odd membrane transits; the spin
            # dwells this step in the compartment it ENDS the step in (the
            # step's transit, if any, happens at an unknown fraction of dt
            # — attributing the whole step to the final side biases dwell
            # time by at most half a step per transit).
            crossings = crossings + cross_t
            parity = parity ^ (cross_t % 2).astype(bool)
            intra_steps = intra_steps + parity.astype(jnp.int32)
            return (
                positions, phases, iter_exc, crossings, parity, intra_steps
            ), out
        return (positions, phases, iter_exc), out

    if track == "exchange":
        carry, trajectory = lax.scan(
            body, (positions, phases, iter_exc) + tuple(compartments),
            (ts, g_eff),
        )
        return carry[:3], trajectory, carry[3:]
    carry, trajectory = lax.scan(body, (positions, phases, iter_exc), (ts, g_eff))
    return carry, trajectory


@partial(jax.jit, static_argnames=("n_valid",))
def reduce_signal(phases, iter_exc, n_valid=None, weights=None):
    """Total signal per measurement: ``Re sum_spins exp(i phi)``, excluding
    iteration-budget-exceeded spins (reference simulations.py:1413-1421).

    Runs on device so the driver fetches n_meas floats instead of the full
    (n_meas, n_spins) phase matrix — host<->device bandwidth, not compute,
    dominated the round-1 driver. ``n_valid`` masks out sharding-padding
    spins (a mask, not a slice, so sharded arrays stay sharded and the
    reduction lowers to one psum). ``weights`` (n,) optionally scales each
    spin's contribution (relaxation weighting).
    """
    cos = jnp.cos(phases)
    if weights is not None:
        cos = cos * weights[None, :]
    excluded = iter_exc[None, :]
    if n_valid is not None:
        excluded = excluded | (
            jnp.arange(phases.shape[1])[None, :] >= n_valid
        )
    return jnp.sum(jnp.where(excluded, 0.0, cos), axis=1)


@jax.jit
def per_spin_signal(phases, iter_exc, weights=None):
    """Per-spin signals ``Re exp(i phi)`` with NaN for excluded spins."""
    cos = jnp.cos(phases)
    if weights is not None:
        cos = cos * weights[None, :]
    return jnp.where(iter_exc[None, :], jnp.nan, cos)
