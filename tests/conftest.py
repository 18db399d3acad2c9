"""Test configuration: run on CPU with 8 virtual devices.

The suite exercises the TPU code paths (float32 engine, GSPMD sharding) on
the CPU backend: 8 virtual host devices stand in for an 8-chip mesh, and
x64 is enabled so the float64 engine mode is testable alongside the float32
default.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The environment may pre-register an accelerator plugin that overrides the
# JAX_PLATFORMS env var; the config update wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pathlib

import pytest


@pytest.fixture(scope="session")
def oracles_dir():
    return pathlib.Path(__file__).parent / "oracles"
