"""Pallas grid-pipeline overhead vs input-block count (round 4).

The level-20 ablation (no-op kernel body) costs ~23 us/tile — launch +
input streaming only. This microbench times no-op pallas_call launches
with the REAL kernel's input structure (11 SMEM rows + 2 params + 3 VMEM
blocks + 1 ANY table = 17 operands) against a consolidated structure
(1 stacked int32 SMEM + 1 f32 SMEM + 2 params + 1 VMEM + table = 6), at
the bench's grid size (1024 tiles), to decide whether per-block DMA issue
cost is what the floor is made of.

Usage: python benchmarks/microbench_pipeline.py [reps]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512
N = 1024 * TILE
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def time_structure(smem_rows, vmem_rows, label):
    n_smem = len(smem_rows)

    def kernel(*refs):
        out_ref = refs[-1]
        pos_ref = refs[n_smem + 2]  # first VMEM operand
        out_ref[0:1, :] = pos_ref[0:1, :]

    in_specs = [
        pl.BlockSpec((r, TILE), lambda t: (0, t), memory_space=pltpu.SMEM)
        for r in smem_rows
    ] + [
        pl.BlockSpec((1, 4), lambda t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 16), lambda t: (0, 0), memory_space=pltpu.SMEM),
    ]
    for r in vmem_rows:
        in_specs.append(
            pl.BlockSpec((r, TILE), lambda t: (0, t),
                         memory_space=pltpu.VMEM)
        )
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(N // TILE,), in_specs=in_specs,
        out_specs=pl.BlockSpec((16, TILE), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, N), jnp.float32),
    )

    smem_args = [jnp.zeros((r, N), jnp.int32) for r in smem_rows]
    params = [jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 16), jnp.float32)]
    vmem_args = [jnp.zeros((r, N), jnp.float32) for r in vmem_rows]
    table = jnp.zeros((2048, 8, 128), jnp.float32)
    args = smem_args + params + vmem_args + [table]

    @jax.jit
    def run(*args):
        def body(c, _):
            return c + call(*args)[0, 0], None

        out, _ = lax.scan(body, jnp.float32(0), None, length=REPS)
        return out

    t0 = time.time()
    float(run(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    float(run(*args))
    elapsed = time.time() - t0
    us_tile = elapsed / REPS / (N // TILE) * 1e6
    print(f"{label}: {us_tile:.2f} us/tile ({elapsed:.3f}s for {REPS} "
          f"launches; compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    # A: the real kernel's structure (11 SMEM rows, pos+dirs+ids VMEM)
    time_structure([1] * 11, [3, 16, 1], "A: 17 operands (current)")
    # B: consolidated (2 stacked SMEM arrays, one 24-row VMEM block)
    time_structure([8, 3], [24], "B: 6 operands (stacked)")
