"""Device-mesh / sharding helpers for multi-chip simulation runs."""

from .sharding import spin_mesh, shard_simulation_arrays  # noqa: F401
