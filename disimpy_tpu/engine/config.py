"""Engine runtime configuration.

``use_pallas``: None (auto — use the Pallas sorted-run mesh kernel on TPU
backends when the substrate has a halo-layout grid and the engine runs in
float32), True (force, e.g. with ``pallas_interpret`` for CPU testing), or
False (always use the XLA gather-based query).
"""

use_pallas = None
pallas_interpret = False


def mesh_query_backend(spec, dtype):
    """Resolve which nearest-hit implementation to use."""
    import jax
    import jax.numpy as jnp

    halo = tuple(spec.spans) == (1, 1, 1)
    if use_pallas is False:
        return "xla"
    if use_pallas is True:
        return "pallas" if halo else "xla"
    # Gate on actual TPU platforms: the Mosaic kernel cannot compile for
    # GPU or other accelerators ("axon" is this image's remote-TPU plugin).
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and halo and jnp.dtype(dtype) == jnp.float32:
        return "pallas"
    return "xla"
