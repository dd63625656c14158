"""Backend selection helper.

This container's sitecustomize registers the 'axon' TPU plugin and pins it
regardless of the JAX_PLATFORMS env var; only a pre-backend-init
``jax.config.update('jax_platforms', ...)`` overrides it.  CLIs expose
``--device cpu|tpu`` and call this before first device use.
"""

from __future__ import annotations

from typing import Optional


def resolve_device(device: Optional[str]):
    """device: None (leave default backend), 'cpu', 'tpu', or 'axon'."""
    if not device:
        return
    import jax

    name = {"tpu": "axon", "axon": "axon", "cpu": "cpu"}.get(device, device)
    try:
        jax.config.update("jax_platforms", name)
    except RuntimeError:
        # backend already initialized; too late to switch
        cur = jax.devices()[0].platform
        if cur != name:
            raise RuntimeError(
                f"backend already initialized to {cur!r}; cannot switch to {name!r}"
            )
