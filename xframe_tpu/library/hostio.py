"""Device→host transfer shim.

The axon TPU tunnel backend only implements float32 device→host copies;
complex64/int/bool readback raises UNIMPLEMENTED. `to_host` decomposes such
arrays into float32 transfers on device (real/imag planes, float casts) and
reassembles them on the host. On CPU (tests) it is a plain np.asarray.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _device_platform(x):
    try:
        return list(x.devices())[0].platform
    except Exception:
        return "cpu"


def to_host(x):
    """numpy copy of a jax array, safe on float32-transfer-only backends."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if _device_platform(x) == "cpu":
        return np.asarray(x)
    dt = x.dtype
    if dt == jnp.float32:
        return np.asarray(x)
    if jnp.issubdtype(dt, jnp.complexfloating):
        return np.asarray(x.real.astype(jnp.float32)) \
            + 1j * np.asarray(x.imag.astype(jnp.float32))
    if dt == jnp.bool_:
        return np.asarray(x.astype(jnp.float32)) > 0.5
    if jnp.issubdtype(dt, jnp.integer):
        return np.asarray(x.astype(jnp.float32)).astype(np.dtype(dt))
    return np.asarray(x.astype(jnp.float32))


def tree_to_host(tree):
    return jax.tree_util.tree_map(to_host, tree)
