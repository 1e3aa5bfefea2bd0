"""Device→host transfer shim.

The axon TPU tunnel backend only reliably supports float32 device→host
copies, and *eager* (op-by-op) dispatch on non-float32 arrays raises
UNIMPLEMENTED. `to_host` therefore decomposes arrays into float32 planes with
jit-compiled casts and reassembles them on the host. On CPU (tests) it is a
plain np.asarray.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _split_complex(x):
    return x.real.astype(jnp.float32), x.imag.astype(jnp.float32)


@jax.jit
def _as_f32(x):
    return x.astype(jnp.float32)


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
        re, im = _split_complex(x)
        return np.asarray(re) + 1j * np.asarray(im)
    if dt == jnp.bool_:
        return np.asarray(_as_f32(x)) > 0.5
    if jnp.issubdtype(dt, jnp.integer):
        return np.asarray(_as_f32(x)).astype(np.dtype(dt))
    return np.asarray(_as_f32(x))


def tree_to_host(tree):
    return jax.tree_util.tree_map(to_host, tree)


@partial(jax.jit, static_argnums=1)
def _combine_complex(planes, cdtype):
    re, im = planes
    return (re + 1j * im).astype(cdtype)


def to_device_complex(x, cdtype=jnp.complex64):
    """Host complex array → device complex array via two float32/float64
    uploads + an on-device combine (eager complex creation and complex H2D
    copies are unimplemented on the axon backend)."""
    x = np.asarray(x)
    rdtype = np.float64 if cdtype == jnp.complex128 else np.float32
    re = np.ascontiguousarray(x.real, dtype=rdtype)
    im = np.ascontiguousarray(x.imag, dtype=rdtype)
    return _combine_complex((re, im), jnp.dtype(cdtype))
