"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the container's default JAX platform
is the single-chip axon TPU tunnel; CPU is the right target for numerical unit
tests and multi-device sharding tests).
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from xframe_tpu.library.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()
