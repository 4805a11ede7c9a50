"""Test harness configuration.

Runs the whole suite on a virtual 8-device CPU mesh so that every sharding /
collective path is exercised without TPU hardware (the JAX idiom:
``--xla_force_host_platform_device_count``).
"""
import os
import sys

# Must be set before jax initializes any backend.  NOTE: in this image a
# plugin overrides the JAX_PLATFORMS env var, so we also force it through
# jax.config below (which wins).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# float64 golden-value tests (MFCC numerics etc.) need x64 on CPU.
jax.config.update("jax_enable_x64", True)
