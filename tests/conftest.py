"""Test harness: force an 8-device virtual CPU mesh and enable x64.

Multi-device sharding correctness is validated without TPU pods by splitting
the host CPU into 8 XLA devices (SURVEY.md section 4d).  x64 is enabled so the
float64 parity path (the reference's -DREAL64 solver precision) is testable.

NOTE: this image's ``sitecustomize`` imports jax at interpreter startup (to
register a tunneled TPU PJRT plugin), so mutating ``JAX_PLATFORMS`` via
``os.environ`` here is too late — ``jax.config.update`` is required to force
the CPU backend; otherwise every test op round-trips through the TPU tunnel.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
