"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that sharding logic is exercised
without TPU hardware.  The container's sitecustomize registers the tunneled
TPU ("axon") backend at interpreter start and pins jax_platforms to it, so
plain JAX_PLATFORMS=cpu in the environment is not sufficient -- we must also
update the jax config after import.  XLA_FLAGS is still read lazily at CPU
client init, so setting it here works.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # keep subprocesses off the TPU
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
