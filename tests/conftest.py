"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the "fake backend" the reference lacks (SURVEY.md §4): multi-chip
sharding logic is exercised on host CPU devices so tests never need TPU
hardware.

The container's sitecustomize registers the axon TPU PJRT backend at
*interpreter startup* (gated on PALLAS_AXON_POOL_IPS) and monkeypatches
jax's backend lookup, so in-process env tweaks are too late — if we were
started under that hook, re-exec pytest once with a scrubbed environment.
"""

import os
import sys

_SENTINEL = "HMA_TPU_TESTS_REEXECED"


def pytest_configure(config):
    if os.environ.get(_SENTINEL) == "1" or not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    # Stop pytest's fd-level capture so the re-exec'd run writes to the
    # real stdout/stderr, then replace the process with a scrubbed env.
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keeps the TPU hook from registering
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
