"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Mesh/sharding tests use the virtual CPU devices
(``--xla_force_host_platform_device_count``); float64 verification (MMS)
requires the CPU backend since TPUs have no native f64.

The surrounding environment pins ``JAX_PLATFORMS=axon`` globally and injects
an axon-TPU sitecustomize via PYTHONPATH that contacts a tunnel relay from
every python process (and can hang all jax computes if the relay is wedged).
``pytest_configure`` therefore re-executes pytest once with a cleaned
environment so tests always run on the local CPU backend.
"""

import os
import subprocess
import sys

_NEEDS_REEXEC = (
    "axon" in os.environ.get("PYTHONPATH", "")
    and os.environ.get("_FDTD_TESTS_REEXEC") != "1"
)

if not _NEEDS_REEXEC:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_enable_x64", True)
    # Persistent compilation cache: the engine tests trace/compile large
    # scans; caching makes repeated pytest runs fast.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["_FDTD_TESTS_REEXEC"] = "1"
    ret = subprocess.run([sys.executable, "-m", "pytest"] + sys.argv[1:], env=env)
    os._exit(ret.returncode)
