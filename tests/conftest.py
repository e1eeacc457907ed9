import os
import sys

# Multi-device testing on CPU: 8 virtual devices (the TPU-native answer to
# "test multi-chip without a pod" — SURVEY §4). The axon TPU plugin in this
# environment force-registers itself irrespective of JAX_PLATFORMS, so we pin
# the platform through jax.config before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("COCOSNET_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the 64px train step alone takes ~4 min to
# compile on this 1-CPU host, and the suite compiles several variants —
# reruns hit the disk cache instead
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception as e:  # read-only fs / older jax: degrade to uncached
    print(f"compilation cache unavailable ({e}); compiles run uncached")

import pytest


@pytest.fixture(autouse=True)
def _reset_compute_dtype():
    """The bf16 activation policy is process-global (set by CLI entry points
    some tests exercise, e.g. serve); restore it around every test so a bf16
    test can't leak the policy into an f32 parity test."""
    from cocosnet_tpu.nn import layers as L
    prev = L.get_compute_dtype()
    yield
    L.set_compute_dtype(prev)
