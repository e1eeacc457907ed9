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
