"""Test configuration.

Tests run on CPU with 8 fake XLA devices so the multi-device sharding
paths (SURVEY.md §4.4) are exercised without a TPU pod.  Must set the
environment before jax is first imported anywhere.

Set DSP_TPU_DEVICE_TESTS=1 to keep the real backend instead (for
tests/test_tpu_device.py on actual TPU hardware).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DSP_TPU_DEVICE_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("JAX_ENABLE_X64", "0")

    # The environment's sitecustomize pins jax to the TPU plugin before
    # this file runs; the env var alone is not enough — override via
    # jax.config.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
