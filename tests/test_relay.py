"""Relay compile hardening (utils/relay.py; ROADMAP #12)."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from dsp_tpu.utils.relay import (CompileTimeout, run_with_deadline,
                                 warm_compile)


def _double(x):
    return x * 2.0


def _stall(x):
    time.sleep(120.0)          # trace-time hang = stalled relay stand-in
    return x


def _boom(x):
    raise ValueError("trace error")


def _backend_name():
    import jax

    return jax.default_backend()


def _echo_shape(x):
    return tuple(np.asarray(x).shape)


def test_warm_compile_success():
    assert warm_compile(_double, (jnp.zeros((4,)),), timeout_s=120.0,
                        retries=0) is True


def test_warm_compile_timeout_kills_and_raises():
    t0 = time.perf_counter()
    with pytest.raises(CompileTimeout):
        warm_compile(_stall, (jnp.zeros((4,)),), timeout_s=3.0, retries=1)
    # 2 attempts x ~3 s deadline + spawn overhead, NOT the 120 s sleep
    assert time.perf_counter() - t0 < 60.0


def test_warm_compile_child_error_returns_false():
    assert warm_compile(_boom, (jnp.zeros((4,)),), timeout_s=120.0,
                        retries=0) is False


def test_child_inherits_parent_platform():
    """The child must run on the PARENT's jax platform (cpu under the
    test mesh), not whatever the fresh interpreter's sitecustomize pins.
    Regression: during a relay outage a CPU-mesh test's spawn child
    initialized the relay TPU plugin and hung on the dead tunnel."""
    import jax

    assert run_with_deadline(_backend_name, (),
                             timeout_s=120.0, retries=0) \
        == jax.default_backend()


def test_large_payload_does_not_block_parent():
    """Megabyte-scale work orders travel via temp file, never through the
    spawn pipe — a child dying at startup must not deadlock the parent
    in p.start() (the stall would sit BEFORE the deadline poll)."""
    x = np.zeros(2_000_000, np.float32)          # ~8 MB >> pipe buffer
    assert run_with_deadline(_echo_shape, (x,),
                             timeout_s=120.0, retries=0) == (2_000_000,)


def test_warm_compile_module_spec_warms_jitted_entry():
    """'module:attr' spec: the child resolves and lowers the already-
    jitted entry point, so the parent's call is the identical program."""
    from dsp_tpu.config import PipelineConfig
    from dsp_tpu.ops import frontend as fe

    cfg = PipelineConfig()
    mats = fe.make_matrices(cfg.frontend)
    x = jnp.zeros((2, cfg.max_samples), jnp.float32)
    n = jnp.full((2,), cfg.max_samples, jnp.int32)
    ok = warm_compile("dsp_tpu.pipeline:extract_features", (x, n, mats),
                      kwargs={"cfg": cfg}, timeout_s=240.0, retries=0)
    assert ok is True
