"""Parity tests for the fused subsequence-DTW Pallas kernel.

Oracle chain (SURVEY.md §4.3): golden/spot.py numpy DP (exact by
construction) -> XLA row scan (ops/spot.py, already golden-pinned in
test_spot.py) -> Pallas kernel in interpret mode.  Witnesses are
compared EXACTLY (array_equal): the kernel's strict-less cummin
reproduces the golden tie order (diagonal > vertical > horizontal,
fresh start wins row-0 ties), not just tie-free behaviour.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dsp_tpu.golden import spot as gs
from dsp_tpu.kernels.spot_fused import subseq_dtw_fused
from dsp_tpu.ops import spot as ops_spot

RNG = np.random.default_rng(11)


def _run(streams, s_lens, bank, b_lens, squared):
    norm, start = subseq_dtw_fused(
        jnp.asarray(streams), jnp.asarray(s_lens), jnp.asarray(bank),
        jnp.asarray(b_lens), squared=squared, interpret=True)
    return np.asarray(norm), np.asarray(start)


@pytest.mark.parametrize("squared", [False, True])
def test_matches_golden(squared):
    b, k, u, t, f = 3, 4, 57, 23, 5
    streams = RNG.normal(size=(b, u, f)).astype(np.float32)
    bank = RNG.normal(size=(k, t, f)).astype(np.float32)
    s_lens = np.array([57, 40, 9], np.int32)
    b_lens = np.array([23, 17, 8, 3], np.int32)
    norm, start = _run(streams, s_lens, bank, b_lens, squared)
    for bi in range(b):
        for v in range(k):
            g_norm, g_start = gs.subseq_dtw(
                bank[v, : b_lens[v]], streams[bi, : s_lens[bi]],
                squared=squared)
            np.testing.assert_allclose(
                norm[bi, v, : s_lens[bi]], g_norm, rtol=2e-4, atol=1e-5,
                err_msg=f"norm ({bi},{v})")
            np.testing.assert_array_equal(
                start[bi, v, : s_lens[bi]], g_start,
                err_msg=f"witness ({bi},{v})")
            assert (norm[bi, v, s_lens[bi]:] >= 1e20).all()


def test_matches_xla_scan():
    """Values allclose AND witnesses equal vs the production XLA scan
    on a bigger random problem (tie-free continuous features)."""
    b, k, u, t, f = 5, 7, 130, 40, 13
    streams = RNG.normal(size=(b, u, f)).astype(np.float32)
    bank = RNG.normal(size=(k, t, f)).astype(np.float32)
    s_lens = RNG.integers(20, u + 1, size=b).astype(np.int32)
    b_lens = RNG.integers(5, t + 1, size=k).astype(np.int32)
    norm_f, start_f = _run(streams, s_lens, bank, b_lens, False)
    norm_s, start_s = ops_spot.subseq_dtw_batch(
        jnp.asarray(streams), jnp.asarray(s_lens), jnp.asarray(bank),
        jnp.asarray(b_lens), squared=False, impl="scan")
    norm_s, start_s = np.asarray(norm_s), np.asarray(start_s)
    for bi in range(b):
        sl = int(s_lens[bi])
        np.testing.assert_allclose(norm_f[bi, :, :sl], norm_s[bi, :, :sl],
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_array_equal(start_f[bi, :, :sl],
                                      start_s[bi, :, :sl])


def test_zero_cost_tie_prefers_fresh_start():
    """A constant stream equal to a constant template: every cost is 0,
    every path ties — the witness must be the FRESH start (s == j),
    golden's row-0 tie rule."""
    f = 3
    stream = np.ones((1, 12, f), np.float32)
    tmpl = np.ones((1, 4, f), np.float32)
    norm, start = _run(stream, np.array([12], np.int32),
                       tmpl, np.array([4], np.int32), False)
    g_norm, g_start = gs.subseq_dtw(tmpl[0], stream[0], squared=False)
    np.testing.assert_array_equal(start[0, 0], g_start)
    np.testing.assert_allclose(norm[0, 0], g_norm, rtol=1e-6)


def test_planted_keyword_found():
    """The witness localises a keyword planted mid-stream (mirrors
    test_spot.py's planted-span check)."""
    f = 6
    kw = RNG.normal(size=(8, f)).astype(np.float32) * 3.0
    stream = RNG.normal(size=(30, f)).astype(np.float32) * 0.05
    stream[12:20] = kw
    norm, start = _run(stream[None], np.array([30], np.int32),
                       kw[None], np.array([8], np.int32), False)
    j = int(np.argmin(norm[0, 0]))
    assert (int(start[0, 0, j]), j) == (12, 19)


def test_auto_routing_cpu_is_scan():
    """impl='auto' on the CPU test backend must take the scan path
    (interpret-mode Pallas is not a production fallback)."""
    streams = RNG.normal(size=(1, 20, 4)).astype(np.float32)
    bank = RNG.normal(size=(2, 6, 4)).astype(np.float32)
    n1 = ops_spot.subseq_dtw_batch(
        jnp.asarray(streams), jnp.asarray([20]), jnp.asarray(bank),
        jnp.asarray([6, 5]), impl="auto")
    n2 = ops_spot.subseq_dtw_batch(
        jnp.asarray(streams), jnp.asarray([20]), jnp.asarray(bank),
        jnp.asarray([6, 5]), impl="scan")
    np.testing.assert_array_equal(np.asarray(n1[0]), np.asarray(n2[0]))
    np.testing.assert_array_equal(np.asarray(n1[1]), np.asarray(n2[1]))
