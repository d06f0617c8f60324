"""Wavefront DTW Pallas kernel parity (interpret mode, SURVEY.md §4.3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsp_tpu.config import DtwConfig
from dsp_tpu import golden
from dsp_tpu.kernels import dtw_pallas as kp
from dsp_tpu.ops import dtw as jdtw


def test_skew_cost_layout():
    cost = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    s = np.asarray(kp.skew_cost(cost))
    assert s.shape == (6, 3)
    # skew[k, i] = cost[i, k-i]
    for k in range(6):
        for i in range(3):
            j = k - i
            want = cost[i, j] if 0 <= j < 4 else kp.BIG
            assert s[k, i] == want


def test_kernel_exact_vs_golden_small():
    rng = np.random.default_rng(0)
    cfg = DtwConfig(squared=True)
    a = rng.integers(-3, 4, size=(5, 6, 2)).astype(np.float32)
    b = rng.integers(-3, 4, size=(5, 7, 2)).astype(np.float32)
    la = np.array([6, 3, 1, 6, 4], dtype=np.int32)
    lb = np.array([7, 7, 1, 2, 5], dtype=np.int32)
    got = np.asarray(kp.dtw_pairs_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(la), jnp.asarray(lb),
        cfg, interpret=True))
    for p in range(5):
        want = golden.dtw_distance(a[p, :la[p]], b[p, :lb[p]], cfg)
        np.testing.assert_allclose(got[p], want, rtol=1e-6, err_msg=str(p))


def test_kernel_matches_scan_dtw_random():
    rng = np.random.default_rng(1)
    bsz, k, t, u, f = 3, 4, 25, 31, 13
    q = rng.standard_normal((bsz, t, f)).astype(np.float32)
    bank = rng.standard_normal((k, u, f)).astype(np.float32)
    ql = rng.integers(5, t + 1, size=bsz).astype(np.int32)
    bl = rng.integers(5, u + 1, size=k).astype(np.int32)
    want = np.asarray(jdtw.dtw_batch(jnp.asarray(q), jnp.asarray(ql),
                                     jnp.asarray(bank), jnp.asarray(bl)))
    got = np.asarray(kp.dtw_batch_pallas(jnp.asarray(q), jnp.asarray(ql),
                                         jnp.asarray(bank), jnp.asarray(bl),
                                         interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kernel_banded():
    rng = np.random.default_rng(2)
    cfg = DtwConfig(band_frac=0.25)
    a = rng.standard_normal((2, 30, 8)).astype(np.float32)
    b = rng.standard_normal((2, 45, 8)).astype(np.float32)
    la = np.array([30, 22], dtype=np.int32)
    lb = np.array([45, 40], dtype=np.int32)
    got = np.asarray(kp.dtw_pairs_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(la), jnp.asarray(lb),
        cfg, interpret=True))
    for p in range(2):
        want = golden.dtw_distance(a[p, :la[p]], b[p, :lb[p]], cfg)
        np.testing.assert_allclose(got[p], want, rtol=1e-5)


def test_kernel_pair_tile_padding():
    """P not a multiple of PAIR_TILE (and tiny): padding must not leak."""
    rng = np.random.default_rng(3)
    a = rng.standard_normal((3, 10, 4)).astype(np.float32)
    b = rng.standard_normal((3, 12, 4)).astype(np.float32)
    la = np.array([10, 7, 2], dtype=np.int32)
    lb = np.array([12, 3, 12], dtype=np.int32)
    noband = DtwConfig(band_frac=None)
    got = np.asarray(kp.dtw_pairs_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(la), jnp.asarray(lb),
        noband, interpret=True))
    for p in range(3):
        want = golden.dtw_distance(a[p, :la[p]], b[p, :lb[p]], noband)
        np.testing.assert_allclose(got[p], want, rtol=1e-5)


def test_fused_kernel_matches_scan():
    """Fully fused DTW kernel (interpret mode) == scan DTW, ragged shapes."""
    from dsp_tpu.kernels.dtw_fused import dtw_batch_fused
    rng = np.random.default_rng(11)
    for (B, K, T, U, F) in [(5, 3, 25, 31, 13), (3, 2, 40, 40, 8),
                            (2, 4, 9, 126, 5)]:
        q = rng.standard_normal((B, T, F)).astype(np.float32)
        bank = rng.standard_normal((K, U, F)).astype(np.float32)
        ql = rng.integers(1, T + 1, size=B).astype(np.int32)
        bl = rng.integers(1, U + 1, size=K).astype(np.int32)
        noband = DtwConfig(band_frac=None)
        want = np.asarray(jdtw.dtw_batch(jnp.asarray(q), jnp.asarray(ql),
                                         jnp.asarray(bank), jnp.asarray(bl),
                                         noband))
        got = np.asarray(dtw_batch_fused(jnp.asarray(q), jnp.asarray(ql),
                                         jnp.asarray(bank), jnp.asarray(bl),
                                         noband, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_kernel_rejects_band():
    from dsp_tpu.kernels.dtw_fused import dtw_batch_fused
    with pytest.raises(ValueError, match="unbanded"):
        dtw_batch_fused(jnp.zeros((2, 8, 3)), jnp.full(2, 8),
                        jnp.zeros((2, 8, 3)), jnp.full(2, 8),
                        DtwConfig(band_frac=0.2), interpret=True)
