"""Parity tests for the fused banded DTW window kernel.

Oracle chain (SURVEY.md §4.3): golden windowed-mask numpy DP (exact
semantics by construction) -> XLA banded scan (equal under coverage) ->
Pallas kernel in interpret mode.  All use the shared integer band rule
(ops/dtw.py:band_r2 == golden/dtw.py:band_r2_int).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dsp_tpu.config import DtwConfig
from dsp_tpu.golden import dtw as gdtw
from dsp_tpu.kernels.dtw_fused_banded import (
    LANE, dtw_batch_fused_banded, plan_window, _round_up)
from dsp_tpu.ops import dtw as jdtw

RNG = np.random.default_rng(7)


def _oracle(q, ql, bk, bl, cfg):
    b, k = len(ql), len(bl)
    t, u = q.shape[1], bk.shape[1]
    w, s_max, _, rb, _ = plan_window(cfg.band_frac, t, u, cfg.max_warp_scale)
    ref = np.zeros((b, k))
    for i in range(b):
        for j in range(k):
            if cfg.band_frac is None:
                ref[i, j] = gdtw.dtw_distance(q[i, :ql[i]], bk[j, :bl[j]], cfg)
            else:
                mask = gdtw.windowed_band_mask(
                    int(ql[i]), int(bl[j]), cfg.band_frac,
                    window=w, row_block=rb, s_max=s_max)
                ref[i, j] = gdtw.dtw_distance_masked(
                    q[i, :ql[i]], bk[j, :bl[j]], mask, squared=cfg.squared)
    return ref


def _run(q, ql, bk, bl, cfg):
    return np.asarray(dtw_batch_fused_banded(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(bk), jnp.asarray(bl),
        cfg, interpret=True))


def _assert_close(d, ref, rtol=2e-5):
    fin = (ref < 1e20) & (d < 1e20)
    assert ((ref >= 1e20) == (d >= 1e20)).all(), "BIG/finite mismatch"
    if fin.any():
        np.testing.assert_allclose(d[fin], ref[fin], rtol=rtol)


@pytest.mark.parametrize("squared", [False, True])
def test_banded_matches_windowed_oracle(squared):
    cfg = DtwConfig(band_frac=0.2, squared=squared)
    q = RNG.normal(size=(3, 37, 5)).astype(np.float32)
    bk = RNG.normal(size=(4, 41, 5)).astype(np.float32)
    ql = np.array([37, 20, 9], np.int32)
    bl = np.array([41, 33, 15, 7], np.int32)
    _assert_close(_run(q, ql, bk, bl, cfg), _oracle(q, ql, bk, bl, cfg))


@pytest.mark.parametrize("squared", [False, True])
def test_windowed_offsets_advance(squared):
    """U >> W so the window actually slides (including an extreme-warp
    pair whose answer cell leaves the window -> BIG on both sides)."""
    cfg = DtwConfig(band_frac=0.1, squared=squared)
    q = RNG.normal(size=(2, 120, 5)).astype(np.float32)
    bk = RNG.normal(size=(3, 300, 5)).astype(np.float32)
    ql = np.array([120, 77], np.int32)
    bl = np.array([300, 150, 222], np.int32)
    w, _, _, _, _ = plan_window(cfg.band_frac, 120, 300, cfg.max_warp_scale)
    assert w < _round_up(300, LANE), "test must exercise a sliding window"
    _assert_close(_run(q, ql, bk, bl, cfg), _oracle(q, ql, bk, bl, cfg))


def test_exact_on_integer_features():
    """Squared cost on small integer features is exactly representable;
    the kernel must match the float64 oracle bit-for-bit (after f32)."""
    cfg = DtwConfig(band_frac=0.25, squared=True)
    q = RNG.integers(-3, 4, size=(2, 33, 4)).astype(np.float32)
    bk = RNG.integers(-3, 4, size=(3, 47, 4)).astype(np.float32)
    ql = np.array([33, 21], np.int32)
    bl = np.array([47, 30, 12], np.int32)
    d = _run(q, ql, bk, bl, cfg)
    ref = _oracle(q, ql, bk, bl, cfg)
    fin = ref < 1e20
    np.testing.assert_array_equal(d[fin], ref[fin].astype(np.float32))


def test_unbanded_matches_golden():
    cfg = DtwConfig(band_frac=None)
    q = RNG.normal(size=(2, 50, 5)).astype(np.float32)
    bk = RNG.normal(size=(3, 60, 5)).astype(np.float32)
    ql = np.array([50, 31], np.int32)
    bl = np.array([60, 44, 17], np.int32)
    _assert_close(_run(q, ql, bk, bl, cfg), _oracle(q, ql, bk, bl, cfg))


def test_equals_scan_banded_under_coverage():
    """When plan_window reports the band covered, the kernel's windowed
    semantics coincide with the pure banded scan (same integer rule)."""
    cfg = DtwConfig(band_frac=0.15)
    t, u = 64, 72
    assert plan_window(cfg.band_frac, t, u)[4]
    q = RNG.normal(size=(3, t, 6)).astype(np.float32)
    bk = RNG.normal(size=(4, u, 6)).astype(np.float32)
    ql = np.array([64, 50, 40], np.int32)
    bl = np.array([72, 60, 48, 33], np.int32)
    d = _run(q, ql, bk, bl, cfg)
    ref = np.asarray(jdtw.dtw_batch(jnp.asarray(q), jnp.asarray(ql),
                                    jnp.asarray(bk), jnp.asarray(bl), cfg))
    _assert_close(d, ref)
    assert (d.argmin(1) == ref.argmin(1)).all()


def test_small_batch_adaptive_tile():
    cfg = DtwConfig(band_frac=0.2, squared=True)
    q = RNG.normal(size=(2, 24, 3)).astype(np.float32)
    bk = RNG.normal(size=(2, 30, 3)).astype(np.float32)
    ql = np.array([24, 11], np.int32)
    bl = np.array([30, 18], np.int32)
    _assert_close(_run(q, ql, bk, bl, cfg), _oracle(q, ql, bk, bl, cfg))


def test_plan_window_properties():
    # full-band fallback when the band cannot be windowed
    w, s_max, span, rb, cov = plan_window(0.9, 256, 256)
    assert w == 256 and s_max == 0 and cov
    # classical setup: half-width window, covered
    w, s_max, span, rb, cov = plan_window(0.1, 198, 198)
    assert w == 128 and cov and span <= w and s_max % 8 == 0
    # unbanded
    w, s_max, span, rb, cov = plan_window(None, 198, 198)
    assert w == 256 and s_max == 0 and cov


def test_integer_band_rule_consistency():
    """ops/dtw.py band_r2 and golden band_r2_int agree cell-for-cell."""
    for ta, tb, bf in [(37, 41, 0.2), (9, 41, 0.2), (120, 300, 0.1),
                       (2, 5, 0.5), (198, 198, 0.1)]:
        lam1, lbm1, r2 = gdtw.band_r2_int(ta, tb, bf)
        r2_jax = int(jdtw.band_r2(jnp.asarray(ta), jnp.asarray(tb), bf))
        assert r2 == r2_jax, (ta, tb, bf)


def test_staged_extraction_bit_identical():
    """_STAGED_EXTRACT replaces the per-block scalar offset chain with a
    vectorized prefix-min + masked static roll stages; distances must be
    BIT-identical to the legacy extraction (same windows selected)."""
    from dsp_tpu.kernels import dtw_fused_banded as fb

    b, k, t, u, f = 5, 7, 50, 46, 8
    q = RNG.standard_normal((b, t, f)).astype(np.float32)
    bk = RNG.standard_normal((k, u, f)).astype(np.float32)
    ql = RNG.integers(12, t + 1, size=b).astype(np.int32)
    bl = RNG.integers(12, u + 1, size=k).astype(np.int32)
    for cfg in (DtwConfig(band_frac=0.15, squared=True),
                DtwConfig(band_frac=0.15, squared=False),
                DtwConfig(band_frac=0.2, slope="itakura")):
        old = fb._STAGED_EXTRACT
        try:
            fb._STAGED_EXTRACT = False
            want = _run(q, ql, bk, bl, cfg)
            fb._STAGED_EXTRACT = True
            got = _run(q, ql, bk, bl, cfg)
        finally:
            fb._STAGED_EXTRACT = old
        np.testing.assert_array_equal(got, want)
