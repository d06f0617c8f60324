"""Real-TPU checks (skipped on the CPU CI mesh; run on a TPU host with
`JAX_PLATFORMS= python -m pytest tests/test_tpu_device.py`).

Covers the round-1 review items that only manifest on real hardware:
 * bench precision: the DEFAULT-precision (bf16 MXU) pipeline must pick
   the same labels as HIGHEST on the synthetic corpus — this is the
   configuration the headline bench ships;
 * the fused banded kernel must match the scan on-device (its GEMM runs
   at forced-HIGHEST; bf16 there flipped 50% of argmins — docs/PERF.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":
    pytest.skip("real-TPU-only checks", allow_module_level=True)

from dsp_tpu import pipeline as pl
from dsp_tpu.config import DtwConfig, PipelineConfig
from dsp_tpu.io.dataset import DIGITS, synth_word
from dsp_tpu.ops import frontend as fe


def _problem(n_query=64, per_word=3):
    cfg = PipelineConfig()
    mats = fe.make_matrices(cfg.frontend)
    bank_sigs = np.stack([synth_word(lab, i, max_samples=cfg.max_samples)
                          for lab in DIGITS for i in range(per_word)])
    ids = np.repeat(np.arange(len(DIGITS), dtype=np.int32), per_word)
    q_sigs = np.stack([synth_word(DIGITS[i % 10], 500 + i,
                                  max_samples=cfg.max_samples)
                       for i in range(n_query)])
    ns = np.full(len(bank_sigs), cfg.max_samples, np.int32)
    qn = np.full(n_query, cfg.max_samples, np.int32)
    return cfg, mats, (jnp.asarray(q_sigs), jnp.asarray(qn),
                       jnp.asarray(bank_sigs), jnp.asarray(ns),
                       jnp.asarray(ids))


def test_default_precision_argmin_parity():
    """DEFAULT (bf16 MXU front-end) vs HIGHEST: same labels end-to-end."""
    cfg, mats, (q, qn, b, bn, ids) = _problem()
    bank_hi = pl.extract_features(b, bn, mats, cfg, jax.lax.Precision.HIGHEST)
    bank_lo = pl.extract_features(b, bn, mats, cfg, jax.lax.Precision.DEFAULT)
    lab_hi, _ = pl.recognize_batch(q, qn, mats, bank_hi, ids, cfg,
                                   jax.lax.Precision.HIGHEST)
    lab_lo, _ = pl.recognize_batch(q, qn, mats, bank_lo, ids, cfg,
                                   jax.lax.Precision.DEFAULT)
    np.testing.assert_array_equal(np.asarray(lab_hi), np.asarray(lab_lo))


def test_fused_banded_kernel_matches_scan_on_device():
    import dataclasses

    from dsp_tpu.kernels.dtw_fused_banded import dtw_batch_fused_banded
    from dsp_tpu.ops.dtw import dtw_batch

    cfg, mats, (q, qn, b, bn, ids) = _problem(n_query=32)
    dtw_cfg = cfg.dtw
    feats = pl.extract_features(q, qn, mats, cfg)
    bank = pl.extract_features(b, bn, mats, cfg)
    d_kernel = np.asarray(dtw_batch_fused_banded(
        feats.feats, feats.length, bank.feats, bank.length, dtw_cfg))
    d_scan = np.asarray(dtw_batch(
        feats.feats, feats.length, bank.feats, bank.length, dtw_cfg))
    fin = (d_kernel < 1e20) & (d_scan < 1e20)
    assert ((d_kernel >= 1e20) == (d_scan >= 1e20)).all()
    np.testing.assert_allclose(d_kernel[fin], d_scan[fin], rtol=5e-4)
    np.testing.assert_array_equal(d_kernel.argmin(1), d_scan.argmin(1))


def test_frontend_pallas_matches_xla_on_device():
    import dataclasses

    cfg, mats, (q, qn, *_rest) = _problem(n_query=16)
    cfg_p = dataclasses.replace(
        cfg, frontend=dataclasses.replace(cfg.frontend, impl="pallas"))
    a = pl.extract_features(q, qn, mats, cfg)
    b = pl.extract_features(q, qn, mats, cfg_p)
    np.testing.assert_array_equal(np.asarray(a.length), np.asarray(b.length))
    np.testing.assert_allclose(np.asarray(a.feats), np.asarray(b.feats),
                               rtol=2e-3, atol=2e-3)


def test_itakura_kernel_matches_scan_on_device():
    import dataclasses

    from dsp_tpu.kernels.dtw_fused_banded import dtw_batch_fused_banded
    from dsp_tpu.ops.dtw import dtw_batch

    cfg, mats, (q, qn, b, bn, ids) = _problem(n_query=32)
    dtw_cfg = dataclasses.replace(cfg.dtw, slope="itakura")
    feats = pl.extract_features(q, qn, mats, cfg)
    bank = pl.extract_features(b, bn, mats, cfg)
    d_kernel = np.asarray(dtw_batch_fused_banded(
        feats.feats, feats.length, bank.feats, bank.length, dtw_cfg))
    d_scan = np.asarray(dtw_batch(
        feats.feats, feats.length, bank.feats, bank.length, dtw_cfg))
    fin = (d_kernel < 1e20) & (d_scan < 1e20)
    assert ((d_kernel >= 1e20) == (d_scan >= 1e20)).all()
    np.testing.assert_allclose(d_kernel[fin], d_scan[fin], rtol=5e-4)
    np.testing.assert_array_equal(d_kernel[fin.all(1)].argmin(1),
                                  d_scan[fin.all(1)].argmin(1))
