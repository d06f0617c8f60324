"""Fused MFCC Pallas kernel parity (interpret mode on CPU, SURVEY.md §4.3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsp_tpu.config import FrontendConfig
from dsp_tpu import golden
from dsp_tpu.io.dataset import synth_word
from dsp_tpu.kernels.mfcc_pallas import mfcc_frames_pallas, mfcc_pallas
from dsp_tpu.ops import frontend as fe

CFG = FrontendConfig()


def test_kernel_matches_ops_composite():
    """Pallas kernel == XLA composite on the same frames (tight f32 parity)."""
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((300, CFG.frame_len)).astype(np.float32)
    mats = fe.make_matrices(CFG)
    want = np.asarray(fe.mfcc_from_frames(jnp.asarray(frames), mats, CFG))
    got = np.asarray(mfcc_frames_pallas(jnp.asarray(frames), CFG, interpret=True))
    assert got.shape == want.shape == (300, 13)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_kernel_matches_golden_end_to_end():
    x = synth_word("six", 3, max_samples=16000)
    got = np.asarray(mfcc_pallas(jnp.asarray(x), CFG, interpret=True))
    want = golden.mfcc(x, CFG)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_kernel_batched_signals():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 8000)).astype(np.float32)
    got = np.asarray(mfcc_pallas(jnp.asarray(x), CFG, interpret=True))
    assert got.shape == (3, 1 + (8000 - 400) // 160, 13)
    for b in range(3):
        np.testing.assert_allclose(got[b], golden.mfcc(x[b], CFG),
                                   rtol=2e-3, atol=2e-3)


def test_kernel_ragged_tile_padding():
    """N not a multiple of the tile: padded rows must not leak."""
    rng = np.random.default_rng(2)
    frames = rng.standard_normal((7, CFG.frame_len)).astype(np.float32)
    mats = fe.make_matrices(CFG)
    want = np.asarray(fe.mfcc_from_frames(jnp.asarray(frames), mats, CFG))
    got = np.asarray(mfcc_frames_pallas(jnp.asarray(frames), CFG, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_kernel_use_energy_matches_ops():
    """use_energy=True replaces c0 with log frame energy (round-1 advisor
    finding: the kernel silently ignored the flag)."""
    import dataclasses

    cfg_e = dataclasses.replace(CFG, use_energy=True)
    x = synth_word("three", 4)
    want = np.asarray(fe.mfcc(jnp.asarray(x), cfg_e))
    got = np.asarray(mfcc_pallas(jnp.asarray(x), cfg_e, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pipeline_impl_dispatch_cpu_fallback():
    """FrontendConfig(impl='pallas') on a non-TPU backend falls back to
    the XLA composite (identical features, no pallas lowering error)."""
    import dataclasses

    from dsp_tpu import pipeline as pl
    from dsp_tpu.config import PipelineConfig

    cfg = PipelineConfig()
    cfg_p = dataclasses.replace(
        cfg, frontend=dataclasses.replace(cfg.frontend, impl="pallas"))
    mats = fe.make_matrices(cfg.frontend)
    x = jnp.asarray(np.stack([synth_word("one", 1), synth_word("two", 2)]))
    n = jnp.full(2, x.shape[1], jnp.int32)
    a = pl.extract_features(x, n, mats, cfg)
    b = pl.extract_features(x, n, mats, cfg_p)
    np.testing.assert_allclose(np.asarray(a.feats), np.asarray(b.feats),
                               rtol=1e-5, atol=1e-5)
