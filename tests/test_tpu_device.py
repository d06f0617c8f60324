"""Real-TPU checks (skipped on the CPU CI mesh; run on a TPU host with
`JAX_PLATFORMS= python -m pytest tests/test_tpu_device.py`).

Covers the round-1 review items that only manifest on real hardware:
 * bench precision: the DEFAULT-precision (bf16 MXU) pipeline must pick
   the same labels as HIGHEST on the synthetic corpus — this is the
   configuration the headline bench ships;
 * the fused banded kernel must match the scan on-device (its GEMM runs
   at forced-HIGHEST; bf16 there flipped 50% of argmins — docs/PERF.md);
plus the round-3/4 surfaces (VERDICT r3 #6): the QT=256 kernel at the
bench shape (parity + a timing line for docs/TPU_TESTS.md), connected
decode (VAD split and level-building) parity against the CPU-verified
paths, and the serve-loop round-trip on device.
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


def test_bench_shape_qt256_kernel_parity_and_timing():
    """The shipped QT=256 kernel at the BENCH shape (256 queries x 100
    templates): scan parity at full size, plus a timing line for
    docs/TPU_TESTS.md (chained harness — a raw block_until_ready reading
    through the relay over-reads)."""
    from dsp_tpu.kernels.dtw_fused_banded import dtw_batch_fused_banded
    from dsp_tpu.ops.dtw import dtw_batch
    from dsp_tpu.utils.timing import chained_timeit, token_mix

    cfg, mats, (q, qn, b, bn, ids) = _problem(n_query=256, per_word=10)
    feats = pl.extract_features(q, qn, mats, cfg)
    bank = pl.extract_features(b, bn, mats, cfg)
    d_kernel = np.asarray(dtw_batch_fused_banded(
        feats.feats, feats.length, bank.feats, bank.length, cfg.dtw))
    d_scan = np.asarray(dtw_batch(
        feats.feats, feats.length, bank.feats, bank.length, cfg.dtw))
    fin = (d_kernel < 1e20) & (d_scan < 1e20)
    np.testing.assert_allclose(d_kernel[fin], d_scan[fin], rtol=5e-4)
    np.testing.assert_array_equal(d_kernel.argmin(1), d_scan.argmin(1))

    @jax.jit
    def step(f, token):
        return dtw_batch_fused_banded(token_mix(f, token), feats.length,
                                      bank.feats, bank.length, cfg.dtw)

    dt = chained_timeit(step, (feats.feats,), n_iters=8)
    print(f"\n[device] QT=256 fused banded kernel, 256x100 pairs: "
          f"{dt * 1e3:.1f} ms/batch = {256 * 100 / dt:,.0f} pairs/s")
    assert dt < 1.0     # sanity, not a perf gate


def test_decode_connected_on_device_matches_vad_truth():
    """Connected decode end-to-end on the chip: the VAD splitter path
    and the level-building path both recover a known 3-word sequence
    (level building additionally on a GAPLESS recording)."""
    from dsp_tpu.io.dataset import synth_connected
    from dsp_tpu.models.knn_dtw import KnnDtwRecognizer

    cfg = PipelineConfig()
    rec = KnnDtwRecognizer(cfg)
    for lab in ["zero", "one", "two"]:
        rec.enroll(lab, [synth_word(lab, i) for i in range(2)])
    truth = ["two", "zero", "one"]
    gapped = synth_connected(truth, seed=6)
    gapless = synth_connected(truth, seed=5, gap_ms=(0.0, 1.0),
                              lead_ms=(50.0, 60.0))
    assert rec.classify_connected([gapped], max_segments=4)[0] == truth
    assert rec.classify_connected([gapless], max_segments=4,
                                  method="level")[0] == truth


def test_grammar_and_nbest_on_device():
    """Round-4 surfaces on the chip: the grammar-constrained level DP
    reroutes a forbidden decode exactly as the CPU-verified path does,
    and classify_nbest's top-1 agrees with classify_batch."""
    from dsp_tpu.io.dataset import synth_connected
    from dsp_tpu.models.knn_dtw import KnnDtwRecognizer

    cfg = PipelineConfig()
    rec = KnnDtwRecognizer(cfg)
    for lab in ["zero", "one", "two"]:
        rec.enroll(lab, [synth_word(lab, i) for i in range(2)])
    truth = ["two", "zero", "one"]
    gapless = synth_connected(truth, seed=5, gap_ms=(0.0, 1.0),
                              lead_ms=(50.0, 60.0))
    assert rec.classify_connected(
        [gapless], max_segments=4, method="level",
        grammar={"no_repeat": True})[0] == truth
    got = rec.classify_connected(
        [gapless], max_segments=4, method="level",
        grammar={"start": ["zero", "one"]})[0]
    assert got and got[0] != "two"

    sigs = [synth_word(lab, 9) for lab in ["zero", "one", "two"]]
    hyps = rec.classify_nbest(sigs, n=3)
    assert [h[0][0] for h in hyps] == rec.classify_batch(sigs)
    assert all(h[0][2] >= h[1][2] >= h[2][2] for h in hyps)


def test_serve_roundtrip_on_device(tmp_path, capsys, monkeypatch):
    """One isolated + one connected request through the resident serve
    loop, on the real chip."""
    import io
    import os

    from dsp_tpu import cli
    from dsp_tpu.io.dataset import synth_connected
    from dsp_tpu.io.wav import write_wav

    corpus = str(tmp_path / "corpus")
    bank = str(tmp_path / "bank.npz")
    cli.main(["make-corpus", "--out", corpus, "--n", "2", "--words", "3"])
    cli.main(["enroll", "--corpus", os.path.join(corpus, "train"),
              "--bank", bank])
    lab = sorted(os.listdir(os.path.join(corpus, "test")))[0]
    wav1 = os.path.join(corpus, "test", lab,
                        sorted(os.listdir(
                            os.path.join(corpus, "test", lab)))[0])
    wav2 = str(tmp_path / "conn.wav")
    labels2 = sorted(os.listdir(os.path.join(corpus, "train")))[:2]
    write_wav(wav2, 16000, synth_connected(labels2, 1))
    monkeypatch.setattr("sys.stdin",
                        io.StringIO(f"{wav1}\nconnected {wav2}\n"))
    cli.main(["serve", "--bank", bank, "--max-segments", "4"])
    out = capsys.readouterr().out
    assert any(wav1 in ln and f"\t{lab}\t" in ln for ln in out.splitlines())
    assert any(wav2 in ln and " ".join(labels2) in ln
               for ln in out.splitlines())


def test_keyword_spotting_on_device():
    """Round-4 surface: the subsequence-DTW spotter finds enrolled
    keywords among distractor words on the real chip, matching the
    CPU-verified event semantics (labels in order, spans overlap)."""
    from dsp_tpu.io.dataset import synth_spotting_stream
    from dsp_tpu.models.knn_dtw import KnnDtwRecognizer
    from dsp_tpu.models.spotter import KeywordSpotter

    cfg = PipelineConfig()
    rec = KnnDtwRecognizer(cfg)
    for lab in ["zero", "one"]:
        rec.enroll(lab, [synth_word(lab, i) for i in range(3)])
    vocab = ["zero", "one", "three", "four", "five"]
    sig, truth = synth_spotting_stream({"zero", "one"}, vocab, seed=11,
                                       n_words=6)
    events, = KeywordSpotter(rec, threshold=30.0).spot([sig])
    hop = cfg.frontend.hop_len
    want = [(lab, s // hop, e // hop) for lab, s, e in truth]
    assert [ev[0] for ev in events] == [w[0] for w in want]
    for (lab, s, e, sc), (tl, ts, te) in zip(events, want):
        lo, hi = max(s, ts), min(e, te)
        assert hi - lo > 0.5 * (te - ts), (lab, (s, e), (ts, te))


def test_gmm_fit_precision_on_device():
    """Round-4 regression: the EM fit's moment GEMMs (w @ x,
    w @ x^2, the _gmm_stats einsums, the UBM EM) must run at f32 MXU
    precision — under the TPU-default bf16 multiplies the
    E[x^2] - mean^2 variance update cancels catastrophically and the
    fitted models are corrupted (observed: a 3-word fit whose 'one'
    HMM never beat the UBM filler by better than -45 nats/frame on its
    own training distribution, while the CPU fit peaked > 0).  Here:
    every keyword's spotting LLR field must peak well above the
    permissive candidate floor at its planted location."""
    from dsp_tpu.config import HmmConfig
    from dsp_tpu.io.dataset import (DIGITS, make_corpus,
                                    synth_spotting_stream)
    from dsp_tpu.models.gmm_hmm import GmmHmmRecognizer
    from dsp_tpu.models.spotter import HmmSpotter

    cfg = PipelineConfig()
    keywords = DIGITS[:3]
    rec = GmmHmmRecognizer(cfg, HmmConfig(n_states=4, n_mix=2, n_iter=4))
    rec.fit(make_corpus(keywords, n_per_word=3, seed=0))
    sig, truth = synth_spotting_stream(
        keywords, keywords + DIGITS[5:8], seed=5000, n_words=6)
    (llr, start), = HmmSpotter(rec).scores([sig])
    hop = cfg.frontend.hop_len
    labels = list(rec.labels)
    for lab, s, e in truth:
        row = labels.index(lab)
        peak = float(llr[row, s // hop: e // hop + 1].max())
        # healthy fits peak in [-26, +2] nats/frame on this stream
        # (measured, TPU == CPU after the fix); the corrupted fit's
        # 'one' model stayed below the -45 candidate floor everywhere
        assert peak > -40.0, (lab, peak)


def test_cascade_spotting_on_device():
    """Round-4 surface: the cascade spotter (HMM landmarks -> exact
    subsequence-DTW rerank) on the real chip — full-word spans with
    correct labels at the shipped defaults."""
    from dsp_tpu.config import HmmConfig
    from dsp_tpu.io.dataset import (DIGITS, make_corpus,
                                    synth_spotting_stream)
    from dsp_tpu.models.gmm_hmm import GmmHmmRecognizer
    from dsp_tpu.models.knn_dtw import KnnDtwRecognizer
    from dsp_tpu.models.spotter import CascadeSpotter

    cfg = PipelineConfig()
    keywords = DIGITS[:3]
    hrec = GmmHmmRecognizer(cfg, HmmConfig(n_states=4, n_mix=2, n_iter=4))
    hrec.fit(make_corpus(keywords, n_per_word=3, seed=0))
    brec = KnnDtwRecognizer(cfg)
    for lab in keywords:
        brec.enroll(lab, [synth_word(lab, i) for i in range(3)])
    sig, truth = synth_spotting_stream(
        keywords, keywords + DIGITS[5:8], seed=5000, n_words=6)
    events, = CascadeSpotter(hrec, brec).spot([sig])
    hop = cfg.frontend.hop_len
    want = [(lab, s // hop, e // hop) for lab, s, e in truth]
    assert [ev[0] for ev in events] == [w[0] for w in want], (events, want)
    for (lab, s, e, sc), (tl, ts, te) in zip(events, want):
        ov = min(e, te) - max(s, ts) + 1
        assert ov >= 0.5 * (te - ts), (lab, (s, e), (ts, te))


def test_hmm_spotting_on_device():
    """Round-4 surface: the HMM keyword/filler spotter (open-endpoint
    Viterbi vs the UBM) finds its words on the real chip — midpoint hit
    rule, body identical to the CPU-verified e2e test."""
    from dsp_tpu.config import HmmConfig
    from dsp_tpu.io.dataset import make_corpus, synth_spotting_stream
    from dsp_tpu.models.gmm_hmm import GmmHmmRecognizer
    from dsp_tpu.models.spotter import HmmSpotter

    cfg = PipelineConfig()
    rec = GmmHmmRecognizer(cfg, HmmConfig(n_states=4, n_mix=2, n_iter=4))
    rec.fit(make_corpus(["zero", "one"], n_per_word=5, seed=0))
    vocab = ["zero", "one", "three", "four", "five"]
    sig, truth = synth_spotting_stream({"zero", "one"}, vocab, seed=11,
                                       n_words=6)
    events, = HmmSpotter(rec, threshold=-30.0).spot([sig])
    hop = cfg.frontend.hop_len
    want = [(lab, s // hop, e // hop) for lab, s, e in truth]
    assert [ev[0] for ev in events] == [w[0] for w in want], (events, want)
    for (lab, s, e, sc), (tl, ts, te) in zip(events, want):
        assert ts <= (s + e) / 2.0 <= te, (lab, (s, e), (ts, te))


def test_spot_fused_kernel_parity_and_timing():
    """Round-5 surface (VERDICT r4 #3): the fused subsequence-DTW
    kernel vs the XLA scan on the real chip at a spotting shape, plus
    a timing line of both paths for docs/TPU_TESTS.md.

    Witness policy (measured on the v5e, 2026-08-19): at U=512 the
    kernel's Kogge-Stone prefix sums and the scan's balanced
    associative-scan tree round differently, and ~0.01% of argmin
    decisions sit on genuine NEAR-TIES — two structurally different
    start columns whose raw path costs agree to ~1e-6 relative (e.g.
    679.6060 vs 679.6063 for starts 25 frames apart).  Either witness
    is a valid DP answer; span normalisation then makes the NORM
    values differ by up to ~13% at those sites.  So the device
    assertion is tie-aware: where witnesses agree, norms must be
    allclose; where they differ, the RAW costs norm*(tl+span) must
    agree to 1e-4 relative (proving a legitimate tie, not a DP bug)
    and such sites must stay rare (< 0.1%).  Interpret-mode CPU tests
    (tests/test_spot_fused.py) keep EXACT witness equality — the
    tie-free regime the module docstring promises."""
    from dsp_tpu.kernels.spot_fused import subseq_dtw_fused
    from dsp_tpu.ops.spot import subseq_dtw_batch_impl
    from dsp_tpu.utils.timing import chained_timeit, token_mix

    rng = np.random.default_rng(3)
    b, k, u, t, f = 8, 100, 512, 198, 39
    streams = jnp.asarray(rng.standard_normal((b, u, f)), jnp.float32)
    bank = jnp.asarray(rng.standard_normal((k, t, f)), jnp.float32)
    slens = jnp.asarray(rng.integers(u // 2, u + 1, size=b), jnp.int32)
    tlens = jnp.asarray(rng.integers(50, t + 1, size=k), jnp.int32)

    norm_f, start_f = subseq_dtw_fused(streams, slens, bank, tlens)
    norm_s, start_s = subseq_dtw_batch_impl(streams, slens, bank, tlens)
    norm_f, start_f = np.asarray(norm_f), np.asarray(start_f)
    norm_s, start_s = np.asarray(norm_s), np.asarray(start_s)
    sl = np.asarray(slens)
    tl = np.asarray(tlens, np.float64)[None, :, None]
    jj = np.arange(u, dtype=np.float64)[None, None, :]
    n_sites = n_flips = 0
    for bi in range(b):
        v = slice(0, sl[bi])
        agree = start_f[bi, :, v] == start_s[bi, :, v]
        np.testing.assert_allclose(
            np.where(agree, norm_f[bi, :, v], 0.0),
            np.where(agree, norm_s[bi, :, v], 0.0),
            rtol=5e-4, atol=1e-4)
        # witness flips must be near-ties: raw D = norm * (tl + span)
        d_f = norm_f[bi, :, v] * (tl[0] + jj[0, :, :sl[bi]]
                                  - start_f[bi, :, v] + 1)
        d_s = norm_s[bi, :, v] * (tl[0] + jj[0, :, :sl[bi]]
                                  - start_s[bi, :, v] + 1)
        np.testing.assert_allclose(d_f, d_s, rtol=1e-4, atol=1e-3)
        n_sites += agree.size
        n_flips += int((~agree).sum())
    assert n_flips < 1e-3 * n_sites, (n_flips, n_sites)
    print(f"\n[device] spot witness near-tie flips: {n_flips}/{n_sites}")

    @jax.jit
    def step_fused(x, token):
        return subseq_dtw_fused(token_mix(x, token), slens, bank, tlens)[0]

    @jax.jit
    def step_scan(x, token):
        return subseq_dtw_batch_impl(token_mix(x, token), slens, bank,
                                     tlens)[0]

    dt_f = chained_timeit(step_fused, (streams,), n_iters=8)
    dt_s = chained_timeit(step_scan, (streams,), n_iters=8)
    print(f"\n[device] fused subseq-DTW kernel, {b}x{k} pairs U={u}: "
          f"{dt_f * 1e3:.1f} ms/batch vs scan {dt_s * 1e3:.1f} ms "
          f"({dt_s / dt_f:.2f}x)")
    assert dt_f < 5.0   # sanity, not a perf gate
