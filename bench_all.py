"""Benchmark all five BASELINE.json configs; one JSON line each.

    python bench_all.py            # runs on whatever backend jax picks

Configs (BASELINE.json `configs`):
  0. single WAV -> MFCC -> DTW vs 10-digit bank  (latency)
  1. batched 1k utterances x 100 templates        (headline throughput;
     same measurement as bench.py)
  2. streaming chunked front-end                  (real-time factor)
  3. GMM-HMM batched log-space Viterbi decode     (utterances/s)
  4. 35-class kNN-DTW, Speech-Commands-shaped     (synthetic stand-in
     unless SC2_ROOT points at a real checkout; bank sharding is covered
     by tests/test_sharding.py on the CPU mesh — one local chip here)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def emit(**kv):
    print(json.dumps(kv), flush=True)


def main():
    from dsp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from dsp_tpu import pipeline as pl
    from dsp_tpu.config import PipelineConfig
    from dsp_tpu.io.dataset import DIGITS, synth_word
    from dsp_tpu.models import gmm_hmm as gh
    from dsp_tpu.ops import frontend as fe
    from dsp_tpu.ops import streaming as st
    from dsp_tpu.utils.timing import chained_timeit, token_mix

    cfg = PipelineConfig()
    mats = fe.make_matrices(cfg.frontend)

    def make_bank(words, per_word):
        sigs = np.stack([synth_word(w, i, max_samples=cfg.max_samples)
                         for w in words for i in range(per_word)])
        ns = np.full(len(sigs), cfg.max_samples, dtype=np.int32)
        ids = np.repeat(np.arange(len(words), dtype=np.int32), per_word)
        bank = pl.extract_features(jnp.asarray(sigs), jnp.asarray(ns), mats, cfg)
        return bank, jnp.asarray(ids)

    # ---- config 0: single-utterance latency --------------------------------
    bank10, ids10 = make_bank(DIGITS, 1)
    x1 = jnp.asarray(synth_word("three", 123)[None])
    n1 = jnp.full(1, cfg.max_samples, dtype=jnp.int32)

    @jax.jit
    def single(x, token):
        labels, _ = pl.recognize_batch(token_mix(x, token), n1, mats,
                                       bank10, ids10, cfg)
        return labels

    dt = chained_timeit(single, (x1,), n_iters=16)
    emit(config=0, metric="single_wav_recognize_latency_ms",
         value=round(dt * 1e3, 3), unit="ms")

    # ---- config 1: headline batched throughput -----------------------------
    bank100, ids100 = make_bank(DIGITS, 10)
    B = 256
    sigs = np.stack([synth_word(DIGITS[i % 10], 1000 + i,
                                max_samples=cfg.max_samples) for i in range(B)])
    xb = jnp.asarray(sigs)
    nb = jnp.full(B, cfg.max_samples, dtype=jnp.int32)

    @jax.jit
    def batched(x, token):
        labels, _ = pl.recognize_batch(token_mix(x, token), nb, mats,
                                       bank100, ids100, cfg)
        return labels

    dt = chained_timeit(batched, (xb,), n_iters=8)
    emit(config=1, metric="mfcc_dtw_alignments_per_sec_per_chip",
         value=round(B * 100 / dt, 1), unit="alignments/s/chip")

    # ---- config 2: streaming front-end real-time factor --------------------
    chunk_len = 1600  # 100 ms of audio
    state = st.init_state(cfg.frontend, chunk_len)
    chunk = jnp.asarray(synth_word("five", 7)[:chunk_len])

    @jax.jit
    def stream_step(c, token, state=state):
        s, out = st.process_chunk(state, token_mix(c, token), mats,
                                  cfg.frontend, cfg.vad, chunk_len)
        return out.mfcc

    dt = chained_timeit(stream_step, (chunk,), n_iters=32)
    emit(config=2, metric="streaming_realtime_factor",
         value=round(0.1 / dt, 1), unit="x realtime (100ms chunks)")

    # ---- config 3: GMM-HMM Viterbi decode ----------------------------------
    rng = np.random.default_rng(0)
    W, S, M, F = 10, 5, 3, cfg.frontend.n_feats
    params = gh.HmmParams(
        log_pi=jnp.tile(jnp.asarray([0.0] + [gh.NEG_INF] * (S - 1)), (W, 1)),
        log_a=jnp.tile(gh._lr_log_a(jnp.full((S,), 0.6), S)[None], (W, 1, 1)),
        means=jnp.asarray(rng.standard_normal((W, S, M, F)), dtype=jnp.float32),
        log_var=jnp.zeros((W, S, M, F)),
        log_mix=jnp.full((W, S, M), -np.log(M)),
    )
    feats = pl.extract_features(xb, nb, mats, cfg)

    @jax.jit
    def decode(f, token):
        return gh.score_words(token_mix(f, token), feats.length, params)

    # fast op (~4 ms): needs many iters or the one-off ~25 ms relay
    # fetch inflates the reading ~2x (round-2 postmortem)
    dt = chained_timeit(decode, (feats.feats,), n_iters=48)
    emit(config=3, metric="viterbi_decodes_per_sec",
         value=round(B * W / dt, 1), unit="utterance-word decodes/s/chip")

    # ---- config 4: 35-class kNN-DTW ----------------------------------------
    root = os.environ.get("SC2_ROOT")
    words35 = [f"w{i:02d}" for i in range(35)]
    if root:
        emit(config="4-note",
             note="real SC2 data detected: run `python -m dsp_tpu evaluate-sc2 --root ...` for the real-data accuracy/throughput; the line below is the synthetic stand-in")
    bank35, ids35 = make_bank(words35, 3)   # 105 templates, 35 classes

    @jax.jit
    def c35(x, token):
        labels, _ = pl.recognize_batch(token_mix(x, token), nb, mats,
                                       bank35, ids35, cfg)
        return labels

    dt = chained_timeit(c35, (xb,), n_iters=8)
    emit(config=4, metric="sc2_style_35class_alignments_per_sec",
         value=round(B * int(bank35.feats.shape[0]) / dt, 1),
         unit="alignments/s/chip (synthetic 35-class)")

    # ---- bonus: connected-word decoding ------------------------------------
    from dsp_tpu.io.dataset import synth_connected

    n_conn, n_words = 64, 3
    clen = 3 * cfg.max_samples
    conn = np.zeros((n_conn, clen), np.float32)
    clens = np.zeros(n_conn, np.int32)
    for i in range(n_conn):
        x = synth_connected([DIGITS[(i + j) % 10] for j in range(n_words)],
                            300 + i)
        m = min(len(x), clen)
        conn[i, :m] = x[:m]
        clens[i] = m
    connj = jnp.asarray(conn)
    clensj = jnp.asarray(clens)

    @jax.jit
    def conn_step(x, token):
        label_ids, n_segs, _, _ = pl.recognize_connected_batch(
            token_mix(x, token), clensj, mats, bank100, ids100,
            n_labels=len(DIGITS), cfg=cfg, max_segments=4)
        return label_ids

    dt = chained_timeit(conn_step, (connj,), n_iters=8)
    emit(config="connected", metric="connected_words_per_sec_per_chip",
         value=round(n_conn * n_words / dt, 1),
         unit="words/s/chip (multi-segment split + classify, 3-word clips)")

    # ---- bonus: linear-time-warp fast matcher ------------------------------
    @jax.jit
    def ltw(x, token):
        f = pl.extract_features(token_mix(x, token), nb, mats, cfg)
        labels, _ = pl.classify_features_ltw(f, bank100, ids100, 64)
        return labels

    dt = chained_timeit(ltw, (xb,), n_iters=16)
    emit(config="ltw", metric="ltw_comparisons_per_sec_per_chip",
         value=round(B * 100 / dt, 1),
         unit="comparisons/s/chip (fast matcher)")


if __name__ == "__main__":
    main()
