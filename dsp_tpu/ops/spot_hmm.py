"""HMM keyword spotting: open-endpoint Viterbi + UBM filler ratio.

The GMM-HMM family's analog of ops/spot.py (the classical
keyword/filler network, Rose & Paul 1990): each word HMM may enter at
any stream frame and exit at any later frame; candidate spans score by
the per-frame Viterbi log-likelihood RATIO against the universal
background GMM (models/gmm_hmm.py:fit_ubm) — the existing UBM doubles
as the filler model, so a `train-hmm --train-mode map` checkpoint
spots keywords with zero extra training.

TPU mapping:

* emissions for ALL (frame, word, state) triples in one batched GEMM
  (models/gmm_hmm.py:emission_logb — the same MXU path scoring uses);
* the DP is frame-synchronous over the stream with a [W, S] carry and
  NO intra-frame dependency (left-right, no skips: every predecessor
  lives at frame j-1), so one `lax.scan` step is pure elementwise
  max-plus work — cheaper per frame than the DTW spotter's
  associative scan;
* entry-frame witnesses ride the argmax; the filler term is a prefix
  sum of per-frame UBM log-liks, subtracted per span at readout.

Scores are per-frame LLRs: > 0 means the word HMM explains the span
better than the background model.  Event extraction reuses
ops/spot.py:extract_events on the NEGATED field (it minimises).

Golden oracle: dsp_tpu/golden/spot_hmm.py (tie order: fresh start >
stay > advance, matched here exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dsp_tpu.models.gmm_hmm import NEG_INF, HmmParams, emission_logb, \
    gmm_loglik_flat


def spot_viterbi(logb: jax.Array, log_a: jax.Array):
    """Open-begin Viterbi over a stream for stacked word HMMs.

    logb [U, W, S] emission log-liks, log_a [W, S, S] left-right
    transitions.  Returns (v_last [W, U], start [W, U]): best-path
    log-lik ENDING at (frame j, last state) and its entry-frame
    witness.
    """
    u, w, s = logb.shape
    stay = jnp.diagonal(log_a, axis1=-2, axis2=-1)           # [W, S]
    adv = jnp.diagonal(log_a, offset=1, axis1=-2, axis2=-1)  # [W, S-1]
    ninf_col = jnp.full((w, 1), NEG_INF)

    def step(carry, inp):
        v, st = carry                                        # [W, S] each
        lb, j = inp                                          # [W, S], []
        stay_v = v + stay
        adv_v = jnp.concatenate([ninf_col, v[:, :-1] + adv], axis=1)
        # tie order stay > advance...
        m = jnp.maximum(stay_v, adv_v)
        sm = jnp.where(stay_v >= adv_v,
                       st, jnp.concatenate([st[:, :1], st[:, :-1]], axis=1))
        # ...and fresh start beats both on ties (golden order), state 0
        is0 = jnp.arange(s)[None, :] == 0
        fresh_wins = is0 & (0.0 >= m)
        m = jnp.where(fresh_wins, 0.0, m)
        sm = jnp.where(fresh_wins, j, sm)
        v_new = lb + m
        out = (v_new[:, -1], sm[:, -1])
        return (v_new, sm), out

    init = (jnp.full((w, s), NEG_INF) + 0.0 * logb[0],
            (0 * logb[0]).astype(jnp.int32))
    _, (v_last, starts) = jax.lax.scan(
        step, init, (logb, jnp.arange(u)))
    return v_last.T, starts.T                                # [W, U]


def _llr_readout(v_last, starts, ubm_ll, stream_len):
    """(v_last [W, U], starts [W, U], ubm_ll [U]) -> per-frame LLR."""
    u = v_last.shape[1]
    p = jnp.concatenate([jnp.zeros(1, ubm_ll.dtype),
                         jnp.cumsum(ubm_ll)])                # [U+1]
    j = jnp.arange(u)[None, :]
    span = (j - starts + 1).astype(v_last.dtype)
    ubm_span = p[j + 1] - jnp.take(p, starts)
    llr = (v_last - ubm_span) / span
    return jnp.where(j < stream_len, llr, NEG_INF)


def spot_hmm_impl(streams: jax.Array, stream_lens: jax.Array,
                  params: HmmParams, ubm):
    """Unjitted body (shared with any future mesh path).

    streams [B, U, F], params stacked [W, ...], ubm = (means [M, F],
    log_var [M, F], log_mix [M]).  Returns (llr [B, W, U], start
    [B, W, U]).
    """
    means, log_var, log_mix = ubm

    def one(stream, slen):
        logb = emission_logb(stream, params)                 # [U, W, S]
        # mask frames past the true length: NEG_INF emissions keep any
        # path through them unusable (readout masks them anyway)
        valid = (jnp.arange(stream.shape[0]) < slen)[:, None, None]
        logb = jnp.where(valid, logb, NEG_INF)
        ull = gmm_loglik_flat(stream, means, log_var)        # [U, M]
        ubm_ll = jax.nn.logsumexp(ull + log_mix, axis=-1)    # [U]
        v_last, starts = spot_viterbi(logb, params.log_a)
        return _llr_readout(v_last, starts, ubm_ll, slen), starts

    return jax.vmap(one)(streams, stream_lens)


@jax.jit
def spot_hmm_batch(streams: jax.Array, stream_lens: jax.Array,
                   params: HmmParams, ubm):
    """Spot every word HMM in every stream (see spot_hmm_impl)."""
    return spot_hmm_impl(streams, stream_lens, params, ubm)
