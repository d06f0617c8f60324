"""Device pipeline: one jitted function from padded signals to labels.

The reference runs VAD -> MFCC -> DTW -> argmin as separate Python stages
(SURVEY.md §3.1).  Here the *entire* pipeline is a single XLA program:
the only host->device crossing is the jit call on the padded signal
batch, and everything downstream (VAD cummax scans, MXU front-end
matmuls, min-plus DTW) fuses inside it.

Static-shape discipline: signals are padded to ``cfg.max_samples``; all
variable lengths travel as integer scalars next to the data (ragged =
pad + mask, SURVEY.md "hard parts").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dsp_tpu.config import PipelineConfig
from dsp_tpu.ops import dtw as jdtw
from dsp_tpu.ops import frontend as fe
from dsp_tpu.ops import vad as jvad


class Features(NamedTuple):
    feats: jax.Array    # [..., T_max, n_feats]
    length: jax.Array   # [...] valid frame count


def pad_signals(signals, max_samples: int):
    """Host list of 1-D signals -> (padded [B, max_samples] f32, lengths [B])."""
    import numpy as np

    out = np.zeros((len(signals), max_samples), dtype=np.float32)
    lens = np.zeros(len(signals), dtype=np.int32)
    for i, s in enumerate(signals):
        s = np.asarray(s, dtype=np.float32)[:max_samples]
        out[i, : len(s)] = s
        lens[i] = len(s)
    return jnp.asarray(out), jnp.asarray(lens)


def _extract_one(x: jax.Array, n_samples: jax.Array, mats: fe.FrontendMatrices,
                 cfg: PipelineConfig, precision) -> Features:
    """Single padded signal [max_samples] -> trimmed, masked features."""
    f = cfg.frontend
    t_max = cfg.max_frames

    if f.feature_type == "lpcc":
        from dsp_tpu.ops.lpc import lpcc
        c = lpcc(x, f)                                           # [T, C]
    else:
        c = fe.mfcc(x, f, mats, use_fft=False, precision=precision)  # [T, C]
    n_frames = jnp.maximum(0, 1 + (n_samples - f.frame_len) // f.hop_len)

    if cfg.use_vad:
        start, end, _ = jvad.detect_endpoints(x, f, cfg.vad, n_samples)
    else:
        start, end = jnp.asarray(0), n_frames

    length = jnp.maximum(end - start, 1)
    idx = jnp.clip(start + jnp.arange(t_max), 0, t_max - 1)
    c = jnp.take(c, idx, axis=0)                              # frames from VAD start
    if f.cmn:
        valid = (jnp.arange(t_max) < length)[:, None].astype(c.dtype)
        mean = jnp.sum(c * valid, axis=0, keepdims=True) / length.astype(c.dtype)
        c = c - mean
    feats = fe.add_deltas(c, f, length)
    feats = jnp.where((jnp.arange(t_max) < length)[:, None], feats, 0.0)
    return Features(feats, length)


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def extract_features(signals: jax.Array, n_samples: jax.Array,
                     mats: fe.FrontendMatrices,
                     cfg: PipelineConfig = PipelineConfig(),
                     precision=jax.lax.Precision.HIGHEST) -> Features:
    """Padded signal batch [B, max_samples] + true lengths [B] -> Features."""
    one = functools.partial(_extract_one, mats=mats, cfg=cfg, precision=precision)
    return jax.vmap(one)(signals, n_samples)


@functools.partial(jax.jit, static_argnames=("cfg", "precision", "k", "n_labels"))
def classify_features(feats: Features, bank: Features, bank_label_ids: jax.Array,
                      n_labels: int | None = None,
                      k: int = 1,
                      cfg: PipelineConfig = PipelineConfig(),
                      precision=jax.lax.Precision.HIGHEST):
    """Features [B] x template bank [K] -> (label_ids [B], distances [B,K]).

    k=1 is plain nearest-template; k>1 does kNN majority vote with
    distance-sum tie-breaking, all on device.
    """
    impl = cfg.dtw.impl
    if impl == "auto":
        # fused banded kernel on TPU when the band is statically windowable
        # (same distances as the scan under coverage); scan otherwise
        from dsp_tpu.kernels.dtw_fused_banded import plan_window
        covered = (cfg.dtw.band_frac is not None
                   and plan_window(cfg.dtw.band_frac, feats.feats.shape[1],
                                   bank.feats.shape[1])[4])
        impl = ("fused_banded"
                if covered and jax.default_backend() == "tpu" else "scan")
    if impl == "fused_banded":
        from dsp_tpu.kernels.dtw_fused_banded import dtw_batch_fused_banded
        dists = dtw_batch_fused_banded(feats.feats, feats.length,
                                       bank.feats, bank.length, cfg.dtw)
    elif impl == "pallas":
        from dsp_tpu.kernels.dtw_pallas import dtw_batch_pallas
        dists = dtw_batch_pallas(feats.feats, feats.length,
                                 bank.feats, bank.length, cfg.dtw, precision)
    elif impl == "fused":
        from dsp_tpu.kernels.dtw_fused import dtw_batch_fused
        dists = dtw_batch_fused(feats.feats, feats.length,
                                bank.feats, bank.length, cfg.dtw)
    else:
        dists = jdtw.dtw_batch(feats.feats, feats.length,
                               bank.feats, bank.length, cfg.dtw, precision)
    if k <= 1:
        best = jnp.argmin(dists, axis=-1)
        return jnp.take(bank_label_ids, best), dists
    if n_labels is None:
        raise ValueError("n_labels required for k > 1")
    # kNN vote: one-hot scatter of the k smallest distances per query
    _, top_idx = jax.lax.top_k(-dists, k)                     # [B, k]
    top_labels = jnp.take(bank_label_ids, top_idx)            # [B, k]
    votes = jax.nn.one_hot(top_labels, n_labels).sum(axis=1)  # [B, L]
    top_d = jnp.take_along_axis(dists, top_idx, axis=1)       # [B, k]
    dist_sum = (jax.nn.one_hot(top_labels, n_labels) * top_d[..., None]).sum(axis=1)
    # order by (votes desc, dist_sum asc): score = votes - eps*dist_sum
    score = votes - 1e-6 * dist_sum
    return jnp.argmax(score, axis=-1), dists


@functools.partial(jax.jit, static_argnames=("target_len", "precision"))
def classify_features_ltw(feats: Features, bank: Features,
                          bank_label_ids: jax.Array,
                          target_len: int = 64,
                          precision=jax.lax.Precision.HIGHEST):
    """Linear-time-warp matching: resample to ``target_len`` frames, then
    the whole bank comparison is ONE [B, L*F] @ [L*F, K] MXU matmul
    (squared-Euclidean expansion) — the classical fast baseline matcher,
    ~two orders of magnitude cheaper than DTW.
    Returns (label_ids [B], distances [B, K])."""
    from dsp_tpu.ops.frontend import time_normalize

    q = jax.vmap(lambda f, l: time_normalize(f, l, target_len))(
        feats.feats, feats.length)                      # [B, L, F]
    t = jax.vmap(lambda f, l: time_normalize(f, l, target_len))(
        bank.feats, bank.length)                        # [K, L, F]
    bsz, l, f = q.shape
    qf = q.reshape(bsz, l * f)
    tf = t.reshape(t.shape[0], l * f)
    cross = jnp.matmul(qf, tf.T, precision=precision)
    d = (jnp.sum(qf * qf, axis=-1, keepdims=True)
         + jnp.sum(tf * tf, axis=-1)[None, :] - 2.0 * cross) / (l * f)
    d = jnp.maximum(d, 0.0)
    return jnp.take(bank_label_ids, jnp.argmin(d, axis=-1)), d


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def recognize_batch(signals: jax.Array, n_samples: jax.Array,
                    mats: fe.FrontendMatrices,
                    bank: Features, bank_label_ids: jax.Array,
                    cfg: PipelineConfig = PipelineConfig(),
                    precision=jax.lax.Precision.HIGHEST):
    """End-to-end on device: padded signals -> (label_ids, distances)."""
    feats = extract_features(signals, n_samples, mats, cfg, precision)
    return classify_features(feats, bank, bank_label_ids, cfg=cfg,
                             precision=precision)
