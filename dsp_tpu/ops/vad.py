"""Vectorized endpoint detection (VAD) in JAX.

Implements exactly the spec of the golden oracle (dsp_tpu/golden/vad.py)
but with *no sequential state machine at all*: every run-length quantity
is computed with a `cummax` trick, so the whole detector is a handful of
vector ops — ideal for the TPU VPU and trivially batchable with vmap.

Run-length trick: for a boolean flag sequence f[t],

    run_end[t]   = t - cummax_t( where(!f, t, -1) )

is the length of the consecutive-True run *ending* at t (0 if f[t] is
False).  Reversing gives runs *starting* at t.  First/last qualifying
positions then come from argmax over booleans (argmax returns the first
True), which replaces the double-threshold state machine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsp_tpu.config import FrontendConfig, VadConfig
from dsp_tpu.golden.vad import ZCR_ABS_FLOOR
from dsp_tpu.ops import frontend as fe


def short_time_energy(frames: jax.Array) -> jax.Array:
    return jnp.sum(frames * frames, axis=-1)


def zero_crossing_rate(frames: jax.Array) -> jax.Array:
    s = jnp.where(frames >= 0.0, 1.0, -1.0)
    return jnp.sum((s[..., 1:] != s[..., :-1]).astype(frames.dtype), axis=-1)


def _run_ending_at(flag: jax.Array) -> jax.Array:
    """Length of consecutive-True run ending at each position (inclusive)."""
    t = flag.shape[-1]
    idx = jnp.arange(t)
    last_false = jax.lax.cummax(jnp.where(flag, -1, idx), axis=flag.ndim - 1)
    return idx - last_false


def _run_starting_at(flag: jax.Array) -> jax.Array:
    return _run_ending_at(flag[..., ::-1])[..., ::-1]


def detect_endpoints_frames(
    e: jax.Array,
    z: jax.Array,
    length: jax.Array | None = None,
    vcfg: VadConfig = VadConfig(),
):
    """Core detector on per-frame energy/ZCR vectors [T].

    ``length`` (traced) is the count of valid frames; frames beyond it are
    ignored.  Returns (start, end_exclusive, found) as traced scalars.
    Matches dsp_tpu.golden.vad.detect_endpoints frame-for-frame.
    """
    t = e.shape[-1]
    idx = jnp.arange(t)
    if length is None:
        length = jnp.asarray(t)
    valid = idx < length

    n_init = jnp.minimum(vcfg.n_init, length)
    init_mask = (idx < n_init).astype(e.dtype)
    denom = jnp.maximum(jnp.sum(init_mask), 1.0)
    e_noise = jnp.sum(e * init_mask) / denom + vcfg.e_abs_floor
    z_noise = jnp.sum(z * init_mask) / denom
    th = e_noise * vcfg.e_high_mult
    tl = e_noise * vcfg.e_low_mult
    zt = z_noise * vcfg.zcr_mult + ZCR_ABS_FLOOR

    high = (e > th) & valid
    runs = _run_ending_at(high)
    qual = runs >= vcfg.min_speech_frames
    found = jnp.any(qual)
    t_first = jnp.argmax(qual)                       # first qualifying end
    start_core = t_first - vcfg.min_speech_frames + 1
    t_last = t - 1 - jnp.argmax(qual[::-1])          # last qualifying end
    end_core = t_last

    audible = ((e > tl) | (z > zt)) & valid
    back = _run_ending_at(audible)                   # run ending at t
    fwd = _run_starting_at(audible)                  # run starting at t
    start = jnp.where(
        start_core > 0,
        start_core - back[jnp.maximum(start_core - 1, 0)],
        0,
    )
    end = jnp.where(
        end_core + 1 < length,
        end_core + fwd[jnp.minimum(end_core + 1, t - 1)],
        end_core,
    )
    end_excl = jnp.minimum(length, end + 1 + vcfg.hangover_frames)

    start = jnp.where(found, start, 0)
    end_excl = jnp.where(found, end_excl, length)
    return start, end_excl, found


def detect_endpoints(
    x: jax.Array,
    fcfg: FrontendConfig = FrontendConfig(),
    vcfg: VadConfig = VadConfig(),
    length_samples: jax.Array | None = None,
):
    """Signal [N] -> (start_frame, end_frame_exclusive, found).

    Frames the RAW signal (no pre-emphasis) on the standard grid, like the
    golden spec.  ``length_samples`` masks padded signal tails.
    """
    frames = fe.frame(x, fcfg.frame_len, fcfg.hop_len)
    e = short_time_energy(frames)
    z = zero_crossing_rate(frames)
    if length_samples is None:
        n_frames = None
    else:
        n_frames = jnp.maximum(
            0, 1 + (length_samples - fcfg.frame_len) // fcfg.hop_len
        )
    return detect_endpoints_frames(e, z, n_frames, vcfg)
