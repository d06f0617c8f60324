"""Golden numpy endpoint detection (VAD).

Classic energy + zero-crossing-rate double-threshold endpoint detector
(SURVEY.md L1; the reference's "endpoint detection" per BASELINE.json).
The exact algorithm is *specified here* (no reference checkout exists —
SURVEY.md §0); the JAX scan implementation in dsp_tpu/ops/vad.py must
match this loop version exactly (integer frame indices, bit-for-bit).

Spec (offline, isolated word):

1. Frame the RAW signal (no pre-emphasis) with the front-end's
   frame/hop; compute per-frame energy E[t] = sum(frame^2) and
   zero-crossing count Z[t] (sign(0) := +1).
2. Noise statistics from the first ``n_init`` frames:
   e_noise = mean(E[:n_init]) + e_abs_floor,  z_noise = mean(Z[:n_init]).
   Thresholds: TH = e_noise * e_high_mult, TL = e_noise * e_low_mult,
   ZT = z_noise * zcr_mult + 5.0.
3. A *core* region runs from the first frame of the first run of
   ``min_speech_frames`` consecutive frames with E > TH, to the last
   frame of the last such run.
4. The start is extended backwards while (E > TL or Z > ZT) holds on the
   preceding frame; the end symmetrically forwards; then
   ``hangover_frames`` extra frames are appended to the end.
5. If no core run exists the whole signal is returned with found=False.

Returns (start_frame, end_frame_exclusive, found).
"""

from __future__ import annotations

import numpy as np

from dsp_tpu.config import FrontendConfig, VadConfig
from dsp_tpu.golden.frontend import frame_signal

ZCR_ABS_FLOOR = 5.0


def short_time_energy(frames: np.ndarray) -> np.ndarray:
    """Per-frame sum of squares -> [n_frames]."""
    return np.sum(np.asarray(frames, dtype=np.float64) ** 2, axis=-1)


def zero_crossing_rate(frames: np.ndarray) -> np.ndarray:
    """Per-frame count of sign changes (sign(0) := +1) -> [n_frames]."""
    frames = np.asarray(frames, dtype=np.float64)
    s = np.where(frames >= 0.0, 1.0, -1.0)
    return np.sum(s[..., 1:] != s[..., :-1], axis=-1).astype(np.float64)


def detect_endpoints(
    x: np.ndarray,
    fcfg: FrontendConfig = FrontendConfig(),
    vcfg: VadConfig = VadConfig(),
):
    """Detect the speech region of an isolated-word signal.

    Returns (start_frame, end_frame_exclusive, found); frame indices are
    on the standard framing grid of ``fcfg``.
    """
    frames = frame_signal(x, fcfg.frame_len, fcfg.hop_len)
    n = frames.shape[0]
    if n == 0:
        return 0, 0, False
    e = short_time_energy(frames)
    z = zero_crossing_rate(frames)

    n_init = min(vcfg.n_init, n)
    e_noise = float(np.mean(e[:n_init])) + vcfg.e_abs_floor
    z_noise = float(np.mean(z[:n_init]))
    th = e_noise * vcfg.e_high_mult
    tl = e_noise * vcfg.e_low_mult
    zt = z_noise * vcfg.zcr_mult + ZCR_ABS_FLOOR

    high = e > th
    # first / last run of min_speech_frames consecutive high frames
    start_core = -1
    end_core = -1
    run = 0
    for t in range(n):
        run = run + 1 if high[t] else 0
        if run >= vcfg.min_speech_frames:
            if start_core < 0:
                start_core = t - vcfg.min_speech_frames + 1
            end_core = t
    if start_core < 0:
        return 0, n, False

    audible = (e > tl) | (z > zt)
    start = start_core
    while start > 0 and audible[start - 1]:
        start -= 1
    end = end_core
    while end + 1 < n and audible[end + 1]:
        end += 1
    end_excl = min(n, end + 1 + vcfg.hangover_frames)
    return int(start), int(end_excl), True
