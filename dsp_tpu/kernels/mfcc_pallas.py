"""Fused MFCC front-end as a single Pallas TPU kernel.

BASELINE.json north star: "the front-end chain (pre-emphasis, framing,
Hamming window, rFFT, mel filterbank, log-DCT MFCC) fuses into a single
Pallas kernel operating on batched frames".

Kernel structure (MelT GEMM-native NDFT, PAPERS.md): per grid step one
tile of frames [TILE_N, L] is DMA'd to VMEM and pushed through

    window (VPU) -> cos/sin DFT matmuls (MXU) -> power (VPU)
    -> mel matmul (MXU) -> log (VPU) -> DCT matmul (MXU) -> lifter (VPU)

with every constant matrix resident in VMEM across the whole grid
(~1.7 MB).  No intermediate (windowed frames, power spectrum, mel
energies) is ever written to HBM — the XLA composite in ops/frontend.py
materialises at least the power spectrum between matmuls.

Constant matrices are zero-padded to lane multiples (K bins 257->384,
mels 26->128, ceps 13->128); zero rows/columns make the padding exact
(padded power bins hit zero mel rows; padded mel columns hit zero DCT
rows), so the result equals the unpadded math bit-for-bit up to f32
rounding.  Parity oracle: dsp_tpu/golden/frontend.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsp_tpu.config import FrontendConfig
from dsp_tpu.ops.frontend import _matrices_np
from dsp_tpu.window_plan import LANE, round_up as _round_up

TILE_N = 256           # frames per grid step



@functools.lru_cache(maxsize=8)
def _padded_constants(cfg: FrontendConfig):
    """Lane-padded constant matrices (numpy, f32)."""
    window, dft_cos, dft_sin, mel_fb_t, dct_t, lifter = _matrices_np(cfg)
    l = cfg.frame_len
    kb = _round_up(cfg.n_bins, LANE)        # padded fft bins
    mm = _round_up(cfg.n_mels, LANE)        # padded mel bands
    cc = _round_up(cfg.n_mfcc, LANE)        # padded cepstra

    def pad(a, shape):
        out = np.zeros(shape, dtype=np.float32)
        out[tuple(slice(0, s) for s in a.shape)] = a
        return out

    return (
        pad(window[None, :], (1, l)),
        pad(dft_cos, (l, kb)),
        pad(dft_sin, (l, kb)),
        pad(mel_fb_t, (kb, mm)),
        pad(dct_t, (mm, cc)),
        pad(lifter[None, :], (1, cc)),
        kb, mm, cc,
    )


def _mfcc_kernel(frames_ref, win_ref, cos_ref, sin_ref, mel_ref, dct_ref,
                 lift_ref, out_ref, *, n_fft: int, log_floor: float,
                 n_mels: int, use_energy: bool):
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST      # bf16 MXU rounding visibly
    w = frames_ref[:] * win_ref[0, :][None, :]     # corrupts log-mel ceps
    re = jnp.dot(w, cos_ref[:], preferred_element_type=f32, precision=hi)
    im = jnp.dot(w, sin_ref[:], preferred_element_type=f32, precision=hi)
    power = (re * re + im * im) * (1.0 / n_fft)
    mel_e = jnp.dot(power, mel_ref[:], preferred_element_type=f32,
                    precision=hi)
    # padded mel columns hold 0 energy -> log(floor); zero DCT rows kill them
    log_mel = jnp.log(jnp.maximum(mel_e, log_floor))
    col = jax.lax.broadcasted_iota(jnp.int32, log_mel.shape, 1)
    log_mel = jnp.where(col < n_mels, log_mel, 0.0)
    ceps = jnp.dot(log_mel, dct_ref[:], preferred_element_type=f32,
                   precision=hi)
    ceps = ceps * lift_ref[0, :][None, :]
    if use_energy:
        # replace c0 with log frame energy of the pre-window frames,
        # mirroring ops/frontend.py:mfcc exactly
        frame_e = jnp.sum(frames_ref[:] * frames_ref[:], axis=-1,
                          keepdims=True)
        c0 = jnp.log(jnp.maximum(frame_e, log_floor))
        out_col = jax.lax.broadcasted_iota(jnp.int32, ceps.shape, 1)
        ceps = jnp.where(out_col == 0, c0, ceps)
    out_ref[:] = ceps


def mfcc_frames_pallas(frames: jax.Array,
                       cfg: FrontendConfig = FrontendConfig(),
                       interpret: bool = False) -> jax.Array:
    """Pre-emphasised frames [N, L] -> MFCC [N, n_mfcc], fused on TPU.

    N is padded to TILE_N internally; rows beyond the input are dropped.
    """
    if cfg.denoise is not None:
        raise ValueError("the fused MFCC kernel does not implement "
                         "FrontendConfig.denoise (needs a cross-frame "
                         "noise estimate); use impl='xla'")
    n, l = frames.shape
    if l != cfg.frame_len:
        raise ValueError(f"frames width {l} != cfg.frame_len "
                         f"{cfg.frame_len} — framed under a different "
                         "FrontendConfig?")
    win, cos, sin, mel, dct, lift, kb, mm, cc = _padded_constants(cfg)
    n_pad = _round_up(max(n, 1), TILE_N)
    if n_pad != n:
        frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))

    kernel = functools.partial(_mfcc_kernel, n_fft=cfg.n_fft,
                               log_floor=cfg.log_floor, n_mels=cfg.n_mels,
                               use_energy=cfg.use_energy)
    grid = (n_pad // TILE_N,)
    const_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, cc), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const_spec(), const_spec(), const_spec(), const_spec(),
            const_spec(), const_spec(),
        ],
        out_specs=pl.BlockSpec((TILE_N, cc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * l * (2 * kb) + 2 * n_pad * kb * mm
            + 2 * n_pad * mm * cc,
            bytes_accessed=n_pad * (l + cc) * 4,
            transcendentals=n_pad * mm,
        ),
        interpret=interpret,
    )(frames.astype(jnp.float32), jnp.asarray(win), jnp.asarray(cos),
      jnp.asarray(sin), jnp.asarray(mel), jnp.asarray(dct), jnp.asarray(lift))
    return out[:n, : cfg.n_mfcc]


def mfcc_pallas(x: jax.Array, cfg: FrontendConfig = FrontendConfig(),
                interpret: bool = False) -> jax.Array:
    """Signal [..., N] -> MFCC [..., T, n_mfcc] via the fused kernel.

    Pre-emphasis + framing stay in XLA (cheap gather); everything from the
    window onward runs in one Pallas program.  Batch dims are flattened
    into the frame axis so arbitrary [B, T] batches share one grid.
    """
    from dsp_tpu.ops.frontend import frame, preemphasis

    y = preemphasis(x, cfg.preemphasis)
    frames = frame(y, cfg.frame_len, cfg.hop_len)
    lead = frames.shape[:-1]
    flat = frames.reshape(-1, cfg.frame_len)
    ceps = mfcc_frames_pallas(flat, cfg, interpret)
    return ceps.reshape(*lead, cfg.n_mfcc)
