"""Fused subsequence-DTW (keyword spotting) Pallas kernel.

Round-5 kernel (VERDICT r4 #3): the open-begin / open-end DP of
ops/spot.py — the last headline compute path still running as a plain
XLA row scan — rebuilt on the fused banded kernel's machinery
(kernels/dtw_fused_banded.py):

 1. **Cost via one augmented GEMM** per stream: the wrapper appends
    ``[-2a, |a|^2, 1]`` / ``[b, 1, |b|^2]`` features so a single MXU
    matmul emits the squared-Euclidean cost matrix [T_tmpl, U_stream]
    directly.
 2. **Closed-form row DP with a START-WITNESS payload.**  The row
    recurrence D[i,j] = c[i,j] + min(D[i,j-1], D[i-1,j], D[i-1,j-1])
    collapses (dtw_fused.py) to

        D[i,j] = CS_j + min_{s<=j} (m_s - CS_{s-1}),
        m_s    = min(D[i-1,s], D[i-1,s-1])      (0 at row 0: open begin)

    with CS the row prefix sums; the min is a Kogge-Stone cummin whose
    stages ALSO carry the start witness: a rolled (earlier-s) candidate
    replaces the resident one only when STRICTLY smaller, so exact ties
    keep the latest start — the same order as golden/spot.py
    (diagonal > vertical > horizontal, fresh start wins row-0 ties) and
    ops/spot.py's associative scan (witness parity is exact, not just
    allclose; tests/test_spot_fused.py asserts array_equal).  Caveat
    measured on the v5e at U=512 (docs/TPU_TESTS.md round 5): the
    kernel's prefix-sum rounding differs from the scan's balanced
    tree, so ~0.01% of decisions land on NEAR-ties — raw costs equal
    to ~1e-6 relative via two different starts — where the two paths
    return different (equally valid) witnesses, and hence different
    span-normalised scores.  The device test asserts raw-cost
    equality at every witness flip instead of exact witness parity.
 3. **Open end**: the whole row i == len_tmpl-1 is harvested (per-end-
    column D and witness), normalised in-kernel by the span convention
    norm[j] = D[j] / (T_tmpl + j - s[j] + 1), BIG at j >= len_stream.

No band/window phase: the stream axis is unbounded relative to the
template (ops/spot.py module doc), so rows run full width and the
banded kernel's extraction/realign machinery drops out entirely.

For ``squared=True`` the wrapper prefix-sums the augmented STREAM
features over U so the GEMM emits CS directly and the in-kernel cumsum
phase disappears (same trick as the banded kernel's template-axis
prefix sums).  The sqrt path (production default) must sqrt the raw
costs first, so it keeps an in-kernel Kogge-Stone cumsum.

Grid: (stream tiles x templates); the [ST, U_pad, Faug] stream block
stays resident across the template axis (fastest-varying), so HBM
traffic per grid step is one [T_pad, Faug] template block + the
[ST, U_pad] outputs.

Exact oracle: golden/spot.py:subseq_dtw (values allclose, witnesses
equal); equals ops/spot.py:subseq_dtw_batch on both counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsp_tpu.ops.dtw import BIG
from dsp_tpu.window_plan import LANE, round_up as _round_up

# Streams per grid step.  f32 sublane granularity is 8; the DP row ops
# run on [ST, U_pad] slabs so a wider tile amortises per-op issue cost
# at the price of ST x T_pad x U_pad x 4 bytes of VMEM cost scratch
# (8 x 200 x 1792 x 4 = 11.5 MB at the 16 s spotting shape).
STREAM_TILE = 8

# Rows unrolled per fori_loop block step (sublane-slice granularity).
ROW_BLOCK = 8


def _kernel(tl_s, sa_ref, ba_ref, slv_ref, norm_ref, start_ref, cq, cs, *,
            t_pad: int, u_pad: int, st: int, squared: bool):
    f32, i32 = jnp.float32, jnp.int32
    ki = pl.program_id(1)
    tl = tl_s[ki]                                    # template length
    tlm1 = tl - 1

    # ---- 1: cost GEMM per stream ----------------------------------------
    # HIGHEST is load-bearing (bf16 rounding corrupts prefix-summed
    # operands — dtw_fused_banded.py measured 50% argmin flips) and the
    # MXU work overlaps the VPU DP anyway.
    for q in range(st):                              # unrolled
        cq[:] = jax.lax.dot_general(
            ba_ref[0], sa_ref[q], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)     # [T_pad, U_pad]
        cs[q] = cq[:]

    lane3 = jax.lax.broadcasted_iota(i32, (st, t_pad, u_pad), 2)
    if not squared:
        # clamp + sqrt, then row prefix sums (squared mode gets CS
        # straight from the GEMM via the wrapper's stream-axis cumsum)
        cs[:] = jnp.sqrt(jnp.maximum(cs[:], 0.0))
        s = 1
        while s < u_pad:
            cs[:] = cs[:] + jnp.where(lane3 >= s,
                                      pltpu.roll(cs[:], s, axis=2), 0.0)
            s *= 2

    # ---- 2: closed-form row DP with start witnesses ---------------------
    lane = jax.lax.broadcasted_iota(i32, (st, u_pad), 1)
    col0 = lane == 0
    nb = t_pad // ROW_BLOCK

    def block_step(b, carry):
        dp, wp, kept_d, kept_s = carry
        i0 = b * ROW_BLOCK
        slab = cs[:, pl.ds(i0, ROW_BLOCK), :]        # [ST, RB, U_pad]
        for r in range(ROW_BLOCK):                   # unrolled
            i = i0 + r
            csr = slab[:, r, :]                      # row prefix sums CS
            cs_prev = jnp.where(col0, 0.0, pltpu.roll(csr, 1, axis=1))
            # m = min(diagonal, vertical), diagonal preferred on ties
            diag = jnp.where(col0, BIG, pltpu.roll(dp, 1, axis=1))
            diag_w = pltpu.roll(wp, 1, axis=1)
            m = jnp.minimum(diag, dp)
            wm = jnp.where(diag <= dp, diag_w, wp)
            # open begin: the virtual row above row 0 is 0, witness j
            row0 = i == 0
            m = jnp.where(row0, 0.0, m)
            wm = jnp.where(row0, lane, wm)
            # cummin of the entry terms, witness riding along; a rolled
            # (earlier-start) candidate wins only when STRICTLY smaller,
            # so exact ties keep the latest start (golden order)
            e = m - cs_prev
            we = wm
            ss = 1
            while ss < u_pad:
                er = jnp.where(lane >= ss,
                               pltpu.roll(e, ss, axis=1), BIG)
                wr = pltpu.roll(we, ss, axis=1)
                take = er < e
                e = jnp.where(take, er, e)
                we = jnp.where(take, wr, we)
                ss *= 2
            dp = csr + e
            wp = we
            at_end = i == tlm1
            kept_d = jnp.where(at_end, dp, kept_d)
            kept_s = jnp.where(at_end, wp, kept_s)
        return dp, wp, kept_d, kept_s

    init = (jnp.full((st, u_pad), BIG, f32), jnp.zeros((st, u_pad), i32),
            jnp.full((st, u_pad), BIG, f32), jnp.zeros((st, u_pad), i32))
    _, _, kept_d, kept_s = jax.lax.fori_loop(0, nb, block_step, init)

    # ---- 3: open-end harvest + span normalisation -----------------------
    span = (lane - kept_s + 1).astype(f32)
    norm = kept_d / (tl.astype(f32) + span)
    norm = jnp.where(lane < slv_ref[:], norm, BIG)   # cols >= len_stream
    # outputs are laid out [K, B, U]: a [1, ST, U_pad] block satisfies
    # Mosaic's (8, 128) tiling on its last two dims, which the natural
    # [B, K, U] layout's [ST, 1, U_pad] block cannot (K is unconstrained)
    norm_ref[:] = norm[None, :, :]
    start_ref[:] = kept_s[None, :, :]


def _augment(tmpl: jax.Array, stream: jax.Array):
    """Features such that one GEMM emits the squared-Euclidean cost
    (template rows x stream columns)."""
    f32 = jnp.float32
    a = tmpl.astype(f32)
    b = stream.astype(f32)
    asq = jnp.sum(a * a, axis=-1, keepdims=True)
    bsq = jnp.sum(b * b, axis=-1, keepdims=True)
    aa = jnp.concatenate([-2.0 * a, asq, jnp.ones_like(asq)], axis=-1)
    ba = jnp.concatenate([b, jnp.ones_like(bsq), bsq], axis=-1)
    return aa, ba


@functools.partial(jax.jit,
                   static_argnames=("squared", "interpret", "stream_tile"))
def subseq_dtw_fused(streams: jax.Array, stream_lens: jax.Array,
                     bank: jax.Array, bank_lens: jax.Array,
                     squared: bool = False, interpret: bool = False,
                     stream_tile: int = STREAM_TILE):
    """All-pairs subsequence DTW: [B,U,F] x [K,T,F] ->
    (norm [B,K,U], start [B,K,U]).  Drop-in for
    ops/spot.py:subseq_dtw_batch (same normalisation, witnesses, BIG
    tail columns)."""
    bsz, u, f = streams.shape
    k, t, _ = bank.shape
    st = stream_tile
    b_pad = _round_up(bsz, st)
    u_pad = _round_up(u, LANE)
    t_pad = _round_up(t, ROW_BLOCK)

    ba, sa = _augment(bank, streams)
    faug = sa.shape[-1]
    sa = jnp.pad(sa, ((0, b_pad - bsz), (0, u_pad - u), (0, 0)))
    ba = jnp.pad(ba, ((0, 0), (0, t_pad - t), (0, 0)))
    if squared:
        # stream-axis prefix sums: the GEMM then emits CS(i, j) directly
        # and the in-kernel cumsum phase disappears
        sa = jnp.cumsum(sa, axis=1)
    sl = jnp.maximum(stream_lens.astype(jnp.int32), 1)
    slv = jnp.pad(sl, (0, b_pad - bsz), constant_values=1)[:, None]
    tl_s = jnp.maximum(bank_lens.astype(jnp.int32), 1)

    kernel = functools.partial(_kernel, t_pad=t_pad, u_pad=u_pad, st=st,
                               squared=squared)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // st, k),
        in_specs=[
            pl.BlockSpec((st, u_pad, faug), lambda si, ki, *_: (si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, faug), lambda si, ki, *_: (ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((st, 1), lambda si, ki, *_: (si, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, st, u_pad), lambda si, ki, *_: (ki, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st, u_pad), lambda si, ki, *_: (ki, si, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_pad, u_pad), jnp.float32),
            pltpu.VMEM((st, t_pad, u_pad), jnp.float32),
        ],
    )
    norm, start = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((k, b_pad, u_pad), jnp.float32),
                   jax.ShapeDtypeStruct((k, b_pad, u_pad), jnp.int32)],
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * k * t_pad * u_pad * faug,
            bytes_accessed=(b_pad * u_pad + k * t_pad) * faug * 4
            + 2 * b_pad * k * u_pad * 4,
            transcendentals=b_pad * k * t_pad * u_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tl_s, sa, ba, slv)
    return (jnp.moveaxis(norm, 0, 1)[:bsz, :, :u],
            jnp.moveaxis(start, 0, 1)[:bsz, :, :u])
