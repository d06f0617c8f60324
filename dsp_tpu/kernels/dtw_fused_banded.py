"""Fused banded DTW kernel: Sakoe-Chiba window computed entirely in VMEM.

This is the round-2 kernel the round-1 cost model called for
(docs/PERF.md "Fused-kernel cost model"): the XLA scan and the unbanded
fused kernel both pay O(T*U) vector work per pair; with a Sakoe-Chiba
band only an O(T*W) window of the cost matrix is ever finite, so the
whole pipeline — cost GEMM, prefix sums, closed-form row DP — runs on a
``W``-lane window (W = 128 for the classical band_frac ~0.1..0.2 setups
vs U_pad = 256 full width), roughly halving VPU element volume.

Per grid step (QUERY_TILE queries x 1 template):

 1. **Cost via one augmented GEMM.**  The wrapper appends two features
    (``[-2a, |a|^2, 1]`` / ``[b, 1, |b|^2]``) so a single MXU matmul
    emits the squared-Euclidean cost directly — no separate |a|^2+|b|^2
    assembly passes.
 2. **Window extraction.**  Per query and ROW_BLOCK rows, the window
    start ``off`` is computed on the scalar unit with *integer-exact*
    arithmetic (the band rule |j*lam1 - i*lbm1| <= r2, see
    ops/dtw.py:band_r2) and the window is peeled off with one dynamic
    lane roll + static slice-store into the [QT, T_pad, W] scratch.
 3. **In-place Kogge-Stone prefix sums** over the window lanes.
 4. **Closed-form row DP** (D_j = CS_j + cummin(m - CS_{j-1}), as in
    dtw_fused.py) in window coordinates.  Between row blocks the DP
    state is realigned by the window advance ``s`` (a multiple of 8,
    applied as log2(S_MAX/8) static rolls selected per pair); the -8
    window-start slack keeps lane 0 out-of-band whenever off > 0, so no
    legal path ever crosses the window's left edge.
 5. The answer cell (la-1, lb-1) is harvested during the sweep; the
    final [QT, LANE] output block revolves over templates (dtw_fused.py
    mechanism).

Semantics: *windowed* banded DTW — the Sakoe-Chiba band intersected with
the quantised window (golden/dtw.py:windowed_band_mask is the exact
oracle).  Whenever the static window covers the whole band (the common
case; see ``plan_window``) this equals the pure banded DTW of
ops/dtw.py:dtw_batch with the same ``band_frac`` exactly.  With
``band_frac=None`` the window is the full row and the kernel computes
plain unbanded DTW.

Masked/BIG bookkeeping notes (the bug farm — SURVEY.md "hard parts"):
out-of-window or out-of-band cells keep their *raw finite* cost in the
prefix sums (differences over in-band runs cancel them; BIG would
poison the closed form) and are forbidden through the entry term ``e``
instead, which also forces D=BIG at invalid lanes for the next row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsp_tpu.config import DtwConfig
from dsp_tpu.ops.dtw import BIG
from dsp_tpu.window_plan import LANE, plan_window, round_up as _round_up

# QUERY_TILE=256 measured 1.31x faster than 128 at the band-0.17
# (row_block=16) plan — 37.8 vs 49.4 ms at 25,600 pairs (B=256, v5e; at
# the old rb=32 plan the two tiles were equal; VMEM cs scratch at 256 is
# ~27 MB).  Shipped as default in round 3 after cache-warming the
# bench-shape compile (the round-2 blocker); see docs/PERF.md.
QUERY_TILE = 256

# Microbench-only phase ablation (scripts/mb_fused_banded.py --ablate):
# None (off), "no_dp" (stop after extraction), "no_roll" (skip the window
# roll), "no_gemm" (skip the cost GEMM; stale cq), "static_off" (constant
# window offsets).  All but None produce WRONG results — timing only.
# Measured phase budget on v5e: docs/PERF.md "Round-2 ablations".
_ABLATE = None

# Staged window extraction: replace the per-row-block scalar->vector
# dependent iterations (nb dynamic rolls per query; measured ~140 cycles
# of issue overhead each, docs/PERF.md round-2 ablations) with a
# vectorized per-row offset computation + log2(u_pad/8) masked STATIC
# roll stages over the whole [T_pad, U_pad] block — fewer, wider ops.
# Offsets are bit-identical to the scalar chain (the sequential
# off=min(raw, off_prev+s_max) clamp is a prefix-min in disguise:
# off_b = min_{j<=b}(raw_j - j*s_max) + b*s_max).  Results are
# bit-identical either way (parity: tests/test_fused_banded.py).
# MEASURED NEGATIVE on v5e (round 3, docs/PERF.md): at QT=64/B=256 the
# staged path is 1.24x SLOWER than the scalar chain (77.6 vs 62.5 ms —
# the log2 masked roll stages move the full [T_pad, U_pad] block per
# stage, costing more VPU bandwidth than the narrow scalar iterations
# cost in issue overhead), and at the shipped QT=256 its Mosaic compile
# exceeds 40 min (disqualifying for cold start regardless of runtime).
# Kept OFF, retained for the parity test + the record; this closes the
# last "batch the per-block scalar work" extraction idea (ROADMAP #3).
_STAGED_EXTRACT = False


def _exact_floordiv(a, b):
    """floor(a/b) for int32 a>=0, b>=1 — float-divide then integer-fix."""
    f32 = jnp.float32
    q0 = (a.astype(f32) / b.astype(f32)).astype(jnp.int32)
    r = a - q0 * b
    return q0 + (r >= b).astype(jnp.int32) - (r < 0).astype(jnp.int32)


def _kernel(la_s, lb_s, qf_ref, bf_ref, lav_ref, out_ref, cq, cs, *,
            t_pad: int, u_pad: int, w: int, s_max: int, span: int, rb: int,
            band_frac, squared: bool, qt: int, slope):
    f32, i32 = jnp.float32, jnp.int32
    qi = pl.program_id(0)
    ki = pl.program_id(1)
    lb = lb_s[ki]
    lbm1 = lb - 1
    banded = band_frac is not None
    windowed = banded and w < u_pad
    nb = t_pad // rb

    # ---- 1+2: cost GEMM + window extraction, per query ------------------
    # squared path: the wrapper prefix-sums the template features over U,
    # so the GEMM emits row prefix sums CS(i, j) directly and the whole
    # in-kernel Kogge-Stone cumsum phase disappears.
    # HIGHEST precision is load-bearing on the prefix-summed operands
    # (bf16 rounding: 5% distance error / 50% argmin flips on v5e) and
    # measured FREE either way — the MXU fully overlaps the VPU-side
    # extraction (docs/PERF.md round-2 ablations).
    for q in range(qt):                                      # unrolled
        a = qf_ref[q]                                        # [T_pad, Faug]
        if _ABLATE != "no_gemm":                 # no_gemm: stale cq, timing only
            cq[:] = jax.lax.dot_general(a, bf_ref[0], (((1,), (1,)), ((), ())),
                                        preferred_element_type=f32,
                                        precision=jax.lax.Precision.HIGHEST)
        if windowed and _STAGED_EXTRACT and _ABLATE is None:
            la = la_s[qi * qt + q]
            lam1 = jnp.maximum(la - 1, 1)
            radius = jnp.maximum(
                f32(1.0), f32(band_frac) * jnp.maximum(la, lb).astype(f32))
            r2 = jnp.floor(radius * lam1.astype(f32)).astype(i32)
            # per-row window offsets, fully vectorized (constant within
            # each row block since i0r is the block-start row)
            row = jax.lax.broadcasted_iota(i32, (t_pad, 1), 0)
            i0r = (row // rb) * rb
            num = jnp.maximum(i0r * lbm1 - r2, 0)
            jlo = _exact_floordiv(num + lam1 - 1, lam1)
            raw = jnp.maximum((jlo // 8) * 8 - 8, 0)
            clip8 = ((jnp.maximum(lb - w, 0) + 7) // 8) * 8
            raw = jnp.minimum(raw, clip8)
            # sequential clamp off_b = min(raw_b, off_{b-1} + s_max) in
            # closed form: prefix-min of raw_b - b*s_max, then shift back
            bidx = row // rb
            g = raw - bidx * s_max
            step = rb
            while step < t_pad:
                g = jnp.minimum(g, jnp.where(row >= step,
                                             pltpu.roll(g, step, axis=0),
                                             i32(2 ** 30)))
                step *= 2
            off_r = g + bidx * s_max
            # decompose the right-roll amount into 8*2^k bit stages
            shift = jnp.where(off_r == 0, 0, u_pad - off_r)
            x = cq[:]
            c = 8
            while c < u_pad:
                bit = (shift & c) != 0
                x = jnp.where(bit, pltpu.roll(x, c, axis=1), x)
                c *= 2
            cs[q] = x[:, :w]
        elif windowed:
            la = la_s[qi * qt + q]
            lam1 = jnp.maximum(la - 1, 1)
            radius = jnp.maximum(
                f32(1.0), f32(band_frac) * jnp.maximum(la, lb).astype(f32))
            r2 = jnp.floor(radius * lam1.astype(f32)).astype(i32)
            off_prev = jnp.asarray(0, i32)
            for b in range(nb):                              # unrolled
                i0 = b * rb
                if _ABLATE == "static_off":
                    off = jnp.asarray(min(b * 8, u_pad - w), i32)
                else:
                    num = jnp.maximum(i0 * lbm1 - r2, 0)
                    jlo = (num + lam1 - 1) // lam1
                    off = jnp.maximum((jlo // 8) * 8 - 8, 0)
                    # right-edge clip, ceil'd to 8: every off stays a
                    # multiple of 8 (the realign stages shift by 8s only)
                    clip8 = ((jnp.maximum(lb - w, 0) + 7) // 8) * 8
                    off = jnp.minimum(off, clip8)
                    off = jnp.minimum(off, off_prev + s_max)
                off_prev = off
                blk = cq[i0:i0 + rb, :]
                if _ABLATE == "no_roll":
                    win = blk
                else:
                    win = pltpu.roll(blk, (u_pad - off) % u_pad, axis=1)
                cs[q, i0:i0 + rb, :] = win[:, :w]
        else:
            cs[q] = cq[:, :w]

    if _ABLATE == "no_dp":
        out_ref[:] = cs[:, 0, :LANE][:, :out_ref.shape[1]]
        return

    if not squared:
        # ---- 1.5: clamp + sqrt ------------------------------------------
        cs[:] = jnp.sqrt(jnp.maximum(cs[:], 0.0))
    if not squared and slope is None:
        # in-place window prefix sums (closed-form row DP needs CS; the
        # Itakura DP reads raw costs and skips this phase entirely)
        lane3 = jax.lax.broadcasted_iota(i32, (qt, t_pad, w), 2)
        s = 1
        while s < w:
            cs[:] = cs[:] + jnp.where(lane3 >= s,
                                      pltpu.roll(cs[:], s, axis=2), 0.0)
            s *= 2

    # ---- 4: row DP in window coordinates ---------------------------------
    lav = lav_ref[:]                                         # [QT, 1] i32
    lam1v = jnp.maximum(lav - 1, 1)
    lane = jax.lax.broadcasted_iota(i32, (qt, w), 1)
    col0 = lane == 0
    if banded:
        radius_v = jnp.maximum(
            f32(1.0), f32(band_frac) * jnp.maximum(lav, lb).astype(f32))
        r2v = jnp.floor(radius_v * lam1v.astype(f32)).astype(i32)

    itak = slope == "itakura"

    def block_step(b, carry):
        dp, ndp, kept, hl, off_prev = carry
        i0 = b * rb
        if windowed:
            num = jnp.maximum(i0 * lbm1 - r2v, 0)
            jlo = _exact_floordiv(num + lam1v - 1, lam1v)
            off = jnp.maximum(((jlo >> 3) << 3) - 8, 0)
            clip8 = ((jnp.maximum(lb - w, 0) + 7) >> 3) << 3
            off = jnp.minimum(off, clip8)
            off = jnp.minimum(off, off_prev + s_max)
            s_v = off - off_prev                             # [QT,1] 8k <= S_MAX
            # (no left-edge diagonal carry needed: the -8 window slack
            # keeps lane 0 out-of-band whenever off > 0, so the only
            # boundary-crossing entry targets an invalid cell)

            def realign(state):
                aligned = state
                c = 8
                while c <= s_max:                            # static stages
                    bit = (s_v & c) != 0
                    aligned = jnp.where(
                        bit, pltpu.roll(aligned, w - c, axis=1), aligned)
                    c *= 2
                return jnp.where(lane < w - s_v, aligned, BIG)

            dp = realign(dp)
            if itak:
                ndp = realign(ndp)
            in_blk = ((lav - 1) >= i0) & ((lav - 1) < i0 + rb)
            hl = jnp.where(in_blk, lbm1 - off, hl)
        else:
            off = off_prev
        jv = lane + off if windowed else lane
        if banded:
            jlam = jv * lam1v
            jvalid = jv <= lbm1
        else:
            jvalid = jv <= lbm1

        slab = cs[:, pl.ds(i0, rb), :]                       # [QT, RB, W]
        for r in range(rb):                                  # unrolled
            i = i0 + r
            csr = slab[:, r, :]
            start = jnp.where(i == 0, 0.0, BIG)
            if banded:
                validr = (jnp.abs(jlam - i * lbm1) <= r2v) & jvalid
            else:
                validr = jvalid
            if itak:
                # Itakura two-state row (ops/dtw.py:dtw_from_cost_itakura):
                # raw costs, no prefix sums, no span sweep.  Lanes 0..1
                # take BIG preds at off>0 — legal, since the -8 slack
                # keeps them out-of-band anyway.
                s1 = jnp.where(col0, start, pltpu.roll(dp, 1, axis=1))
                s2 = jnp.where(lane <= 1, BIG, pltpu.roll(dp, 2, axis=1))
                n_new = jnp.where(validr, csr + jnp.minimum(s1, s2), BIG)
                dp = jnp.where(validr, jnp.minimum(n_new, csr + ndp), BIG)
                ndp = n_new
            else:
                cs_shift = jnp.where(col0, 0.0, pltpu.roll(csr, 1, axis=1))
                shifted = jnp.where(col0, start, pltpu.roll(dp, 1, axis=1))
                m = jnp.minimum(dp, shifted)
                e = jnp.where(validr, m - cs_shift, BIG)
                ss = 1
                while ss < span:
                    # wrap mask needed on EVERY sweep (dtw_fused.py pitfall a)
                    e = jnp.minimum(e, jnp.where(lane >= ss,
                                                 pltpu.roll(e, ss, axis=1),
                                                 BIG))
                    ss *= 2
                # mask invalid DESTINATION lanes too: the cummin propagates
                # finite entries past the band edge within the row otherwise
                dp = jnp.where(validr, csr + e, BIG)
            kept = jnp.where((lav - 1) == i, dp, kept)
        return dp, ndp, kept, hl, off

    bigrow = jnp.full((qt, w), BIG, f32)
    init = (bigrow, bigrow if itak else jnp.zeros((), f32),
            jnp.full((qt, w), BIG, f32),
            jnp.broadcast_to(jnp.asarray(lbm1, i32), (qt, 1)),
            jnp.zeros((qt, 1), i32))
    _, _, kept, hl, _ = jax.lax.fori_loop(0, nb, block_step, init)

    # ---- 5: harvest + revolving output block ----------------------------
    onehot = (lane == hl).astype(f32)
    val = jnp.sum(kept * onehot, axis=1, keepdims=True)      # [QT, 1]
    # answer cell outside the window (extreme warp, S_MAX clamp bound):
    # the path is unreachable under windowed semantics -> BIG, not 0
    val = jnp.where((hl >= 0) & (hl < w), val, BIG)
    out_lane = jax.lax.broadcasted_iota(i32, out_ref.shape, 1)

    @pl.when(ki % LANE == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = jnp.where(out_lane == ki % LANE, val, out_ref[:])


def _augment(q: jax.Array, b: jax.Array):
    """Features such that one GEMM emits the squared-Euclidean cost."""
    f32 = jnp.float32
    q = q.astype(f32)
    b = b.astype(f32)
    qsq = jnp.sum(q * q, axis=-1, keepdims=True)
    bsq = jnp.sum(b * b, axis=-1, keepdims=True)
    ones_q = jnp.ones_like(qsq)
    ones_b = jnp.ones_like(bsq)
    qa = jnp.concatenate([-2.0 * q, qsq, ones_q], axis=-1)
    ba = jnp.concatenate([b, ones_b, bsq], axis=-1)
    return qa, ba


def dtw_batch_fused_banded(queries: jax.Array, q_lens: jax.Array,
                           bank: jax.Array, bank_lens: jax.Array,
                           cfg: DtwConfig = DtwConfig(band_frac=0.1),
                           interpret: bool = False) -> jax.Array:
    """All-pairs (windowed-)banded DTW: [B,T,F] x [K,U,F] -> [B,K].

    Exact oracle: golden/dtw.py:dtw_distance_masked over
    windowed_band_mask(...); equals ops/dtw.py banded dtw_batch whenever
    plan_window reports the band fully covered.
    """
    max_b = 512
    if queries.shape[0] > max_b:
        outs = [dtw_batch_fused_banded(queries[lo:lo + max_b],
                                       q_lens[lo:lo + max_b],
                                       bank, bank_lens, cfg, interpret)
                for lo in range(0, queries.shape[0], max_b)]
        return jnp.concatenate(outs, axis=0)

    bsz, t, f = queries.shape
    k, u, _ = bank.shape
    if cfg.slope not in (None, "itakura"):
        raise ValueError(f"unknown DtwConfig.slope {cfg.slope!r}")
    if cfg.band_frac is not None and cfg.max_warp_scale is None:
        raise ValueError(
            "the fused banded kernel implements the windowed band "
            "(DtwConfig.max_warp_scale set); use impl='scan' for the "
            "pure unbounded-slope band")
    w, s_max, span, rb, _covered = plan_window(cfg.band_frac, t, u,
                                               cfg.max_warp_scale)
    # NEGATIVE RESULT (docs/PERF.md): running the Itakura DP on
    # full-width rows (w = u_pad, no window extraction) measured 20.7 ms
    # vs 17.3 ms windowed at the reference workload — the wider DP rows
    # cost more than the extraction they remove.  Keep the window.
    t_pad = _round_up(t, rb)
    u_pad = _round_up(u, LANE)
    # wide query tiles amortise the DP's per-op cost (measured on v5e:
    # 59 / 35 / 24 ms at QT 32/64/128 for 12,800 pairs); small batches
    # shrink the tile instead of padding up to 128
    qt = max(16, min(QUERY_TILE, _round_up(bsz, 16)))
    b_pad = _round_up(bsz, qt)
    k_pad = _round_up(k, LANE)

    qa, ba = _augment(queries, bank)
    faug = qa.shape[-1]
    qa = jnp.pad(qa, ((0, b_pad - bsz), (0, t_pad - t), (0, 0)))
    ba = jnp.pad(ba, ((0, 0), (0, u_pad - u), (0, 0)))
    if cfg.squared and cfg.slope is None:
        # prefix-sum the template features over U: the kernel's GEMM then
        # emits row prefix sums of the cost and skips its cumsum phase
        # (the Itakura DP consumes raw costs — no prefix sums anywhere)
        ba = jnp.cumsum(ba, axis=1)
    la = jnp.maximum(q_lens.astype(jnp.int32), 1)
    la_s = jnp.pad(la, (0, b_pad - bsz), constant_values=1)
    lav = la_s[:, None]
    lb_s = jnp.maximum(bank_lens.astype(jnp.int32), 1)

    kernel = functools.partial(
        _kernel, t_pad=t_pad, u_pad=u_pad, w=w, s_max=s_max, span=span,
        rb=rb, band_frac=cfg.band_frac, squared=cfg.squared, qt=qt,
        slope=cfg.slope)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_pad // qt, k),
        in_specs=[
            pl.BlockSpec((qt, t_pad, faug),
                         lambda qi, ki, *_: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u_pad, faug), lambda qi, ki, *_: (ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 1), lambda qi, ki, *_: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qt, LANE),
                               lambda qi, ki, *_: (qi, ki // LANE),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t_pad, u_pad), jnp.float32),
            pltpu.VMEM((qt, t_pad, w), jnp.float32),
        ],
    )
    raw = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, k_pad), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * k * t_pad * u_pad * faug,
            bytes_accessed=(b_pad * t_pad + k * u_pad) * faug * 4,
            transcendentals=b_pad * k * t_pad * w,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(la_s, lb_s, qa, ba, lav)
    dist = raw[:bsz, :k] / (q_lens[:, None]
                            + bank_lens[None, :]).astype(jnp.float32)
    return dist
