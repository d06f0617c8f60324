"""Fully fused DTW kernel: features in, distances out, nothing in HBM.

The XLA scan path (ops/dtw.py) materialises the [P, T, U] cost tensor in
HBM and pays ~30 XLA ops/row; docs/PERF.md measures both as the ~48 ms
floor at 12,800 pairs.  This kernel keeps EVERYTHING on-chip:

  per grid step (one template x QB queries):
    1. cost[q] = |a|^2 + |b|^2 - 2 a.b    - QB small MXU matmuls -> VMEM
    2. in-place Kogge-Stone prefix-sum over lanes: CS[q,i,j] = sum c[q,i,:j]
    3. row loop: the min-plus row recurrence in closed form
           D_j = CS_j + cummin_{l<=j}( m_l - CS_{l-1} ),
       one cummin sweep (8 roll+min) instead of the tuple assoc-scan
       (8 x (2 rolls + min + 2 adds)); masked lanes are sanitised to +BIG
       so the wrap-around of pltpu.roll cannot poison the cummin.
    4. the DP row at i == len_a-1 is harvested; its column len_b-1 is the
       unnormalised distance.

Numerics: CS introduces f32 cancellation ~1e-4 absolute on row sums of
~200 costs — harmless for classification (validated vs golden);
length masking is a BIG *suffix* so prefix sums stay clean (this closed
form is NOT safe with in-row band masking — unbanded only).

Status: experimental (opt-in via DtwConfig(impl="fused")); exact-parity
tested in interpret mode and on device vs the scan (argmin agreement
100%).  Measured on v5e at 12,800 pairs: ~58 ms vs the scan's ~48 ms —
the DP's per-vector-op fixed cost (~25-30 cycles) dominates, amortised
by QUERY_TILE=40/48 but not eliminated.  What the kernel buys today is
MEMORY: O(B*T*F + K*U*F), no [B,K,T,U] HBM cost tensor, so huge B*K runs
unchunked.  The round-2 banded variant shrinks the DP width and sweep
count for the actual speedup (docs/PERF.md cost model).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsp_tpu.config import DtwConfig
from dsp_tpu.ops.dtw import BIG
from dsp_tpu.window_plan import LANE, round_up as _round_up

QUERY_TILE = 40



def _fused_kernel(lb_sref, qf_ref, bf_ref, la_ref, out_ref,
                  cs, d_prev, kept, *, t: int, u: int, u_pad: int, squared: bool):
    qb = qf_ref.shape[0]
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (qb, u_pad), 1)
    lb = lb_sref[pl.program_id(1)]                            # scalar prefetch
    la = la_ref[:]                                            # [QB, 1]

    # ---- 1. cost into VMEM scratch --------------------------------------
    bf = bf_ref[0]                                            # [U_pad, F]
    sqb = jnp.sum(bf * bf, axis=-1)[None, :]                  # [1, U_pad]
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (t, u_pad), 1)
    for q in range(qb):                                       # unrolled
        a = qf_ref[q]                                         # [T, F]
        cross = jnp.dot(a, bf.T, preferred_element_type=f32)  # [T, U_pad]
        sqa = jnp.sum(a * a, axis=-1)[:, None]
        sq = jnp.maximum(sqa + sqb - 2.0 * cross, 0.0)
        c = sq if squared else jnp.sqrt(sq)
        cs[q] = jnp.where(lane_row < lb, c, BIG)

    # ---- 2. in-place prefix sum over lanes -------------------------------
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (qb, t, u_pad), 2)
    s = 1
    while s < u_pad:
        rolled = pltpu.roll(cs[:], s, axis=2)
        cs[:] = cs[:] + jnp.where(lane3 >= s, rolled, 0.0)
        s *= 2

    # ---- 3. DP row loop ---------------------------------------------------
    d_prev[:] = jnp.full_like(d_prev, BIG)
    kept[:] = jnp.full_like(kept, BIG)
    col0 = lane == 0
    valid_lane = lane < lb

    def row_block(ii, _):
        # one ALIGNED sublane-tile read per 8 rows (a dynamic per-row read
        # of cs[:, i, :] is tile-strided and dominated the kernel)
        i0 = ii * 8
        blk = cs[:, pl.ds(i0, 8), :]                          # [QB, 8, U_pad]
        dp = d_prev[:]
        kp = kept[:]
        for r in range(8):                                    # unrolled
            i = i0 + r
            cs_row = blk[:, r, :]                             # static slice
            cs_shift = jnp.where(col0, 0.0, pltpu.roll(cs_row, 1, axis=1))
            start = jnp.where(i == 0, 0.0, BIG)
            shifted = jnp.where(col0, start, pltpu.roll(dp, 1, axis=1))
            m = jnp.minimum(dp, shifted)
            e = jnp.where(valid_lane, m - cs_shift, BIG)
            ss = 1
            while ss < u_pad:
                # the wrap mask is required on EVERY sweep: after the first
                # sweep the padded lanes hold real cummin values
                rolled = jnp.where(lane >= ss, pltpu.roll(e, ss, axis=1), BIG)
                e = jnp.minimum(e, rolled)
                ss *= 2
            dp = cs_row + e
            kp = jnp.where(la == i, dp, kp)                   # la holds len-1
        d_prev[:] = dp
        kept[:] = kp
        return 0

    jax.lax.fori_loop(0, t // 8, row_block, 0)

    onehot = (lane == lb - 1).astype(f32)
    val = jnp.sum(kept[:] * onehot, axis=1, keepdims=True)    # [QB, 1]
    # the out block [QB, LANE] revolves across LANE consecutive template
    # steps; Mosaic cannot do dynamic single-lane stores, so each step
    # does a masked read-modify-write of the whole (VMEM-resident) block
    ki = pl.program_id(1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)

    @pl.when(ki % LANE == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = jnp.where(out_lane == ki % LANE, val, out_ref[:])


def dtw_batch_fused(queries: jax.Array, q_lens: jax.Array,
                    bank: jax.Array, bank_lens: jax.Array,
                    cfg: DtwConfig = DtwConfig(),
                    interpret: bool = False) -> jax.Array:
    """All-pairs fused DTW: [B,T,F] x [K,U,F] -> [B,K] (unbanded only).

    Memory is O(B*T*F + K*U*F): the cost tensor never exists in HBM, so
    arbitrarily large B*K runs without the scan path's chunking.  (The
    query axis is still split into <=480-row pieces internally: XLA
    stages whole custom-call operands in VMEM when they fit, and large B
    would trip its scoped-vmem allocator.)
    """
    if cfg.band_frac is not None:
        raise ValueError("fused DTW supports unbanded matching only "
                         "(prefix-sum closed form; see module docstring)")
    if cfg.slope is not None:
        raise ValueError("fused DTW does not support cfg.slope; use "
                         "impl='scan' or 'fused_banded'")
    max_b = 480
    if queries.shape[0] > max_b:
        outs = [
            dtw_batch_fused(queries[lo:lo + max_b], q_lens[lo:lo + max_b],
                            bank, bank_lens, cfg, interpret)
            for lo in range(0, queries.shape[0], max_b)
        ]
        return jnp.concatenate(outs, axis=0)
    bsz, t, f = queries.shape
    k, u, _ = bank.shape
    t_pad = _round_up(t, 8)
    u_pad = _round_up(u, LANE)
    b_pad = _round_up(bsz, QUERY_TILE)

    q = jnp.pad(queries.astype(jnp.float32),
                ((0, b_pad - bsz), (0, t_pad - t), (0, 0)))
    bk = jnp.pad(bank.astype(jnp.float32), ((0, 0), (0, u_pad - u), (0, 0)))
    la = jnp.pad((q_lens - 1).astype(jnp.int32)[:, None],
                 ((0, b_pad - bsz), (0, 0)))
    lb = bank_lens.astype(jnp.int32)                          # [K] prefetch

    kernel = functools.partial(_fused_kernel, t=t_pad, u=u, u_pad=u_pad,
                               squared=cfg.squared)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // QUERY_TILE, k),
        in_specs=[
            pl.BlockSpec((QUERY_TILE, t_pad, f), lambda qi, ki, *_: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u_pad, f), lambda qi, ki, *_: (ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QUERY_TILE, 1), lambda qi, ki, *_: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QUERY_TILE, LANE),
                               lambda qi, ki, *_: (qi, ki // LANE),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((QUERY_TILE, t_pad, u_pad), jnp.float32),
            pltpu.VMEM((QUERY_TILE, u_pad), jnp.float32),
            pltpu.VMEM((QUERY_TILE, u_pad), jnp.float32),
        ],
    )
    k_pad = _round_up(k, LANE)
    raw = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, k_pad), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * k * t_pad * u_pad * f,
            bytes_accessed=(b_pad * t_pad + k * u_pad) * f * 4,
            transcendentals=b_pad * k * t_pad * u_pad,
        ),
        interpret=interpret,
    )(lb, q, bk, la)
    dist = raw[:bsz, :k] / (q_lens[:, None]
                            + bank_lens[None, :]).astype(jnp.float32)
    return dist
