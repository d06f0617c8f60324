"""Anti-diagonal wavefront DTW as a Pallas TPU kernel.

BASELINE.json north star: "DTW template matching is rewritten as an
anti-diagonal wavefront Pallas kernel, vmapped across the template bank".

Layout: pairs on sublanes, the DP diagonal on lanes.  The recurrence

    d_k[i] = c_k[i] + min(d_{k-1}[i], d_{k-1}[i-1], d_{k-2}[i-1])

is 1 roll + 2 mins + 1 add per step on a [PAIR_TILE, T] vreg block —
no log-factor associative scan (the XLA fallback in ops/dtw.py needs
log2(U) sweeps per row).  The two previous diagonals live in VMEM
scratch across grid steps; the cost matrix arrives PRE-SKEWED
(skew[k, i] = cost[i, k-i]) so each grid step k DMAs one contiguous
[PAIR_TILE, 1, T] slab — Pallas double-buffers it automatically.

The answer cell (len_a-1, len_b-1) is harvested during the sweep: a
precomputed one-hot row mask picks column len_a-1 and the diagonal index
k == len_a+len_b-2 picks the step, so ragged lengths cost nothing.

Parity oracles: dsp_tpu/golden/dtw.py (loops) and ops/dtw.py (scan).

Performance status (TPU v5e, 12,800 pairs T=U=198 F=39, relay noise
+/-30%): the kernel alone runs ~39 ms on pre-skewed input, but producing
the skewed tensor in XLA costs another ~80 ms (data-movement ops run at
7-25% of HBM peak on this chip — docs/PERF.md), so the total trails the
XLA min-plus scan (~48 ms), which stays the default.  The round-2 plan
is a fused banded kernel that never materialises cost in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsp_tpu.config import DtwConfig
from dsp_tpu.ops.dtw import BIG, masked_cost
from dsp_tpu.window_plan import LANE, round_up as _round_up

PAIR_TILE = 256
DIAG_BLOCK = 8          # diagonals fetched per grid step (sublane tile)



def skew_cost(cost: jax.Array, big: float = BIG) -> jax.Array:
    """[..., T, U] -> [..., T+U-1, T] with skew[..., k, i] = cost[..., i, k-i].

    Gather-free: pad each row by T (BIG), then reinterpreting the flat
    buffer with row stride U+T-1 shifts row i right by i (the classic
    stride trick); transposing yields the diagonal-major layout.  All
    out-of-range cells land on BIG pad automatically.
    """
    t, u = cost.shape[-2:]
    lead = cost.shape[:-2]
    a = jnp.pad(cost, [(0, 0)] * len(lead) + [(0, 0), (0, t)],
                constant_values=big)
    flat = a.reshape(*lead, t * (u + t))[..., : t * (u + t - 1)]
    c = flat.reshape(*lead, t, u + t - 1)
    return jnp.swapaxes(c, -1, -2)


def _dtw_kernel(cost_ref, onehot_ref, ktarget_ref, out_ref, d1, d2, acc):
    kb = pl.program_id(1)
    n_blocks = pl.num_programs(1)

    @pl.when(kb == 0)
    def _():
        d1[:] = jnp.full_like(d1, BIG)
        d2[:] = jnp.full_like(d2, BIG)
        acc[:] = jnp.zeros_like(acc)

    onehot = onehot_ref[:]
    ktarget = ktarget_ref[:]
    prev1, prev2, acc_v = d1[:], d2[:], acc[:]
    col0 = jax.lax.broadcasted_iota(jnp.int32, prev1.shape, 1) == 0

    for dk in range(DIAG_BLOCK):                            # unrolled
        k = kb * DIAG_BLOCK + dk
        c = cost_ref[:, dk, :]                              # [PT, T]
        s1 = jnp.where(col0, BIG, pltpu.roll(prev1, 1, axis=1))
        # virtual origin D[-1,-1] = 0 enters as d_{-2}[-1] at k == 0
        fill2 = jnp.where(k == 0, 0.0, BIG)
        s2 = jnp.where(col0, fill2, pltpu.roll(prev2, 1, axis=1))
        new = c + jnp.minimum(prev1, jnp.minimum(s1, s2))
        hit = jnp.sum(new * onehot, axis=1, keepdims=True)  # [PT, 1]
        acc_v = jnp.where(ktarget == k, hit, acc_v)
        prev2, prev1 = prev1, new

    d1[:] = prev1
    d2[:] = prev2
    acc[:] = acc_v

    @pl.when(kb == n_blocks - 1)
    def _():
        out_ref[:] = acc_v


def dtw_from_cost_pallas(cost: jax.Array, len_a: jax.Array, len_b: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Masked cost matrices [P, T, U] + lengths [P] -> DTW distances [P]."""
    p, t, u = cost.shape
    t_pad = _round_up(t, LANE)
    p_pad = _round_up(max(p, 1), PAIR_TILE)

    skew = skew_cost(cost)                                   # [P, D, T]
    d = t + u - 1
    d_pad = _round_up(d, DIAG_BLOCK)
    if t_pad != t or p_pad != p or d_pad != d:
        skew = jnp.pad(skew, ((0, p_pad - p), (0, d_pad - d), (0, t_pad - t)),
                       constant_values=BIG)

    onehot = (jnp.arange(t_pad)[None, :] == (len_a - 1)[:, None])
    onehot = onehot.astype(jnp.float32)
    ktarget = (len_a + len_b - 2).astype(jnp.int32)[:, None]   # [P, 1]
    if p_pad != p:
        onehot = jnp.pad(onehot, ((0, p_pad - p), (0, 0)))
        ktarget = jnp.pad(ktarget, ((0, p_pad - p), (0, 0)),
                          constant_values=-1)

    grid = (p_pad // PAIR_TILE, d_pad // DIAG_BLOCK)
    raw = pl.pallas_call(
        _dtw_kernel,
        out_shape=jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((PAIR_TILE, DIAG_BLOCK, t_pad),
                         lambda pi, k: (pi, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIR_TILE, t_pad), lambda pi, k: (pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIR_TILE, 1), lambda pi, k: (pi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PAIR_TILE, 1), lambda pi, k: (pi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PAIR_TILE, t_pad), jnp.float32),
            pltpu.VMEM((PAIR_TILE, t_pad), jnp.float32),
            pltpu.VMEM((PAIR_TILE, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * p_pad * d * t_pad,
            bytes_accessed=p_pad * d * t_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(skew, onehot, ktarget)
    dist = raw[:p, 0] / (len_a + len_b).astype(jnp.float32)
    return dist


def dtw_pairs_pallas(a: jax.Array, b: jax.Array,
                     len_a: jax.Array, len_b: jax.Array,
                     cfg: DtwConfig = DtwConfig(),
                     precision=jax.lax.Precision.HIGHEST,
                     interpret: bool = False) -> jax.Array:
    """Paired DTW: a [P,T,F] vs b [P,U,F] -> [P] distances."""
    cost = jax.vmap(lambda x, y, la, lb: masked_cost(x, y, la, lb, cfg,
                                                     precision))(
        a, b, len_a, len_b)
    return dtw_from_cost_pallas(cost, len_a, len_b, interpret)


def dtw_batch_pallas(queries: jax.Array, q_lens: jax.Array,
                     bank: jax.Array, bank_lens: jax.Array,
                     cfg: DtwConfig = DtwConfig(),
                     precision=jax.lax.Precision.HIGHEST,
                     interpret: bool = False) -> jax.Array:
    """All-pairs DTW [B,T,F] x [K,U,F] -> [B,K] via the wavefront kernel."""
    if cfg.slope is not None:
        raise ValueError("wavefront DTW does not support cfg.slope; use "
                         "impl='scan' or 'fused_banded'")
    bsz, t, f = queries.shape
    k, u, _ = bank.shape
    cost = jax.vmap(
        jax.vmap(lambda x, y, la, lb: masked_cost(x, y, la, lb, cfg, precision),
                 in_axes=(None, 0, None, 0)),
        in_axes=(0, None, 0, None),
    )(queries, bank, q_lens, bank_lens)                     # [B, K, T, U]
    la = jnp.broadcast_to(q_lens[:, None], (bsz, k)).reshape(-1)
    lb = jnp.broadcast_to(bank_lens[None, :], (bsz, k)).reshape(-1)
    dist = dtw_from_cost_pallas(cost.reshape(bsz * k, t, u), la, lb, interpret)
    return dist.reshape(bsz, k)
