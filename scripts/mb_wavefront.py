"""Microbenchmarks for the round-2 DTW wavefront redesign.

Questions this answers on the real chip (docs/PERF.md round-2 plan):
  1. op-diet DP: wavefront step reduced to 6 vector ops (no per-step
     harvest reduce, no col0 selects — BIG padding carries the boundary)
     on pre-skewed input at PAIR_TILE=256/512 — how far under the 39 ms
     round-1 wavefront does it land?
  2. in-kernel Mosaic transpose throughput ([QB, T, D] swapaxes) — the
     enabler for producing the skew inside a kernel instead of XLA's
     84 ms pad/reshape/transpose.
  3. skew-construction kernel: cost [QB,T,U] -> skewed [QB,D,T] via
     static slice-stores + 3 log-shift passes + transpose.

Run: python scripts/mb_wavefront.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsp_tpu.utils.timing import chained_timeit

BIG = 1e30
P, T, U = 12800, 198, 198
T_PAD, U_PAD = 256, 256
D_PAD = 512                       # t+u-1 = 395 -> 400 -> keep 512 for lanes


def rup(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------- E1: DP
def _dp_kernel(ktarget_ref, la_ref, cost_ref, out_ref, d1, d2, acc,
               *, diag_block):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        d1[:] = jnp.full_like(d1, BIG)
        # virtual origin: roll(prev2,1) at k==0 must inject 0 into lane 0
        last = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) == d2.shape[1] - 1
        d2[:] = jnp.where(last, 0.0, BIG)
        acc[:] = jnp.zeros_like(acc)

    ktarget = ktarget_ref[:]
    prev1, prev2, acc_v = d1[:], d2[:], acc[:]
    for dk in range(diag_block):
        k = kb * diag_block + dk
        c = cost_ref[:, dk, :]
        s1 = pltpu.roll(prev1, 1, axis=1)
        s2 = pltpu.roll(prev2, 1, axis=1)
        new = c + jnp.minimum(prev1, jnp.minimum(s1, s2))
        acc_v = jnp.where(ktarget == k, new, acc_v)
        prev2, prev1 = prev1, new
    d1[:] = prev1
    d2[:] = prev2
    acc[:] = acc_v

    @pl.when(kb == pl.num_programs(1) - 1)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, acc_v.shape, 1)
        onehot = (lane == la_ref[:] - 1).astype(jnp.float32)
        out_ref[:] = jnp.sum(acc_v * onehot, axis=1, keepdims=True)


def dp_diet(skew, ktarget, la, pair_tile=256, diag_block=8, interpret=False):
    p, d, t = skew.shape
    kernel = functools.partial(_dp_kernel, diag_block=diag_block)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p, 1), jnp.float32),
        grid=(p // pair_tile, d // diag_block),
        in_specs=[
            pl.BlockSpec((pair_tile, 1), lambda pi, k: (pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pair_tile, 1), lambda pi, k: (pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pair_tile, diag_block, t), lambda pi, k: (pi, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pair_tile, 1), lambda pi, k: (pi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((pair_tile, t), jnp.float32),
            pltpu.VMEM((pair_tile, t), jnp.float32),
            pltpu.VMEM((pair_tile, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(flops=6 * p * d * t,
                                      bytes_accessed=p * d * t * 4,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ktarget, la, skew)


def _dma_kernel(ktarget_ref, cost_ref, out_ref, acc):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    # touch the block minimally so the fetch cannot be elided
    acc[:] = acc[:] + cost_ref[:, 0, :1] + ktarget_ref[:].astype(jnp.float32)

    @pl.when(kb == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc[:]


def bench_dma():
    print("=== E0: pure block-fetch over the same 6.5 GB skew array ===")
    skew = jnp.ones((P, D_PAD, T_PAD), jnp.float32)
    ktarget = jnp.zeros((P, 1), jnp.int32)
    for pt in (256,):
        fn = jax.jit(lambda s, kt, token=None, _pt=pt: pl.pallas_call(
            _dma_kernel,
            out_shape=jax.ShapeDtypeStruct((P, 1), jnp.float32),
            grid=(P // _pt, D_PAD // 8),
            in_specs=[
                pl.BlockSpec((_pt, 1), lambda pi, k: (pi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_pt, 8, T_PAD), lambda pi, k: (pi, k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_pt, 1), lambda pi, k: (pi, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((_pt, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(kt + (token * 0).astype(jnp.int32), s))
        sec = chained_timeit(fn, (skew, ktarget), n_iters=4)
        gb = P * D_PAD * T_PAD * 4 / 1e9
        print(f"  PAIR_TILE={pt}: {sec*1e3:.1f} ms ({gb/sec:.0f} GB/s read)")


def bench_dp():
    print("=== E1: op-diet wavefront DP (pre-skewed dummy input) ===")
    skew = jnp.ones((P, D_PAD, T_PAD), jnp.float32)
    ktarget = jnp.full((P, 1), T + U - 2, jnp.int32)
    la = jnp.full((P, 1), T, jnp.int32)
    for pt in (256, 512):
        fn = jax.jit(lambda s, kt, a, token=None, _pt=pt:
                     dp_diet(s, kt + (token * 0).astype(jnp.int32), a,
                             pair_tile=_pt))
        sec = chained_timeit(fn, (skew, ktarget, la), n_iters=4)
        print(f"  PAIR_TILE={pt}: {sec*1e3:.1f} ms")


# ------------------------------------------------ E1b: op-cost anatomy
def _anatomy_kernel(x_ref, out_ref, st, *, n_rolls, steps, width):
    st[:] = x_ref[:]
    prev = st[:]

    def body(i, carry):
        prev1, prev2 = carry
        s = prev1
        for _ in range(n_rolls):
            s = pltpu.roll(s, 1, axis=1)
        new = jnp.minimum(prev1, s) + prev2 * 0.5
        return new, prev1

    a, b = jax.lax.fori_loop(0, steps, body, (prev, prev))
    out_ref[:] = a + b


def bench_anatomy():
    print("=== E1b: per-op anatomy (fori of rolls+min+add, no HBM) ===")
    x0 = jnp.ones((8, 128), jnp.float32)
    trivial = jax.jit(lambda v, token=None: pl.pallas_call(
        lambda i, o: o.__setitem__(slice(None), i[:] * 2.0),
        out_shape=jax.ShapeDtypeStruct(x0.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(v + token))
    base = chained_timeit(trivial, (x0,), n_iters=16)
    print(f"  trivial kernel launch: {base*1e6:.0f} us")
    steps = 4000
    for pt in (64, 256):
        for width in (256, 512):
            for n_rolls in (0, 1, 2):
                x = jnp.ones((pt, width), jnp.float32)
                kern = functools.partial(_anatomy_kernel, n_rolls=n_rolls,
                                         steps=steps, width=width)
                fn = jax.jit(lambda v, token=None, _k=kern: pl.pallas_call(
                    _k,
                    out_shape=jax.ShapeDtypeStruct(v.shape, jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM(v.shape, jnp.float32)],
                )(v + token))
                sec = chained_timeit(fn, (x,), n_iters=8)
                cyc = (sec - base) * 940e6 / steps
                print(f"  [{pt},{width}] rolls={n_rolls}: {sec*1e6:.0f} us"
                      f" -> {cyc:.1f} cyc/step (launch-corrected)")


# ------------------------------------------------------- E2: transpose
def _tr_kernel(in_ref, out_ref):
    out_ref[:] = jnp.swapaxes(in_ref[:], 1, 2)


def bench_transpose():
    print("=== E2: in-kernel Mosaic transpose [QB, 256, 512]->[QB,512,256] ===")
    x = jnp.ones((P, T_PAD, D_PAD), jnp.float32)  # 6.5 GB
    for qb in (4, 8):
        fn0 = jax.jit(lambda v, token=None, _qb=qb: pl.pallas_call(
            _tr_kernel,
            out_shape=jax.ShapeDtypeStruct((P, D_PAD, T_PAD), jnp.float32),
            grid=(P // _qb,),
            in_specs=[pl.BlockSpec((_qb, T_PAD, D_PAD), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_qb, D_PAD, T_PAD), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(v + token))
        try:
            sec = chained_timeit(fn0, (x,), n_iters=4)
            gb = P * T_PAD * D_PAD * 4 / 1e9
            print(f"  QB={qb}: {sec*1e3:.1f} ms "
                  f"({2*gb/sec:.0f} GB/s r+w, incl. token pass)")
        except Exception as e:  # noqa: BLE001
            print(f"  QB={qb}: FAILED: {type(e).__name__}: {str(e)[:300]}")


# ---------------------------------------------------- E3: skew construct
def _skew_kernel(cost_ref, out_ref, s3, *, t_pad, u_pad, d_pad, qb):
    # S3[q, i, i + j] = cost[q, i, j]; build with static block offsets +
    # 3 log-shift passes for the within-block remainder, then transpose.
    s3[:] = jnp.full_like(s3, BIG)
    for b in range(t_pad // 8):            # static slice-store, offset 8b
        blk = cost_ref[:, b * 8:(b + 1) * 8, :]          # [QB, 8, U]
        row = jax.lax.broadcasted_iota(jnp.int32, (qb, 8, u_pad + 8), 1)
        piece = jnp.pad(blk, ((0, 0), (0, 0), (0, 8)), constant_values=BIG)
        for bit in (1, 2, 4):              # shift row r by r (r = 0..7)
            rolled = pltpu.roll(piece, bit, axis=2)
            piece = jnp.where((row & bit) != 0, rolled, piece)
        s3[:, b * 8:(b + 1) * 8, b * 8:b * 8 + u_pad + 8] = piece
    out_ref[:] = jnp.swapaxes(s3[:], 1, 2)


def bench_skew():
    print("=== E3: skew-construct kernel cost[QB,T,U] -> skew[QB,D,T] ===")
    cost = jnp.ones((P, T_PAD, U_PAD), jnp.float32)
    for qb in (4, 8):
        kernel = functools.partial(_skew_kernel, t_pad=T_PAD, u_pad=U_PAD,
                                   d_pad=D_PAD, qb=qb)
        fn = jax.jit(lambda v, token=None, _k=kernel, _qb=qb: pl.pallas_call(
            _k,
            out_shape=jax.ShapeDtypeStruct((P, D_PAD, T_PAD), jnp.float32),
            grid=(P // _qb,),
            in_specs=[pl.BlockSpec((_qb, T_PAD, U_PAD), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_qb, D_PAD, T_PAD), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((_qb, T_PAD, D_PAD), jnp.float32)],
        )(v + token))
        try:
            sec = chained_timeit(fn, (cost,), n_iters=4)
            print(f"  QB={qb}: {sec*1e3:.1f} ms (incl. token pass over 3.2 GB)")
        except Exception as e:  # noqa: BLE001
            print(f"  QB={qb}: FAILED: {type(e).__name__}: {str(e)[:300]}")


# --------------------------------------------- E4: XLA batched cost ref
def bench_cost():
    print("=== E4: XLA batched cost matmul (128 q x 100 t) ===")
    q = jnp.ones((128, T_PAD, 40), jnp.float32)
    b = jnp.ones((100, U_PAD, 40), jnp.float32)

    def cost_fn(qq, bb, token=None):
        qq = qq + token
        cr = jnp.einsum("btf,kuf->bktu", qq, bb,
                        precision=jax.lax.Precision.HIGHEST)
        sa = jnp.sum(qq * qq, -1)[:, None, :, None]
        sb = jnp.sum(bb * bb, -1)[None, :, None, :]
        return jnp.maximum(sa + sb - 2 * cr, 0.0).reshape(P, T_PAD, U_PAD)

    sec = chained_timeit(jax.jit(cost_fn), (q, b), n_iters=4)
    print(f"  cost tensor [12800,256,256]: {sec*1e3:.1f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "dma"):
        bench_dma()
    if which in ("all", "dp"):
        bench_dp()
    if which in ("all", "anatomy"):
        bench_anatomy()
    if which in ("all", "tr"):
        bench_transpose()
    if which in ("all", "skew"):
        bench_skew()
    if which in ("all", "cost"):
        bench_cost()
