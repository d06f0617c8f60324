"""Microbench: fused subsequence-DTW (spotting) kernel tile sweep.

Times kernels/spot_fused.py at bench_all's `spot` workload (64 streams
of ~6 s connected audio x 100 templates: U=595, T=198, F=39) across
STREAM_TILE settings, plus the XLA row scan as the comparison row,
using the chained-dependency harness (utils/timing.py) so relay
latency is paid once per pass.

The tile trades VPU issue-cost amortisation (every Kogge-Stone stage
runs on [ST, U_pad] slabs — wider ST = more vregs per op) against
VMEM cost-scratch (ST x T_pad x U_pad x 4 B) and batch padding
(b_pad = round_up(B, ST); tiles wider than the batch time PADDING).

Usage:  python scripts/mb_spot_fused.py [--b 64 --u 595 --tiles 8,16,32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dsp_tpu.kernels.spot_fused import subseq_dtw_fused
from dsp_tpu.ops.spot import subseq_dtw_batch_impl
from dsp_tpu.utils.timing import chained_timeit_spread, token_mix


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--u", type=int, default=595)
    ap.add_argument("--t", type=int, default=198)
    ap.add_argument("--f", type=int, default=39)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--tiles", default="8,16,32")
    ap.add_argument("--scan", action="store_true",
                    help="also time the XLA row scan")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU smoke test)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    streams = jnp.asarray(rng.standard_normal((args.b, args.u, args.f)),
                          jnp.float32)
    bank = jnp.asarray(rng.standard_normal((args.k, args.t, args.f)),
                       jnp.float32)
    sl = jnp.asarray(rng.integers(args.u // 2, args.u + 1, size=args.b),
                     jnp.int32)
    tl = jnp.asarray(rng.integers(min(50, args.t), args.t + 1, size=args.k),
                     jnp.int32)
    # audio-seconds per iteration at the 100 fps frame rate bench_all's
    # front-end produces (hop 160 @ 16 kHz)
    audio_s = float(np.sum(np.asarray(sl))) / 100.0
    print(f"[shape] B={args.b} K={args.k} U={args.u} T={args.t} "
          f"F={args.f}  audio={audio_s:.1f}s/iter")

    ref = None
    for st in (int(x) for x in args.tiles.split(",")):
        def step(x, token, st=st):
            n, s = subseq_dtw_fused(token_mix(x, token), sl, bank, tl,
                                    stream_tile=st,
                                    interpret=args.interpret)
            return n

        out = np.asarray(jax.jit(step)(streams, jnp.asarray(0.0)))
        if ref is None:
            ref = out
        else:
            np.testing.assert_allclose(out, ref, rtol=5e-4, atol=1e-4,
                                       err_msg=f"tile {st} diverges")
        med, lo, hi = chained_timeit_spread(
            jax.jit(step), (streams,), n_iters=args.iters,
            passes=args.passes)
        print(f"[fused st={st:>3}] {med*1e3:8.2f} ms/iter "
              f"({lo*1e3:.2f}..{hi*1e3:.2f})  "
              f"{audio_s/med:9.1f} audio-s/s")

    if args.scan:
        def scan_step(x, token):
            n, s = subseq_dtw_batch_impl(token_mix(x, token), sl, bank, tl)
            return n

        med, lo, hi = chained_timeit_spread(
            jax.jit(scan_step), (streams,), n_iters=args.iters,
            passes=args.passes)
        print(f"[scan       ] {med*1e3:8.2f} ms/iter "
              f"({lo*1e3:.2f}..{hi*1e3:.2f})  "
              f"{audio_s/med:9.1f} audio-s/s")


if __name__ == "__main__":
    main()
