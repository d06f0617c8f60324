"""Microbench: fused banded DTW kernel phase/param sweep on the real chip.

Times kernels/dtw_fused_banded.py at the PERF.md reference workload
(12,800 pairs: 128 queries x 100 templates, T=U=198, F=39) across
QUERY_TILE settings and cost variants, using the chained-dependency
harness (utils/timing.py) so relay latency is paid once.

Usage:  python scripts/mb_fused_banded.py [--b 256 --k 100 --qt 256]

NOTE: the kernel caps its query tile at round_up(--b, 16), so QT rows
above the batch size are duplicates of the capped tile — sweep QT=256
with --b >= 256 (rows print the EFFECTIVE tile).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dsp_tpu.config import DtwConfig
from dsp_tpu.kernels import dtw_fused_banded as fb
from dsp_tpu.utils.timing import chained_timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--t", type=int, default=198)
    ap.add_argument("--f", type=int, default=39)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--qt", type=int, default=0, help="only this QUERY_TILE")
    ap.add_argument("--variant", default="", help="only variants containing this")
    ap.add_argument("--ablate", default=None,
                    help="phase ablation: no_dp | no_roll | no_gemm | "
                         "static_off (WRONG results; timing only)")
    ap.add_argument("--staged", action="store_true",
                    help="staged window extraction (_STAGED_EXTRACT=True; "
                         "bit-identical results, round-3 candidate)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((args.b, args.t, args.f)), jnp.float32)
    bank = jnp.asarray(rng.standard_normal((args.k, args.t, args.f)),
                       jnp.float32)
    ql = jnp.full(args.b, args.t, jnp.int32)
    bl = jnp.full(args.k, args.t, jnp.int32)
    pairs = args.b * args.k

    variants = [
        ("banded sq", DtwConfig(band_frac=0.15, squared=True)),
        ("banded sqrt", DtwConfig(band_frac=0.15, squared=False)),
        ("unbanded sq", DtwConfig(band_frac=None, squared=True)),
    ]
    for qt in (64, 128, 256, 384, 512):
        if args.qt and qt != args.qt:
            continue
        for name, cfg in variants:
            if args.variant and args.variant not in name:
                continue
            fb.QUERY_TILE = qt
            # the kernel caps the tile at round_up(b, 16) — label rows
            # with the EFFECTIVE tile so capped rows are not mistaken
            # for the requested one (module docstring)
            eff = max(16, min(qt, -(-args.b // 16) * 16))
            fb._ABLATE = args.ablate
            fb._STAGED_EXTRACT = args.staged

            @jax.jit
            def step(q, ql, bank, bl, token, cfg=cfg):
                return fb.dtw_batch_fused_banded(q + token, ql, bank, bl, cfg)

            try:
                sec = chained_timeit(step, (q, ql, bank, bl),
                                     n_iters=args.iters)
            except Exception as e:  # noqa: BLE001
                print(f"QT={qt:4d}(eff {eff:3d}) {name:14s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            print(f"QT={qt:4d}(eff {eff:3d}) {name:14s} "
                  f"{sec * 1e3:7.1f} ms "
                  f"({pairs / sec / 1e3:8.0f}k pairs/s)")


if __name__ == "__main__":
    main()
