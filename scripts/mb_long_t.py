"""Long-utterance DTW scaling: scan vs fused banded kernel vs unbanded.

VERDICT round 2 #6: the banded kernel's O(T*W) story was only measured
at T=U=198 where banding is "a wash" against the extraction phase.
This sweep measures the long-sequence regime (SURVEY.md §5 long-context
row) where O(T*W) must separate from O(T*U):

    python scripts/mb_long_t.py                  # T in (198, 512, 1024)
    python scripts/mb_long_t.py --t 1024 --pairs 256

Per shape it times (chained harness, relay-safe):
  * XLA min-plus scan, banded mask  (O(T*U) compute regardless of band)
  * fused banded kernel             (O(T*W) in VMEM)
  * fused unbanded kernel           (O(T*U) fusion baseline)
and prints ms/pairs plus the kernel:scan ratio — the crossover guidance
quoted in DtwConfig's docs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dsp_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dsp_tpu.config import DtwConfig
    from dsp_tpu.kernels.dtw_fused import dtw_batch_fused
    from dsp_tpu.kernels.dtw_fused_banded import dtw_batch_fused_banded
    from dsp_tpu.ops.dtw import dtw_batch
    from dsp_tpu.utils.timing import chained_timeit
    from dsp_tpu.window_plan import plan_window

    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=0, help="only this T (=U)")
    ap.add_argument("--pairs", type=int, default=0,
                    help="override B*K (B=pairs/16, K=16)")
    ap.add_argument("--f", type=int, default=39)
    ap.add_argument("--band", type=float, default=0.17)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--impls", default="scan,kernel,unbanded",
                    help="comma-subset of scan,kernel,unbanded — long-T "
                         "compiles are expensive (the kernel unrolls "
                         "T/rb row blocks per query; at T=1024 its Mosaic "
                         "compile ran past 100 min), so time impls "
                         "separately when probing a new shape")
    args = ap.parse_args()
    impls = {s.strip() for s in args.impls.split(",") if s.strip()}

    shapes = [args.t] if args.t else [198, 512, 1024]
    print(f"device: {jax.devices()[0]}; band={args.band}, F={args.f}")
    print("| T=U | pairs | W plan | scan banded | fused banded | fused unbanded | kernel/scan |")
    print("|---|---|---|---|---|---|---|")
    for t in shapes:
        # keep the cost-tensor footprint ~constant across shapes
        pairs = args.pairs or max(64, (256 * 198 * 198) // (t * t) // 16 * 16)
        k = 16
        b = max(1, pairs // k)
        pairs = b * k
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((b, t, args.f)), jnp.float32)
        bank = jnp.asarray(rng.standard_normal((k, t, args.f)), jnp.float32)
        ql = jnp.full(b, t, jnp.int32)
        bl = jnp.full(k, t, jnp.int32)
        cfgb = DtwConfig(band_frac=args.band, squared=False)
        cfgu = DtwConfig(band_frac=None, squared=False)
        w, s_max, _, rb, covered = plan_window(args.band, t, t, 2.0)

        def timed(fn, cfg):
            import jax as _jax

            @_jax.jit
            def step(q, ql, bank, bl, token):
                return fn(q + token, ql, bank, bl, cfg)

            try:
                return chained_timeit(step, (q, ql, bank, bl),
                                      n_iters=args.iters) * 1e3
            except Exception as e:          # OOM at long T is data too
                # TPU OOM surfaces as RESOURCE_EXHAUSTED (HBM) or an
                # Internal "Ran out of memory in memory space vmem"
                # compile error (scoped-VMEM kernels); both mean "this
                # impl cannot run this shape" — report as nan, measure on
                msg = repr(e).upper()
                if "RESOURCE" in msg or "OUT OF MEMORY" in msg or \
                        "VMEM" in msg:
                    return float("nan")
                raise

        nan = float("nan")
        ms_scan = timed(dtw_batch, cfgb) if "scan" in impls else nan
        ms_kern = (timed(dtw_batch_fused_banded, cfgb)
                   if "kernel" in impls else nan)
        ms_unb = timed(dtw_batch_fused, cfgu) if "unbanded" in impls else nan
        ratio = ms_kern / ms_scan if ms_scan == ms_scan else float("nan")
        print(f"| {t} | {pairs} | W={w} rb={rb}"
              f"{' covered' if covered else ''} | {ms_scan:.1f} ms |"
              f" {ms_kern:.1f} ms | {ms_unb:.1f} ms | {ratio:.2f}x |",
              flush=True)


if __name__ == "__main__":
    main()
