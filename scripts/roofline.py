"""MFU / roofline accounting for the headline configs (VERDICT r4 #7).

Converts measured rates into utilization-of-peak per hardware unit so
PERF.md can state WHICH unit bounds each config and how much silicon
headroom remains.  Work models are derived from the kernels themselves
(formulas inline below, cross-referenced to the kernel sources); peaks
are the public TPU v5e (v5 lite) numbers:

  MXU peak (bf16)            197   TFLOP/s   [scaling-book / spec sheet]
  MXU f32-HIGHEST (bf16x6)   ~32.8 TFLOP/s   (6-pass split of f32 operands)
  MXU f32-DEFAULT (bf16x1)   197   TFLOP/s-equivalent (inputs rounded)
  VPU f32                    ~3.9  Tops/s    (8x128 lanes x 4 ALUs x ~0.94 GHz)
  HBM                        819   GB/s

The VPU number is the coarsest (public docs give the v5e VPU indirectly);
utilizations against it are stated to one significant figure in PERF.md.

    python scripts/roofline.py --pairs-per-s 714600            # classify kernel
    python scripts/roofline.py --config spot --pairs-per-s N   # subseq kernel
    python scripts/roofline.py --config viterbi --frames-per-s N

Prints one JSON line per unit with work/pair, achieved rate, peak, and
utilization; the binding unit is the max-utilization one.
"""

import argparse
import json

MXU_BF16 = 197e12
MXU_F32_HIGHEST = MXU_BF16 / 6.0
VPU_F32 = 8 * 128 * 4 * 0.94e9
HBM = 819e9


def classify_model(t=198, u=198, w=128, f=39, qt=256):
    """kernels/dtw_fused_banded.py at the bench shape (T=U=198,
    band 0.17 -> plan_window width W=128, QUERY_TILE=256, F_aug=F+2)."""
    faug = f + 2
    t_pad = -(-t // 16) * 16                  # row_block=16 plan
    u_pad = -(-u // 128) * 128
    mxu = 2.0 * t_pad * u_pad * faug          # cost GEMM, f32 HIGHEST
    # row DP ~21 vector ops/row on [*, W] lanes (measured budget,
    # docs/PERF.md round-2 ablations) + extraction ~= same again
    vpu = 21.0 * w * t_pad * 2.0
    # per grid step (QT queries x 1 template): template block read once
    hbm = (t_pad * faug * 4.0) / qt + 2 * 128 * 4.0 / 1.0
    return {"mxu_highest": mxu, "vpu": vpu, "hbm": hbm}


def spot_model(t=198, u=1598, f=39, st=8):
    """kernels/spot_fused.py: open-begin/end subsequence DP, full-width
    rows (no band), Kogge-Stone cumsum+cummin over U_pad lanes."""
    faug = f + 3
    t_pad = -(-t // 8) * 8
    u_pad = -(-u // 128) * 128
    import math
    stages = math.ceil(math.log2(u_pad))
    mxu = 2.0 * t_pad * u_pad * faug
    # per row: cummin sweep (3 ops x log2 U stages) + ~8 bookkeeping
    # ops on [*, U_pad]; plus the one-off cumsum phase (2 ops x stages)
    vpu = (3.0 * stages + 8.0) * u_pad * t_pad + 2.0 * stages * u_pad * t_pad / t_pad
    hbm = (t_pad * faug * 4.0) / st + 2 * u_pad * 4.0
    return {"mxu_highest": mxu, "vpu": vpu, "hbm": hbm}


def viterbi_model(s=4, w=35, f=39, mix=2):
    """ops/viterbi.py / spot_hmm.py per frame per stream: GEMM
    emissions [W*S*mix, F] x frame + [W, S] max-plus column update."""
    mxu = 2.0 * w * s * mix * f
    vpu = 12.0 * w * s
    hbm = f * 4.0
    return {"mxu_highest": mxu, "vpu": vpu, "hbm": hbm}


MODELS = {"classify": classify_model, "spot": spot_model,
          "viterbi": viterbi_model}
PEAKS = {"mxu_highest": MXU_F32_HIGHEST, "vpu": VPU_F32, "hbm": HBM}
UNITS = {"mxu_highest": "FLOP", "vpu": "op", "hbm": "B"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=sorted(MODELS), default="classify")
    ap.add_argument("--pairs-per-s", type=float, default=None,
                    help="measured pair rate (classify/spot)")
    ap.add_argument("--frames-per-s", type=float, default=None,
                    help="measured (stream frames x streams)/s (viterbi)")
    ap.add_argument("--t", type=int, default=198)
    ap.add_argument("--u", type=int, default=None)
    args = ap.parse_args()

    kw = {}
    if args.u is not None:
        kw["u"] = args.u
    work = MODELS[args.config](t=args.t, **kw) \
        if args.config != "viterbi" else MODELS[args.config]()
    rate = args.pairs_per_s if args.config != "viterbi" \
        else args.frames_per_s
    if rate is None:
        raise SystemExit("give --pairs-per-s (or --frames-per-s)")

    rows = []
    for unit, per_item in work.items():
        achieved = per_item * rate
        util = achieved / PEAKS[unit]
        rows.append({"unit": unit,
                     f"{UNITS[unit]}_per_item": round(per_item),
                     "achieved_per_s": f"{achieved:.3e}",
                     "peak_per_s": f"{PEAKS[unit]:.3e}",
                     "utilization": round(util, 4)})
        print(json.dumps(rows[-1]))
    bind = max(rows, key=lambda r: r["utilization"])
    print(json.dumps({"config": args.config, "binding_unit": bind["unit"],
                      "binding_utilization": bind["utilization"]}))


if __name__ == "__main__":
    main()
