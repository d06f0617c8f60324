"""Attribute the bench.py headline gap: front-end vs DTW vs dispatch.

bench.py's round-4 headline (597k alignments/s/chip) sits ~18% under the
fused banded kernel's own steady-state (714.6k pairs/s at the identical
256x100 shape, docs/TPU_TESTS.md).  ROADMAP #25 attributed the residual
to "front-end + per-dispatch overhead" — a guess, because the isolated
front-end program was never timed (its cold compile through the relay
exceeded 20 min).  This script times every stage of the bench chain as
its OWN warm chained program, so the gap is measured, not guessed:

    stage      program
    noop       jitted token passthrough       -> per-dispatch floor
    mfcc       batched fe.mfcc (DFT GEMMs)    -> front-end GEMM cost
    vad        detect_endpoints only          -> VAD cummax cost
    fe         extract_features (mfcc+vad+window+CMN+deltas)
    dtw        classify_features on resident Features (the kernel+argmin)
    full       recognize_batch (what bench.py times)

All stages run through utils/timing.chained_timeit_spread (the relay's
block_until_ready is unreliable; a scalar data dependency chains the
iterations and ONE fetch closes the chain).  The whole body executes in
a relay deadline child resuming warm from the persistent compile cache
(`python -m dsp_tpu warm --stages` pre-compiles these exact programs).

    python scripts/fe_profile.py            # chip
    JAX_PLATFORMS=cpu python scripts/fe_profile.py --chunk 32 --iters 2

Prints one JSON line per stage plus a closing attribution line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def body(chunk, n_templates, iters, passes):
    from dsp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dsp_tpu import pipeline as pl
    from dsp_tpu.config import PipelineConfig
    from dsp_tpu.io.dataset import DIGITS, synth_word
    from dsp_tpu.ops import frontend as fe
    from dsp_tpu.ops import vad as jvad
    from dsp_tpu.utils.timing import chained_timeit_spread

    cfg = PipelineConfig()
    mats = fe.make_matrices(cfg.frontend)
    precision = jax.lax.Precision.DEFAULT     # bench.py's default

    per_word = max(1, n_templates // len(DIGITS))
    bank_sigs = np.stack([
        synth_word(lab, i, max_samples=cfg.max_samples)
        for lab in DIGITS for i in range(per_word)])[:n_templates]
    bank_ns = np.full(bank_sigs.shape[0], cfg.max_samples, dtype=np.int32)
    bank = pl.extract_features(jnp.asarray(bank_sigs), jnp.asarray(bank_ns),
                               mats, cfg)
    ids = jnp.asarray(np.repeat(np.arange(len(DIGITS), dtype=np.int32),
                                per_word)[:n_templates])

    rng = np.random.default_rng(0)
    sigs = jnp.asarray(np.stack([
        synth_word(DIGITS[rng.integers(10)], 1000 + i,
                   max_samples=cfg.max_samples) for i in range(chunk)]))
    qn = jnp.full(chunk, cfg.max_samples, dtype=jnp.int32)
    feats = jax.block_until_ready(
        pl.extract_features(sigs, qn, mats, cfg, precision))

    @jax.jit
    def s_noop(x, token):
        return (x.ravel()[0] + token,)

    @jax.jit
    def s_mfcc(x, token):
        one = lambda xi: fe.mfcc(xi, cfg.frontend, mats, use_fft=False,
                                 precision=precision)
        return jax.vmap(one)(x + token)

    @jax.jit
    def s_vad(x, n, token):
        one = lambda xi, ni: jvad.detect_endpoints(
            xi, cfg.frontend, cfg.vad, ni)[:2]
        return jax.vmap(one)(x + token, n)

    @functools.partial(jax.jit, static_argnames=())
    def s_fe(x, n, token):
        return pl.extract_features(x + token, n, mats, cfg, precision)

    @jax.jit
    def s_dtw(qf, ql, token):
        q = pl.Features(qf + token, ql)
        return pl.classify_features(q, bank, ids, cfg=cfg,
                                    precision=precision)

    @jax.jit
    def s_full(x, n, token):
        return pl.recognize_batch(x + token, n, mats, bank, ids, cfg,
                                  precision)

    stages = [
        ("noop", s_noop, (sigs,)),
        ("mfcc", s_mfcc, (sigs,)),
        ("vad", s_vad, (sigs, qn)),
        ("fe", s_fe, (sigs, qn)),
        ("dtw", s_dtw, (feats.feats, feats.length)),
        ("full", s_full, (sigs, qn)),
    ]
    out = {}
    for name, fn, fargs in stages:
        step = lambda *a, token, _fn=fn: _fn(*a, token)
        med, lo, hi = chained_timeit_spread(step, fargs, n_iters=iters,
                                            passes=passes)
        out[name] = med
        print(json.dumps({
            "stage": name, "ms": round(med * 1e3, 3),
            "ms_lo": round(lo * 1e3, 3), "ms_hi": round(hi * 1e3, 3),
            "pairs_per_s": (round(chunk * n_templates / med)
                            if name in ("dtw", "full") else None),
        }), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--templates", type=int, default=100)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--timeout", type=float, default=2400.0,
                    help="deadline for the measured child; compiles "
                         "resume warm from the persistent cache")
    ap.add_argument("--in-process", action="store_true",
                    help="skip the relay child (local CPU testing)")
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.in_process:
        out = body(args.chunk, args.templates, args.iters, args.passes)
    else:
        from dsp_tpu.utils.relay import run_with_deadline
        out = run_with_deadline(
            "scripts.fe_profile:body",
            (args.chunk, args.templates, args.iters, args.passes),
            timeout_s=args.timeout, retries=1)
    full, dtw, fe_ms = out["full"], out["dtw"], out["fe"]
    print(json.dumps({
        "attribution": {
            "full_ms": round(full * 1e3, 3),
            "dtw_ms": round(dtw * 1e3, 3),
            "fe_ms": round(fe_ms * 1e3, 3),
            "noop_dispatch_ms": round(out["noop"] * 1e3, 3),
            "unexplained_ms": round((full - dtw - fe_ms) * 1e3, 3),
            "fe_share_of_gap": round(fe_ms / max(full - dtw, 1e-9), 3),
        }}), flush=True)


if __name__ == "__main__":
    main()
