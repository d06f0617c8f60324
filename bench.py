"""Headline benchmark: batched isolated-word recognition throughput.

BASELINE.json config 1: utterance batch x 100-template bank, full
pipeline (VAD -> MFCC+delta/delta-delta -> all-pairs DTW -> argmin) on
one chip.  Metric: utterance x template DTW alignments per second per
chip, including the fused front-end (the north-star target is >= 10,000;
the reference publishes no numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 10_000 (the BASELINE.json north-star floor).

Relay hardening (VERDICT r3 #1): the round-3 driver capture died at
import-time backend init when the TPU relay was down (BENCH_r03 rc=1).
The parent now touches NO jax: a deadline child probes the backend
first (fail FAST + clear tail when the relay is hard-down, with bounded
re-probes across an outage window), then the whole measured body runs
in a second deadline child — a stalled compile is PID-killed and
retried, resuming warm from the persistent cache (utils/relay.py, the
mechanism that kept MULTICHIP_r03 green through the same outage).

Env knobs: BENCH_UTTS (default 1024), BENCH_TEMPLATES (100),
BENCH_CHUNK (256), BENCH_DISPATCH ("chunked" = one async dispatch per
chunk, the default; "single" = the whole chain as ONE jit program
scanning the chunk axis — a round-5 NEGATIVE result: it measured 569k
vs chunked 597k on the v5e.  fe_profile showed ~7 ms dispatch overhead
per program, but the async per-chunk loop already hides it — the host
enqueues chunk c+1 while c runs — whereas the lax.scan body serializes
on reused buffers and loses that overlap.  Kept as a measured mode),
BENCH_PASSES (5, value = median), BENCH_PRECISION
(default|highest), BENCH_SLOPE ("" = shipped default | "itakura" — the
slope-constrained matcher, ~1.4x faster with different alignment
semantics).  Hardening knobs: BENCH_HARDENED (1; 0 = legacy in-process
run), BENCH_PROBE_TIMEOUT (90 s per probe), BENCH_PROBE_WINDOW (600 s
of re-probes before giving up), BENCH_DEADLINE (2400 s per measured
attempt), BENCH_RETRIES (1 retry of the measured body), BENCH_PLATFORM
("" = the env's TPU; "cpu" forces the CPU backend for local testing —
without it a CPU-only probe/run is REJECTED, because the env's
'axon,cpu' platform list would otherwise let a fast-failing relay
fall back to CPU and record a bogus number with rc=0).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NORTH_STAR = 10_000.0


def _probe():
    """Deadline-child target: first backend touch happens HERE."""
    import jax

    return [str(d) for d in jax.devices()]


def _cpu_only(devices: list[str]) -> bool:
    return all("cpu" in d.lower() for d in devices)


def _bench_body():
    """The full benchmark — bank build, compile/warm, timed passes.

    Runs inside a relay deadline child (or in-process with
    BENCH_HARDENED=0).  Returns the result dict; the parent prints it.
    """
    from dsp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dsp_tpu import pipeline as pl
    from dsp_tpu.config import PipelineConfig
    from dsp_tpu.io.dataset import DIGITS, synth_word
    from dsp_tpu.ops import frontend as fe

    if os.environ.get("BENCH_PLATFORM", "") == "":
        # production guard: the graft env's platform list is 'axon,cpu',
        # so a FAST-failing relay init silently falls back to CPU — and
        # a CPU number must never masquerade as chip throughput
        if jax.default_backend() == "cpu":
            raise RuntimeError(
                "backend fell back to CPU (relay init failed fast?) — "
                "refusing to measure; set BENCH_PLATFORM=cpu to bench "
                "the CPU explicitly")

    n_utts = int(os.environ.get("BENCH_UTTS", 1024))
    n_templates = int(os.environ.get("BENCH_TEMPLATES", 100))
    chunk = int(os.environ.get("BENCH_CHUNK", 256))
    precision = (jax.lax.Precision.HIGHEST
                 if os.environ.get("BENCH_PRECISION", "default") == "highest"
                 else jax.lax.Precision.DEFAULT)

    cfg = PipelineConfig()
    slope = os.environ.get("BENCH_SLOPE", "")    # "" (shipped default) | "itakura"
    if slope:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, dtw=dataclasses.replace(cfg.dtw, slope=slope))
    mats = fe.make_matrices(cfg.frontend)

    # template bank: 10 words x (n_templates/10) takes each
    per_word = max(1, n_templates // len(DIGITS))
    bank_sigs = np.stack([
        synth_word(lab, i, max_samples=cfg.max_samples)
        for lab in DIGITS for i in range(per_word)
    ])[:n_templates]
    ids = np.repeat(np.arange(len(DIGITS), dtype=np.int32), per_word)[:n_templates]
    bank_ns = np.full(bank_sigs.shape[0], cfg.max_samples, dtype=np.int32)
    bank = pl.extract_features(jnp.asarray(bank_sigs), jnp.asarray(bank_ns),
                               mats, cfg)
    bank = jax.block_until_ready(bank)

    # query utterances: distinct signals per chunk (blocking per chunk —
    # identical queued executions can be deduped by the runtime)
    rng = np.random.default_rng(0)
    n_chunks = max(1, round(n_utts / chunk))
    if n_chunks * chunk != n_utts:
        print(f"# note: BENCH_UTTS {n_utts} rounded to {n_chunks * chunk} "
              f"(whole chunks of {chunk})", file=sys.stderr)
    chunks = []
    for c in range(n_chunks):
        q_sigs = np.stack([
            synth_word(DIGITS[rng.integers(10)], 1000 + c * chunk + i,
                       max_samples=cfg.max_samples)
            for i in range(chunk)
        ])
        chunks.append(jnp.asarray(q_sigs))
    qn = jnp.full(chunk, cfg.max_samples, dtype=jnp.int32)
    ids_d = jnp.asarray(ids)

    @jax.jit
    def step(signals, n_samples, token):
        # fold the previous chunk's result in as a zero-valued data
        # dependency: forces sequential execution so ONE final host fetch
        # times the whole chain (block_until_ready is unreliable through
        # the relay and per-chunk fetches add ~25 ms latency each)
        labels, _ = pl.recognize_batch(signals + token, n_samples, mats,
                                       bank, ids_d, cfg, precision)
        return labels

    dispatch_mode = os.environ.get("BENCH_DISPATCH", "chunked")
    if dispatch_mode == "single":
        stacked = jnp.stack(chunks)                # [n_chunks, chunk, N]

    @jax.jit
    def chain_step(all_sigs, n_samples, token):
        # the WHOLE chain as one XLA program: an internal scan walks the
        # chunk axis, so per-chunk HBM intermediates stay bounded (the
        # scan body reuses buffers) while the host pays ONE dispatch.
        # Measured SLOWER than the chunked loop (569k vs 597k, round 5,
        # v5e): async dispatch already overlaps the ~7 ms per-program
        # launch latency, and the scan loses that pipelining.  Kept as
        # BENCH_DISPATCH=single for re-measurement, not the default.
        def body(tok, sigs):
            labels, _ = pl.recognize_batch(sigs + tok, n_samples, mats,
                                           bank, ids_d, cfg, precision)
            return (labels[0] * 0).astype(jnp.float32), labels[0]
        _, firsts = jax.lax.scan(body, token, all_sigs)
        return firsts

    def run_chain():
        token = jnp.asarray(0.0, jnp.float32)
        if dispatch_mode == "single":
            firsts = chain_step(stacked, qn, token)
            return np.asarray(firsts[-1])  # one tiny fetch = barrier
        labels = None
        for c in range(n_chunks):
            labels = step(chunks[c], qn, token)
            token = (labels[0] * 0).astype(jnp.float32)
        return np.asarray(labels[0])  # single tiny fetch = completion barrier

    run_chain()                        # compile + warm
    dts = []
    for _ in range(int(os.environ.get("BENCH_PASSES", 5))):
        t0 = time.perf_counter()
        run_chain()
        dts.append(time.perf_counter() - t0)

    alignments = n_chunks * chunk * bank.feats.shape[0]
    rates = sorted(alignments / d for d in dts)       # ascending
    median = rates[len(rates) // 2] if len(rates) % 2 else (
        0.5 * (rates[len(rates) // 2 - 1] + rates[len(rates) // 2]))
    # value = MEDIAN of >= 5 passes (VERDICT round 2: best-of-2 through a
    # +/-30%-noise relay over-read; min/max expose the spread honestly)
    return {
        "metric": "mfcc_dtw_alignments_per_sec_per_chip",
        "value": round(median, 1),
        "unit": "alignments/s/chip",
        "vs_baseline": round(median / NORTH_STAR, 3),
        "passes": len(rates),
        "min": round(rates[0], 1),
        "max": round(rates[-1], 1),
    }


def _probe_until_up(window_s: float, per_probe_s: float,
                    require_tpu: bool) -> list[str]:
    """Re-probe the backend across an outage window; raises on give-up.

    With ``require_tpu`` a probe that comes back CPU-only counts as a
    FAILED probe: the 'axon,cpu' platform list means a fast-failing
    relay init silently lands on CPU, and a CPU number must never be
    recorded as chip throughput.
    """
    from dsp_tpu.utils.relay import CompileTimeout, run_with_deadline

    deadline = time.monotonic() + window_s
    attempt = 0
    while True:
        attempt += 1
        try:
            devices = run_with_deadline("bench:_probe", (),
                                        timeout_s=per_probe_s, retries=0)
            if require_tpu and _cpu_only(devices):
                raise RuntimeError(
                    f"probe saw only CPU devices {devices} — relay init "
                    f"failed fast and jax fell back to CPU")
            return devices
        except (CompileTimeout, RuntimeError) as e:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise RuntimeError(
                    f"backend unreachable after {attempt} probes over "
                    f"{window_s:.0f}s (last: {e}) — TPU relay appears "
                    f"hard-down; not starting the measured run") from e
            pause = min(60.0, max(5.0, remaining / 4))
            print(f"# bench: probe {attempt} failed ({e}); relay may be "
                  f"down — re-probing in {pause:.0f}s "
                  f"({remaining:.0f}s left in window)", file=sys.stderr)
            time.sleep(pause)


def main():
    if os.environ.get("BENCH_HARDENED", "1") != "1":
        print(json.dumps(_bench_body()))
        return

    # Both the probe and the body run in deadline children (module
    # docstring).  Everything a child compiles lands in the persistent
    # cache, so a killed/retried attempt resumes warm.  The parent's
    # only jax touch is the config pin below — importing jax and
    # setting config do NOT initialize a backend.
    from dsp_tpu.utils.relay import CompileTimeout, run_with_deadline

    platform = os.environ.get("BENCH_PLATFORM", "")
    if platform:
        # explicit platform (e.g. cpu for local testing).  The config
        # pin is REQUIRED: site startup rewrites jax_platforms to
        # 'axon,cpu' in every interpreter regardless of the env var,
        # and relay children mirror the parent's CONFIG value.
        import jax
        jax.config.update("jax_platforms", platform)
        os.environ["JAX_PLATFORMS"] = platform

    probe_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", 90))
    window_s = float(os.environ.get("BENCH_PROBE_WINDOW", 600))
    try:
        devices = _probe_until_up(window_s, probe_s,
                                  require_tpu=(platform == ""))
    except RuntimeError as e:
        print(f"# bench: NOT MEASURED — {e}", file=sys.stderr)
        raise SystemExit(1)
    print(f"# bench: backend up: {devices}", file=sys.stderr)

    deadline_s = float(os.environ.get("BENCH_DEADLINE", 2400))
    retries = int(os.environ.get("BENCH_RETRIES", 1))
    try:
        result = run_with_deadline("bench:_bench_body", (),
                                   timeout_s=deadline_s, retries=retries)
    except (CompileTimeout, RuntimeError) as e:
        print(f"# bench: measured run FAILED through the relay: {e}",
              file=sys.stderr)
        raise SystemExit(1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
