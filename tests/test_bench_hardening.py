"""bench.py relay-outage hardening (VERDICT r3 #1).

The round-3 driver capture died at import-time backend init when the
relay was down (BENCH_r03 rc=1).  These tests pin the parent-side
orchestration: probe retries across the outage window, CPU-fallback
rejection (the env's 'axon,cpu' platform list silently lands on CPU
when the relay init fails FAST), and the give-up path's clear error.
The measured body itself is covered end-to-end by running bench.py
with BENCH_PLATFORM=cpu (test_bench_cpu_smoke).
"""

import json
import os
import subprocess
import sys

import pytest

import bench
from dsp_tpu.utils.relay import CompileTimeout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cpu_only_detector():
    assert bench._cpu_only(["TFRT_CPU_0"])
    assert bench._cpu_only(["cpu:0", "CPU_7"])
    assert not bench._cpu_only(["TPU_0(process=0,(0,0,0,0))"])
    assert not bench._cpu_only(["TFRT_CPU_0", "axon:0"])


def test_probe_until_up_retries_then_succeeds(monkeypatch):
    calls = []

    def fake_run(fn, args, timeout_s, retries):
        calls.append(fn)
        if len(calls) < 3:
            raise CompileTimeout("stalled")
        return ["axon:0"]

    monkeypatch.setattr("dsp_tpu.utils.relay.run_with_deadline", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    got = bench._probe_until_up(window_s=300, per_probe_s=1,
                                require_tpu=True)
    assert got == ["axon:0"]
    assert len(calls) == 3


def test_probe_until_up_rejects_cpu_fallback_then_gives_up(monkeypatch):
    """require_tpu: a CPU-only probe is a FAILED probe — a fast-failing
    relay must not let a CPU number masquerade as chip throughput."""
    monkeypatch.setattr("dsp_tpu.utils.relay.run_with_deadline",
                        lambda *a, **k: ["TFRT_CPU_0"])
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="unreachable|CPU"):
        bench._probe_until_up(window_s=0.5, per_probe_s=1, require_tpu=True)


def test_probe_until_up_accepts_cpu_when_not_required(monkeypatch):
    monkeypatch.setattr("dsp_tpu.utils.relay.run_with_deadline",
                        lambda *a, **k: ["TFRT_CPU_0"])
    got = bench._probe_until_up(window_s=1, per_probe_s=1,
                                require_tpu=False)
    assert got == ["TFRT_CPU_0"]


def test_probe_until_up_gives_up_with_clear_error(monkeypatch):
    def always_stall(*a, **k):
        raise CompileTimeout("attempt stalled")

    monkeypatch.setattr("dsp_tpu.utils.relay.run_with_deadline",
                        always_stall)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="hard-down"):
        bench._probe_until_up(window_s=0.2, per_probe_s=1, require_tpu=True)


@pytest.mark.slow
def test_bench_cpu_smoke():
    """Full hardened path end-to-end on CPU: probe child + measured
    child + exactly one JSON line on stdout."""
    env = dict(os.environ, BENCH_PLATFORM="cpu", BENCH_UTTS="4",
               BENCH_CHUNK="4", BENCH_TEMPLATES="10", BENCH_PASSES="1",
               BENCH_PROBE_TIMEOUT="120", BENCH_DEADLINE="300")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=420,
                         env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "mfcc_dtw_alignments_per_sec_per_chip"
    assert rec["value"] > 0 and rec["passes"] == 1
