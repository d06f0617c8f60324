#!/usr/bin/env bash
# One-shot TPU evidence capture (run when the relay is up).
#
# Produces every number the round needs from the real chip, in
# dependency order, with the persistent cache warmed first so the
# driver's own bench run is fast.  Each step is independently
# restartable; partial progress is kept in /tmp/tpu_capture/.
#
#   bash scripts/tpu_capture.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_capture}"
mkdir -p "$OUT"
echo "== tpu_capture -> $OUT"

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "== $name (timeout ${t}s)"
  if [ -s "$OUT/$name.ok" ]; then echo "   cached, skipping"; return 0; fi
  timeout "$t" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  echo "rc=$rc" > "$OUT/$name.rc"
  if [ $rc -eq 0 ]; then touch "$OUT/$name.ok"; fi
  tail -3 "$OUT/$name.out"
  return $rc
}

# 1. warm the serving/bench shapes into the persistent cache (deadline
#    children; survives stalls)
run warm 3600 python -m dsp_tpu warm --bank-size 100 --batches 1,8,64,256 \
    --timeout 900 --retries 2
# connected/level/grammar decoders at the serve_latency recording shapes
echo '{"no_repeat": true}' > "$OUT/g.json"
run warm_conn 3600 python -m dsp_tpu warm --bank-size 100 --batches '' \
    --connected 2,3 --max-segments 4 --grammar "$OUT/g.json" \
    --timeout 900 --retries 2

# 2. the driver-contract surfaces
run bench 3600 python bench.py
run entry 1200 python __graft_entry__.py

# 3. the full BASELINE config sweep (median-of-3 each)
run bench_all 5400 python bench_all.py

# 4. serving latency percentiles
run serve_latency 3600 python scripts/serve_latency.py

# 5. on-device test artifact (11 tests -> docs/TPU_TESTS.md refresh)
run device_tests 5400 env DSP_TPU_DEVICE_TESTS=1 \
    python -m pytest tests/test_tpu_device.py -v -s

# 6. keyword-spotting accuracy matrix (backend-independent but cheap
#    on the chip once warm; docs/RESULTS.md table)
run spot_eval 1800 python scripts/spot_eval.py

echo "== capture summary"
for f in "$OUT"/*.rc; do echo "$(basename "$f" .rc): $(cat "$f")"; done
