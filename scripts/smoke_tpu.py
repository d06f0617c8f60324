"""On-device integration smoke test (run on the real TPU).

CI runs on CPU (tests/conftest.py forces it); this script exercises the
main user flows on whatever device jax selects and prints one PASS/FAIL
line per stage with wall-clock. Safe to run repeatedly — the persistent
compilation cache makes warm runs fast.

    python scripts/smoke_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dsp_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from dsp_tpu import KnnDtwRecognizer
    from dsp_tpu.config import DtwConfig, FrontendConfig, HmmConfig, PipelineConfig
    from dsp_tpu.io.dataset import synth_word
    from dsp_tpu.models.gmm_hmm import GmmHmmRecognizer
    from dsp_tpu.models.streaming import StreamingRecognizer

    print(f"device: {jax.devices()[0]}")
    labels = ["zero", "one", "two"]
    train = {lab: [synth_word(lab, i) for i in range(3)] for lab in labels}
    test = {lab: [synth_word(lab, 100 + i) for i in range(2)] for lab in labels}
    failures = 0

    def stage(name, fn, expect=1.0):
        nonlocal failures
        t0 = time.perf_counter()
        try:
            acc = fn()
            ok = acc >= expect
        except Exception as e:  # noqa: BLE001 — report, keep smoking
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            return
        dt = time.perf_counter() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name}: acc={acc:.3f} ({dt:.1f}s)")
        failures += 0 if ok else 1

    def knn(impl):
        # the unbanded fused kernel rejects a band (kernels/dtw_fused.py);
        # the other impls exercise the shipped band default
        band = None if impl == "fused" else DtwConfig.band_frac
        rec = KnnDtwRecognizer(
            PipelineConfig(dtw=DtwConfig(impl=impl, band_frac=band)))
        for lab in labels:
            rec.enroll(lab, train[lab])
        return rec.evaluate(test)["accuracy"]

    stage("knn-dtw (scan)", lambda: knn("scan"))
    stage("knn-dtw (pallas kernel)", lambda: knn("pallas"))
    stage("knn-dtw (fused kernel)", lambda: knn("fused"))

    def ltw():
        rec = KnnDtwRecognizer(PipelineConfig(), matcher="ltw")
        for lab in labels:
            rec.enroll(lab, train[lab])
        return rec.evaluate(test)["accuracy"]

    stage("knn-ltw (fast matcher)", ltw, expect=5 / 6)

    def lpcc():
        rec = KnnDtwRecognizer(
            PipelineConfig(frontend=FrontendConfig(feature_type="lpcc")))
        for lab in labels:
            rec.enroll(lab, train[lab])
        return rec.evaluate(test)["accuracy"]

    stage("knn-dtw (lpcc features)", lpcc, expect=5 / 6)

    def hmm(mode):
        rec = GmmHmmRecognizer(
            PipelineConfig(),
            HmmConfig(n_states=4, n_mix=2, n_iter=3, train_mode=mode))
        rec.fit(train)
        return rec.evaluate(test)["accuracy"]

    stage("gmm-hmm (viterbi EM)", lambda: hmm("viterbi"), expect=5 / 6)
    stage("gmm-hmm (baum-welch)", lambda: hmm("baum_welch"), expect=5 / 6)

    def streaming():
        rec = KnnDtwRecognizer(PipelineConfig())
        for lab in labels:
            rec.enroll(lab, train[lab])
        rng = np.random.default_rng(0)
        sig = (0.002 * rng.standard_normal(16000 * 4)).astype(np.float32)
        w = synth_word("two", 77, max_samples=24000)
        sig[16000:16000 + len(w)] += w
        stream = StreamingRecognizer(rec, 1600)
        events = []
        for c in range(len(sig) // 1600):
            events += stream.feed(sig[c * 1600:(c + 1) * 1600])
        events += stream.flush()
        return 1.0 if [e[0] for e in events] == ["two"] else 0.0

    stage("streaming recognizer", streaming)

    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
