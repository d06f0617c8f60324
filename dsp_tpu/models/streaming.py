"""Online recognizer: streaming front-end + template matching.

The reference's live-demo loop (SURVEY.md §3.3: record -> streaming
endpoint detection -> on utterance end: MFCC -> classify).  The host side
here only moves chunks and collects events; all signal processing runs in
the jitted ``process_chunk``, and each finished utterance is classified
with the same device pipeline as the offline recognizer.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from dsp_tpu import pipeline as pl
from dsp_tpu.config import PipelineConfig
from dsp_tpu.models.knn_dtw import KnnDtwRecognizer
from dsp_tpu.ops import frontend as fe
from dsp_tpu.ops import streaming as st


class StreamingRecognizer:
    """Feed audio chunks, get (label, start_frame, end_frame) events."""

    def __init__(self, recognizer: KnnDtwRecognizer, chunk_len: int = 1600,
                 history_frames: int | None = None):
        self.rec = recognizer
        self.cfg: PipelineConfig = recognizer.cfg
        if self.cfg.frontend.feature_type != "mfcc":
            # the streaming front-end computes MFCC only; matching LPCC
            # bank templates against MFCC queries would silently collapse
            raise NotImplementedError(
                "StreamingRecognizer supports feature_type='mfcc' only "
                f"(got {self.cfg.frontend.feature_type!r})")
        self.chunk_len = chunk_len
        self.mats = recognizer.mats
        self.state = st.init_state(self.cfg.frontend, chunk_len)
        self._frames: list[np.ndarray] = []   # recent MFCC frames, host side
        self._offset = 0                      # global index of _frames[0]
        # keep enough history for the longest classifiable utterance plus
        # VAD hangover; bounds host memory on long-running streams
        self.history_frames = history_frames or 4 * self.cfg.max_frames

    def reset(self) -> None:
        self.state = st.init_state(self.cfg.frontend, self.chunk_len)
        self._frames = []
        self._offset = 0

    def _trim_history(self) -> None:
        extra = len(self._frames) - self.history_frames
        if extra > 0:
            del self._frames[:extra]
            self._offset += extra

    def feed(self, chunk: np.ndarray):
        """One chunk [chunk_len] -> list of recognized utterance events."""
        assert len(chunk) == self.chunk_len
        self.state, out = st.process_chunk(
            self.state, jnp.asarray(chunk, dtype=jnp.float32), self.mats,
            self.cfg.frontend, self.cfg.vad, self.chunk_len)
        mfcc = np.asarray(out.mfcc)
        valid = np.asarray(out.frame_valid)
        self._frames.extend(mfcc[valid])

        events = []
        ends = np.asarray(out.utt_end)
        min_frames = self.cfg.vad.min_utterance_frames
        for t in np.nonzero(ends)[0]:
            start = int(np.asarray(out.utt_start_idx)[t])
            end = int(np.asarray(out.utt_end_idx)[t])
            end = min(end, self._offset + len(self._frames))
            if end - start >= min_frames:
                ev = self._classify(start, end)
                if ev is not None:
                    events.append(ev)
        self._trim_history()
        return events

    def _classify(self, start: int, end: int):
        # global frame indices -> positions in the trimmed history window
        lo = max(start - self._offset, 0)
        hi = max(end - self._offset, lo)
        if hi <= lo:
            # utterance fell entirely behind the trimmed history window
            # (history_frames < the VAD's silence+hangover horizon) —
            # nothing classifiable; callers drop the None event
            return None
        seg = np.stack(self._frames[lo:hi])                   # [T', n_mfcc]
        t_max = self.cfg.max_frames
        padded = np.zeros((t_max, seg.shape[1]), dtype=np.float32)
        padded[: len(seg)] = seg[:t_max]
        length = jnp.asarray(min(len(seg), t_max))
        if self.cfg.frontend.cmn:
            # mirror pipeline._extract_one: mean over the valid frames
            # only, so streaming queries live in the same feature space
            # as the CMN-normalised bank templates
            valid = (np.arange(t_max) < int(length))[:, None]
            mean = (padded * valid).sum(0, keepdims=True) / max(int(length), 1)
            padded = np.where(valid, padded - mean, 0.0).astype(np.float32)
        feats = fe.add_deltas(jnp.asarray(padded), self.cfg.frontend, length)
        feats = jnp.where((jnp.arange(t_max) < length)[:, None], feats, 0.0)
        query = pl.Features(feats[None], length[None])
        bank, ids = self.rec.device_bank()
        # same matcher routing and kNN vote as the offline recognizer,
        # so a streamed utterance and classify_batch of the identical
        # frames agree (the class docstring's parity promise)
        r = self.rec
        if r.matcher == "ltw":
            label_ids, _ = pl.classify_features_ltw(query, bank, ids,
                                                    r.ltw_len)
        elif r.matcher == "cascade":
            label_ids, _, _ = pl.classify_features_cascade(
                query, bank, ids, r.shortlist, r.k,
                n_labels=len(r.labels), target_len=r.ltw_len, cfg=self.cfg)
        else:
            label_ids, _ = pl.classify_features(
                query, bank, ids, n_labels=len(r.labels), k=r.k,
                cfg=self.cfg)
        label = r._ids_to_labels(label_ids)[0]
        return label, start, end

    def flush(self):
        """Force-close a speech segment in progress (end of stream)."""
        if int(np.asarray(self.state.vad_state)) == st.SPEECH:
            start = int(np.asarray(self.state.utt_start))
            end = self._offset + len(self._frames)
            if end - start >= self.cfg.vad.min_utterance_frames:
                ev = self._classify(start, end)
                return [ev] if ev is not None else []
        return []
