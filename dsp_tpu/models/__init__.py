"""Recognizer model families: kNN-DTW (primary) and GMM-HMM (statistical)."""

from dsp_tpu.models.knn_dtw import KnnDtwRecognizer

__all__ = ["KnnDtwRecognizer"]
