"""Golden numpy DTW and nearest-template classification.

Classical dynamic time warping (SURVEY.md L3; Muda et al. 1003.4083 §C):

    D[i, j] = d(a_i, b_j) + min(D[i-1, j], D[i, j-1], D[i-1, j-1])

with Euclidean local cost, full boundary conditions, and the final
distance normalised by (T_a + T_b).  Optional Sakoe-Chiba band expressed
as a fraction of max(T_a, T_b).

This loop implementation is the exact-parity oracle for the JAX
min-plus-scan DTW (dsp_tpu/ops/dtw.py) and the Pallas wavefront kernel
(dsp_tpu/kernels/dtw_pallas.py).
"""

from __future__ import annotations

import numpy as np

from dsp_tpu.config import DtwConfig

BIG = 1e30


def dtw_distance(
    a: np.ndarray,
    b: np.ndarray,
    cfg: DtwConfig = DtwConfig(),
    return_path: bool = False,
):
    """DTW distance between feature sequences a [Ta, F] and b [Tb, F]."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    ta, tb = a.shape[0], b.shape[0]
    assert ta > 0 and tb > 0

    diff = a[:, None, :] - b[None, :, :]
    cost = np.sum(diff * diff, axis=-1)
    if not cfg.squared:
        cost = np.sqrt(np.maximum(cost, 0.0))

    if cfg.band_frac is not None:
        radius = max(1.0, cfg.band_frac * max(ta, tb))
        # band around the stretched diagonal j ~ i * (tb-1)/(ta-1)
        scale = (tb - 1) / max(ta - 1, 1)
        for i in range(ta):
            for j in range(tb):
                if abs(j - i * scale) > radius:
                    cost[i, j] = BIG

    dp = np.full((ta, tb), BIG, dtype=np.float64)
    dp[0, 0] = cost[0, 0]
    for j in range(1, tb):
        dp[0, j] = dp[0, j - 1] + cost[0, j]
    for i in range(1, ta):
        dp[i, 0] = dp[i - 1, 0] + cost[i, 0]
        for j in range(1, tb):
            dp[i, j] = cost[i, j] + min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1])

    dist = dp[ta - 1, tb - 1] / float(ta + tb)
    if not return_path:
        return dist

    # backtrace
    path = [(ta - 1, tb - 1)]
    i, j = ta - 1, tb - 1
    while i > 0 or j > 0:
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            choices = [(dp[i - 1, j - 1], i - 1, j - 1),
                       (dp[i - 1, j], i - 1, j),
                       (dp[i, j - 1], i, j - 1)]
            _, i, j = min(choices, key=lambda c: c[0])
        path.append((i, j))
    return dist, path[::-1]


def classify(feats: np.ndarray, bank, cfg: DtwConfig = DtwConfig()):
    """Nearest-template classification.

    ``bank`` is a list of (label, template_feats).  Returns
    (best_label, distances list).
    """
    dists = [dtw_distance(feats, tmpl, cfg) for _, tmpl in bank]
    best = int(np.argmin(dists))
    return bank[best][0], dists
