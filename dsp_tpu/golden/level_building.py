"""Loop-level oracle for level-building connected-word decoding.

Plain-numpy mirror of ops/level_building.py (same step set, entry rule,
token passing and BIG masking — see that module's docstring for the
semantics contract), plus an exponential brute-force enumerator used by
the tests to prove the DP itself is right on tiny problems: enumerate
every segmentation of the query into <= L contiguous non-empty spans
and every template assignment, score each span with the same
query-synchronous asymmetric DTW, and take the minimum.
"""

from __future__ import annotations

import itertools

import numpy as np

BIG = 1e30


def _dist(a: np.ndarray, b: np.ndarray, squared: bool) -> float:
    d = float(np.sum((a - b) ** 2))
    return d if squared else float(np.sqrt(d))


def span_dtw(q: np.ndarray, tmpl: np.ndarray, squared: bool = False) -> float:
    """Asymmetric DTW of a query SPAN against one whole template.

    Query-synchronous steps {(1,0),(1,1),(1,2)}: each query frame is
    consumed exactly once; the path starts at template frame 0 on the
    span's first frame and must end at the template's last frame.
    """
    t, u = len(q), len(tmpl)
    dp = np.full((t, u), BIG)
    dp[0, 0] = _dist(q[0], tmpl[0], squared)   # path enters at frame 0, j=0
    for i in range(1, t):
        for j in range(u):
            best = dp[i - 1, j]
            if j >= 1:
                best = min(best, dp[i - 1, j - 1])
            if j >= 2:
                best = min(best, dp[i - 1, j - 2])
            dp[i, j] = min(BIG, best + _dist(q[i], tmpl[j], squared))
    return float(dp[t - 1, u - 1])


def brute_connected(q: np.ndarray, templates: list, max_levels: int,
                    word_penalty: float = 0.0, squared: bool = False):
    """Exhaustive minimum over all segmentations x word assignments.

    Returns (best word-id sequence, best cost); ([], BIG) when nothing
    is feasible.  Exponential — tiny test inputs only.
    """
    t = len(q)
    best_cost, best_seq = BIG, []
    for n_words in range(1, max_levels + 1):
        # boundaries: 0 = b0 < b1 < ... < bn = t  (non-empty spans)
        for cuts in itertools.combinations(range(1, t), n_words - 1):
            bounds = (0,) + cuts + (t,)
            spans = [(bounds[i], bounds[i + 1]) for i in range(n_words)]
            span_costs = [[span_dtw(q[a:b], tmpl, squared)
                           for tmpl in templates] for a, b in spans]
            ids = [int(np.argmin(c)) for c in span_costs]
            cost = sum(min(c) for c in span_costs) \
                + word_penalty * n_words
            if cost < best_cost:
                best_cost, best_seq = cost, ids
    return best_seq, float(best_cost)


def brute_connected_grammar(q: np.ndarray, templates: list,
                            start: np.ndarray, pairs: np.ndarray,
                            end: np.ndarray, max_levels: int,
                            word_penalty: float = 0.0,
                            squared: bool = False):
    """Exhaustive grammar-constrained minimum (oracle for the oracle).

    Unlike :func:`brute_connected`, the word assignment can NOT be
    chosen per-span independently — the grammar couples consecutive
    words — so this enumerates the full K^n assignment product too.
    Doubly exponential; only for tiny test inputs.
    """
    t, k = len(q), len(templates)
    best_cost, best_seq = BIG, []
    for n_words in range(1, max_levels + 1):
        for cuts in itertools.combinations(range(1, t), n_words - 1):
            bounds = (0,) + cuts + (t,)
            spans = [(bounds[i], bounds[i + 1]) for i in range(n_words)]
            span_costs = np.asarray(
                [[span_dtw(q[a:b], tmpl, squared) for tmpl in templates]
                 for a, b in spans])
            for ids in itertools.product(range(k), repeat=n_words):
                if not (start[ids[0]] and end[ids[-1]]):
                    continue
                if any(not pairs[ids[i], ids[i + 1]]
                       for i in range(n_words - 1)):
                    continue
                cost = sum(span_costs[i, w] for i, w in enumerate(ids)) \
                    + word_penalty * n_words
                if cost < best_cost:
                    best_cost, best_seq = cost, list(ids)
    return best_seq, float(best_cost)


def level_build_grammar_ref(q: np.ndarray, templates: list,
                            start: np.ndarray, pairs: np.ndarray,
                            max_levels: int, word_penalty: float = 0.0,
                            squared: bool = False):
    """Grammar-constrained loop-level DP -> (costs, starts) [L, T, K].

    Mirror of ops/level_building.level_build_grammar for a single
    recording.  Unlike :func:`level_build_ref`, the per-frame front can
    NOT be reduced to the best template — the next level's entry for
    word v is a masked min over the PREVIOUS word u (``pairs[u, v]``) —
    so the returned planes keep the template axis: ``costs[l, t, v]`` =
    best cost of ``l+1`` words consuming frames ``0..t`` with LAST word
    ``v``; ``starts[l, t, v]`` = the frame where that last word entered.
    The ``end`` mask applies at readout (ops backtrack_grammar), not
    here: a non-final word may be a predecessor even if it cannot end
    the utterance.
    """
    t, k = len(q), len(templates)
    costs = np.full((max_levels, t, k), BIG)
    starts = np.zeros((max_levels, t, k), np.int32)
    # prev[s, u]: best cost of the earlier levels consuming exactly s
    # frames with last word u; the virtual start (level 0, s=0) is an
    # all-BIG-free row whose outgoing mask is `start` regardless of u.
    prev = np.full((t + 1, k), BIG)
    prev[0] = 0.0
    for lvl in range(max_levels):
        mask = np.broadcast_to(start, (k, k)) if lvl == 0 else pairs
        dp = [np.full(len(tm), BIG) for tm in templates]
        tok = [np.zeros(len(tm), np.int32) for tm in templates]
        for i in range(t):
            entry = np.full(k, BIG)
            for v in range(k):
                allowed = prev[i][mask[:, v]]
                if allowed.size and allowed.min() < BIG / 2:
                    entry[v] = allowed.min() + word_penalty
            new_dp, new_tok = [], []
            for v, tm in enumerate(templates):
                u = len(tm)
                nd = np.full(u, BIG)
                nt = np.zeros(u, np.int32)
                for j in range(u):
                    cands = [(dp[v][j], tok[v][j])]
                    if j >= 1:
                        cands.append((dp[v][j - 1], tok[v][j - 1]))
                    if j >= 2:
                        cands.append((dp[v][j - 2], tok[v][j - 2]))
                    if j == 0:
                        cands.append((entry[v], np.int32(i)))
                    c_best, t_best = min(cands, key=lambda x: x[0])
                    nd[j] = min(BIG, c_best + _dist(q[i], tm[j], squared))
                    nt[j] = t_best
                new_dp.append(nd)
                new_tok.append(nt)
            dp, tok = new_dp, new_tok
            for v in range(k):
                costs[lvl, i, v] = dp[v][-1]
                starts[lvl, i, v] = tok[v][-1]
        prev = np.concatenate([np.full((1, k), BIG), costs[lvl]])
    return costs, starts


def level_build_ref(q: np.ndarray, templates: list, max_levels: int,
                    word_penalty: float = 0.0, squared: bool = False):
    """Loop-level level-building DP -> (costs, words, starts) [L, T].

    Identical recursion/conventions to ops/level_building.level_build
    for a single recording (templates as a ragged python list — no
    padding needed at loop level).
    """
    t = len(q)
    k = len(templates)
    costs = np.full((max_levels, t), BIG)
    words = np.zeros((max_levels, t), np.int32)
    starts = np.zeros((max_levels, t), np.int32)
    prev = np.full(t + 1, BIG)
    prev[0] = 0.0
    for lvl in range(max_levels):
        # dp[v][j], tok[v][j] over query frames
        dp = [np.full(len(tm), BIG) for tm in templates]
        tok = [np.zeros(len(tm), np.int32) for tm in templates]
        for i in range(t):
            entry = prev[i] + word_penalty if prev[i] < BIG / 2 else BIG
            new_dp, new_tok = [], []
            for v, tm in enumerate(templates):
                u = len(tm)
                nd = np.full(u, BIG)
                nt = np.zeros(u, np.int32)
                for j in range(u):
                    cands = [(dp[v][j], tok[v][j])]
                    if j >= 1:
                        cands.append((dp[v][j - 1], tok[v][j - 1]))
                    if j >= 2:
                        cands.append((dp[v][j - 2], tok[v][j - 2]))
                    if j == 0:
                        cands.append((entry, np.int32(i)))
                    c_best, t_best = min(cands, key=lambda x: x[0])
                    nd[j] = min(BIG, c_best + _dist(q[i], tm[j], squared))
                    nt[j] = t_best
                new_dp.append(nd)
                new_tok.append(nt)
            dp, tok = new_dp, new_tok
            ends = np.asarray([dp[v][-1] for v in range(k)])
            v_best = int(np.argmin(ends))
            costs[lvl, i] = ends[v_best]
            words[lvl, i] = v_best
            starts[lvl, i] = tok[v_best][-1]
        prev = np.concatenate([[BIG], costs[lvl]])
    return costs, words, starts
