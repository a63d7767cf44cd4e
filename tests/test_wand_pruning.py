"""Adversarial block-max WAND pruning tests (pure Python, no Spark).

Regression for the r1 unsoundness: when the block-max refinement rejects a
pivot, the skip target must be clamped at the next (non-pivot) cursor's
current doc (Ding & Suel BMW d' rule), and the pivot must be extended
across cursors tied at pivot_doc before summing block upper bounds.
Without either, a doc appearing in both a skipped-over list and a later
list permanently loses the skipped list's contribution.
"""

import numpy as np

from kafka_es_spark.operators.wand import _Cursor, wand_range_topk


def mk_cursor(ids, contribs, block_spec):
    """Build a _Cursor directly from raw postings. block_spec is either a
    fixed block size (int) or explicit block lengths (list summing to
    len(ids)); block upper bound = max contribution within the block (the
    tightest valid bound, same role as blk_maxtf/blk_mindl in the real
    index)."""
    c = object.__new__(_Cursor)
    c.ids = np.asarray(ids, dtype=np.int64)
    c.contrib = np.asarray(contribs, dtype=np.float64)
    n = c.ids.size
    if isinstance(block_spec, int):
        bounds = list(range(0, n, block_spec)) + [n]
    else:
        assert sum(block_spec) == n
        bounds = [0]
        for ln in block_spec:
            bounds.append(bounds[-1] + ln)
    bl, bu = [], []
    for s, e in zip(bounds, bounds[1:]):
        if s == e:
            continue
        bl.append(int(c.ids[e - 1]))
        bu.append(float(c.contrib[s:e].max()))
    c.blk_last = np.asarray(bl, dtype=np.int64)
    c.blk_ub = np.asarray(bu, dtype=np.float64)
    c.pos = 0
    c.n = n
    return c


def brute_topk(raw, k):
    """Exhaustive scorer accumulating per-doc contributions in cursor-index
    order — the same float64 op order as wand_range_topk, so results must be
    bit-identical."""
    docs = sorted({int(d) for ids, _ in raw for d in ids})
    out = []
    for d in docs:
        s = 0.0
        for ids, con in raw:
            j = int(np.searchsorted(ids, d))
            if j < len(ids) and ids[j] == d:
                s += float(con[j])
        out.append((d, s))
    out.sort(key=lambda e: (-e[1], e[0]))
    return out[:k]


def run_wand(raw, blocks, k):
    cursors = [mk_cursor(ids, con, b) for (ids, con), b in zip(raw, blocks)]
    return wand_range_topk(cursors, k)


def test_bmw_skip_clamped_at_next_cursor_doc():
    # c0's block [5,11,40] has ub 0.5; at pivot=5 with theta=5.0 the
    # refinement rejects and the unclamped skip jumps c0 to 41, losing
    # c0's 0.5 contribution to doc 11 (true winner 5.3).
    raw = [
        ([1, 5, 11, 40], [5.0, 0.5, 0.5, 0.5]),
        ([11, 50], [4.8, 0.1]),
    ]
    # c0 block layout [1] | [5,11,40] — the rejected-pivot block's last doc
    # (40) reaches past c1's current doc (11)
    got = run_wand(raw, blocks=[[1, 3], [2]], k=1)
    assert got == brute_topk(raw, 1) == [(11, 5.3)]


def test_bmw_pivot_extended_across_ties():
    # all three cursors sit on doc 11; without extending the pivot across
    # the ties, bub counts only c0's 0.5 < theta=5.0 and skips c0 past 11,
    # undercounting doc 11 (true 5.6) to 5.1.
    raw = [
        ([1, 11, 40], [5.0, 0.5, 0.5]),
        ([11, 40], [0.6, 0.6]),
        ([11], [4.5]),
    ]
    got = run_wand(raw, blocks=[1, 2, 1], k=1)
    want = brute_topk(raw, 1)
    assert got == want
    assert want[0][0] == 11 and abs(want[0][1] - 5.6) < 1e-12


def test_wand_matches_bruteforce_random_layouts():
    # many random posting layouts with tiny blocks (1-4 docs) — small
    # blocks maximize refinement-skip opportunities, the regression zone.
    rng = np.random.default_rng(1234)
    for trial in range(300):
        n_terms = int(rng.integers(2, 5))
        raw, blocks = [], []
        for _ in range(n_terms):
            n = int(rng.integers(1, 15))
            ids = np.sort(rng.choice(60, size=n, replace=False))
            con = np.round(rng.uniform(0.1, 5.0, size=n), 3)
            raw.append((ids.tolist(), con.tolist()))
            blocks.append(int(rng.integers(1, 5)))
        k = int(rng.integers(1, 6))
        got = run_wand(raw, blocks, k)
        want = brute_topk(raw, k)
        assert got == want, f"trial={trial} k={k} raw={raw} blocks={blocks}"


def test_vectorized_matches_bmw_and_bruteforce():
    """blockmax_topk_vectorized must be bit-identical to both the classic
    cursor BMW and the brute-force scorer on random layouts, including with
    tombstone exclusions."""
    from kafka_es_spark.operators.wand import blockmax_topk_vectorized

    rng = np.random.default_rng(99)
    for trial in range(300):
        n_terms = int(rng.integers(2, 5))
        raw, blocks = [], []
        for _ in range(n_terms):
            n = int(rng.integers(1, 20))
            ids = np.sort(rng.choice(8000, size=n, replace=False))
            con = np.round(rng.uniform(0.1, 5.0, size=n), 3)
            raw.append((ids.tolist(), con.tolist()))
            blocks.append(int(rng.integers(1, 5)))
        k = int(rng.integers(1, 6))
        excluded = None
        if trial % 3 == 0:
            pool = sorted({d for ids, _ in raw for d in ids})
            excluded = frozenset(pool[:: max(1, len(pool) // 3)])
        want = brute_topk_excl(raw, k, excluded)
        cursors = [mk_cursor(ids, con, b) for (ids, con), b in zip(raw, blocks)]
        got_v = blockmax_topk_vectorized(cursors, k, excluded=excluded, wbits=3)
        assert got_v == want, f"vector trial={trial}"
        if excluded is None:
            cursors2 = [mk_cursor(ids, con, b) for (ids, con), b in zip(raw, blocks)]
            got_b = wand_range_topk(cursors2, k)
            assert got_b == want, f"bmw trial={trial}"


def brute_topk_excl(raw, k, excluded=None):
    out = [
        (d, s)
        for d, s in brute_topk(raw, 10**9)
        if excluded is None or d not in excluded
    ]
    return out[:k]


def test_bmw_exclusion_matches_bruteforce():
    rng = np.random.default_rng(7)
    for trial in range(100):
        raw, blocks = [], []
        for _ in range(3):
            n = int(rng.integers(2, 15))
            ids = np.sort(rng.choice(100, size=n, replace=False))
            con = np.round(rng.uniform(0.1, 5.0, size=n), 3)
            raw.append((ids.tolist(), con.tolist()))
            blocks.append(int(rng.integers(1, 4)))
        pool = sorted({d for ids, _ in raw for d in ids})
        excluded = frozenset(pool[::2])
        want = brute_topk_excl(raw, 3, excluded)
        cursors = [mk_cursor(ids, con, b) for (ids, con), b in zip(raw, blocks)]
        got = wand_range_topk(cursors, 3, excluded=excluded)
        assert got == want, f"trial={trial}"


# ---------------------------------------------------------------------------
# Conjunctive (AND) mode — posting-list intersection semantics
# ---------------------------------------------------------------------------


def brute_and_topk(raw, k):
    """Docs present in EVERY list, scored in cursor-index order."""
    common = set(int(d) for d in raw[0][0])
    for ids, _ in raw[1:]:
        common &= set(int(d) for d in ids)
    out = []
    for d in sorted(common):
        s = 0.0
        for ids, con in raw:
            j = int(np.searchsorted(ids, d))
            s += float(con[j])
        out.append((d, s))
    out.sort(key=lambda e: (-e[1], e[0]))
    return out[:k]


def test_conjunctive_matches_brute_intersection():
    from kafka_es_spark.operators.wand import conjunctive_range_topk

    rng = np.random.default_rng(5)
    for trial in range(20):
        raw = []
        for _ in range(rng.integers(2, 5)):
            n = int(rng.integers(3, 40))
            ids = np.sort(rng.choice(100, size=n, replace=False))
            con = np.round(rng.uniform(0.1, 3.0, size=n), 6)
            raw.append((ids.astype(np.int64), con))
        cursors = [mk_cursor(ids, con, 4) for ids, con in raw]
        k = int(rng.integers(1, 8))
        got = conjunctive_range_topk(cursors, k)
        want = brute_and_topk(raw, k)
        assert got == want, f"trial {trial}"


def test_conjunctive_empty_on_disjoint_lists():
    from kafka_es_spark.operators.wand import conjunctive_range_topk

    raw = [
        ([1, 3, 5], [1.0, 1.0, 1.0]),
        ([2, 4, 6], [1.0, 1.0, 1.0]),
    ]
    cursors = [mk_cursor(i, c, 2) for i, c in raw]
    assert conjunctive_range_topk(cursors, 5) == []


def test_conjunctive_excluded_docs_skipped():
    from kafka_es_spark.operators.wand import conjunctive_range_topk

    raw = [
        ([1, 2, 3], [3.0, 2.0, 1.0]),
        ([1, 2, 3], [3.0, 2.0, 1.0]),
    ]
    cursors = [mk_cursor(i, c, 2) for i, c in raw]
    got = conjunctive_range_topk(cursors, 2, excluded=frozenset({1}))
    assert got == [(2, 4.0), (3, 2.0)]


def brute_msm_topk(raw, k, m):
    """Docs matching >= m lists, scored in cursor-index order."""
    from collections import Counter

    cnt = Counter()
    for ids, _ in raw:
        for d in ids:
            cnt[int(d)] += 1
    out = []
    for d in sorted(d for d, c in cnt.items() if c >= m):
        s = 0.0
        for ids, con in raw:
            j = int(np.searchsorted(ids, d))
            if j < len(ids) and ids[j] == d:
                s += float(con[j])
        out.append((d, s))
    out.sort(key=lambda e: (-e[1], e[0]))
    return out[:k]


def test_msm_matches_brute_counting():
    from kafka_es_spark.operators.wand import msm_range_topk

    rng = np.random.default_rng(9)
    for trial in range(20):
        n_lists = int(rng.integers(2, 6))
        raw = []
        for _ in range(n_lists):
            n = int(rng.integers(3, 40))
            ids = np.sort(rng.choice(80, size=n, replace=False))
            con = np.round(rng.uniform(0.1, 3.0, size=n), 6)
            raw.append((ids.astype(np.int64), con))
        cursors = [mk_cursor(ids, con, 4) for ids, con in raw]
        k = int(rng.integers(1, 8))
        m = int(rng.integers(1, n_lists + 1))
        got = msm_range_topk(cursors, k, m)
        want = brute_msm_topk(raw, k, m)
        assert got == want, f"trial {trial} m={m}"
    # boundary equivalences: m=1 == OR (all docs), m=n == AND
    from kafka_es_spark.operators.wand import conjunctive_range_topk

    cursors = [mk_cursor(ids, con, 4) for ids, con in raw]
    assert msm_range_topk(cursors, 50, len(raw)) == conjunctive_range_topk(
        [mk_cursor(i, c, 4) for i, c in raw], 50
    )
