"""Property tests for the ITERATIVE / fixed-budget operators (VERDICT
r06 item #5): DBSCAN's in-row CC fold, k-core's peel budget, isotonic
PAVA's merge cascade, and binary segmentation's split selection each
carry a convergence-budget assumption. These tests drive the factored
cores (queries/mining.py: inrow_min_label_cc, kcore_profile_frame,
pava_fold_sql, binseg_tree) with hypothesis-generated adversarial
inputs — long chains, stars, strict-violation stacks, step series —
and assert (a) exact agreement with a pure-Python reference and
(b) that budget exhaustion is IN-BAND (the k-core profile's final
n_removed row says whether the fixpoint was reached), never a
silently-wrong answer.

Examples are kept small (Spark job latency dominates); the laws carry
the coverage (same policy as tests/test_properties.py)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from ecommerce_lakehouse_spark.queries.mining import (
    _KC_K,
    _KC_ROUNDS,
    binseg_tree,
    inrow_min_label_cc,
    kcore_profile_frame,
    pava_fold_sql,
)

import pytest

# end-to-end storage/streaming/property tier (README two-tier note):
# the fast path skips these with  -m "not slow"
pytestmark = pytest.mark.slow


SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# k-core peel: per-round profile == reference; truncation is in-band
# ---------------------------------------------------------------------------


def _ref_kcore_profile(edges: set[tuple[int, int]], k: int, rounds: int):
    """Synchronous peel reference: per round (nodes, edges, removed)."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = set(adj)
    out = []
    prev = None
    for _ in range(rounds + 1):
        ne = sum(len(adj[z] & nodes) for z in nodes) // 2
        out.append((len(nodes), ne, 0 if prev is None else prev - len(nodes)))
        prev = len(nodes)
        nodes = {z for z in nodes if len(adj[z] & nodes) >= k}
    return out


def _run_kcore(spark, edges: set[tuple[int, int]], k: int, rounds: int):
    e = spark.createDataFrame(sorted(edges), "s bigint, d bigint")
    adj = e.select(F.col("s").alias("z"), F.col("d").alias("nbr")).union(
        e.select(F.col("d").alias("z"), F.col("s").alias("nbr"))
    )
    got = kcore_profile_frame(adj, k=k, rounds=rounds).collect()
    return [(r.n_nodes, r.n_edges, r.n_removed) for r in sorted(got)]


edge_lists = st.sets(
    st.tuples(st.integers(1, 8), st.integers(1, 8)).map(
        lambda t: (min(t), max(t))
    ),
    min_size=1,
    max_size=14,
).map(lambda es: {e for e in es if e[0] != e[1]})


@given(edges=edge_lists, k=st.integers(2, 3))
@settings(**SETTINGS)
def test_kcore_profile_matches_reference(spark, edges, k):
    if not edges:
        return
    rounds = 6
    assert _run_kcore(spark, edges, k, rounds) == _ref_kcore_profile(
        edges, k, rounds
    )


def test_kcore_chain_truncation_is_in_band(spark):
    """A 30-node path at k=2 peels ONE LAYER PER ROUND from both ends
    (fixpoint needs 15 rounds) — with the production budget of
    {rounds}, the final profile row must SAY the peel is unfinished
    (n_removed > 0), and every reported round must still be exact."""
    edges = {(i, i + 1) for i in range(1, 30)}
    got = _run_kcore(spark, edges, k=2, rounds=_KC_ROUNDS)
    ref = _ref_kcore_profile(edges, k=2, rounds=_KC_ROUNDS)
    assert got == ref
    assert got[-1][2] > 0  # truncation visible in-band, not silent


def test_kcore_star_and_clique_converge_fast(spark):
    star = {(1, i) for i in range(2, 10)}
    got = _run_kcore(spark, star, k=_KC_K, rounds=3)
    assert got == _ref_kcore_profile(star, k=_KC_K, rounds=3)
    assert got[-1][2] == 0  # fixpoint reached (everything peeled round 1)
    clique = {(a, b) for a in range(1, 6) for b in range(a + 1, 6)}
    got = _run_kcore(spark, clique, k=3, rounds=3)
    assert got == _ref_kcore_profile(clique, k=3, rounds=3)
    assert got[-1] == (5, 10, 0)  # K5 is its own 3-core, stable


# ---------------------------------------------------------------------------
# in-row min-label CC: labels == union-find reference on chains/stars
# ---------------------------------------------------------------------------


def _ref_components(cids: list[int], edges: list[tuple[int, int]]):
    parent = {c: c for c in cids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {c: find(c) for c in cids}


def _run_cc(spark, cids: list[int], edges: list[tuple[int, int]]):
    nodes1 = spark.createDataFrame(
        [(c, c * 10) for c in cids], "cid bigint, min_key bigint"
    ).agg(F.expr("array_sort(collect_list(struct(cid, min_key)))").alias("nodes"))
    e = spark.createDataFrame(
        edges or [(None, None)], "doc_a bigint, doc_b bigint"
    ).filter(F.col("doc_a").isNotNull())
    edges1 = e.agg(F.expr("collect_list(struct(doc_a, doc_b))").alias("edges"))
    row = inrow_min_label_cc(nodes1, edges1).collect()[0]
    srt = sorted(cids)
    return {srt[i]: srt[row.labels[i] - 1] for i in range(len(srt))}


@given(
    n=st.integers(2, 10),
    raw_edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=12
    ),
)
@settings(**SETTINGS)
def test_inrow_cc_matches_union_find(spark, n, raw_edges):
    cids = list(range(1, n + 1))
    edges = sorted(
        {
            (min(a % n + 1, b % n + 1), max(a % n + 1, b % n + 1))
            for a, b in raw_edges
            if a % n != b % n
        }
    )
    assert _run_cc(spark, cids, edges) == _ref_components(cids, edges)


def test_inrow_cc_long_chain_within_budget(spark):
    """A 120-node path has diameter 119; pointer jumping contracts it in
    O(log n) rounds, so the fixed 32-round budget must label every node
    with the chain head — the adversarial case plain propagation (one
    hop per round) would get wrong."""
    cids = list(range(1, 121))
    edges = [(i, i + 1) for i in range(1, 120)]
    got = _run_cc(spark, cids, edges)
    assert set(got.values()) == {1}


def test_inrow_cc_star_and_islands(spark):
    cids = list(range(1, 12))
    edges = [(1, i) for i in range(2, 8)]  # star 1..7; 8..11 isolated
    got = _run_cc(spark, cids, edges)
    assert all(got[i] == 1 for i in range(1, 8))
    assert all(got[i] == i for i in range(8, 12))


# ---------------------------------------------------------------------------
# PAVA stack fold: blocks == reference; over-budget is a no-op
# ---------------------------------------------------------------------------


def _ref_pava(buckets: list[tuple[int, int, int]]):
    """(bs, n, p) sorted by bs -> blocks (bs, be, n, p), integer
    cross-multiplied strict-violation merge-down."""
    st_: list[list[int]] = []
    for bs, n, p in buckets:
        st_.append([bs, bs, n, p])
        while len(st_) >= 2 and st_[-2][3] * st_[-1][2] > st_[-1][3] * st_[-2][2]:
            a = st_.pop()
            b = st_.pop()
            st_.append([b[0], a[1], b[2] + a[2], b[3] + a[3]])
    return [tuple(b) for b in st_]


bucket_stats = st.lists(
    st.tuples(st.integers(1, 100), st.integers(0, 100)).map(
        lambda t: (max(t[0], 1), min(t[1], max(t[0], 1)))
    ),
    min_size=1,
    max_size=11,
)


def _run_pava(spark, buckets, rounds):
    df = spark.createDataFrame(buckets, "bs bigint, n bigint, p bigint")
    arr = df.agg(F.expr("array_sort(collect_list(struct(bs, n, p)))").alias("a"))
    row = arr.select(F.expr(pava_fold_sql("a", rounds)).alias("b")).collect()[0]
    return [(x.bs, x.be, x.n, x.p) for x in row.b]


@given(stats=bucket_stats)
@settings(**SETTINGS)
def test_pava_fold_matches_reference(spark, stats):
    buckets = [(i, n, p) for i, (n, p) in enumerate(stats)]
    ref = _ref_pava(buckets)
    got = _run_pava(spark, buckets, rounds=len(buckets) - 1 if len(buckets) > 1 else 1)
    assert got == ref
    # over-budget rounds never change the result (the fold is a no-op
    # once the stack is monotone)
    assert _run_pava(spark, buckets, rounds=len(buckets) + 5) == ref


def test_pava_strict_violation_stack_pools_to_one_block(spark):
    """Strictly decreasing rates — the worst-case cascade where every
    push merges all the way down: PAVA must pool EVERYTHING into one
    block whose counts are the totals."""
    buckets = [(i, 10, 10 - i) for i in range(11)]  # rates 1.0 .. 0.0
    got = _run_pava(spark, buckets, rounds=10)
    assert got == [(0, 10, 110, sum(10 - i for i in range(11)))]


# ---------------------------------------------------------------------------
# binary segmentation: split day / CUSUM == reference on synthetic series
# ---------------------------------------------------------------------------


def _ref_binseg(days: list[tuple[str, int]]):
    """Depth-2 reference with the SAME fixed-order IEEE ops the Spark
    expression uses: cusum = (cum - i * (t / n)) / 100.0."""

    def scan(seg):
        n = len(seg)
        t = sum(c for _, c in seg)
        best = None
        cum = 0
        for i, (day, c) in enumerate(seg, start=1):
            cum += c
            cusum = (float(cum) - float(i) * (float(t) / n)) / 100.0
            key = (-abs(cusum), day)
            if best is None or key < best[0]:
                best = (key, day, cusum)
        return best[1], best[2], n, t

    full = scan(days)
    left = [x for x in days if x[0] <= full[0]]
    right = [x for x in days if x[0] > full[0]]
    rows = [("full", *full)]
    for name, seg in (("left", left), ("right", right)):
        if seg:
            rows.append((name, *scan(seg)))
    return {
        r[0]: (r[1], r[2], r[3], (float(r[4]) / r[3]) / 100.0) for r in rows
    }


@given(
    cents=st.lists(st.integers(0, 10_000_00), min_size=3, max_size=14),
)
@settings(**SETTINGS)
def test_binseg_matches_reference(spark, cents):
    days = [(f"2024-01-{i + 1:02d}", c) for i, c in enumerate(cents)]
    d = spark.createDataFrame(days, "day string, cents bigint").select(
        F.to_date("day").alias("day"), "cents"
    )
    got = {
        r.segment: (
            r.changepoint_day.isoformat(),
            r.cusum_at_peak,
            r.n_days,
            r.seg_mean_daily,
        )
        for r in binseg_tree(d).collect()
    }
    assert got == _ref_binseg(days)


def test_binseg_step_series_finds_the_step(spark):
    """A clean level shift: 7 days at 100.00 then 7 at 900.00 — the full
    scan's |CUSUM| peak must be the last low day (the canonical CUSUM
    changepoint estimate)."""
    days = [(f"2024-02-{i + 1:02d}", 100_00 if i < 7 else 900_00) for i in range(14)]
    d = spark.createDataFrame(days, "day string, cents bigint").select(
        F.to_date("day").alias("day"), "cents"
    )
    got = {r.segment: r for r in binseg_tree(d).collect()}
    assert got["full"].changepoint_day.isoformat() == "2024-02-07"
    assert set(got) == {"full", "left", "right"}
