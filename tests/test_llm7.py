"""Wave-7 operators: BM25 / HLL against independent Python recomputations
under the same nano/register contracts; the exact prefix-filtered
similarity join against literal brute force (the lemma's completeness is
the whole point, so the test enumerates ALL pairs); BFS on a two-component
graph where every hop and the unreached remainder are hand-checkable."""

import pytest
import hashlib
import itertools
import math
import os

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
LI_SCHEMA = "l_orderkey bigint, l_partkey bigint"


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path / "mini")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, f"{name}.parquet"))
    return d


@pytest.mark.slow  # demoted r10 (VERDICT r09 #4): oracle/property coverage kept in the release gate
def test_similarity_join_matches_bruteforce(spark, tmp_path):
    """Prefix filtering must be exact: brute-force every canonical pair's
    3-gram-shingle Jaccard in Python and demand the identical row set
    (values included), with an exact-duplicate doc collapsed first."""
    texts = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "the quick brown fox jumps over the lazy cat tonight",
        3: "the quick brown fox jumps over the lazy dog tonight",  # dup of 1
        4: "completely different words about spark shuffles and joins",
        5: "the quick brown fox jumps over a very lazy dog indeed",
        6: "too short",  # < 3 tokens after split -> excluded
    }
    rows = [(i, t, "en", "s0", 0) for i, t in texts.items()]
    d = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)

    canon = {}
    for i, t in sorted(texts.items()):
        canon.setdefault(t, i)
    shingles = {}
    for t, i in canon.items():
        toks = t.strip().split()
        if len(toks) >= 3:
            shingles[i] = {
                " ".join(toks[k : k + 3]) for k in range(len(toks) - 2)
            }
    expected = set()
    for a, b in itertools.combinations(sorted(shingles), 2):
        c = len(shingles[a] & shingles[b])
        u = len(shingles[a] | shingles[b])
        if c / u >= 0.5:
            expected.add((a, b, c, u, c / u))
    assert expected, "corpus must contain at least one qualifying pair"

    from ecommerce_lakehouse_spark.queries.llm7 import shingle_similarity_join

    got = {
        (r.doc_a, r.doc_b, r.n_common, r.n_union, r.jaccard)
        for r in shingle_similarity_join(spark, d).collect()
    }
    assert got == expected
    assert all(a != 3 and b != 3 for a, b, *_ in got)  # dup collapsed


def test_hll_matches_python_recompute(spark, sf_dir):
    """Register-for-register Python recomputation of the p=8 sketch from
    the same md5-truncated 60-bit hash; estimate must agree to the 6dp
    rounding and land within 4/sqrt(m) of the exact count."""
    import pyarrow.parquet as pq

    keys = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    ).column("o_custkey").to_pylist()
    regs = {}
    for k in keys:
        hv = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        b = hv % 256
        rho = 53 - (hv >> 8).bit_length() if hv >> 8 > 0 else 53
        regs[b] = max(regs.get(b, 0), rho)
    zeros = 256 - len(regs)
    sum_inv = sum(1.0 / (1 << m) for m in regs.values())
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = alpha * 65536.0 / (sum_inv + float(zeros))
    est = (
        256.0 * math.log(256.0 / zeros)
        if raw <= 640.0 and zeros > 0
        else raw
    )
    n_exact = len(set(keys))

    from ecommerce_lakehouse_spark.queries.llm7 import hll_distinct_sketch

    r = hll_distinct_sketch(spark, sf_dir).collect()[0]
    assert (r.m, r.n_exact, r.zero_registers) == (256, n_exact, zeros)
    assert abs(r.hll_estimate - round(est, 6)) <= 1e-6
    assert abs(r.hll_estimate - n_exact) / n_exact < 4.0 / math.sqrt(256.0)


@pytest.mark.slow  # demoted r10 (VERDICT r09 #4): oracle/property coverage kept in the release gate
def test_bm25_matches_python(spark, tmp_path):
    """Hand corpus where every doc's tf/dl/df are knowable; per-doc
    bm25_nanos must equal the Python recomputation under the identical
    round-once-into-nanos contract, and ranking must follow."""
    texts = {
        1: "dup dup window spark cleanup",     # all three terms, tf_dup=2
        2: "window spark window spark spark",  # two terms
        3: "nothing relevant here at all",     # no terms -> filtered out
        4: "dup of a window",                  # two terms, short doc
        5: "spark spark spark spark spark spark spark spark",
    }
    rows = [(i, t, "en", "s0", 0) for i, t in texts.items()]
    d = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)

    toks = {
        i: [w for w in t.lower().split() if w.isalpha()]
        for i, t in texts.items()
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    expected = {}
    for i, tv in toks.items():
        total, nterms = 0, 0
        for term in ("dup", "window", "spark"):
            df = sum(1 for v in toks.values() if term in v)
            idf_n = int(round(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e9))
            tf = tv.count(term)
            if tf > 0:
                nterms += 1
                dl = len(tv)
                s = ((idf_n / 1e9) * (tf * 2.2)) / (
                    tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))
                )
                total += int(round(s * 1e9))
        if total > 0:
            expected[i] = (nterms, total)

    from ecommerce_lakehouse_spark.queries.llm7 import bm25_search

    got = bm25_search(spark, d).collect()
    assert {r.doc_id: (r.n_terms, r.bm25_nanos) for r in got} == expected
    assert [r.doc_id for r in got] == sorted(
        expected, key=lambda i: (-expected[i][1], i)
    )


@pytest.mark.slow  # demoted r10 (VERDICT r09 #4): oracle/property coverage kept in the release gate
def test_bfs_two_components(spark, tmp_path):
    """Chain 1-2-3 reached hop by hop from the min part; island {10,11}
    reported as the unreached remainder."""
    rows = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 10), (3, 11)]
    d = _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)

    from ecommerce_lakehouse_spark.queries.llm7 import bfs_hops_copurchase

    got = {
        (r.hop, r.n_nodes, r.min_node)
        for r in bfs_hops_copurchase(spark, d).collect()
    }
    assert got == {(0, 1, 1), (1, 1, 2), (2, 1, 3), (-1, 2, 10)}


def test_lsh_recall_composition(spark, sf_dir):
    """The audit's counts must be internally consistent and its truth
    side must equal the exact join's row count."""
    from ecommerce_lakehouse_spark.queries.llm7 import (
        lsh_recall_eval,
        shingle_similarity_join,
    )

    r = lsh_recall_eval(spark, sf_dir).collect()[0]
    n_truth = shingle_similarity_join(spark, sf_dir).count()
    assert r.n_truth == n_truth
    assert 0 <= r.n_hits <= r.n_truth
    assert r.recall == r.n_hits / r.n_truth
