"""Wave-5 curation operators: span-level dedup must find exactly the
planted repeated window, dup rates must match hand counts, temperature
mixing must up-weight small domains, TF-IDF must prefer rare terms."""

import os

import pytest

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _mini_corpus(spark, tmp_path, rows):
    d = str(tmp_path / "mini")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


@pytest.mark.slow  # demoted r10 (VERDICT r09 #4): oracle/property coverage kept in the release gate
def test_span_dedup_finds_planted_span(spark, tmp_path):
    # K=8: docs 0 and 1 share the 8-word prefix "w0 ... w7" (one span
    # each); doc 2 is disjoint. Exactly one duplicated span must emerge.
    shared = " ".join(f"w{i}" for i in range(8))
    rows = [
        (0, shared + " alpha beta", "en", "s0", 0),
        (1, shared + " gamma delta", "en", "s0", 0),
        (2, " ".join(f"z{i}" for i in range(10)), "en", "s1", 0),
    ]
    d = _mini_corpus(spark, tmp_path, rows)
    from ecommerce_lakehouse_spark.queries.llm5 import span_dedup_spans

    got = span_dedup_spans(spark, d).collect()
    assert len(got) == 1
    assert got[0].n_docs == 2 and got[0].n_occurrences == 2


@pytest.mark.slow  # demoted r10 (VERDICT r09 #4): oracle/property coverage kept in the release gate
def test_span_dup_rate_hand_computed(spark, tmp_path):
    # doc 0: 10 words -> 3 spans; only the first (the shared prefix) is
    # duplicated -> rate 1/3. doc 2: all spans unique -> rate 0.
    shared = " ".join(f"w{i}" for i in range(8))
    rows = [
        (0, shared + " alpha beta", "en", "s0", 0),
        (1, shared + " gamma delta", "en", "s0", 0),
        (2, " ".join(f"z{i}" for i in range(10)), "en", "s1", 0),
    ]
    d = _mini_corpus(spark, tmp_path, rows)
    from ecommerce_lakehouse_spark.queries.llm5 import span_dup_rate

    got = {r.doc_id: r for r in span_dup_rate(spark, d).collect()}
    assert got[0].n_spans == 3 and got[0].n_dup_spans == 1
    assert got[0].dup_span_rate == pytest.approx(1 / 3)
    assert got[2].n_dup_spans == 0 and got[2].dup_span_rate == 0.0


@pytest.mark.slow  # demoted r10 (VERDICT r09 #4): oracle/property coverage kept in the release gate
def test_temperature_mixture_upweights_small_domains(spark, tmp_path):
    # 90/10 split at alpha=0.5 -> temp shares 3/4 and 1/4: the small
    # domain's sampling factor rises above 1, the big one falls below.
    rows = [(i, f"t {i}", "en", "big" if i < 90 else "small", 0) for i in range(100)]
    d = _mini_corpus(spark, tmp_path, rows)
    from ecommerce_lakehouse_spark.queries.llm5 import temperature_mixture_weights

    got = {r.source: r for r in temperature_mixture_weights(spark, d).collect()}
    assert got["small"].temp_share == pytest.approx(0.25)
    assert got["big"].temp_share == pytest.approx(0.75)
    assert got["small"].sampling_factor > 1 > got["big"].sampling_factor
    assert got["small"].share + got["big"].share == pytest.approx(1.0)


@pytest.mark.slow  # demoted r10 (VERDICT r09 #4): oracle/property coverage kept in the release gate
def test_tfidf_prefers_rare_terms(spark, tmp_path):
    # 'common' appears in every doc (idf=0 -> score 0); each doc's unique
    # term must rank first.
    rows = [
        (0, "common common unique0", "en", "s", 0),
        (1, "common common unique1", "en", "s", 0),
        (2, "common common unique2", "en", "s", 0),
    ]
    d = _mini_corpus(spark, tmp_path, rows)
    from ecommerce_lakehouse_spark.queries.llm5 import tfidf_top_terms

    top1 = {
        r.doc_id: r.term
        for r in tfidf_top_terms(spark, d).filter("rnk = 1").collect()
    }
    assert top1 == {0: "unique0", 1: "unique1", 2: "unique2"}


@pytest.mark.slow  # demoted r10 (VERDICT r09 #4): oracle/property coverage kept in the release gate
def test_apply_mixture_sample_copy_counts(spark, tmp_path):
    # 90/10 at alpha=0.5: factor_small = 2.5 (docs get 2 or 3 copies),
    # factor_big ~ 0.833 (docs keep 0 or 1) — realized counts must land
    # near the temperature target.
    rows = [(i, f"t {i}", "en", "big" if i < 90 else "small", 0) for i in range(100)]
    d = _mini_corpus(spark, tmp_path, rows)
    from ecommerce_lakehouse_spark.queries.llm5 import apply_mixture_sample

    got = apply_mixture_sample(spark, d).collect()
    small = [r.n_copies for r in got if r.source == "small"]
    big = [r.n_copies for r in got if r.source == "big"]
    assert set(small) <= {2, 3} and len(small) == 10  # every small doc kept
    assert set(big) <= {1}  # big docs are never duplicated, some dropped
    total_small, total_big = sum(small), sum(big)
    assert 20 <= total_small <= 30  # target 25
    assert 60 <= total_big <= 90  # target 75


@pytest.mark.slow  # demoted r10 (VERDICT r09 #4): oracle/property coverage kept in the release gate
def test_span_dedup_rewrite_removes_only_covered_tokens(spark, tmp_path):
    # docs 0/1 share the 8-word prefix -> those 8 tokens are removed from
    # BOTH; each unique tail survives; doc 2 passes byte-identical.
    shared = " ".join(f"w{i}" for i in range(8))
    rows = [
        (0, shared + " alpha beta", "en", "s0", 0),
        (1, shared + " gamma delta", "en", "s0", 0),
        (2, " ".join(f"z{i}" for i in range(10)), "en", "s1", 0),
    ]
    d = _mini_corpus(spark, tmp_path, rows)
    from ecommerce_lakehouse_spark.queries.llm5 import span_dedup_rewrite

    got = {r.doc_id: r for r in span_dedup_rewrite(spark, d).collect()}
    assert got[0].clean_text == "alpha beta" and got[0].n_removed == 8
    assert got[1].clean_text == "gamma delta" and got[1].n_removed == 8
    assert got[2].clean_text == rows[2][1] and got[2].n_removed == 0
