"""Materialized corpus-curation pipeline (pipelines/curation.py):
stage semantics on a micro corpus + the incrementality contract — a
re-run with a new batch rewrites only the touched partitions, combines
cross-batch exact dups, and APPENDS to the LSH band index (round-2
verdict item #2's 'done' test)."""

import glob
import hashlib

import pyspark.sql.functions as F

from ecommerce_lakehouse_spark.pipelines.curation import curate, funnel

import pytest

# end-to-end storage/streaming/property tier (README two-tier note):
# the fast path skips these with  -m "not slow"
pytestmark = pytest.mark.slow

BASE_EN = "the quick brown fox jumps over the lazy dog near the river bank"
BASE_FR = "le chat noir dort sur le tapis rouge pres de la fenetre ce soir"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, text string"
    )


def _hashes(pattern):
    return {
        f: hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in sorted(glob.glob(pattern))
    }


def test_curation_stages_and_incremental_rerun(spark, tmp_path):
    root = str(tmp_path / "cur")
    b1 = _docs(
        spark,
        [
            (1, "en", "web", BASE_EN),
            (2, "en", "web", BASE_EN),  # exact dup of 1
            (3, "fr", "web", BASE_FR),
            (4, "en", "web", "too short"),  # fails MIN_WORDS
            (5, "en", "web",
             "contact me at someone@example.com please do not share this address"),  # PII
            (6, "en", "web", "spam spam spam spam spam spam spam spam"),  # repetitive
        ],
    )
    t = curate(spark, b1, root)

    # quality gates: dup pair + french doc pass; short/PII/repetitive fail
    assert {r.doc_id for r in t["quality"].read().collect()} == {1, 2, 3}
    # exact collapse: 2 distinct texts; dup pair collapses to min id with 2 copies
    c1 = {(r.doc_id, r.n_copies) for r in t["canonical"].read().collect()}
    assert c1 == {(1, 2), (3, 1)}
    assert {r.doc_id for r in t["survivors"].read().collect()} == {1, 3}

    en_before = _hashes(root + "/quality/data/*/lang=en/*.parquet")
    assert en_before

    # ---- batch 2: french only; one exact dup of doc 3, one new text
    b2 = _docs(
        spark,
        [
            (10, "fr", "web", BASE_FR),  # cross-batch exact dup of 3
            (11, "fr", "web",
             "une autre phrase francaise tout a fait differente des precedentes vraiment"),
        ],
    )
    t = curate(spark, b2, root)

    # partition-pruned MERGE: en files byte-identical, and the new quality
    # version's data dir contains NO en partition (nothing rewritten).
    # (Derive the merge's data-dir version instead of hardcoding it —
    # metadata commits like add_constraint also advance the version.)
    vmerge = f"v{t['quality'].current_version():08d}"
    assert _hashes(root + "/quality/data/*/lang=en/*.parquet") == en_before
    assert not glob.glob(root + f"/quality/data/{vmerge}-*/lang=en")
    assert glob.glob(root + f"/quality/data/{vmerge}-*/lang=fr")

    # cross-batch exact dedup combined: doc 3's text now has 2 copies and
    # keeps its original (min) canonical id; batch-1 state untouched
    c2 = {(r.doc_id, r.n_copies) for r in t["canonical"].read().collect()}
    assert c2 == {(1, 2), (3, 2), (11, 1)}

    # band index is append-only (incremental LSH: new docs join the full
    # index, old bands are never recomputed; the trailing commit may be
    # the r09 txn-less paired-through watermark, a metadata-only write)
    ops = [h["operation"] for h in t["band_index"].history()]
    assert "append" in ops and ops.count("overwrite") == 1
    assert all(o in ("append", "overwrite", "set-properties") for o in ops)
    # index holds bands for new canonical texts only: 3 distinct texts,
    # doc 10's dup text added no bands
    assert t["band_index"].read().select("doc_id").distinct().count() == 3

    # funnel totals read from materialized state
    f = {r.stage: r.n_docs for r in funnel(spark, t, 8).collect()}
    assert f["raw"] == 8
    assert f["quality_pass"] == 5  # 1,2,3,10,11
    assert f["canonical"] == 3
    assert f["survivors"] == f["train"] + f["val"] + f["test"]
    assert f["survivors"] == 3  # distinct sentences: no near-dup collapse


def test_curation_survivors_collapse_near_dups(spark, tmp_path):
    """Near-identical texts (one word changed) must cluster and keep one
    survivor — the minhash → clusters → survivors path end-to-end."""
    near = BASE_EN.replace("lazy", "sleepy")
    t = curate(
        spark,
        _docs(spark, [(1, "en", "web", BASE_EN), (2, "en", "web", near)]),
        str(tmp_path / "cur2"),
    )
    pairs = t["pairs"].read().collect()
    assert len(pairs) == 1 and pairs[0]["doc_a"] == 1 and pairs[0]["doc_b"] == 2
    assert {r.doc_id for r in t["survivors"].read().collect()} == {1}


def test_streaming_curation_ingest_idempotent(spark, tmp_path):
    """Streaming front door (round 3): micro-batches run the incremental
    DAG; a replayed batch id (at-least-once foreachBatch crash semantics)
    is skipped — table versions unchanged; the next batch id applies."""
    from ecommerce_lakehouse_spark.pipelines.curation import _tables
    from ecommerce_lakehouse_spark.streaming.jobs import ingest_curation_batch

    root = str(tmp_path / "scur")
    b0 = _docs(
        spark,
        [(1, "en", "web", BASE_EN), (2, "en", "web", BASE_EN), (3, "fr", "web", BASE_FR)],
    )
    ingest_curation_batch(spark, b0, 0, root)
    t = _tables(spark, root)
    v_after_b0 = {s: t[s].current_version() for s in t}
    assert {r.doc_id for r in t["survivors"].read().collect()} == {1, 3}

    # replay batch 0: every stage version must be untouched
    ingest_curation_batch(spark, b0, 0, root)
    assert {s: t[s].current_version() for s in t} == v_after_b0

    # batch 1 applies incrementally
    b1 = _docs(spark, [(10, "fr", "web", BASE_FR + " encore")])
    ingest_curation_batch(spark, b1, 1, root)
    assert t["quality"].last_txn("stream_curation") == 1
    assert t["canonical"].read().count() == 3


def test_stream_curation_ingest_end_to_end(spark, tmp_path):
    """The actual writeStream path: file-source stream -> watermarked
    content-hash dedup at the door -> foreachBatch curation. Exact dups
    inside the stream never reach the pipeline."""
    import datetime

    from ecommerce_lakehouse_spark.pipelines.curation import _tables
    from ecommerce_lakehouse_spark.streaming.jobs import stream_curation_ingest

    src = str(tmp_path / "spool")
    ts = datetime.datetime(2025, 1, 1, 12, 0)
    spark.createDataFrame(
        [
            (1, "en", "web", BASE_EN, ts),
            (2, "en", "web", BASE_EN, ts),  # exact dup, same micro-batch
            (3, "fr", "web", BASE_FR, ts),
        ],
        "doc_id bigint, lang string, source string, text string, ts timestamp",
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "doc_id bigint, lang string, source string, text string, ts timestamp"
    ).parquet(src)
    root = str(tmp_path / "scur2")
    q = stream_curation_ingest(stream, root, str(tmp_path / "ckpt"))
    q.start().awaitTermination(120)

    t = _tables(spark, root)
    # the at-the-door dedup dropped one exact copy before the pipeline
    # (which of the pair survives is arbitrary within a micro-batch);
    # the canonical stage sees 2 distinct texts
    assert t["canonical"].read().count() == 2
    surv = {r.doc_id for r in t["survivors"].read().collect()}
    assert len(surv) == 2 and 3 in surv and surv - {3} <= {1, 2}


def test_quality_stage_declares_constraints(spark, tmp_path):
    import pyspark.sql.functions as F
    import pytest

    from ecommerce_lakehouse_spark.lake.table import ConstraintViolationError
    from ecommerce_lakehouse_spark.pipelines.curation import curate

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta", "en", "s", 0) for i in range(5)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    t = curate(spark, docs, str(tmp_path / "cur"))
    assert set(t["quality"].constraints()) == {"doc_id_present", "text_present"}
    # a direct write that violates the stage invariant is rejected
    bad = t["quality"].read().limit(1).withColumn("text", F.lit(None).cast("string"))
    with pytest.raises(ConstraintViolationError):
        t["quality"].merge(bad, keys=["doc_id"])


def test_crash_mid_dag_resumes_from_first_unapplied_stage(spark, tmp_path):
    """Per-stage txn idempotence: a crash between the canonical merge and
    the band-index append must NOT lose the batch — the replay resumes
    downstream stages, and nothing is double-merged."""
    import pytest

    from ecommerce_lakehouse_spark.lake.table import LakeTable
    from ecommerce_lakehouse_spark.pipelines.curation import _tables, curate

    root = str(tmp_path / "crash")
    docs = spark.createDataFrame(
        [
            (i, f"alpha beta gamma delta epsilon token{i} zeta eta theta", "en", "s", 0)
            for i in range(6)
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    txn = {"app_id": "crashtest", "version": 7}

    # crash the first run right before the band-index commit
    orig_overwrite = LakeTable.overwrite

    def boom(self, *a, **k):
        if self.root.endswith("band_index"):
            raise RuntimeError("simulated crash")
        return orig_overwrite(self, *a, **k)

    LakeTable.overwrite = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            curate(spark, docs, root, txn=txn)
    finally:
        LakeTable.overwrite = orig_overwrite

    t = _tables(spark, root)
    assert t["quality"].exists() and t["canonical"].exists()
    assert not t["splits"].exists()  # crash happened mid-DAG
    n_canon = t["canonical"].read().count()
    copies = {r.doc_id: r.n_copies for r in t["canonical"].read().collect()}

    # replay the SAME batch (at-least-once delivery)
    t = curate(spark, docs, root, txn=txn)
    # upstream stages were not re-applied: multiplicities unchanged
    assert {r.doc_id: r.n_copies for r in t["canonical"].read().collect()} == copies
    assert t["canonical"].read().count() == n_canon
    # downstream stages now exist and cover the whole batch
    assert t["band_index"].read().select("doc_id").distinct().count() == n_canon
    assert t["splits"].read().count() == t["survivors"].read().count() > 0
    # a second full replay is a no-op end to end
    versions = {s: t[s].current_version() for s in t}
    t = curate(spark, docs, root, txn=txn)
    assert {s: t[s].current_version() for s in t} == versions


def test_clusters_incremental_equals_full_recompute(spark, tmp_path):
    """r03 verdict item #6: once seeded, the clusters stage recomputes
    ONLY components adjacent to the new batch (prior connectivity
    compressed to star edges) and MERGEs the delta — batch-2 labels must
    equal a from-scratch recompute while the re-propagated node set
    stays batch-sized (untouched components never re-enter)."""
    from ecommerce_lakehouse_spark.operators.graph import incremental_components
    from ecommerce_lakehouse_spark.pipelines.curation import _connected_components

    root = str(tmp_path / "cc")
    near1 = BASE_EN.replace("lazy", "sleepy")
    t = curate(
        spark,
        _docs(spark, [(1, "en", "web", BASE_EN), (2, "en", "web", near1),
                      (3, "fr", "web", BASE_FR)]),
        root,
        txn={"app_id": "cc", "version": 1},
    )
    assert {(r.doc_id, r.cluster_id) for r in t["clusters"].read().collect()} == {
        (1, 1), (2, 1), (3, 3)
    }
    v_b1 = t["clusters"].current_version()

    near2 = BASE_EN.replace("river", "ocean")  # near-dup joining component {1,2}
    fr_new = "une phrase francaise entierement nouvelle sans rapport avec les autres textes"
    t = curate(
        spark,
        _docs(spark, [(10, "en", "web", near2), (11, "fr", "web", fr_new)]),
        root,
        txn={"app_id": "cc", "version": 2},
    )
    ids = t["canonical"].read().select("doc_id")
    pairs = t["pairs"].read().select("doc_a", "doc_b")
    full = {
        (r.doc_id, r.cluster_id)
        for r in _connected_components(ids, pairs).collect()
    }
    got = {(r.doc_id, r.cluster_id) for r in t["clusters"].read().collect()}
    assert got == full and (10, 1) in got and (11, 11) in got

    # the incremental path touched only the adjacent component + new docs:
    # doc 3 (untouched fr component) never re-entered propagation
    prev = t["clusters"].read(version=v_b1).select("doc_id", "cluster_id")
    sub_labels, sub_ids = incremental_components(prev, ids, pairs)
    touched = {r.doc_id for r in sub_ids.collect()}
    assert touched == {1, 2, 10, 11}
    assert {(r.doc_id, r.cluster_id) for r in sub_labels.collect()} == {
        (1, 1), (2, 1), (10, 1), (11, 11)
    }


def test_txnless_batches_get_unique_band_tags(spark, tmp_path):
    """ADVICE r07 regression: every txn-less batch must write a DISTINCT
    batch_v tag into the band index — a shared constant tag made the
    stage-4 read-back return ALL prior txn-less bands, degrading the
    incremental new⋈index candidate join to full index⋈index."""
    root = str(tmp_path / "cur_txnless")
    b1 = _docs(spark, [(1, "en", "web", BASE_EN), (2, "fr", "web", BASE_FR)])
    t = curate(spark, b1, root)
    tags1 = {r.batch_v for r in t["band_index"].read().select("batch_v").distinct().collect()}
    assert len(tags1) == 1

    b2 = _docs(
        spark,
        [(10, "en", "web",
          "a completely different english sentence that shares no shingles at all here")],
    )
    t = curate(spark, b2, root)
    bands = t["band_index"].read()
    tags2 = {r.batch_v for r in bands.select("batch_v").distinct().collect()}
    assert len(tags2) == 2, f"txn-less batches must not share a tag: {tags2}"
    # the second batch's tag covers exactly the new doc's bands
    new_tag = (tags2 - tags1).pop()
    assert {r.doc_id for r in bands.filter(F.col("batch_v") == new_tag)
            .select("doc_id").distinct().collect()} == {10}


def test_txnless_crash_between_band_append_and_pairs_is_recovered(spark, tmp_path):
    """ADVICE r08: unique txn-less tags must not orphan a batch that
    dies between the band_index append and the pairs merge — the
    paired-through watermark makes the next run's stage-4 read-back
    cover the crashed batch's bands, so its new-vs-index candidate
    pairs are recovered (idempotently: the pairs merge dedups)."""
    from ecommerce_lakehouse_spark.lake.table import LakeTable
    from ecommerce_lakehouse_spark.pipelines.curation import _tables

    root = str(tmp_path / "cur_orphan")
    b1 = _docs(spark, [(1, "en", "web", BASE_EN), (2, "fr", "web", BASE_FR)])
    curate(spark, b1, root)

    near = BASE_EN.replace("lazy", "sleepy")  # near-dup of doc 1
    b2 = _docs(spark, [(10, "en", "web", near)])
    orig_merge = LakeTable.merge

    def boom(self, *a, **k):
        if self.root.endswith("pairs"):
            raise RuntimeError("simulated crash")
        return orig_merge(self, *a, **k)

    LakeTable.merge = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            curate(spark, b2, root)
    finally:
        LakeTable.merge = orig_merge
    t = _tables(spark, root)
    banded = {
        r.doc_id
        for r in t["band_index"].read().select("doc_id").distinct().collect()
    }
    assert banded == {1, 2, 10}  # batch 2 IS banded ...
    assert t["pairs"].read().count() == 0  # ... but currently orphaned

    # any follow-up txn-less batch resumes it via the watermark read-back
    b3 = _docs(
        spark,
        [(20, "fr", "web",
          "texte nouveau totalement distinct de tous les precedents ici present")],
    )
    t = curate(spark, b3, root)
    got = {(r.doc_a, r.doc_b) for r in t["pairs"].read().select("doc_a", "doc_b").collect()}
    assert (1, 10) in got, f"orphaned batch's pairs must be recovered: {got}"
