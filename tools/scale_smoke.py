"""Scale-up smoke: replicate the documents/embeddings tables K× and
measure the dedup/ANN family's growth behavior.

The question a 100 TB deployment asks of every candidate-generation
operator is "what happens to candidate counts and bucket sizes when the
corpus grows 10×?" — a well-bucketed LSH grows candidates ~linearly
(bucket count grows, bucket size stays bounded by near-dup density),
while a broken one grows quadratically. This tool synthesizes a K×
corpus (replicas get perturbed ids/text so exact dedup still collapses
them and near-dup density rises, the adversarial direction), runs the
candidate-generating queries, and reports wall time + output sizes.

Usage: python tools/scale_smoke.py [K] [base_sf_dir]
Writes the synthetic corpus under /tmp/spark_graft_scale_smoke.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402

QUERIES = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "embedding_lsh_ann",
    "embedding_cosine_dups_canonical",
    "embedding_cosine_dups",
    "ngram_contamination",
    "repetition_profile",
]


def build_corpus(spark, base: str, out: str, k: int) -> dict:
    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    n = docs.count()
    reps = None
    for i in range(k):
        # replica i: shifted ids; odd replicas keep text identical (exact
        # dups), even replicas append a suffix token (near dups)
        r = docs.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            (
                F.col("text")
                if i % 2 == 1 or i == 0
                else F.concat(F.col("text"), F.lit(f" replica{i}"))
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    m = emb.count()
    ereps = None
    for i in range(k):
        r = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * m))
        ereps = r if ereps is None else ereps.unionByName(r)
    ereps.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    return {"docs": n * k, "vecs": m * k}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = "/tmp/spark_graft_scale_smoke"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    spark = get_spark("scale-smoke")
    sizes = build_corpus(spark, base, out, k)
    report: dict = {"k": k, "base": base, **sizes, "queries": {}}
    for name in QUERIES:
        t0 = time.time()
        df = REGISTRY[name](spark, out)
        rows = df.count()
        report["queries"][name] = {"sec": round(time.time() - t0, 2), "rows": rows}
        print(f"{name:26s} {report['queries'][name]['sec']:7.2f}s  {rows} rows", file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
