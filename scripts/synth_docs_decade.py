"""Synthesize a third-decade documents corpus for the composed-pipeline
scale probes (r14, the r13 verdict's ask #6: "probe c24/e31 at a third
decade — one more decade turns the 'no quadratic term' claim from a
two-point fit into a real exponent").

Takes the sf0.1 documents table (5k docs, doc_id 0..N-1) and emits a
10x corpus (50k docs) whose replicas are textually INDEPENDENT — the
property the probe needs, because naive text replication would inject
cross-replica exact/near-duplicate structure that the smaller SFs do
not have, and the dedup stages' shuffle volume would then measure the
synthesis artifact, not the pipeline. Replica i in 1..9 of base doc j
splices the first word-half of doc j with the second word-half of doc
(j + 137*i) mod N: Jaccard against either parent is ~1/3 (half the
shingles shared, union 1.5x), far below every near-dup threshold in
the engine, while the corpus word distribution and doc-length profile
are preserved exactly. doc_id = j + N*i keeps the c24 fixture shapes
intact: the %7/%70 canned-duplicate injection scales to 10x as many
~10-doc groups (same group size), and the doc_id < 20 bench slice
stays the constant-size eval suite it is at every real SF.

Usage: python scripts/synth_docs_decade.py [src_sf_dir] [out_dir]
       (defaults: /root/testdata/sf0.1 -> /tmp/cellphe_synth/sf1_docs)
Then:  python scripts/d3_scaling_probe.py --query=c24_corpus_pipeline \
           --sfs=0.001,0.1,/tmp/cellphe_synth/sf1_docs
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/cellphe_synth/sf1_docs"
    )
    from pyspark.sql import functions as F

    from cellphe_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="synth-docs-decade")
    base = spark.read.parquet(os.path.join(src, "documents.parquet"))
    n = base.count()
    assert {r["doc_id"] for r in base.select("doc_id").collect()} == set(
        range(n)
    ), "synthesis assumes contiguous 0..N-1 doc_ids (true for testdata)"

    left = base.select(
        "doc_id", "lang", "source", F.split("text", " ").alias("w")
    )
    right = base.select(
        F.col("doc_id").alias("rid"), F.split("text", " ").alias("w2")
    )
    spliced = F.concat_ws(
        " ",
        F.concat(
            F.expr("slice(w, 1, cast(size(w)/2 as int))"),
            F.expr(
                "slice(w2, cast(size(w2)/2 as int)+1,"
                " size(w2) - cast(size(w2)/2 as int))"
            ),
        ),
    )
    reps = []
    for i in range(1, 10):
        reps.append(
            left.withColumn(
                "rid", (F.col("doc_id") + F.lit(137 * i)) % F.lit(n)
            )
            .join(right, "rid")
            .select(
                (F.col("doc_id") + F.lit(n * i)).alias("doc_id"),
                spliced.alias("text"),
                "lang",
                "source",
            )
        )
    allr = base.select("doc_id", "text", "lang", "source")
    for r in reps:
        allr = allr.unionByName(r)
    allr = allr.select(
        "doc_id", "text", "lang", "source",
        F.length("text").cast("bigint").alias("n_chars"),
    )
    os.makedirs(out, exist_ok=True)
    allr.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    print(f"wrote {allr.count()} docs to {out}/documents.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
