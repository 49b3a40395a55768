"""Interleaved A/B: minhash pipeline WITH vs WITHOUT the separate eager
docs.count() gram-materialization job (r17).  Same session, alternating
runs, so hypervisor steal bursts land on both variants equally; MIN per
variant is the comparable signal.

Variant A (r16): docs.count() then sigs.count() — two eager jobs, the
gram pass runs twice-ish (once alone, once inside the signature scan of
the cache).  Variant B (r17): sigs.count() only — one eager job fills
both caches (the signature computation scans the persisted gram
relation, materializing it as a side effect).

Usage: python tools/minhash_eager_exp.py [rounds=6]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.catalog import load_table
from real_time_financial_data_pipeline_spark.operators.dedup import (
    doc_grams,
    jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
)
from real_time_financial_data_pipeline_spark.session import get_spark


def pipeline(spark, sf_dir: str, eager_docs_count: bool) -> float:
    docs_in = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    docs = doc_grams(docs_in, "text", "doc_id", 3, "grams").persist()
    if eager_docs_count:
        docs.count()
    sigs = minhash_signatures(
        docs_in, "text", "doc_id", 16, 3, grams_df=docs
    ).persist()
    sigs.count()
    cands = lsh_candidate_pairs(sigs, "doc_id", 4, 4)
    verified = (
        cands.join(docs.withColumnsRenamed({"doc_id": "id_a", "grams": "grams_a"}), "id_a")
        .join(docs.withColumnsRenamed({"doc_id": "id_b", "grams": "grams_b"}), "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("grams_a"), F.col("grams_b")), 6))
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    )
    verified.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    docs.unpersist()
    sigs.unpersist()
    return wall


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("rtfdp-minhash-eager-exp")
    # warm both variants once (plan compile, python worker fork)
    pipeline(spark, sf_dir, True)
    pipeline(spark, sf_dir, False)
    a, b = [], []
    for i in range(rounds):
        spark.sparkContext.setJobDescription(f"A eager round {i}")
        a.append(pipeline(spark, sf_dir, True))
        spark.sparkContext.setJobDescription(f"B single round {i}")
        b.append(pipeline(spark, sf_dir, False))
    print(f"A eager-docs-count min={min(a):.3f} all={[round(x, 3) for x in a]}")
    print(f"B single-job       min={min(b):.3f} all={[round(x, 3) for x in b]}")


if __name__ == "__main__":
    main()
