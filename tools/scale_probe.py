"""Data-scaling probe: measures headline operator families at 1x vs Nx
replicated inputs and prints ONE JSON line — the reproducible harness
behind BASELINE.md's "Nx-data shape" sections (rounds 5-9 ran these as
ad-hoc scripts; this pins the recipe).

Replication recipe (same as BASELINE.md): id-offset copies along the id
axis (documents/embeddings) or the time axis (events) — structure-
preserving, so each family's candidate-generation behavior (dup windows,
cluster densities, gram tables) scales the way a bigger corpus would,
modulo the noted every-copy-is-a-duplicate effect for content-keyed ops.

Usage: python tools/scale_probe.py [replication, default 3]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.catalog import load_table
from real_time_financial_data_pipeline_spark.session import get_spark


def median_of(fn, runs: int = 3) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df, id_col):
        out = df
        for i in range(1, rep):
            out = out.union(df.withColumn(id_col, F.col(id_col) + F.lit(i * 1_000_000)))
        return out.persist()

    docs1 = load_table(spark, sf_dir, "documents").persist()
    emb1 = load_table(spark, sf_dir, "embeddings").persist()
    ev1 = load_table(spark, sf_dir, "events").persist()
    docs1.count(), emb1.count(), ev1.count()
    docsN = replicate(docs1, "doc_id")
    embN = replicate(emb1, "vec_id")
    evN = ev1
    for i in range(1, rep):
        evN = evN.union(ev1.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 37} DAYS")))
    evN = evN.persist()
    docsN.count(), embN.count(), evN.count()

    from real_time_financial_data_pipeline_spark.operators.dedup import (
        apply_substring_dedup,
        minhash_dedup_pairs,
        paragraph_dedup,
        substring_dup_spans,
    )
    from real_time_financial_data_pipeline_spark.operators.finance import (
        activity_bars,
        kyle_lambda,
        vwap_bars,
    )
    from real_time_financial_data_pipeline_spark.operators.lm import (
        perplexity_trigram,
        train_trigram_lm,
    )
    from real_time_financial_data_pipeline_spark.operators.similarity import (
        ivf_pq_topk,
        semdedup_pairs,
    )
    from real_time_financial_data_pipeline_spark.operators.text import corpus_report

    def ticks(ev):
        return ev.select(
            "event_type", "ts", F.col("value").alias("price"),
            F.get_json_object("props", "$.k").cast("double").alias("size"),
        )

    probes = {
        "minhash_pairs": lambda d: noop(minhash_dedup_pairs(d, threshold=0.5)),
        "paragraph_dedup": lambda d: noop(paragraph_dedup(
            d.withColumn("text", F.regexp_replace(F.col("text"), r"((?:\S+ ){3}\S+) ", "$1\n")))),
        "substring_dedup": lambda d: noop(apply_substring_dedup(
            d, substring_dup_spans(d, window_tokens=20))),
        "corpus_report": lambda d: noop(corpus_report(d)),
        "trigram_perplexity": lambda d: noop(
            perplexity_trigram(d, train_trigram_lm(d, vocab_size=20))),
    }
    emb_probes = {
        "semdedup_pairs": lambda e: noop(semdedup_pairs(e, threshold=0.3, k=8)),
        "ivf_pq_topk": lambda e: noop(
            ivf_pq_topk(e, e.filter(F.col("vec_id") < 5), k=10)),
    }
    ev_probes = {
        "vwap_daily_bars": lambda e: noop(
            vwap_bars(ticks(e), "D", group_cols=["event_type"])),
        "activity_bars": lambda e: noop(activity_bars(ticks(e), 2000.0, "volume")),
        "kyle_lambda": lambda e: noop(kyle_lambda(ticks(e), ["event_type"])),
    }

    results: dict[str, dict[str, float]] = {}
    for name, fn in probes.items():
        results[name] = {"1x": median_of(lambda: fn(docs1)), f"{rep}x": median_of(lambda: fn(docsN))}
    for name, fn in emb_probes.items():
        results[name] = {"1x": median_of(lambda: fn(emb1)), f"{rep}x": median_of(lambda: fn(embN))}
    for name, fn in ev_probes.items():
        results[name] = {"1x": median_of(lambda: fn(ev1)), f"{rep}x": median_of(lambda: fn(evN))}
    for name, r in results.items():
        r["ratio"] = round(r[f"{rep}x"] / r["1x"], 2) if r["1x"] else None

    print(json.dumps({
        "metric": "scale_probe",
        "unit": "sec",
        "replication": rep,
        "sf_dir": sf_dir,
        "timings": results,
    }))


if __name__ == "__main__":
    main()
