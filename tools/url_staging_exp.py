"""One-off measurement behind the r17 URL parts-staging refactor
(BASELINE.md round 17): inline registered_domain expression vs the
staged with_registered_domain form, timed on a 4M-row synthetic URL
table with a domain-count aggregate.  Recorded best-of-3 warm:
inline 2.92 s vs staged 2.46 s (0.84x) — whole-stage codegen CSE was
NOT de-duplicating the repeated regexp_extract work, so the named-host
staging is a runtime win as well as the codegen-size fix."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.urls import (
    registered_domain,
    with_registered_domain,
)
from real_time_financial_data_pipeline_spark.session import get_spark


def main() -> None:
    spark = get_spark("url-staging-exp")
    spark.sparkContext.setLogLevel("ERROR")
    n = 4_000_000
    base = spark.range(n).select(
        F.concat(
            F.lit("http://www.h"),
            (F.col("id") % 99991).cast("string"),
            F.lit(".example.co.uk/p/"),
            F.col("id").cast("string"),
            F.lit("?q=1"),
        ).alias("uri")
    )
    base = base.persist()
    base.count()

    def t(tag: str, df) -> None:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df.groupBy("_dom").count().agg(F.count("*")).collect()
            w = time.perf_counter() - t0
            best = w if best is None or w < best else best
        print(f"{tag}: best {best:.3f}s")

    t("inline-expr ", base.withColumn("_dom", registered_domain(F.col("uri"))))
    t("staged-parts", with_registered_domain(base, "uri", "_dom"))
    spark.stop()


if __name__ == "__main__":
    main()
