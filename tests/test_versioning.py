"""Snapshot-versioned tables (versioning.py): time travel, rollback,
vacuum retention, crash-orphan invisibility, and append/overwrite
lineage."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.versioning import VersionedTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


class TestVersioning:
    def test_append_overwrite_time_travel(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        v0 = t.commit(_df(spark, 0, 10))            # 10 rows
        v1 = t.commit(_df(spark, 10, 15))           # +5 -> 15
        v2 = t.commit(_df(spark, 100, 102), mode="overwrite")  # fresh 2
        v3 = t.commit(_df(spark, 102, 105))         # +3 -> 5
        assert (v0, v1, v2, v3) == (0, 1, 2, 3)
        assert t.read(0).count() == 10
        assert t.read(1).count() == 15
        assert t.read(2).count() == 2
        assert t.read().count() == 5
        assert {r.id for r in t.read(2).collect()} == {100, 101}
        hist = t.history()
        assert [h["rows"] for h in hist] == [10, 15, 2, 5]
        assert hist[2]["mode"] == "overwrite"

    def test_rollback_restores_without_deleting(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        t.commit(_df(spark, 0, 10))
        t.commit(_df(spark, 0, 1), mode="overwrite")  # the "bad ingest"
        v = t.rollback(0)
        assert v == 2
        assert t.read().count() == 10
        # the bad version is still auditable
        assert t.read(1).count() == 1
        assert t.history()[-1]["mode"] == "rollback(0)"

    def test_vacuum_keeps_referenced_dirs(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        t.commit(_df(spark, 0, 10))
        t.commit(_df(spark, 10, 20))
        t.commit(_df(spark, 50, 52), mode="overwrite")
        t.commit(_df(spark, 52, 55))
        out = t.vacuum(keep_last=2)
        # versions 0/1 dropped; their b000000/b000001 dirs are unreferenced
        assert out == {"manifests_dropped": 2, "data_dirs_removed": 2}
        assert t.versions() == [2, 3]
        assert t.read(3).count() == 5 and t.read(2).count() == 2
        with pytest.raises(FileNotFoundError):
            t.read(0)

    def test_vacuum_shared_dirs_survive(self, spark, tmp_path):
        """An appended snapshot shares its parent's dirs — vacuuming away
        the parent manifest must NOT remove dirs the child still needs."""
        t = VersionedTable(spark, str(tmp_path / "t"))
        t.commit(_df(spark, 0, 10))
        t.commit(_df(spark, 10, 20))
        t.vacuum(keep_last=1)
        assert t.versions() == [1]
        assert t.read().count() == 20  # both dirs still present

    def test_crash_orphan_invisible_and_vacuumed(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        t.commit(_df(spark, 0, 10))
        # simulate a writer that died after the data write, before the
        # manifest: orphan dir exists, readers never see it
        orphan = str(tmp_path / "t" / "data" / "b000042")
        _df(spark, 900, 999).write.parquet(orphan)
        assert t.read().count() == 10
        out = t.vacuum(keep_last=1)
        assert out["data_dirs_removed"] == 1
        assert not os.path.isdir(orphan)
        assert t.read().count() == 10

    def test_random_lifecycle_duckdb_oracle(self, spark, tmp_path):
        """Property test over a random commit/rollback/vacuum sequence
        (r8 verdict item #5) with TWO independent checks at every step:

        1. time-travel oracle — for every retained version, the manifest
           is resolved OUTSIDE Spark (json + glob) and DuckDB reads the
           recorded parquet union; its multiset of rows must equal both
           Spark's ``read(v)`` and the Python-side expected model;
        2. vacuum safety — after any vacuum, every directory referenced
           by a retained manifest still exists on disk, every retained
           version still reads, and the manifest's ``rows`` count stays
           truthful."""
        import glob
        import json
        import random

        import duckdb

        rng = random.Random(11)
        root = str(tmp_path / "t")
        t = VersionedTable(spark, root)
        expected: dict[int, set[tuple]] = {}
        next_id = 0

        def fresh(n):
            nonlocal next_id
            lo, next_id = next_id, next_id + n
            return _df(spark, lo, lo + n), {(i, i * 2) for i in range(lo, lo + n)}

        con = duckdb.connect()

        def oracle_rows(version):
            with open(os.path.join(root, "_versions", f"v{version:06d}.json")) as f:
                m = json.load(f)
            files = [
                p
                for d in m["dirs"]
                for p in glob.glob(os.path.join(root, d, "*.parquet"))
            ]
            rows = con.execute(
                "SELECT id, v FROM read_parquet(?)", [files]
            ).fetchall()
            return {tuple(r) for r in rows}, m

        # seed commit so rollback/vacuum always have a target
        df, rows = fresh(rng.randint(1, 5))
        expected[t.commit(df)] = rows
        for _ in range(22):
            op = rng.choice(["append", "append", "overwrite", "rollback", "vacuum"])
            if op == "append":
                df, rows = fresh(rng.randint(1, 5))
                parent = t.latest_version()
                v = t.commit(df)
                expected[v] = expected[parent] | rows
            elif op == "overwrite":
                df, rows = fresh(rng.randint(1, 5))
                expected[t.commit(df, mode="overwrite")] = rows
            elif op == "rollback":
                target = rng.choice(t.versions())
                expected[t.rollback(target)] = expected[target]
            else:
                keep = rng.randint(1, 3)
                t.vacuum(keep_last=keep)
                retained = set(t.versions())
                expected = {v: r for v, r in expected.items() if v in retained}
            # invariants over ALL retained versions, every step
            assert set(t.versions()) == set(expected)
            for v in t.versions():
                got_oracle, m = oracle_rows(v)
                assert got_oracle == expected[v], f"v{v} oracle mismatch"
                assert m["rows"] == len(expected[v])
                for d in m["dirs"]:
                    assert os.path.isdir(os.path.join(root, d)), (v, d)
            # spot-check Spark's own resolution on one random version
            v = rng.choice(t.versions())
            got_spark = {tuple(r) for r in t.read(v).collect()}
            assert got_spark == expected[v], f"v{v} spark mismatch"

    def test_read_empty_table_raises(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        with pytest.raises(FileNotFoundError):
            t.read()

    def test_bad_args(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        with pytest.raises(ValueError):
            t.commit(_df(spark, 0, 1), mode="merge")
        t.commit(_df(spark, 0, 1))
        with pytest.raises(ValueError):
            t.vacuum(keep_last=0)

    def test_schema_and_values_round_trip(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        t.commit(_df(spark, 0, 5))
        t.commit(_df(spark, 5, 8))
        got = sorted((r.id, r.v) for r in t.read().collect())
        assert got == [(i, 2 * i) for i in range(8)]


class TestIncrementalConsumption:
    def test_read_changes_returns_only_new_rows(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        v0 = t.commit(_df(spark, 0, 10))
        v1 = t.commit(_df(spark, 10, 15))
        v2 = t.commit(_df(spark, 15, 18))
        assert {r.id for r in t.read_changes(v0).collect()} == set(range(10, 18))
        assert {r.id for r in t.read_changes(v0, v1).collect()} == set(range(10, 15))
        assert {r.id for r in t.read_changes(v1, v2).collect()} == set(range(15, 18))
        assert t.read_changes(v2, v2).count() == 0

    def test_read_changes_refuses_rewrites(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        v0 = t.commit(_df(spark, 0, 10))
        t.commit(_df(spark, 0, 2), mode="overwrite")
        with pytest.raises(ValueError, match="overwrite"):
            t.read_changes(v0)

    def test_streaming_commits_and_delta_consumption(self, spark, tmp_path):
        """Deployment composition: micro-batches land as versioned commits
        (foreachBatch), then a downstream incremental job consumes exactly
        the delta since the version it last processed."""
        src = tmp_path / "src"
        _df(spark, 0, 40).coalesce(1).write.parquet(str(src / "f1"))
        _df(spark, 40, 70).coalesce(1).write.parquet(str(src / "f2"))
        t = VersionedTable(spark, str(tmp_path / "t"))
        schema = spark.read.parquet(str(src / "f1")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream.writeStream.foreachBatch(lambda bdf, bid: t.commit(bdf))
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        assert len(t.versions()) == 2
        assert t.read().count() == 70
        # downstream job processed v0, now consumes the delta only
        delta = t.read_changes(0)
        assert {r.id for r in delta.collect()} == set(range(40, 70))

    def test_delta_feeds_incremental_dedup(self, spark, tmp_path, documents):
        """The nightly incremental-curation chain: corpus lands as
        versioned commits; the new batch (read_changes) is deduped against
        the STANDING corpus (earlier version) before being committed —
        planted clones of existing docs never reach the curated table."""
        from real_time_financial_data_pipeline_spark.operators.dedup import (
            incremental_dedup,
        )

        docs = documents.select("doc_id", "text").limit(100).cache()
        t = VersionedTable(spark, str(tmp_path / "corpus"))
        v0 = t.commit(docs)
        # new batch: 5 genuinely novel docs + 3 verbatim clones of corpus docs
        fresh = spark.createDataFrame(
            [
                (10_000 + i, " ".join(f"novel{i}tok{j} unseen phrase" for j in range(30)))
                for i in range(5)
            ],
            "doc_id long, text string",
        )
        clones = docs.limit(3).select(
            (F.col("doc_id") + 20_000).alias("doc_id"), F.col("text")
        )
        t.commit(fresh.unionByName(clones))
        new_batch = t.read_changes(v0)
        standing = t.read(v0)
        kept = incremental_dedup(new_batch, standing, threshold=0.9)
        ids = {r.doc_id for r in kept.collect()}
        assert ids == {10_000 + i for i in range(5)}


def test_lake_versioned_accessor(spark, tmp_path):
    """DataLake.versioned routes through the same validated path logic
    (traversal-safe) and yields a working VersionedTable."""
    from real_time_financial_data_pipeline_spark.lake import DataLake

    lake = DataLake(spark, str(tmp_path / "lake"))
    t = lake.versioned("yahoo_stock_20240101", layer="silver")
    t.commit(_df(spark, 0, 7))
    assert lake.versioned("yahoo_stock_20240101", "silver").read().count() == 7
    with pytest.raises(ValueError):
        lake.versioned("../escape", "silver")


class TestEvolutionAndConstraints:
    def test_schema_evolution_read_merged(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        t.commit(_df(spark, 0, 5))
        t.commit(_df(spark, 5, 8).withColumn("extra", F.lit("x")))
        merged = t.read_merged()
        assert set(merged.columns) == {"id", "v", "extra"}
        vals = {r.id: r.extra for r in merged.collect()}
        assert vals[0] is None and vals[7] == "x"
        assert merged.count() == 8

    def test_commit_checked_rejects_and_leaves_no_version(self, spark, tmp_path):
        from real_time_financial_data_pipeline_spark.operators.quality import (
            in_range,
            not_null,
        )

        t = VersionedTable(spark, str(tmp_path / "t"))
        rules = [not_null("v"), in_range("id", 0, 100)]
        v0 = t.commit_checked(_df(spark, 0, 10), rules)
        assert v0 == 0 and t.read().count() == 10
        bad = _df(spark, 200, 205)  # id out of range
        with pytest.raises(ValueError, match="id_in_range=5"):
            t.commit_checked(bad, rules)
        # no new version, no orphan data dir
        assert t.versions() == [0]
        data_dirs = os.listdir(str(tmp_path / "t" / "data"))
        assert data_dirs == ["b000000"]
        # table still readable and unchanged
        assert t.read().count() == 10


class TestMergeAndCompact:
    def test_merge_upsert(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        t.commit(_df(spark, 0, 10))
        updates = spark.createDataFrame(
            [(3, 999), (4, 888), (100, 777)], "id long, v long"
        )
        v = t.merge_upsert(updates, ["id"])
        got = {r.id: r.v for r in t.read(v).collect()}
        assert got[3] == 999 and got[4] == 888 and got[100] == 777
        assert got[5] == 10 and len(got) == 11
        # pre-merge state still readable (time travel)
        pre = {r.id: r.v for r in t.read(v - 1).collect()}
        assert pre[3] == 6 and 100 not in pre
        with pytest.raises(ValueError):
            t.merge_upsert(updates, [])
        with pytest.raises(ValueError, match="missing"):
            t.merge_upsert(updates, ["nope"])

    def test_compact_preserves_history(self, spark, tmp_path):
        t = VersionedTable(spark, str(tmp_path / "t"))
        for i in range(4):
            t.commit(_df(spark, i * 5, (i + 1) * 5))
        out = t.compact()
        assert out["dirs_before"] == 4 and out["dirs_after"] == 1
        assert t.read().count() == 20
        assert sorted(r.id for r in t.read().collect()) == list(range(20))
        # pinned reader on the pre-compaction version still works
        assert t.read(out["version"] - 1).count() == 20
        # vacuum now reclaims the four pre-compaction dirs
        assert t.vacuum(keep_last=1)["data_dirs_removed"] == 4


def test_crashed_commit_retry_not_blocked(spark, tmp_path):
    """A writer that died between data write and manifest rename leaves an
    orphan dir at the NEXT version number; the retried commit must clear
    it and succeed instead of failing on parquet mode('error')."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 10))
    # simulate the crash: data for v1 landed, manifest never written
    _df(spark, 500, 503).write.parquet(str(tmp_path / "t" / "data" / "b000001"))
    v = t.commit(_df(spark, 10, 15))  # retry lands as v1
    assert v == 1
    assert t.read().count() == 15
    assert {r.id for r in t.read_changes(0).collect()} == set(range(10, 15))


def test_quarantined_versioned_ingest_chain(spark, tmp_path):
    """Deployment chain tying the round's two ingest features: each
    micro-batch splits on the rule set (split_by_rules) and BOTH sides
    land as versioned commits — good rows queryable with time travel,
    quarantine auditable with its violation labels, and the downstream
    incremental consumer reads only the good delta."""
    from real_time_financial_data_pipeline_spark.operators.quality import (
        in_range,
        not_null,
    )
    from real_time_financial_data_pipeline_spark.streaming.ingest import (
        split_by_rules,
    )

    rules = [not_null("v"), in_range("id", 0, 999)]
    src = tmp_path / "src"
    good1 = [(i, i * 2) for i in range(20)]
    bad1 = [(2000, 1), (3000, None)]
    good2 = [(i, i * 2) for i in range(20, 30)]
    schema = "id long, v long"
    spark.createDataFrame(good1 + bad1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(good2, schema).coalesce(1).write.parquet(str(src / "f2"))

    good_t = VersionedTable(spark, str(tmp_path / "good"))
    dlq_t = VersionedTable(spark, str(tmp_path / "dlq"))

    def route(batch_df, batch_id):
        good, bad = split_by_rules(batch_df, rules)
        good_t.commit(good)
        dlq_t.commit(bad)

    stream = (
        spark.readStream.schema(spark.read.parquet(str(src / "f1")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(route)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    assert good_t.read().count() == 30
    assert good_t.read(0).count() == 20  # time travel to the first trigger
    dlq = dlq_t.read().toPandas()
    assert len(dlq) == 2 and "_violations" in dlq.columns
    # incremental consumer: only the second trigger's good rows
    delta = good_t.read_changes(0)
    assert {r.id for r in delta.collect()} == set(range(20, 30))
