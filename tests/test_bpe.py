"""BPE tokenizer training + encoding (operators/bpe.py): pure-Python
pipeline parity, the classic low/lower/lowest example, losslessness,
determinism under layout, and encode-memo correctness."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.bpe import (
    _merge_word,
    _pair_counts,
    bpe_encode,
    bpe_token_count,
    encode_word,
    learn_bpe,
    vocab_from_merges,
    word_counts,
)

# ASCII-only twin of text.py:BPE_PRETOKEN_RE for the pure-Python reference
# (Python `re` lacks \p{L}; test corpora below are ASCII so the classes
# coincide exactly)
PY_PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)|\s+"
)


def _py_learn(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Independent scalar-Python BPE trainer over the same pre-tokens."""
    wc = Counter(piece for t in texts for piece in PY_PRETOKEN_RE.findall(t))
    words = [(list(w), n) for w, n in wc.items()]
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, n in words:
            for pair in zip(syms, syms[1:]):
                pc[pair] += n
        if not pc:
            break
        best_count = max(pc.values())
        if best_count < 2:
            break
        best = min(p for p, c in pc.items() if c == best_count)
        merges.append(best)
        words = [(_merge_word(s, best), n) for s, n in words]
    return merges


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "lower lowest low lowly lower lowest",
    "pack my box with five dozen liquor jugs, quickly!",
    "the fox and the dog and the low lazy fox",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


class TestLearn:
    def test_word_counts_match_python(self, spark, corpus_df):
        got = {r["word"]: r["n"] for r in word_counts(corpus_df).collect()}
        exp = Counter(p for t in CORPUS for p in PY_PRETOKEN_RE.findall(t))
        assert got == dict(exp)

    def test_merges_match_python_reference(self, spark, corpus_df):
        assert learn_bpe(corpus_df, n_merges=40) == _py_learn(CORPUS, 40)

    def test_classic_low_example(self, spark):
        # Sennrich et al.'s running example: 'lo' is the most frequent pair
        df = spark.createDataFrame(
            [(0, "low low low lower lower lowest")], "doc_id long, text string"
        )
        merges = learn_bpe(df, n_merges=3)
        assert merges[0] == ("l", "o")
        assert merges[1] == ("lo", "w")

    def test_layout_independent(self, spark, corpus_df):
        m1 = learn_bpe(corpus_df, n_merges=25)
        m2 = learn_bpe(corpus_df.repartition(7), n_merges=25)
        assert m1 == m2 and len(m1) == 25

    def test_stops_when_no_repeating_pair(self, spark):
        df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
        # every pair occurs once -> no merge may be learned
        assert learn_bpe(df, n_merges=10) == []

    def test_max_words_caps_driver_set(self, spark, corpus_df):
        # capping to the 3 most frequent pieces still learns only from them
        merges = learn_bpe(corpus_df, n_merges=5, max_words=3)
        top3 = (
            word_counts(corpus_df).orderBy(F.desc("n"), F.asc("word")).limit(3).collect()
        )
        alphabet = {c for r in top3 for c in r["word"]}
        for a, b in merges:
            assert set(a + b) <= alphabet

    def test_counts_reuse(self, spark, corpus_df):
        wc = word_counts(corpus_df)
        assert learn_bpe(corpus_df, 20, counts=wc) == learn_bpe(corpus_df, 20)


class TestEncode:
    def test_lossless_reconstruction(self, spark, corpus_df):
        merges = learn_bpe(corpus_df, n_merges=30)
        enc = bpe_encode(corpus_df, merges).collect()
        for r in enc:
            assert "".join(r["bpe_tokens"]) == r["text"]

    def test_matches_python_encode(self, spark, corpus_df):
        merges = learn_bpe(corpus_df, n_merges=30)
        ranks = {p: i for i, p in enumerate(merges)}
        got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(corpus_df, merges).collect()}
        for i, t in enumerate(CORPUS):
            exp = [s for p in PY_PRETOKEN_RE.findall(t) for s in encode_word(p, ranks)]
            assert got[i] == exp

    def test_token_count_between_bounds(self, spark, corpus_df):
        merges = learn_bpe(corpus_df, n_merges=30)
        rows = (
            bpe_token_count(corpus_df, merges)
            .withColumn("n_pieces", F.size(F.regexp_extract_all("text", F.lit(r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"), 0)))
            .withColumn("n_chars", F.length("text"))
            .collect()
        )
        for r in rows:
            assert r["n_pieces"] <= r["n_bpe_tokens"] <= r["n_chars"]

    def test_more_merges_never_increase_count(self, spark, corpus_df):
        m10 = learn_bpe(corpus_df, n_merges=10)
        m40 = learn_bpe(corpus_df, n_merges=40)
        c10 = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(corpus_df, m10).collect()}
        c40 = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(corpus_df, m40).collect()}
        assert all(c40[k] <= c10[k] for k in c10)

    def test_empty_and_null_text(self, spark):
        df = spark.createDataFrame([(0, ""), (1, None)], "doc_id long, text string")
        rows = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, [("a", "b")]).collect()}
        assert rows[0] == [] and rows[1] == []

    def test_vocab_contains_every_emitted_multichar_token(self, spark, corpus_df):
        merges = learn_bpe(corpus_df, n_merges=30)
        vocab = vocab_from_merges(merges)
        for r in bpe_encode(corpus_df, merges).collect():
            for tok in r["bpe_tokens"]:
                assert len(tok) == 1 or tok in vocab

    def test_plan_is_map_only(self, spark, corpus_df):
        merges = learn_bpe(corpus_df, n_merges=10)
        plan = (
            bpe_encode(corpus_df, merges)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestKernels:
    def test_merge_word(self):
        assert _merge_word(list("aabab"), ("a", "b")) == ["a", "ab", "ab"]
        assert _merge_word(["x"], ("a", "b")) == ["x"]
        # overlapping occurrences merge left-to-right, no double consumption
        assert _merge_word(list("aaa"), ("a", "a")) == ["aa", "a"]

    def test_pair_counts_weighted(self):
        pc = _pair_counts([(list("abc"), 3), (list("ab"), 2)])
        assert pc[("a", "b")] == 5 and pc[("b", "c")] == 3

    def test_encode_word_rank_order(self):
        # lower-rank merge applies first even if a later one appears earlier
        ranks = {("b", "c"): 0, ("a", "b"): 1}
        assert encode_word("abc", ranks) == ["a", "bc"]


class TestComposition:
    def test_bpe_counts_drive_packing(self, spark, corpus_df):
        """The intended deployment chain: learn a tokenizer on the corpus,
        count REAL subword tokens per doc, pack docs into fixed-budget
        sequences by those counts (upgrading the pre-token lower bound)."""
        from real_time_financial_data_pipeline_spark.operators.training import (
            pack_sequences,
        )

        merges = learn_bpe(corpus_df, n_merges=30)
        counted = bpe_token_count(corpus_df, merges).withColumn(
            "chunk_id", F.lit(0)
        )
        budget = 40
        packed = pack_sequences(
            counted, budget, id_col="doc_id", tokens_col="n_bpe_tokens",
            n_buckets=1,
        )
        rows = packed.collect()
        assert {r["doc_id"] for r in rows} == set(range(len(CORPUS)))
        per_pack = Counter()
        for r in rows:
            per_pack[r["pack_id"]] += r["n_bpe_tokens"]
        assert per_pack and all(v <= budget for v in per_pack.values())


class TestPersistence:
    def test_save_load_round_trip(self, spark, corpus_df, tmp_path):
        merges = learn_bpe(corpus_df, n_merges=25)
        from real_time_financial_data_pipeline_spark.operators.bpe import (
            load_bpe,
            save_bpe,
        )

        path = str(tmp_path / "bpe_artifact")
        save_bpe(spark, merges, path)
        loaded = load_bpe(spark, path)
        assert loaded == merges
        # the loaded tokenizer encodes identically
        a = bpe_encode(corpus_df, merges).collect()
        b = bpe_encode(corpus_df, loaded).collect()
        assert [r["bpe_tokens"] for r in a] == [r["bpe_tokens"] for r in b]


class TestStreaming:
    def test_encode_is_stream_legal(self, spark, corpus_df, tmp_path):
        """bpe_encode/bpe_token_count are stateless projections, so they
        run unchanged on a streaming frame (in-flight token accounting
        with the production tokenizer)."""
        merges = learn_bpe(corpus_df, n_merges=20)
        src = tmp_path / "docs"
        corpus_df.coalesce(1).write.parquet(str(src))
        stream = spark.readStream.schema(
            spark.read.parquet(str(src)).schema
        ).parquet(str(src))
        q = (
            bpe_token_count(stream, merges)
            .writeStream.format("memory")
            .queryName("bpe_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        got = {r["doc_id"]: r["n_bpe_tokens"] for r in spark.table("bpe_stream").collect()}
        exp = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(corpus_df, merges).collect()}
        assert got == exp and len(got) == len(CORPUS)


class TestBpeChunking:
    def test_byte_exact_reconstruction(self, spark, corpus_df):
        from real_time_financial_data_pipeline_spark.operators.bpe import (
            chunk_documents_bpe,
        )

        merges = learn_bpe(corpus_df, n_merges=30)
        ranks = {p: i for i, p in enumerate(merges)}
        chunks = (
            chunk_documents_bpe(corpus_df, merges, chunk_tokens=12, overlap_tokens=3)
            .toPandas().sort_values(["doc_id", "chunk_id"], ignore_index=True)
        )
        for doc_id, text in enumerate(CORPUS):
            rows = chunks[chunks.doc_id == doc_id]
            assert len(rows) > 0
            # each chunk is the exact concat of its subword window; drop
            # each later chunk's 3-subword overlap prefix and concat ->
            # byte-exact document
            pieces = [s for p in PY_PRETOKEN_RE.findall(text) for s in encode_word(p, ranks)]
            rebuilt = ""
            for _, r in rows.iterrows():
                start = int(r.chunk_id) * (12 - 3)
                toks = pieces[start : start + 12]
                assert "".join(toks) == r.chunk_text
                rebuilt += "".join(toks[3:] if r.chunk_id > 0 else toks)
            assert rebuilt == text

    def test_budget_and_overlap_bounds(self, spark, corpus_df):
        from real_time_financial_data_pipeline_spark.operators.bpe import (
            chunk_documents_bpe,
        )

        merges = learn_bpe(corpus_df, n_merges=30)
        rows = chunk_documents_bpe(corpus_df, merges, chunk_tokens=10, overlap_tokens=2).collect()
        assert rows and all(r.n_chunk_tokens <= 10 for r in rows)
        # every chunk except possibly a doc's last is exactly full
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        merges_ranks = {p_: i for i, p_ in enumerate(merges)}
        for doc_rows in by_doc.values():
            doc_rows.sort(key=lambda r: r.chunk_id)
            for r in doc_rows[:-1]:
                assert r.n_chunk_tokens == 10
            # consecutive chunks share EXACTLY overlap_tokens subwords
            def subwords(txt):
                return [s for p_ in PY_PRETOKEN_RE.findall(txt)
                        for s in encode_word(p_, merges_ranks)]
            for a, b in zip(doc_rows, doc_rows[1:]):
                ta, tb = subwords(a.chunk_text), subwords(b.chunk_text)
                assert ta[-2:] == tb[:2]

    def test_no_exchange_plan(self, spark, corpus_df):
        from real_time_financial_data_pipeline_spark.operators.bpe import (
            chunk_documents_bpe,
        )

        merges = learn_bpe(corpus_df, n_merges=10)
        plan = (
            chunk_documents_bpe(corpus_df, merges)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestPipelineIntegration:
    def test_prepare_training_set_with_tokenizer(self, spark, corpus_df):
        from real_time_financial_data_pipeline_spark.operators.training import (
            prepare_training_set,
        )

        merges = learn_bpe(corpus_df, n_merges=30)
        out = prepare_training_set(
            corpus_df, min_quality=0.0, chunk_tokens=12, overlap_tokens=2,
            tokenizer_merges=merges,
        ).collect()
        assert out and all(r.n_chunk_tokens <= 12 for r in out)
        # budgets are SUBWORD counts: re-encoding each chunk hits the bound
        ranks = {p: i for i, p in enumerate(merges)}
        for r in out:
            n = len([s for p in PY_PRETOKEN_RE.findall(r.chunk_text)
                     for s in encode_word(p, ranks)])
            assert n == r.n_chunk_tokens


class TestOracleMergeReplay:
    def test_fixpoint_sql_replay_handles_adjacent_repeats(self):
        """Twin of the bpe_token_count_docs oracle's rec CTE
        (__spark_entry__.py): one replace() pass per rank MISSES
        back-to-back occurrences of the same pair ('abab' under (a,b)
        would count 3 tokens instead of 2, because each match consumes
        the separator the next occurrence needs), so the oracle iterates
        each rank's replace to a FIXPOINT.  This pins that loop against
        the real encoder on exactly the adversarial shapes the one-pass
        version got wrong."""
        import duckdb

        corpus = ["abab ababab abcabc aaaa baba abab"]
        merges = _py_learn(corpus, 8)
        assert merges, "fabric must learn at least one merge"
        ranks = {p: i for i, p in enumerate(merges)}
        pieces = sorted({p for t in corpus for p in PY_PRETOKEN_RE.findall(t)})
        expected = {p: len(encode_word(p, ranks)) for p in pieces}

        con = duckdb.connect()
        con.execute("CREATE TABLE m(rank INT, a TEXT, b TEXT)")
        con.executemany(
            "INSERT INTO m VALUES (?, ?, ?)",
            [(i, a, b) for i, (a, b) in enumerate(merges)],
        )
        con.execute("CREATE TABLE words(piece TEXT)")
        con.executemany("INSERT INTO words VALUES (?)", [(p,) for p in pieces])
        got = dict(con.execute("""
            WITH RECURSIVE rec AS (
                SELECT piece,
                       chr(31) || array_to_string(
                           list_transform(range(1, len(piece) + 1), i -> piece[i]),
                           chr(31)) || chr(31) AS s,
                       0 AS k
                FROM words
                UNION ALL
                SELECT piece, s2,
                       CASE WHEN contains(s2, pat) THEN k ELSE k + 1 END AS k
                FROM (
                    SELECT r.piece,
                           replace(r.s, chr(31) || m.a || chr(31) || m.b || chr(31),
                                   chr(31) || m.a || m.b || chr(31)) AS s2,
                           chr(31) || m.a || chr(31) || m.b || chr(31) AS pat,
                           r.k AS k
                    FROM rec r JOIN m ON m.rank = r.k
                )
            )
            SELECT piece, len(string_split(s, chr(31))) - 2 AS n
            FROM rec WHERE k = (SELECT count(*) FROM m)
        """).fetchall())
        assert got == expected
