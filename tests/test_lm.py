"""Bigram-LM perplexity filter (operators/lm.py): pure-Python parity,
discrimination between natural and scrambled text, OOV/UNK handling, and
plan-shape checks (corpus never shuffles before its per-doc sum)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from real_time_financial_data_pipeline_spark.operators.lm import (
    BOS,
    EOS,
    UNK,
    build_vocab,
    perplexity,
    train_bigram_lm,
)


def _docs_df(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_lm(texts: list[str], vocab_size: int, k: float):
    """Independent pure-Python add-k bigram LM (train + per-doc score)."""
    tok_docs = [[w for w in t.lower().split(" ") if w] for t in texts]
    uni = Counter(w for toks in tok_docs for w in toks)
    vocab = set(
        w for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    v_pred = len(vocab) + 2

    def mapped(toks):
        seq = [BOS] + [w if w in vocab else UNK for w in toks] + [EOS]
        return list(zip(seq, seq[1:]))

    big = Counter(p for toks in tok_docs for p in mapped(toks))
    ctx = Counter()
    for (w1, _), c in big.items():
        ctx[w1] += c
    scores = []
    for toks in tok_docs:
        pairs = mapped(toks)
        lp = sum(
            math.log((big.get(p, 0) + k) / (ctx.get(p[0], 0) + k * v_pred))
            for p in pairs
        )
        scores.append((len(pairs), lp, math.exp(-lp / len(pairs))))
    return v_pred, scores


class TestTrainScore:
    def test_matches_python_reference(self, spark):
        texts = [
            "the cat sat on the mat",
            "the dog sat on the log",
            "a cat and a dog",
            "the the the cat cat",
            "zippy unseen words here",
        ]
        lm = train_bigram_lm(_docs_df(spark, texts), vocab_size=8, add_k=0.5)
        v_pred, ref = _py_lm(texts, 8, 0.5)
        assert lm.v_pred == v_pred
        got = (
            perplexity(_docs_df(spark, texts), lm)
            .toPandas()
            .sort_values("doc_id", ignore_index=True)
        )
        for i, (n, lp, ppl) in enumerate(ref):
            assert got["n_bigrams"].iloc[i] == n
            assert got["log_prob"].iloc[i] == pytest.approx(lp, rel=1e-12)
            assert got["perplexity"].iloc[i] == pytest.approx(ppl, rel=1e-12)

    def test_n_bigrams_is_tokens_plus_one(self, spark):
        texts = ["one two three", "", "solo"]
        lm = train_bigram_lm(_docs_df(spark, texts), vocab_size=10)
        got = (
            perplexity(_docs_df(spark, texts), lm)
            .toPandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert got["n_bigrams"].tolist() == [4, 1, 2]

    def test_vocab_deterministic_ties_by_token(self, spark):
        # every token count 1 -> selection must be purely alphabetical
        df = _docs_df(spark, ["delta alpha echo bravo charlie"])
        v = sorted(r.token for r in build_vocab(df, vocab_size=3).collect())
        assert v == ["alpha", "bravo", "charlie"]

    def test_scores_unseen_corpus_with_unseen_contexts(self, spark):
        lm = train_bigram_lm(_docs_df(spark, ["a b a b a b"]), vocab_size=4)
        got = perplexity(_docs_df(spark, ["q r s"]), lm).toPandas()
        # all tokens OOV -> mapped to <unk>, context <unk> unseen in training
        assert got["perplexity"].iloc[0] > 0 and not pd.isna(got["perplexity"].iloc[0])

    def test_discriminates_pattern_from_gibberish(self, spark, documents):
        """CCNet-style use: in-distribution text scores lower perplexity
        than token-salad drawn from the same vocabulary."""
        corpus = documents.limit(200)
        lm = train_bigram_lm(corpus, vocab_size=1000, add_k=0.5)
        natural = [r.text for r in corpus.limit(5).collect()]
        rng_tokens = sorted({w for t in natural for w in t.lower().split()})
        scrambled = " ".join(rng_tokens[::-1][:50])  # reversed-vocab salad
        score = perplexity(
            _docs_df(spark, natural + [scrambled]), lm
        ).toPandas().sort_values("doc_id", ignore_index=True)
        nat_ppl = score["perplexity"].iloc[:5].mean()
        assert score["perplexity"].iloc[5] > nat_ppl

    def test_local_scorer_matches_distributed(self, spark, documents):
        """perplexity_local (driver-collected model, stateless Arrow map)
        must equal the distributed explode+join+aggregate scorer up to
        float summation order."""
        from real_time_financial_data_pipeline_spark.operators.lm import (
            collect_model,
            perplexity_local,
        )

        corpus = documents.limit(100)
        lm = train_bigram_lm(corpus, vocab_size=25, add_k=0.5)
        dist = (
            perplexity(corpus, lm).toPandas().sort_values("doc_id", ignore_index=True)
        )
        loc = (
            perplexity_local(corpus, collect_model(lm))
            .toPandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert dist["n_bigrams"].tolist() == loc["n_bigrams"].tolist()
        assert dist["log_prob"].tolist() == pytest.approx(
            loc["log_prob"].tolist(), rel=1e-9
        )
        assert dist["perplexity"].tolist() == pytest.approx(
            loc["perplexity"].tolist(), rel=1e-9
        )

    def test_perplexity_gate_in_curation(self, spark, documents):
        """curate_documents(perplexity_lm=..., max_perplexity=...) drops a
        planted token-salad document and keeps in-distribution text."""
        from real_time_financial_data_pipeline_spark.operators.training import (
            curate_documents,
        )

        corpus = documents.limit(100)
        lm = train_bigram_lm(corpus, vocab_size=1000, add_k=0.5)
        base = perplexity(corpus, lm).toPandas()
        cutoff = float(base["perplexity"].max()) + 0.5

        vocab_toks = sorted(
            {w for r in corpus.limit(5).collect() for w in r.text.lower().split()}
        )
        salad = " ".join(vocab_toks[::-1] * 3)
        planted = corpus.select("doc_id", "text").union(
            spark.createDataFrame([(999_999, salad)], "doc_id long, text string")
        )
        kept = curate_documents(
            planted,
            min_quality=0.0,
            near_dup_threshold=0.99,
            perplexity_lm=lm,
            max_perplexity=cutoff,
        )
        kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
        assert 999_999 not in kept_ids
        assert len(kept_ids) > 50  # in-distribution docs survive the gate

    def test_score_plan_has_no_corpus_shuffle_before_doc_sum(self, spark):
        texts = ["a b c", "c b a"]
        df = _docs_df(spark, texts)
        lm = train_bigram_lm(df, vocab_size=4)
        plan = (
            perplexity(df, lm)._jdf.queryExecution().executedPlan().toString()
        )
        # model joins are broadcast; the only exchange on the scored side is
        # the per-doc hash aggregate (plus AQE coalesces reading it)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestTrigramLM:
    @staticmethod
    def _py_trigram(texts, vocab_size, k, lambdas):
        """Independent pure-Python interpolated trigram LM."""
        from real_time_financial_data_pipeline_spark.operators.lm import BOS, EOS, UNK

        tok_docs = [[w for w in t.lower().split(" ") if w] for t in texts]
        uni_raw = Counter(w for toks in tok_docs for w in toks)
        vocab = set(
            w
            for w, _ in sorted(uni_raw.items(), key=lambda kv: (-kv[1], kv[0]))[
                :vocab_size
            ]
        )
        v_pred = len(vocab) + 2

        def seqs(toks):
            s = [BOS, BOS] + [w if w in vocab else UNK for w in toks] + [EOS]
            return list(zip(s, s[1:], s[2:]))

        tri = Counter(t for toks in tok_docs for t in seqs(toks))
        ctx2 = Counter()
        bi = Counter()
        uni = Counter()
        for (w1, w2, w3), c in tri.items():
            ctx2[(w1, w2)] += c
            bi[(w2, w3)] += c
            uni[w3] += c
        bctx = Counter()
        for (w1, _), c in bi.items():
            bctx[w1] += c
        n_total = sum(uni.values())
        l1, l2, l3 = lambdas
        out = []
        for toks in tok_docs:
            lp = 0.0
            trips = seqs(toks)
            for w1, w2, w3 in trips:
                p3 = (tri.get((w1, w2, w3), 0) + k) / (ctx2.get((w1, w2), 0) + k * v_pred)
                p2 = (bi.get((w2, w3), 0) + k) / (bctx.get(w2, 0) + k * v_pred)
                p1 = (uni.get(w3, 0) + k) / (n_total + k * v_pred)
                lp += math.log(l3 * p3 + l2 * p2 + l1 * p1)
            out.append((len(trips), lp, math.exp(-lp / len(trips))))
        return v_pred, n_total, out

    def test_matches_python_reference(self, spark):
        from real_time_financial_data_pipeline_spark.operators.lm import (
            perplexity_trigram,
            train_trigram_lm,
        )

        texts = [
            "the cat sat on the mat",
            "the dog sat on the log",
            "a cat and a dog sat",
            "rare words appear here once",
            "",
        ]
        lambdas = (0.1, 0.3, 0.6)
        lm = train_trigram_lm(_docs_df(spark, texts), vocab_size=10, add_k=0.5,
                              lambdas=lambdas)
        v_pred, n_total, ref = self._py_trigram(texts, 10, 0.5, lambdas)
        assert lm.v_pred == v_pred and lm.n_tokens == n_total
        got = (
            perplexity_trigram(_docs_df(spark, texts), lm)
            .toPandas()
            .sort_values("doc_id", ignore_index=True)
        )
        for i, (n, lp, ppl) in enumerate(ref):
            assert got["n_grams"].iloc[i] == n
            assert got["log_prob"].iloc[i] == pytest.approx(lp, rel=1e-12)
            assert got["perplexity"].iloc[i] == pytest.approx(ppl, rel=1e-12)

    def test_trigram_rewards_seen_trigrams_over_bigram_salad(self, spark):
        """The trigram order must distinguish text whose BIGRAMS are all
        in-distribution but whose TRIGRAMS are novel — the failure mode a
        bigram model can't see."""
        from real_time_financial_data_pipeline_spark.operators.lm import (
            perplexity_trigram,
            train_trigram_lm,
        )

        train = ["a b c d e f g h " * 5]
        # every adjacent PAIR below occurs in training; almost no triple does
        bigram_salad = "a b c d e f g h a b c d"
        verbatim = "a b c d e f g h a b c d e f g h"
        # build salad with seen bigrams, unseen trigrams: pairs (c,d),(d,e)
        # exist, but e.g. window shifts create novel triples
        salad = "c d e f g h a b"
        lm = train_trigram_lm(_docs_df(spark, train), vocab_size=20, add_k=0.5)
        got = (
            perplexity_trigram(
                _docs_df(spark, [verbatim, bigram_salad, salad]), lm
            )
            .toPandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert got["perplexity"].iloc[0] < got["perplexity"].iloc[2]

    def test_lambda_validation(self, spark):
        from real_time_financial_data_pipeline_spark.operators.lm import train_trigram_lm

        with pytest.raises(ValueError):
            train_trigram_lm(_docs_df(spark, ["x"]), lambdas=(0.5, 0.5, 0.5))


def test_local_scorer_sentinel_collision_matches_distributed(spark):
    """Review regression: documents containing LITERAL '<s>'/'</s>' tokens
    (common crawl artifacts) must score identically under the distributed
    and local scorers — both apply the positional sentinel mapping."""
    from real_time_financial_data_pipeline_spark.operators.lm import (
        collect_model,
        perplexity_local,
    )

    texts = ["a <s> b </s> c", "<s> starts and ends </s>", "plain text here"]
    df = _docs_df(spark, texts)
    lm = train_bigram_lm(df, vocab_size=10, add_k=0.5)
    dist = perplexity(df, lm).toPandas().sort_values("doc_id", ignore_index=True)
    loc = (
        perplexity_local(df, collect_model(lm))
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert dist["n_bigrams"].tolist() == loc["n_bigrams"].tolist()
    assert dist["log_prob"].tolist() == pytest.approx(loc["log_prob"].tolist(), rel=1e-9)


def test_lm_save_load_round_trip(spark, documents, tmp_path):
    """A saved+loaded model scores every document identically to the
    in-memory fit (contexts re-derived from the persisted bigram table),
    and the loaded model feeds collect_model for the streaming gate."""
    from real_time_financial_data_pipeline_spark.operators.lm import (
        collect_model,
        load_lm,
        perplexity_local,
        save_lm,
    )

    corpus = documents.limit(80)
    lm = train_bigram_lm(corpus, vocab_size=25, add_k=0.5)
    save_lm(lm, str(tmp_path / "lm"))
    loaded = load_lm(spark, str(tmp_path / "lm"))
    assert loaded.v_pred == lm.v_pred and loaded.add_k == lm.add_k

    a = perplexity(corpus, lm).toPandas().sort_values("doc_id", ignore_index=True)
    b = perplexity(corpus, loaded).toPandas().sort_values("doc_id", ignore_index=True)
    assert a["n_bigrams"].tolist() == b["n_bigrams"].tolist()
    assert a["log_prob"].tolist() == pytest.approx(b["log_prob"].tolist(), rel=1e-12)

    local = collect_model(loaded)
    c = (
        perplexity_local(corpus, local)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a["log_prob"].tolist() == pytest.approx(c["log_prob"].tolist(), rel=1e-9)
