"""Driver-contract smoke: entry() runs on a vanilla-style session; every
queries() entry returns a DataFrame at sf0.001; oracle keys are a subset."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "event_type", "period", "open", "high", "low", "close", "n_events", "sum_value",
    }


def test_oracle_keys_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # every non-oracle query is an intentionally rows-only op
    rows_only = set(qs) - set(os_)
    assert rows_only <= {
        "ann_lsh_topk", "ann_ivf_topk", "minhash_pairs", "dedup_apply_docs", "simhash_docs",
        "lang_id_docs", "fingerprint_docs", "multimodal_features",
    }


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_each_query_runs_at_smallest_sf(spark, name):
    df = entrymod.queries()[name](spark, SF)
    assert df.count() >= 0 and len(df.columns) > 0
