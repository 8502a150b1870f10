"""Persisted inverted index (operators/index.py): index-backed BM25
must equal the direct-scan q_bm25, and term lookups must actually push
the token filter into the postings scan."""

from __future__ import annotations

import pytest

from assignment_2_dataengineering_spark.operators.index import (
    bm25_from_index,
    build_inverted_index,
)
from assignment_2_dataengineering_spark.plans.registry import get_spec
from assignment_2_dataengineering_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("inv_index"))
    build_inverted_index(load_table(spark, sf_dir, "documents"), p)
    return p


def test_index_bm25_equals_direct(spark, sf_dir, index_path):
    """Same terms, same k: the index path must reproduce q_bm25's
    result rows exactly (scoring discipline is shared by design)."""
    direct = get_spec("q_bm25").fn(spark, sf_dir).collect()
    indexed = bm25_from_index(
        spark, index_path, ("spark", "window", "join"), k=20
    ).collect()
    assert [tuple(r) for r in indexed] == [tuple(r) for r in direct]
    assert len(indexed) == 20


def test_term_filter_pushes_into_postings_scan(spark, index_path):
    df = bm25_from_index(spark, index_path, ("spark", "window", "join"), k=5)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "PushedFilters" in plan and "In(token" in plan, plan


def test_index_tables_shape(spark, index_path):
    postings = spark.read.parquet(index_path + "/postings")
    docs = spark.read.parquet(index_path + "/docs")
    stats = spark.read.parquet(index_path + "/stats").collect()
    assert postings.columns == ["token", "doc_id", "tf"]
    assert docs.count() == 500 or docs.count() > 0
    assert len(stats) == 1 and stats[0].n_docs == docs.count()
