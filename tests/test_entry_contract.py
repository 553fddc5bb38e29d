"""Driver-contract guard: entry/queries/oracle_sql stay consistent, and a
sample of oracle queries stays value-hash-equal to DuckDB — so a regression
fails in pytest before the driver's CORRECTNESS gate sees it."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from scripts.check_correctness import TABLES, value_hash

SF_DIR = "/root/testdata/sf0.001"

SAMPLE = [
    "pipeline_metrics",
    "route_status_counts",
    "q1_pricing_summary",
    "docs_top_similar_pairs",
    "emb_cosine_topk",
    "docs_langid_confusion",
]


def test_contract_shape():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 30  # most queries carry a SQL oracle


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"sink", "status", "n"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SAMPLE)
def test_sampled_queries_match_oracle(spark, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(oracles[name])
    d_rows = rel.fetchall()
    assert len(s_rows) == len(d_rows), name
    assert sorted(sdf.columns) == sorted(rel.columns), name
    assert value_hash(sdf.columns, s_rows) == value_hash(list(rel.columns), d_rows), name
