"""Registry consistency: every query callable is well-formed, every
oracle parses in DuckDB against the real table schemas, and the
rows-only set is exactly the documented pair of e2e extraction entries
(whose gate is the pytest span-equality suite, not SQL)."""

import duckdb

from high_performance_docling_spark.entry_queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ROWS_ONLY_ALLOWED = {"extract_spans_e2e", "extract_spans_ocr_e2e"}


def test_every_query_is_oracled_or_documented_rows_only():
    assert set(ORACLES) <= set(QUERIES)
    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == ROWS_ONLY_ALLOWED


def test_all_oracles_parse_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in ORACLES.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"oracle for {name!r} failed to plan: {e}")
