"""Incremental corpus-update loop: screen_incoming verdicts, the job's
idempotent replace-by-batch commit, and audit completeness. The screen's
value-level correctness is separately pinned by the `dedup_incremental`
DuckDB oracle; these tests cover the operator contract and the job."""

from pyspark.sql import functions as F

from high_performance_docling_spark.operators import dedup as DD
from jobs.incremental_update_job import run_incremental_update

SF = "/root/testdata/sf0.001"


def test_screen_incoming_flags_exact_duplicate(spark):
    existing = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "totally different words here")],
        ["doc_id", "text"],
    )
    incoming = spark.createDataFrame(
        [
            (10, "Alpha beta GAMMA delta  "),  # normalizes to doc 1: exact
            (11, "nothing like the corpus at all zz"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in DD.screen_incoming(existing, incoming).collect()}
    assert rows[10]["n_exact"] == 1 and rows[10]["keep"] == 0
    assert rows[10]["n_near"] >= 1  # hamming 0 counts as near too
    assert rows[11]["n_exact"] == 0


def test_screen_incoming_append_stable(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    a = sorted(map(tuple, DD.screen_incoming(existing, incoming).collect()))
    b = sorted(map(tuple, DD.screen_incoming(existing, incoming).collect()))
    assert a == b and len(a) == incoming.count()


def test_incremental_update_job_idempotent(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    corpus_path = str(tmp_path / "corpus")
    incoming_path = str(tmp_path / "incoming")
    docs.filter(F.col("doc_id") % 10 != 0).write.parquet(corpus_path)
    docs.filter(F.col("doc_id") % 10 == 0).write.parquet(incoming_path)
    out = str(tmp_path / "out")

    s1 = run_incremental_update(spark, corpus_path, incoming_path, out, "b1")
    kept1 = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/docs/batch=b1").collect()
    )
    audit1 = sorted(map(tuple, spark.read.parquet(f"{out}/audit/batch=b1").collect()))

    # re-run the SAME batch: partition replaced in place, identical output
    s2 = run_incremental_update(spark, corpus_path, incoming_path, out, "b1")
    kept2 = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/docs/batch=b1").collect()
    )
    audit2 = sorted(map(tuple, spark.read.parquet(f"{out}/audit/batch=b1").collect()))
    assert s1 == s2 and kept1 == kept2 and audit1 == audit2

    # stats are consistent: every incoming doc audited, kept+dropped=all
    assert s1["n_in"] == len(audit1)
    assert s1["n_kept"] == len(kept1)
    assert s1["n_kept"] + s1["n_exact_dropped"] + s1["n_near_dropped"] == s1["n_in"]

    # a second batch lands in its own partition, first batch untouched
    run_incremental_update(spark, corpus_path, incoming_path, out, "b2")
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/docs/batch=b1").collect()
    ) == kept1
