"""SCD2 interval-build invariants (scd2_user_status): intervals tile
each user's timeline with no gaps/overlaps, exactly one current row
per user, and adjacent islands always change status. Value-exactness
vs DuckDB is scripts/verify_queries.py's job."""

from __future__ import annotations

from high_performance_docling_spark.entry_queries import QUERIES

SF = "/root/testdata/sf0.001"
EOT = 9999999999.0


def test_scd2_intervals_tile_and_alternate(spark):
    rows = QUERIES["scd2_user_status"](spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, seq_rows in by_user.items():
        seq_rows.sort(key=lambda r: r["seq"])
        # seq is dense from 1
        assert [r["seq"] for r in seq_rows] == list(
            range(1, len(seq_rows) + 1)
        )
        # exactly one current row, and it is the last one
        currents = [r for r in seq_rows if r["is_current"] == 1]
        assert len(currents) == 1 and currents[0] is seq_rows[-1]
        assert seq_rows[-1]["valid_to"] == EOT
        for prev, nxt in zip(seq_rows, seq_rows[1:]):
            # no gaps/overlaps: valid_to == successor's valid_from
            assert prev["valid_to"] == nxt["valid_from"]
            # an island boundary always changes status
            assert prev["status"] != nxt["status"]
            assert prev["is_current"] == 0
        # event counts are positive and intervals are ordered
        assert all(r["n_events"] >= 1 for r in seq_rows)
        assert all(
            r["valid_from"] < r["valid_to"] for r in seq_rows
        )
