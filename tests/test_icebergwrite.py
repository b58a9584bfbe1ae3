"""Native Iceberg writer (sinks/icebergwrite.py): append/overwrite
round trips through the in-repo reader, manifest carry-forward,
schema guards, CAS commit race."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.icebergwrite import write_iceberg
from harness_aws_etl_pipeline_spark.sources.icebergread import (
    iceberg_snapshot,
    iceberg_snapshots,
    read_iceberg,
)


class TestRoundTrip:
    def test_append_overwrite_time_travel(self, spark, tmp_path):
        t = str(tmp_path / "t")
        rep0 = write_iceberg(
            spark, spark.range(4).withColumn("v", F.lit("a")), t
        )
        assert rep0["metadata_version"] == 1 and rep0["files_added"] >= 1
        rep1 = write_iceberg(
            spark, spark.range(4, 6).withColumn("v", F.lit("b")), t
        )
        assert rep1["metadata_version"] == 2
        got = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {
            (0, "a"), (1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")
        }
        # time travel to the first snapshot
        first = iceberg_snapshots(spark, t)[0]["snapshot_id"]
        assert read_iceberg(spark, t, snapshot_id=first).count() == 4
        # overwrite drops history's live set
        write_iceberg(
            spark,
            spark.range(9, 11).withColumn("v", F.lit("c")),
            t,
            mode="overwrite",
        )
        got = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(9, "c"), (10, "c")}
        ops = [s["operation"] for s in iceberg_snapshots(spark, t)]
        assert ops == ["append", "append", "overwrite"]

    def test_record_counts_in_manifest(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(7).withColumn("v", F.lit("x")), t)
        from harness_aws_etl_pipeline_spark.sources.avroread import (
            _iter_container,
        )

        snap = iceberg_snapshot(spark, str(t))
        md = json.loads(
            (tmp_path / "t" / "metadata" / "v1.metadata.json").read_text()
        )
        mlist = (
            tmp_path / "t" / md["snapshots"][0]["manifest-list"]
        ).read_bytes()
        _s, _n, recs = _iter_container(mlist)
        (man,) = list(recs)
        assert man["added_rows_count"] == 7
        _s, _n, entries = _iter_container(
            (tmp_path / "t" / man["manifest_path"]).read_bytes()
        )
        entries = list(entries)
        assert sum(e["data_file"]["record_count"] for e in entries) == 7
        # spec-required fields external clients expect: partition is
        # an (empty) struct even unpartitioned; paths are full
        # location-based, not relative
        for e in entries:
            assert e["data_file"]["partition"] == {}
            assert e["data_file"]["file_path"].startswith(t)
        assert man["manifest_path"].startswith(t)
        assert md["snapshots"][0]["manifest-list"].startswith(t)
        assert snap["files"]

    def test_schema_guard_and_overwrite_evolution(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(2).withColumn("v", F.lit("a")), t)
        with pytest.raises(ValueError, match="schema differs"):
            write_iceberg(
                spark, spark.range(2).withColumn("w", F.lit(1)), t
            )
        write_iceberg(
            spark,
            spark.range(3).withColumn("w", F.lit(5)),
            t,
            mode="overwrite",
        )
        out = read_iceberg(spark, t)
        assert set(out.columns) == {"id", "w"} and out.count() == 3
        md = json.loads(
            (tmp_path / "t" / "metadata" / "v2.metadata.json").read_text()
        )
        assert len(md["schemas"]) == 2  # old + evolved, both registered

    def test_commit_race_bumps_version(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(1).withColumn("v", F.lit("a")), t)
        # plant a foreign v2 metadata: the writer must land at v3
        md = json.loads(
            (tmp_path / "t" / "metadata" / "v1.metadata.json").read_text()
        )
        (tmp_path / "t" / "metadata" / "v2.metadata.json").write_text(
            json.dumps(md)
        )
        rep = write_iceberg(
            spark, spark.range(1, 3).withColumn("v", F.lit("b")), t
        )
        assert rep["metadata_version"] == 3
        assert read_iceberg(spark, t).count() == 3

    def test_concurrent_appenders_both_land(self, spark, tmp_path):
        import threading

        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(0).withColumn("v", F.lit("")), t)
        errs: list[Exception] = []

        def go(lo: int):
            try:
                write_iceberg(
                    spark,
                    spark.range(lo, lo + 2).withColumn("v", F.lit(str(lo))),
                    t,
                )
            except Exception as e:  # noqa: BLE001 - surfaced below
                errs.append(e)

        th = [threading.Thread(target=go, args=(lo,)) for lo in (10, 20)]
        for x in th:
            x.start()
        for x in th:
            x.join()
        assert not errs
        assert {r.id for r in read_iceberg(spark, t).collect()} == {
            10, 11, 20, 21
        }

    def test_bad_mode(self, spark, tmp_path):
        with pytest.raises(ValueError, match="mode"):
            write_iceberg(
                spark, spark.range(1), str(tmp_path / "t"), mode="merge"
            )
