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
        # incompatible type change on append still rejects
        with pytest.raises(ValueError, match="not a safe promotion"):
            write_iceberg(
                spark, spark.range(2).withColumn("v", F.lit(1)), t
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

    def test_append_schema_evolution(self, spark, tmp_path):
        """Round 12: appends with ADDED columns evolve the schema —
        new fields get fresh ids above last-column-id, old files read
        null for them; int→long widens in place."""
        t = str(tmp_path / "t")
        write_iceberg(
            spark,
            spark.createDataFrame([(1, "a")], "id int, v string"),
            t,
        )
        # append with an added column AND id widened int→long
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(2, "b", 9.5)], "id long, v string, score double"
            ),
            t,
        )
        out = read_iceberg(spark, t)
        got = {(r.id, r.v, r.score) for r in out.collect()}
        assert got == {(1, "a", None), (2, "b", 9.5)}
        md = json.loads(
            (tmp_path / "t" / "metadata" / "v2.metadata.json").read_text()
        )
        cur = next(
            s
            for s in md["schemas"]
            if s["schema-id"] == md["current-schema-id"]
        )
        by_name = {f["name"]: f for f in cur["fields"]}
        # existing columns keep their ids; the new column's id is fresh
        assert by_name["id"]["id"] == 1 and by_name["id"]["type"] == "long"
        assert by_name["v"]["id"] == 2
        assert by_name["score"]["id"] == 3
        assert md["last-column-id"] == 3
        assert len(md["schemas"]) == 2
        # a subset append (missing column) reuses the evolved schema
        write_iceberg(
            spark,
            spark.createDataFrame([(3, "c")], "id long, v string"),
            t,
        )
        md = json.loads(
            (tmp_path / "t" / "metadata" / "v3.metadata.json").read_text()
        )
        assert len(md["schemas"]) == 2  # no new schema registered
        got = {
            (r.id, r.v, r.score) for r in read_iceberg(spark, t).collect()
        }
        assert got == {(1, "a", None), (2, "b", 9.5), (3, "c", None)}
        # a NARROWER batch (int under the evolved long column) is the
        # spec's own evolved-table state — accepted, column keeps long
        write_iceberg(
            spark,
            spark.createDataFrame([(4, "d")], "id int, v string"),
            t,
        )
        md = json.loads(
            (tmp_path / "t" / "metadata" / "v4.metadata.json").read_text()
        )
        assert len(md["schemas"]) == 2  # still no new schema
        out = read_iceberg(spark, t)
        assert out.schema["id"].dataType.simpleString() == "bigint"
        assert {r.id for r in out.collect()} == {1, 2, 3, 4}

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


class TestPartitionedWrites:
    """Round 12: identity partition specs — hive-style data layout,
    populated manifest partition structs, spec inheritance on append,
    metadata-level partition pruning."""

    def test_partitioned_round_trip_and_layout(self, spark, tmp_path):
        import glob

        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(0, 1, "a"), (1, 1, "b"), (2, 2, "c")], "id long, p int, v string"
        )
        rep = write_iceberg(spark, df, t, partition_by=["p"])
        assert rep["files_added"] >= 2
        got = {(r.id, r.p, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(0, 1, "a"), (1, 1, "b"), (2, 2, "c")}
        # hive-style layout, and data files still CONTAIN the column
        p1 = glob.glob(str(tmp_path / "t" / "data" / "p=1" / "*.parquet"))
        p2 = glob.glob(str(tmp_path / "t" / "data" / "p=2" / "*.parquet"))
        assert p1 and p2
        back = spark.read.parquet(*p1)
        assert "p" in back.columns and {r.p for r in back.collect()} == {1}
        # spec registered in metadata
        md = json.loads(
            (tmp_path / "t" / "metadata" / "v1.metadata.json").read_text()
        )
        spec = md["partition-specs"][md["default-spec-id"]]
        assert [f["name"] for f in spec["fields"]] == ["p"]
        assert [f["transform"] for f in spec["fields"]] == ["identity"]
        assert spec["fields"][0]["field-id"] == 1000
        assert md["last-partition-id"] == 1000

    def test_append_inherits_spec_and_mismatch_rejects(
        self, spark, tmp_path
    ):
        import glob

        t = str(tmp_path / "t")
        df = spark.createDataFrame([(0, 1, "a")], "id long, p int, v string")
        write_iceberg(spark, df, t, partition_by=["p"])
        # append WITHOUT partition_by inherits the table spec
        write_iceberg(
            spark,
            spark.createDataFrame([(9, 3, "z")], "id long, p int, v string"),
        t)
        assert glob.glob(str(tmp_path / "t" / "data" / "p=3" / "*.parquet"))
        assert read_iceberg(spark, t).count() == 2
        with pytest.raises(ValueError, match="partition"):
            write_iceberg(
                spark,
                spark.createDataFrame(
                    [(1, 1, "b")], "id long, p int, v string"
                ),
                t,
                partition_by=["v"],
            )
        with pytest.raises(ValueError, match="not in the frame"):
            write_iceberg(
                spark,
                spark.createDataFrame(
                    [(1, 1, "b")], "id long, p int, v string"
                ),
                str(tmp_path / "t2"),
                partition_by=["nope"],
            )

    def test_partition_pruned_read(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i % 3, f"v{i}") for i in range(9)],
            "id long, p int, v string",
        )
        write_iceberg(spark, df, t, partition_by=["p"])
        snap = iceberg_snapshot(spark, t)
        all_files = snap["files"]
        pof = snap["partition_of"]
        assert all(pof[f].keys() == {"p"} for f in all_files)
        pruned = read_iceberg(spark, t, partition_filter={"p": 1})
        got = {(r.id, r.p) for r in pruned.collect()}
        assert got == {(1, 1), (4, 1), (7, 1)}
        # metadata-level pruning: the scan touches ONLY p=1 files
        scanned = {f for f in pruned.inputFiles()}
        assert scanned and all("p=1" in f for f in scanned)
        assert len(scanned) < len(all_files)

    def test_overwrite_can_change_partitioning(self, spark, tmp_path):
        import glob

        t = str(tmp_path / "t")
        write_iceberg(
            spark,
            spark.createDataFrame([(0, 1, "a")], "id long, p int, v string"),
            t,
            partition_by=["p"],
        )
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(5, 7, "q")], "id long, p int, v string"
            ),
            t,
            mode="overwrite",
            partition_by=["v"],
        )
        assert glob.glob(str(tmp_path / "t" / "data" / "v=q" / "*.parquet"))
        md_files = sorted(
            glob.glob(str(tmp_path / "t" / "metadata" / "v*.metadata.json"))
        )
        md = json.loads(open(md_files[-1]).read())
        specs = {s["spec-id"] for s in md["partition-specs"]}
        assert len(specs) == 2 and md["default-spec-id"] == max(specs)
        got = {(r.id, r.p, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(5, 7, "q")}

    def test_compaction_preserves_partitioning(self, spark, tmp_path):
        import glob

        from harness_aws_etl_pipeline_spark.sinks.compact import (
            iceberg_compact,
        )

        t = str(tmp_path / "t")
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(0, 1, "a"), (1, 2, "b")], "id long, p int, v string"
            ),
            t,
            partition_by=["p"],
        )
        write_iceberg(
            spark,
            spark.createDataFrame([(2, 1, "c")], "id long, p int, v string"),
            t,
        )
        iceberg_compact(spark, t)
        got = {(r.id, r.p, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(0, 1, "a"), (1, 2, "b"), (2, 1, "c")}
        # compacted files still live in hive dirs (spec inherited)
        assert glob.glob(str(tmp_path / "t" / "data" / "p=1" / "*.parquet"))

    def test_null_and_string_partition_values(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(0, None, "a"), (1, "us", "b")], "id long, region string, v string"
        )
        write_iceberg(spark, df, t, partition_by=["region"])
        got = {(r.id, r.region) for r in read_iceberg(spark, t).collect()}
        assert got == {(0, None), (1, "us")}
        snap = iceberg_snapshot(spark, t)
        vals = {tuple(v.items()) for v in snap["partition_of"].values()}
        assert (("region", None),) in vals and (("region", "us"),) in vals
        got = {
            r.id
            for r in read_iceberg(
                spark, t, partition_filter={"region": "us"}
            ).collect()
        }
        assert got == {1}


class TestCliWrite:
    def test_cli_partitioned_write(self, spark, tmp_path, capsys):
        import glob

        from harness_aws_etl_pipeline_spark.cli import main

        src = tmp_path / "src"
        spark.createDataFrame(
            [(0, 1, "a"), (1, 2, "b")], "id long, p int, v string"
        ).write.parquet(str(src))
        t = tmp_path / "t"
        rc = main([
            "iceberg", "--path", str(t), "--write", str(src),
            "--partition-by", "p",
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "iceberg_write" and rep["files_added"] >= 2
        assert glob.glob(str(t / "data" / "p=1" / "*.parquet"))
        assert read_iceberg(spark, str(t)).count() == 2


class TestPartitionedDmlComposition:
    def test_delete_where_on_partitioned_table(self, spark, tmp_path):
        """The pruned read must stay CORRECT after a delete (r13:
        delete entries now carry real partition values too — see
        tests/test_icebergdml.py::TestPartitionedDml)."""
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_delete_where,
        )

        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i % 2, f"v{i}") for i in range(8)],
            "id long, p int, v string",
        )
        write_iceberg(spark, df, t, partition_by=["p"])
        rep = iceberg_delete_where(spark, t, "id < 2")
        assert rep["rows_deleted"] == 2
        got = {(r.id, r.p) for r in read_iceberg(spark, t).collect()}
        assert got == {(i, i % 2) for i in range(2, 8)}
        pruned = {
            (r.id, r.p)
            for r in read_iceberg(
                spark, t, partition_filter={"p": 0}
            ).collect()
        }
        assert pruned == {(2, 0), (4, 0), (6, 0)}


class TestHiddenTransforms:
    """Round 12: hidden partition transforms — day/month/year/hour,
    spec-exact murmur3 bucket, truncate — write layout, manifest
    values, spec JSON, inheritance, and transform-aware pruning."""

    def test_murmur3_and_bucket_spec_vectors(self):
        """The spec's published test vectors (iceberg.apache.org/spec
        Appendix B)."""
        import datetime
        import struct

        from harness_aws_etl_pipeline_spark.sources.icebergpart import (
            bucket_value,
            murmur3_32,
        )

        def signed(u):
            return u - (1 << 32) if u >= (1 << 31) else u

        assert signed(murmur3_32(struct.pack("<q", 34))) == 2017239379
        assert signed(murmur3_32(b"iceberg")) == 1210000089
        days = (
            datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)
        ).days
        assert signed(murmur3_32(struct.pack("<q", days))) == -653330422
        assert bucket_value(34, 16, "long") == 2017239379 % 16
        assert bucket_value("iceberg", 16, "string") == 1210000089 % 16
        assert (
            bucket_value(datetime.date(2017, 11, 16), 8, "date")
            == ((-653330422) & 0x7FFFFFFF) % 8
        )

    def test_day_and_bucket_write_read_prune(self, spark, tmp_path):
        import datetime
        import glob

        from harness_aws_etl_pipeline_spark.sources.icebergpart import (
            bucket_value,
        )

        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [
                (i, datetime.date(2024, 1, 1 + (i % 2)), f"v{i}")
                for i in range(8)
            ],
            "id long, d date, v string",
        )
        rep = write_iceberg(
            spark, df, t, partition_by=["days(d)", "bucket(4, id)"]
        )
        assert rep["files_added"] >= 2
        # layout dirs carry the TRANSFORMED values
        day0 = (
            datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)
        ).days
        assert glob.glob(
            str(tmp_path / "t" / "data" / f"d_day={day0}" / "*" / "*.parquet")
        )
        # spec JSON records the transforms
        md = json.loads(
            (tmp_path / "t" / "metadata" / "v1.metadata.json").read_text()
        )
        spec = md["partition-specs"][md["default-spec-id"]]
        assert [(f["name"], f["transform"]) for f in spec["fields"]] == [
            ("d_day", "day"), ("id_bucket", "bucket[4]"),
        ]
        # full read round-trips
        got = {(r.id, r.d, r.v) for r in read_iceberg(spark, t).collect()}
        assert len(got) == 8
        # day pruning: exact rows, only d_day=day0 files scanned
        pruned = read_iceberg(spark, t, partition_filter={"d_day": day0})
        assert {r.d for r in pruned.collect()} == {datetime.date(2024, 1, 1)}
        assert all(f"d_day={day0}" in f for f in pruned.inputFiles())
        # bucket pruning: exact rows for one bucket
        b = bucket_value(3, 4, "long")
        got = {
            r.id
            for r in read_iceberg(
                spark, t, partition_filter={"id_bucket": b}
            ).collect()
        }
        assert 3 in got
        assert got == {
            i for i in range(8) if bucket_value(i, 4, "long") == b
        }
        # append WITHOUT partition_by inherits the transform spec
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(100, datetime.date(2024, 1, 1), "x")],
                "id long, d date, v string",
            ),
            t,
        )
        assert read_iceberg(spark, t).count() == 9
        # manifest partition values match the driver-side twin
        snap = iceberg_snapshot(spark, t)
        for f, pv in snap["partition_of"].items():
            assert set(pv) == {"d_day", "id_bucket"}

    def test_truncate_and_month_year_hour(self, spark, tmp_path):
        import datetime

        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [
                (17, "alphabet", datetime.datetime(2023, 3, 5, 22, 30)),
                (-3, "beta", datetime.datetime(2024, 7, 1, 1, 10)),
            ],
            "n long, s string, ts timestamp",
        )
        write_iceberg(
            spark, df, t,
            partition_by=[
                "truncate(10, n)", "truncate(4, s)",
                "months(ts)", "years(ts)", "hours(ts)",
            ],
        )
        snap = iceberg_snapshot(spark, t)
        vals = sorted(
            tuple(sorted(pv.items()))
            for pv in snap["partition_of"].values()
        )
        # spec semantics: truncate floors toward -inf; month/year are
        # offsets from 1970; hour = epoch_seconds // 3600
        h1 = int(
            datetime.datetime(
                2023, 3, 5, 22, 30, tzinfo=datetime.timezone.utc
            ).timestamp() // 3600
        )
        h2 = int(
            datetime.datetime(
                2024, 7, 1, 1, 10, tzinfo=datetime.timezone.utc
            ).timestamp() // 3600
        )
        expect = sorted([
            tuple(sorted({
                "n_trunc": 10, "s_trunc": "alph",
                "ts_month": (2023 - 1970) * 12 + 2, "ts_year": 53,
                "ts_hour": h1,
            }.items())),
            tuple(sorted({
                "n_trunc": -10, "s_trunc": "beta",
                "ts_month": (2024 - 1970) * 12 + 6, "ts_year": 54,
                "ts_hour": h2,
            }.items())),
        ])
        assert vals == expect
        got = {(r.n, r.s) for r in read_iceberg(spark, t).collect()}
        assert got == {(17, "alphabet"), (-3, "beta")}
        # month pruning returns exactly the 2023 row
        got = {
            r.n
            for r in read_iceberg(
                spark, t,
                partition_filter={"ts_month": (2023 - 1970) * 12 + 2},
            ).collect()
        }
        assert got == {17}

    def test_transform_guards(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        with pytest.raises(ValueError, match="needs a date/timestamp"):
            write_iceberg(spark, df, t, partition_by=["days(id)"])
        with pytest.raises(ValueError, match="unparseable"):
            write_iceberg(spark, df, t, partition_by=["bucket(id)"])
        write_iceberg(spark, df, t, partition_by=["bucket(4, id)"])
        # append with a DIFFERENT transform of the same column rejects
        with pytest.raises(ValueError, match="differs"):
            write_iceberg(
                spark,
                spark.createDataFrame([(2, "b")], "id long, v string"),
                t,
                partition_by=["bucket(8, id)"],
            )
        # unknown filter key rejects
        with pytest.raises(ValueError, match="neither"):
            read_iceberg(spark, t, partition_filter={"nope": 1}).collect()


class TestTimeTransformTimezone:
    """Spec: all timestamp time transforms are defined over UTC epoch
    micros — results must not depend on spark.sql.session.timeZone,
    and days(ts) must always equal hours(ts) // 24."""

    def test_utc_consistent_under_non_utc_session_tz(self, spark):
        import datetime

        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.sources.icebergpart import (
            parse_transform,
            transform_column,
        )

        # 2024-01-01T02:30Z — in America/Los_Angeles this is still
        # 2023-12-31 local, so session-tz field extraction would give
        # the wrong year/month/day.
        inst = datetime.datetime(
            2024, 1, 1, 2, 30, tzinfo=datetime.timezone.utc
        )
        epoch_s = int(inst.timestamp())
        prev = spark.conf.get("spark.sql.session.timeZone")
        results = {}
        try:
            for zone in ("UTC", "America/Los_Angeles", "Asia/Tokyo"):
                spark.conf.set("spark.sql.session.timeZone", zone)
                df = spark.createDataFrame(
                    [(inst,)], "ts timestamp"
                ).select(
                    *[
                        transform_column(
                            parse_transform(f"{k}(ts)"), "timestamp"
                        ).alias(k)
                        for k in ("years", "months", "days", "hours")
                    ]
                )
                row = df.collect()[0]
                results[zone] = (row.years, row.months, row.days, row.hours)
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)
        expect = (
            2024 - 1970,
            (2024 - 1970) * 12 + 0,
            epoch_s // 86400,
            epoch_s // 3600,
        )
        for zone, got in results.items():
            assert got == expect, (zone, got, expect)
            assert got[3] // 24 == got[2], (zone, got)

    def test_hours_on_timestamp_ntz(self, spark):
        import datetime

        from harness_aws_etl_pipeline_spark.sources.icebergpart import (
            parse_transform,
            transform_column,
        )

        # ntz transforms use the STORED local value (no tz) — hour of
        # 1970-01-02T03:00 local is 27 regardless of session tz.
        prev = spark.conf.get("spark.sql.session.timeZone")
        try:
            for zone in ("UTC", "America/Los_Angeles"):
                spark.conf.set("spark.sql.session.timeZone", zone)
                df = spark.createDataFrame(
                    [(datetime.datetime(1970, 1, 2, 3, 0),)],
                    "ts timestamp_ntz",
                ).select(
                    transform_column(
                        parse_transform("hours(ts)"), "timestamp_ntz"
                    ).alias("h"),
                    transform_column(
                        parse_transform("days(ts)"), "timestamp_ntz"
                    ).alias("d"),
                )
                row = df.collect()[0]
                assert (row.h, row.d) == (27, 1), zone
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)

    def test_pre_epoch_timestamp_floors(self, spark):
        import datetime

        from harness_aws_etl_pipeline_spark.sources.icebergpart import (
            parse_transform,
            transform_column,
        )

        inst = datetime.datetime(
            1969, 12, 31, 23, 0, tzinfo=datetime.timezone.utc
        )
        row = (
            spark.createDataFrame([(inst,)], "ts timestamp")
            .select(
                *[
                    transform_column(
                        parse_transform(f"{k}(ts)"), "timestamp"
                    ).alias(k)
                    for k in ("years", "months", "days", "hours")
                ]
            )
            .collect()[0]
        )
        assert (row.years, row.months, row.days, row.hours) == (
            -1,
            -1,
            -1,
            -1,
        )

    def test_bucket_vectorized_matches_scalar(self, spark):
        import datetime
        import struct

        import numpy as np

        from harness_aws_etl_pipeline_spark.sources.icebergpart import (
            bucket_value,
            murmur3_32,
            murmur3_32_i64_batch,
            parse_transform,
            transform_column,
        )

        rng = np.random.default_rng(11)
        vals = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
        batch = murmur3_32_i64_batch(vals)
        assert list(batch) == [
            murmur3_32(struct.pack("<q", int(v))) for v in vals
        ]
        # end-to-end through the staging UDF, nulls included
        df = spark.createDataFrame(
            [(int(v),) for v in vals[:50]] + [(None,)], "id long"
        ).select(
            "id",
            transform_column(
                parse_transform("bucket(16, id)"), "long"
            ).alias("b"),
        )
        for r in df.collect():
            assert r.b == (
                None if r.id is None else bucket_value(r.id, 16, "long")
            )
        # date path through the vectorized UDF
        dd = spark.createDataFrame(
            [(datetime.date(2017, 11, 16),), (None,)], "d date"
        ).select(
            "d",
            transform_column(
                parse_transform("bucket(8, d)"), "date"
            ).alias("b"),
        )
        got = {str(r.d): r.b for r in dd.collect()}
        assert got["2017-11-16"] == ((-653330422) & 0x7FFFFFFF) % 8
        assert got["None"] is None


class TestSpecFieldIdUniqueness:
    def test_overwrite_new_spec_allocates_fresh_field_ids(
        self, spark, tmp_path
    ):
        """Iceberg v2: partition field ids are unique across ALL
        specs — an overwrite that changes partitioning must not reuse
        spec 0's ids for different transforms; identical fields DO
        keep their id."""
        import json

        t = tmp_path / "t"
        df = spark.createDataFrame(
            [(i, i % 2, f"v{i}") for i in range(4)],
            "id long, p int, v string",
        )
        write_iceberg(spark, df, str(t), partition_by=["p"])
        write_iceberg(
            spark, df, str(t), mode="overwrite",
            partition_by=["bucket(4, id)", "p"],
        )
        mds = sorted((t / "metadata").glob("v*.metadata.json"))
        md = json.loads(mds[-1].read_text())
        specs = {s["spec-id"]: s for s in md["partition-specs"]}
        assert set(specs) == {0, 1}
        ids0 = {
            (f["name"], f["transform"], f["source-id"]): f["field-id"]
            for f in specs[0]["fields"]
        }
        ids1 = {
            (f["name"], f["transform"], f["source-id"]): f["field-id"]
            for f in specs[1]["fields"]
        }
        # the identical field ("p", identity) keeps its id
        same = next(k for k in ids0 if k in ids1)
        assert ids0[same] == ids1[same]
        # the new bucket field gets an id no other spec ever used
        new_ids = {v for k, v in ids1.items() if k not in ids0}
        assert new_ids and new_ids.isdisjoint(set(ids0.values()))
        assert md["last-partition-id"] == max(
            set(ids0.values()) | set(ids1.values())
        )
        # round-trip still reads
        assert read_iceberg(spark, str(t)).count() == 4
