"""Native Delta writer (sinks/deltawrite.py): append/overwrite round
trips through the in-repo reader, hive partition layout, schema
guards, and the put-if-absent commit race."""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.deltawrite import write_delta
from harness_aws_etl_pipeline_spark.sources.deltaread import (
    delta_history,
    delta_snapshot,
    read_delta,
)


class TestRoundTrip:
    def test_append_overwrite_and_time_travel(self, spark, tmp_path):
        t = str(tmp_path / "t")
        rep = write_delta(
            spark, spark.range(4).withColumn("v", F.lit("a")), t
        )
        assert rep["version"] == 0 and rep["files_removed"] == 0
        rep = write_delta(
            spark, spark.range(4, 6).withColumn("v", F.lit("b")), t
        )
        assert rep["version"] == 1
        assert {
            (r.id, r.v) for r in read_delta(spark, t).collect()
        } == {(0, "a"), (1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")}
        assert read_delta(spark, t, version=0).count() == 4
        rep = write_delta(
            spark,
            spark.range(9, 10).withColumn("v", F.lit("c")),
            t,
            mode="overwrite",
        )
        assert rep["files_removed"] > 0
        assert {
            (r.id, r.v) for r in read_delta(spark, t).collect()
        } == {(9, "c")}
        ops = [h["operation"] for h in delta_history(spark, t)]
        assert ops == ["WRITE", "WRITE", "WRITE"]
        # the log is readable json-per-line (foreign-client shape)
        for p in glob.glob(str(tmp_path / "t" / "_delta_log" / "*.json")):
            for line in open(p):
                json.loads(line)

    def test_partitioned_layout(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, "x", 10), (2, "y", 10), (3, "z", 20)],
            "id long, v string, g int",
        )
        write_delta(spark, df, t, partition_by=["g"])
        snap = delta_snapshot(spark, t)
        assert snap["partition_columns"] == ["g"]
        # hive dirs on disk, partition values in the log, column typed
        assert glob.glob(str(tmp_path / "t" / "g=10" / "*.parquet"))
        pvs = {
            a["partitionValues"]["g"] for a in snap["files"].values()
        }
        assert pvs == {"10", "20"}
        out = read_delta(spark, t)
        assert dict(out.dtypes)["g"] == "int"
        assert out.filter(F.col("g") == 10).count() == 2
        assert {(r.id, r.g) for r in out.collect()} == {
            (1, 10), (2, 10), (3, 20)
        }
        # appends must repeat the partition spec
        with pytest.raises(ValueError, match="partitioned by"):
            write_delta(spark, df, t)

    def test_schema_guards(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_delta(spark, spark.range(2).withColumn("v", F.lit("a")), t)
        with pytest.raises(ValueError, match="schema differs"):
            write_delta(
                spark, spark.range(2).withColumn("w", F.lit(1)), t
            )
        # overwrite may change the schema; the new metaData wins
        write_delta(
            spark,
            spark.range(3).withColumn("w", F.lit(7)),
            t,
            mode="overwrite",
        )
        out = read_delta(spark, t)
        assert set(out.columns) == {"id", "w"}
        assert out.count() == 3

    def test_bad_mode_and_missing_partition_col(self, spark, tmp_path):
        with pytest.raises(ValueError, match="mode"):
            write_delta(spark, spark.range(1), str(tmp_path / "t"), mode="merge")
        with pytest.raises(ValueError, match="not in DataFrame"):
            write_delta(
                spark, spark.range(1), str(tmp_path / "t"),
                partition_by=["nope"],
            )


class TestStatsAndZorder:
    def test_per_file_stats_recorded(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(100).withColumn("v", F.col("id") * 2).repartition(4)
        write_delta(spark, df, t)
        snap = delta_snapshot(spark, t)
        total = 0
        for add in snap["files"].values():
            st = json.loads(add["stats"])
            total += st["numRecords"]
            assert st["minValues"]["id"] <= st["maxValues"]["id"]
            assert st["nullCount"]["id"] == 0
            assert st["minValues"]["v"] == st["minValues"]["id"] * 2
        assert total == 100
        # stats=False omits them
        t2 = str(tmp_path / "t2")
        write_delta(spark, spark.range(3), t2, stats=False)
        snap2 = delta_snapshot(spark, t2)
        assert all("stats" not in a for a in snap2["files"].values())

    def test_stats_utc_timestamps_and_exact_decimals(
        self, spark, tmp_path
    ):
        """Timestamp stats must be UTC-normalized Z-format regardless
        of the session zone, and decimal stats exact JSON numbers —
        external engines data-skip on these."""
        t = str(tmp_path / "t")
        df = spark.sql(
            "SELECT TIMESTAMP'2021-01-01 00:00:00' AS ts,"
            " CAST('12345678901234567.89' AS DECIMAL(19,2)) AS d"
        )
        tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            write_delta(spark, df, t)
        finally:
            spark.conf.set("spark.sql.session.timeZone", tz)
        snap = delta_snapshot(spark, t)
        (add,) = snap["files"].values()
        st = json.loads(add["stats"])
        # the literal parsed under the (UTC) test session → instant
        # 00:00Z; a naive session-zone isoformat under the NY write
        # session would have said 2020-12-31T19:00:00
        assert st["minValues"]["ts"] == "2021-01-01T00:00:00.000Z"
        assert st["maxValues"]["ts"].endswith("Z")
        # decimal survives exactly as a raw JSON number (a float cast
        # would have rounded the 19-digit value)
        assert "12345678901234567.89" in add["stats"]

    def test_zorder_tightens_per_file_ranges(self, spark, tmp_path):
        """Morton layout + per-file stats: the id range covered per
        file shrinks vs a hash-shuffled write — the data-skipping win
        any Delta client gets from the recorded minValues/maxValues."""
        import random

        rng = random.Random(7)
        rows = [(rng.randrange(10_000), rng.randrange(10_000))
                for _ in range(8_000)]
        df = spark.createDataFrame(rows, "x long, y long").repartition(8)

        def spread(table):
            snap = delta_snapshot(spark, table)
            spans = []
            for add in snap["files"].values():
                st = json.loads(add["stats"])
                spans.append(st["maxValues"]["x"] - st["minValues"]["x"])
            return sum(spans) / len(spans)

        t_plain = str(tmp_path / "plain")
        t_z = str(tmp_path / "zed")
        write_delta(spark, df, t_plain)
        write_delta(spark, df, t_z, zorder=["x", "y"], zorder_files=8)
        assert read_delta(spark, t_z).count() == 8_000
        # repartitionByRange SAMPLES to pick boundaries, so the layout
        # (and thus the spread ratio) varies slightly with the
        # session's partitioning environment — under shard co-tenancy
        # the ratio has landed at 0.61 (r12); 0.75 still asserts a
        # decisive tightening without flaking on sampling noise
        assert spread(t_z) < spread(t_plain) * 0.75

    def test_write_lake_dispatch(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.lakeread import (
            detect_lake_format,
            read_lake,
            write_lake,
        )

        d = str(tmp_path / "d")
        write_lake(spark, spark.range(5), d, format="delta")
        assert detect_lake_format(spark, d) == "delta"
        assert read_lake(spark, d).count() == 5
        i = str(tmp_path / "i")
        write_lake(spark, spark.range(4), i, format="iceberg")
        assert detect_lake_format(spark, i) == "iceberg"
        assert read_lake(spark, i).count() == 4
        with pytest.raises(ValueError, match="unknown lake write"):
            write_lake(spark, spark.range(1), d, format="orc")


class TestCheckpointing:
    def test_interval_checkpoint_preserves_fold_and_txns(
        self, spark, tmp_path
    ):
        """checkpoint_interval=5 → a checkpoint at v4; deleting every
        superseded JSON commit still folds the snapshot AND the txn
        ledger (idempotence state must survive checkpointing)."""
        import glob as _glob
        import os as _os

        t = str(tmp_path / "t")
        for i in range(6):
            write_delta(
                spark,
                spark.range(i * 10, i * 10 + 2).withColumn("v", F.lit(str(i))),
                t,
                txn=("app", i),
                checkpoint_interval=5,
            )
        log = tmp_path / "t" / "_delta_log"
        assert (log / f"{4:020d}.checkpoint.parquet").exists()
        assert json.loads((log / "_last_checkpoint").read_text())["version"] == 4
        for p in sorted(_glob.glob(str(log / "*.json")))[:5]:
            _os.unlink(p)  # commits 0..4 now live only in the checkpoint
        snap = delta_snapshot(spark, t)
        assert snap["version"] == 5
        assert snap["txns"] == {"app": 5}
        assert read_delta(spark, t).count() == 12
        # a replayed batch from BEFORE the checkpoint still skips
        rep = write_delta(
            spark, spark.range(99).withColumn("v", F.lit("x")), t,
            txn=("app", 2), checkpoint_interval=5,
        )
        assert rep["skipped"]
        assert read_delta(spark, t).count() == 12


class TestTxnIdempotence:
    def test_same_txn_skips(self, spark, tmp_path):
        t = str(tmp_path / "t")
        rep = write_delta(
            spark, spark.range(3).withColumn("v", F.lit("a")), t,
            txn=("appA", 0),
        )
        assert not rep.get("skipped")
        # replay of the SAME (app, version): recognized, no new rows
        rep = write_delta(
            spark, spark.range(3).withColumn("v", F.lit("a")), t,
            txn=("appA", 0),
        )
        assert rep["skipped"] and rep["files_added"] == 0
        assert read_delta(spark, t).count() == 3
        # next version lands; an older version replays as a skip too
        rep = write_delta(
            spark, spark.range(3, 5).withColumn("v", F.lit("b")), t,
            txn=("appA", 1),
        )
        assert not rep.get("skipped")
        rep = write_delta(
            spark, spark.range(99).withColumn("v", F.lit("x")), t,
            txn=("appA", 0),
        )
        assert rep["skipped"]
        assert read_delta(spark, t).count() == 5
        # a DIFFERENT app's version 0 is independent
        rep = write_delta(
            spark, spark.range(5, 6).withColumn("v", F.lit("c")), t,
            txn=("appB", 0),
        )
        assert not rep.get("skipped")
        assert read_delta(spark, t).count() == 6
        snap = delta_snapshot(spark, t)
        assert snap["txns"] == {"appA": 1, "appB": 0}

    def test_stream_to_delta_exactly_once(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            stream_to_delta,
        )

        src = tmp_path / "src"
        src.mkdir()
        spark.range(5).withColumn("v", F.lit("s")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / "b1"))
        stream = (
            spark.readStream.schema("id long, v string")
            .parquet(str(src / "*"))
        )
        t = str(tmp_path / "t")
        q = stream_to_delta(
            stream, t, "ingest", str(tmp_path / "ckpt")
        ).start()
        q.awaitTermination(120)
        assert read_delta(spark, t).count() == 5
        # drain again with a FRESH checkpoint (simulating a replay of
        # the same batches): the txn ledger skips them
        q = stream_to_delta(
            stream, t, "ingest", str(tmp_path / "ckpt2")
        ).start()
        q.awaitTermination(120)
        assert read_delta(spark, t).count() == 5


class TestCommitProtocol:
    def test_lost_race_retries_with_next_version(self, spark, tmp_path):
        """A competing commit appearing at the claimed version bumps
        this writer to the next number (the put-if-absent loop)."""
        t = str(tmp_path / "t")
        write_delta(spark, spark.range(2).withColumn("v", F.lit("a")), t)
        # plant a foreign commit at version 1 (what the writer would
        # claim next): a bare commitInfo is a valid, file-less commit
        log = tmp_path / "t" / "_delta_log"
        (log / f"{1:020d}.json").write_text(
            json.dumps({"commitInfo": {"timestamp": 1, "operation": "X"}})
            + "\n"
        )
        rep = write_delta(
            spark, spark.range(2, 4).withColumn("v", F.lit("b")), t
        )
        assert rep["version"] == 2
        assert read_delta(spark, t).count() == 4

    def test_concurrent_appenders_both_land(self, spark, tmp_path):
        import threading

        t = str(tmp_path / "t")
        write_delta(spark, spark.range(0).withColumn("v", F.lit("")), t)
        errs: list[Exception] = []
        reps: list[dict] = []

        def go(lo: int):
            try:
                reps.append(
                    write_delta(
                        spark,
                        spark.range(lo, lo + 3).withColumn(
                            "v", F.lit(str(lo))
                        ),
                        t,
                    )
                )
            except Exception as e:  # noqa: BLE001 - surfaced below
                errs.append(e)

        th = [threading.Thread(target=go, args=(lo,)) for lo in (10, 20)]
        for x in th:
            x.start()
        for x in th:
            x.join()
        assert not errs
        assert sorted(r["version"] for r in reps) == [1, 2]
        got = {r.id for r in read_delta(spark, t).collect()}
        assert got == {10, 11, 12, 20, 21, 22}


class TestMergeSchema:
    """merge_schema=True: append-time schema evolution (the Iceberg
    writer's sibling)."""

    def test_new_column_nullfill_and_upcast(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_delta(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
        )
        write_delta(
            spark,
            spark.createDataFrame(
                [(2, "b", 3.5)], "id long, v string, score double"
            ),
            t,
            merge_schema=True,
        )
        # batch missing table columns null-fills; int id upcasts
        write_delta(
            spark,
            spark.createDataFrame([(7,)], "id int"),
            t,
            merge_schema=True,
        )
        snap = delta_snapshot(spark, t)
        assert [
            (f.name, f.dataType.simpleString()) for f in snap["schema"].fields
        ] == [("id", "bigint"), ("v", "string"), ("score", "double")]
        assert snap["schema"]["score"].nullable
        assert sorted(
            tuple(r) for r in read_delta(spark, t).collect()
        ) == [(1, "a", None), (2, "b", 3.5), (7, None, None)]

    def test_conflict_and_plain_append_reject(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_delta(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
        )
        with pytest.raises(ValueError, match="type conflict"):
            write_delta(
                spark,
                spark.createDataFrame([("x", "a")], "id string, v string"),
                t,
                merge_schema=True,
            )
        with pytest.raises(ValueError, match="merge_schema"):
            write_delta(
                spark,
                spark.createDataFrame(
                    [(1, "a", 2)], "id long, v string, z long"
                ),
                t,
            )

    def test_streaming_sink_still_works(self, spark, tmp_path):
        # the default path is untouched: same-schema appends emit no
        # metaData action
        t = str(tmp_path / "t")
        write_delta(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
        )
        write_delta(
            spark, spark.createDataFrame([(2, "b")], "id long, v string"), t
        )
        import pathlib

        last = sorted(
            pathlib.Path(t, "_delta_log").glob("*.json")
        )[-1].read_text()
        assert '"metaData"' not in last


class TestColumnMappedAppend:
    """write_delta on column-mapped tables: staged files follow the
    physical layout so any mapped reader resolves them."""

    def _name_mapped_table(self, spark, tmp_path, partition=False):
        from tests.test_deltadml import TestColumnMappedDml

        return TestColumnMappedDml()._name_mapped_table(
            spark, tmp_path, partition=partition
        )

    def test_name_mapped_append_reads_back(self, spark, tmp_path):
        t = self._name_mapped_table(spark, tmp_path)
        write_delta(
            spark,
            spark.createDataFrame([(9, "nine")], "id long, v string"),
            t,
        )
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert (9, "nine") in got and len(got) == 7
        # the staged parquet carries PHYSICAL column names
        import pathlib

        new = [
            p
            for p in pathlib.Path(t).glob("*.parquet")
            if p.name != "f0.parquet"
        ]
        cols = spark.read.parquet(str(new[0])).columns
        assert set(cols) <= {"col-aa", "col-bb"}

    def test_name_mapped_partitioned_append(self, spark, tmp_path):
        t = self._name_mapped_table(spark, tmp_path, partition=True)
        write_delta(
            spark,
            spark.createDataFrame(
                [(10, "ten", 0)], "id long, v string, p int"
            ),
            t,
            partition_by=["p"],
        )
        got = {
            (r.id, r.v, r.p) for r in read_delta(spark, t).collect()
        }
        assert (10, "ten", 0) in got and len(got) == 7
        assert read_delta(spark, t).filter("p = 0").count() == 4

    def test_schema_change_rejects(self, spark, tmp_path):
        t = self._name_mapped_table(spark, tmp_path)
        with pytest.raises(ValueError, match="column-mapped"):
            write_delta(
                spark,
                spark.createDataFrame(
                    [(1, "a", 2)], "id long, v string, z long"
                ),
                t,
            )
        with pytest.raises(ValueError, match="column-mapped"):
            write_delta(
                spark,
                spark.createDataFrame(
                    [(1, "a", 2)], "id long, v string, z long"
                ),
                t,
                merge_schema=True,
            )

    def test_id_mapped_append_reads_back(self, spark, tmp_path):
        from tests.test_deltadml import TestColumnMappedDml

        t = TestColumnMappedDml()._id_mapped_table(spark, tmp_path)
        df = read_delta(spark, t)
        write_delta(
            spark,
            spark.createDataFrame([(99, "x99")], df.schema),
            t,
        )
        got = read_delta(spark, t)
        assert got.filter(got[got.columns[0]] == 99).count() == 1


    def test_merge_schema_on_partitioned_table(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.createDataFrame(
                [(1, "a", 0)], "id long, v string, p int"
            ),
            t,
            partition_by=["p"],
        )
        write_delta(
            spark,
            spark.createDataFrame(
                [(2, "b", 1, 9.5)], "id long, v string, p int, score double"
            ),
            t,
            partition_by=["p"],
            merge_schema=True,
        )
        df = read_delta(spark, t)
        assert sorted(tuple(r) for r in df.collect()) == [
            (1, "a", 0, None),
            (2, "b", 1, 9.5),
        ]
        assert df.filter("p = 1").count() == 1
