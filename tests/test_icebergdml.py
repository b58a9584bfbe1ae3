"""Position-delete DELETE on Iceberg tables (sinks/icebergdml.py):
write → delete → read round trips, sequence numbers, repeat-delete
no-op, time travel, bulk bound, commit race."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
    iceberg_delete_where,
)
from harness_aws_etl_pipeline_spark.sinks.icebergwrite import write_iceberg
from harness_aws_etl_pipeline_spark.sources.icebergread import (
    iceberg_snapshot,
    iceberg_snapshots,
    read_iceberg,
)


class TestDeleteWhere:
    def test_delete_and_time_travel(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(20).withColumn("v", F.lit("a")), t)
        first = iceberg_snapshot(spark, t)["snapshot_id"]
        rep = iceberg_delete_where(spark, t, "id % 5 = 0")
        assert rep["rows_deleted"] == 4 and rep["files_touched"] >= 1
        got = {r.id for r in read_iceberg(spark, t).collect()}
        assert got == set(range(20)) - {0, 5, 10, 15}
        # the delete landed as a new snapshot; the old one sees all
        assert read_iceberg(spark, t, snapshot_id=first).count() == 20
        ops = [s["operation"] for s in iceberg_snapshots(spark, t)]
        assert ops == ["append", "delete"]
        # a delete parquet exists; no data parquet was rewritten
        assert glob.glob(str(tmp_path / "t" / "data" / "*-deletes.parquet"))

    def test_repeat_delete_is_noop(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(10).withColumn("v", F.lit("a")), t)
        iceberg_delete_where(spark, t, "id < 3")
        rep = iceberg_delete_where(spark, t, "id < 5")
        assert rep["rows_deleted"] == 2  # 3 and 4 only — 0..2 were gone
        rep = iceberg_delete_where(spark, t, "id < 5")
        assert rep["rows_deleted"] == 0 and rep["files_touched"] == 0
        assert {r.id for r in read_iceberg(spark, t).collect()} == {
            5, 6, 7, 8, 9,
        }

    def test_append_after_delete_composes(self, spark, tmp_path):
        """New data files carry a higher sequence than the delete —
        re-inserted rows must survive the earlier position delete."""
        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(5).withColumn("v", F.lit("a")), t)
        iceberg_delete_where(spark, t, "id = 2")
        write_iceberg(
            spark,
            spark.range(2, 3).withColumn("v", F.lit("back")),
            t,
            mode="append",
        )
        got = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(0, "a"), (1, "a"), (3, "a"), (4, "a"), (2, "back")}

    def test_bulk_bound(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(100).withColumn("v", F.lit("a")), t)
        with pytest.raises(ValueError, match="rewrite-based"):
            iceberg_delete_where(spark, t, "id >= 0", max_deleted_rows=10)

    def test_commit_race_retries(self, spark, tmp_path, monkeypatch):
        import harness_aws_etl_pipeline_spark.sinks.icebergdml as dml

        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(10).withColumn("v", F.lit("a")), t)
        real_get_fs = dml.get_fs
        state = {"raced": False}

        class RacingFs:
            def __init__(self, inner):
                self._inner = inner

            def __getattr__(self, name):
                return getattr(self._inner, name)

            def rename_if_absent(self, src, dst):
                if not state["raced"]:
                    state["raced"] = True
                    iceberg_delete_where(spark, t, "id = 7")
                return self._inner.rename_if_absent(src, dst)

        monkeypatch.setattr(
            dml, "get_fs", lambda p, s: RacingFs(real_get_fs(p, s))
        )
        rep = iceberg_delete_where(spark, t, "id < 2")
        assert rep["retries"] == 1 and rep["rows_deleted"] == 2
        got = {r.id for r in read_iceberg(spark, t).collect()}
        assert got == {2, 3, 4, 5, 6, 8, 9}  # both deletes landed


class TestCli:
    def test_delete_where_cli(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(6).withColumn("v", F.lit("a")), t)
        rc = main(["iceberg", "--path", t, "--delete-where", "id < 2"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "iceberg_delete" and rep["rows_deleted"] == 2
        assert read_iceberg(spark, t).count() == 4

    def test_delta_delete_where_cli(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            write_delta,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            read_delta,
        )

        t = str(tmp_path / "d")
        write_delta(spark, spark.range(6).withColumn("v", F.lit("a")), t)
        rc = main(["delta", "--path", t, "--delete-where", "id >= 4"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "delta_delete" and rep["rows_deleted"] == 2
        assert read_delta(spark, t).count() == 4


class TestUpsert:
    def test_upsert_replaces_older_keys_atomically(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )

        t = str(tmp_path / "t")
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
            ),
            t,
        )
        rep = iceberg_upsert(
            spark,
            t,
            spark.createDataFrame(
                [(2, "b2"), (4, "d")], "id long, v string"
            ),
            keys=["id"],
        )
        assert rep["rows_upserted"] == 2
        got = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(1, "a"), (2, "b2"), (3, "c"), (4, "d")}
        # the old snapshot is intact; the upsert is one new snapshot
        ops = [s["operation"] for s in iceberg_snapshots(spark, t)]
        assert ops == ["append", "overwrite"]
        snap = iceberg_snapshot(spark, t)
        assert len(snap["equality_delete_files"]) == 1
        assert snap["equality_delete_files"][0]["columns"] == ["id"]

    def test_repeat_upserts_latest_wins(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )

        t = str(tmp_path / "t")
        iceberg_upsert(
            spark, t,
            spark.createDataFrame([(1, "v1")], "id long, v string"),
            keys=["id"],
        )  # creates the table
        iceberg_upsert(
            spark, t,
            spark.createDataFrame([(1, "v2")], "id long, v string"),
            keys=["id"],
        )
        iceberg_upsert(
            spark, t,
            spark.createDataFrame([(1, "v3"), (2, "w")], "id long, v string"),
            keys=["id"],
        )
        got = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(1, "v3"), (2, "w")}

    def test_composite_keys_and_guards(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )

        t = str(tmp_path / "t")
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(1, "x", 10.0), (1, "y", 20.0)], "id long, g string, m double"
            ),
            t,
        )
        iceberg_upsert(
            spark, t,
            spark.createDataFrame(
                [(1, "x", 99.0)], "id long, g string, m double"
            ),
            keys=["id", "g"],
        )
        got = {(r.id, r.g, r.m) for r in read_iceberg(spark, t).collect()}
        assert got == {(1, "x", 99.0), (1, "y", 20.0)}
        with pytest.raises(ValueError, match="not in the table schema"):
            iceberg_upsert(
                spark, t,
                spark.createDataFrame(
                    [(1, "x", 1.0)], "id long, g string, m double"
                ),
                keys=["nope"],
            )
        with pytest.raises(ValueError, match="do not match"):
            iceberg_upsert(
                spark, t,
                spark.createDataFrame([(1,)], "id long"),
                keys=["id"],
            )

    def test_upsert_then_delete_where_refused(self, spark, tmp_path):
        """delete_where cannot see through live equality deletes —
        the refusal must hold on tables this writer produces."""
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )

        t = str(tmp_path / "t")
        write_iceberg(
            spark, spark.range(3).withColumn("v", F.lit("a")), t
        )
        iceberg_upsert(
            spark, t,
            spark.createDataFrame([(1, "b")], "id long, v string"),
            keys=["id"],
        )
        with pytest.raises(ValueError, match="equality"):
            iceberg_delete_where(spark, t, "id = 0")


def _decode_manifests(t: str):
    """(manifest_file record, [entries]) pairs of the CURRENT
    snapshot, via the repo's own Avro decoder."""
    import json
    import posixpath

    from harness_aws_etl_pipeline_spark.sources.avroread import (
        _iter_container,
    )

    mds = sorted(
        glob.glob(f"{t}/metadata/v*.metadata.json"),
        key=lambda p: int(p.rsplit("/v", 1)[1].split(".")[0]),
    )
    md = json.load(open(mds[-1]))
    snap = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    mlist = snap["manifest-list"]
    if not mlist.startswith("/"):
        mlist = posixpath.join(t, mlist)
    _s, _n, recs = _iter_container(open(mlist, "rb").read())
    out = []
    for man in recs:
        mp = man["manifest_path"]
        if not mp.startswith("/"):
            mp = posixpath.join(t, mp)
        _s2, _n2, entries = _iter_container(open(mp, "rb").read())
        out.append((man, list(entries)))
    return md, out


class TestPartitionedDml:
    """Round 13: DML on partitioned tables writes spec-consistent
    manifests — real partition values, the table's spec id, one
    position-delete file per referenced partition."""

    def test_delete_manifest_carries_partition_values(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i % 3, f"v{i}") for i in range(12)],
            "id long, p int, v string",
        )
        write_iceberg(spark, df, t, partition_by=["p"])
        rep = iceberg_delete_where(spark, t, "id IN (0, 1, 3)")
        assert rep["rows_deleted"] == 3
        got = {r.id for r in read_iceberg(spark, t).collect()}
        assert got == set(range(12)) - {0, 1, 3}
        md, mans = _decode_manifests(t)
        del_mans = [(m, es) for m, es in mans if int(m["content"]) == 1]
        assert del_mans
        ptuples = set()
        for m, es in del_mans:
            assert m["partition_spec_id"] == md["default-spec-id"]
            for e in es:
                part = e["data_file"]["partition"]
                assert part and part.get("p") is not None
                ptuples.add(part["p"])
        # ids 0,1,3 live in partitions p=0 (0,3) and p=1 (1) —
        # one delete file per touched partition, values recorded
        assert ptuples == {0, 1}
        n_del_files = sum(len(es) for _m, es in del_mans)
        assert n_del_files == 2
        # partition-pruned read stays exact after the delete
        pruned = {
            r.id
            for r in read_iceberg(
                spark, t, partition_filter={"p": 0}
            ).collect()
        }
        assert pruned == {6, 9}

    def test_partitioned_upsert_records_partitions_and_prunes(
        self, spark, tmp_path
    ):
        import datetime

        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )

        t = str(tmp_path / "t")
        d0 = datetime.date(2024, 1, 1)
        df = spark.createDataFrame(
            [
                (i, datetime.date(2024, 1, 1 + (i % 2)), f"v{i}")
                for i in range(8)
            ],
            "id long, d date, v string",
        )
        write_iceberg(spark, df, t, partition_by=["days(d)"])
        up = spark.createDataFrame(
            [
                (0, d0, "up0"),
                (99, datetime.date(2024, 1, 3), "new"),
            ],
            "id long, d date, v string",
        )
        rep = iceberg_upsert(spark, t, up, keys=["id"])
        assert rep["rows_upserted"] == 2
        got = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(i, f"v{i}") for i in range(1, 8)} | {
            (0, "up0"),
            (99, "new"),
        }
        md, mans = _decode_manifests(t)
        # data files from the upsert landed in hive layout with real
        # partition values; snapshot partition metadata covers ALL
        # live files (pruning never conservatively includes DML files)
        snap = iceberg_snapshot(spark, t)
        pof = snap["partition_of"]
        assert all(
            "d_day" in (pof.get(f) or {}) for f in snap["files"]
        ), "a live file lost partition metadata"
        epoch = datetime.date(1970, 1, 1)
        day3 = (datetime.date(2024, 1, 3) - epoch).days
        pruned = {
            (r.id, r.v)
            for r in read_iceberg(
                spark, t, partition_filter={"d_day": day3}
            ).collect()
        }
        assert pruned == {(99, "new")}
        # the upsert's data manifest uses the table spec; the global
        # equality delete rides an UNPARTITIONED spec
        up_data = [
            (m, es)
            for m, es in mans
            if int(m["content"]) == 0
            and any(
                e["data_file"]["file_path"].endswith(".parquet")
                and e["data_file"]["partition"]
                for e in es
            )
        ]
        assert up_data
        del_mans = [(m, es) for m, es in mans if int(m["content"]) == 1]
        assert del_mans
        unpart_ids = {
            s["spec-id"]
            for s in md["partition-specs"]
            if not s.get("fields")
        }
        for m, _es in del_mans:
            assert m["partition_spec_id"] in unpart_ids
        assert md["default-spec-id"] not in unpart_ids

    def test_bucket_partitioned_upsert_keeps_bucket_pruning(
        self, spark, tmp_path
    ):
        """The r12 strict bucket check demands full partition-metadata
        coverage — upsert files must carry bucket values so
        partition_filter on the bucket field keeps working."""
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )
        from harness_aws_etl_pipeline_spark.sources.icebergpart import (
            bucket_value,
        )

        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(16)], "id long, v string"
        )
        write_iceberg(spark, df, t, partition_by=["bucket(4, id)"])
        up = spark.createDataFrame(
            [(3, "up3"), (100, "new")], "id long, v string"
        )
        iceberg_upsert(spark, t, up, keys=["id"])
        b = bucket_value(3, 4, "long")
        pruned = {
            (r.id, r.v)
            for r in read_iceberg(
                spark, t, partition_filter={"id_bucket": b}
            ).collect()
        }
        expect = {
            (i, f"v{i}")
            for i in range(16)
            if bucket_value(i, 4, "long") == b and i != 3
        } | {(3, "up3")}
        if bucket_value(100, 4, "long") == b:
            expect |= {(100, "new")}
        assert pruned == expect

    def test_delete_refuses_uncovered_partition_metadata(
        self, spark, tmp_path, monkeypatch
    ):
        """Files without partition metadata on a partitioned table
        (foreign writers / pre-r13 DML) reject loudly toward compact."""
        import harness_aws_etl_pipeline_spark.sinks.icebergdml as dml

        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i % 2) for i in range(4)], "id long, p int"
        )
        write_iceberg(spark, df, t, partition_by=["p"])
        real = iceberg_snapshot

        def _wipe(spark_, path_, snapshot_id=None):
            s = real(spark_, path_, snapshot_id)
            s = dict(s)
            s["partition_of"] = {}
            return s

        monkeypatch.setattr(dml, "iceberg_snapshot", _wipe)
        with pytest.raises(ValueError, match="no partition metadata"):
            iceberg_delete_where(spark, t, "id = 0")

    def test_unpartitioned_dml_unchanged(self, spark, tmp_path):
        """Unpartitioned tables keep the single-delete-file shape."""
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )

        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(10).withColumn("v", F.lit("a")), t)
        iceberg_delete_where(spark, t, "id < 2")
        iceberg_upsert(
            spark,
            t,
            spark.createDataFrame([(5, "up")], "id long, v string"),
            keys=["id"],
        )
        got = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(i, "a") for i in range(2, 10) if i != 5} | {
            (5, "up")
        }
        md, mans = _decode_manifests(t)
        for m, es in mans:
            assert m["partition_spec_id"] == 0
            for e in es:
                assert (e["data_file"]["partition"] or {}) == {}
