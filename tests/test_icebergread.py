"""Iceberg reader (sources/icebergread.py): hand-built tables per the
open spec — metadata json, Avro manifest list + manifests (written
with the in-repo open-spec Avro encoder), snapshot resolution, time
travel, v2 schemas, DELETED-entry handling, delete-file rejection,
schema mapping."""

from __future__ import annotations

import json

import pytest

from harness_aws_etl_pipeline_spark.sources.avroread import write_avro_bytes
from harness_aws_etl_pipeline_spark.sources.icebergread import (
    _iceberg_to_spark,
    iceberg_snapshot,
    iceberg_snapshots,
    read_iceberg,
)

_ENTRY_SCHEMA = json.dumps({
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "data_file", "type": {
            "type": "record", "name": "data_file",
            "fields": [
                {"name": "content", "type": ["null", "int"]},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
            ],
        }},
    ],
})

_MLIST_SCHEMA = json.dumps({
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "content", "type": ["null", "int"]},
    ],
})

_FIELDS = [
    {"id": 1, "name": "id", "required": False, "type": "long"},
    {"id": 2, "name": "v", "required": False, "type": "string"},
]


def _entry(path, status=1, content=0):
    return {
        "status": status,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": 1,
        },
    }


def _manifest(tmp_path, name, entries):
    p = tmp_path / "metadata" / name
    p.parent.mkdir(exist_ok=True)
    p.write_bytes(write_avro_bytes(_ENTRY_SCHEMA, entries))
    return f"metadata/{name}"


def _mlist(tmp_path, name, manifests):
    p = tmp_path / "metadata" / name
    p.parent.mkdir(exist_ok=True)
    p.write_bytes(write_avro_bytes(_MLIST_SCHEMA, [
        {"manifest_path": m, "manifest_length": 1, "content": c}
        for m, c in manifests
    ]))
    return f"metadata/{name}"


def _datafile(spark, tmp_path, name, rows):
    import glob
    import shutil

    stage = tmp_path / "stage" / name
    spark.createDataFrame(rows, "id long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(stage))
    (tmp_path / "data").mkdir(exist_ok=True)
    src = glob.glob(str(stage / "*.parquet"))[0]
    shutil.move(src, str(tmp_path / "data" / name))
    return f"data/{name}"


def _metadata(tmp_path, snapshots, current, v2=False, version=1):
    md = {
        "format-version": 2 if v2 else 1,
        "location": str(tmp_path),
        "current-snapshot-id": current,
        "snapshots": snapshots,
    }
    if v2:
        md["schemas"] = [
            {"schema-id": 0, "type": "struct", "fields": _FIELDS}
        ]
        md["current-schema-id"] = 0
    else:
        md["schema"] = {"type": "struct", "fields": _FIELDS}
    p = tmp_path / "metadata" / f"v{version}.metadata.json"
    p.parent.mkdir(exist_ok=True)
    p.write_text(json.dumps(md))
    (tmp_path / "metadata" / "version-hint.text").write_text(str(version))


class TestRead:
    def _table(self, spark, tmp_path):
        a = _datafile(spark, tmp_path, "a.parquet", [(1, "x"), (2, "y")])
        b = _datafile(spark, tmp_path, "b.parquet", [(3, "z")])
        c = _datafile(spark, tmp_path, "c.parquet", [(4, "w")])
        m1 = _manifest(tmp_path, "m1.avro", [_entry(a), _entry(b)])
        # snapshot 2 rewrites: b DELETED in place, c added
        m2 = _manifest(
            tmp_path, "m2.avro",
            [_entry(a, status=0), _entry(b, status=2), _entry(c)],
        )
        l1 = _mlist(tmp_path, "snap-1.avro", [(m1, 0)])
        l2 = _mlist(tmp_path, "snap-2.avro", [(m2, 0)])
        snaps = [
            {"snapshot-id": 100, "timestamp-ms": 1,
             "manifest-list": l1, "summary": {"operation": "append"}},
            {"snapshot-id": 200, "timestamp-ms": 2,
             "manifest-list": l2, "summary": {"operation": "overwrite"}},
        ]
        _metadata(tmp_path, snaps, current=200)
        return tmp_path

    def test_current_and_time_travel(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        cur = {(r.id, r.v) for r in read_iceberg(spark, str(t)).collect()}
        assert cur == {(1, "x"), (2, "y"), (4, "w")}
        old = {
            (r.id, r.v)
            for r in read_iceberg(spark, str(t), snapshot_id=100).collect()
        }
        assert old == {(1, "x"), (2, "y"), (3, "z")}

    def test_snapshots_and_resolution(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        log = iceberg_snapshots(spark, str(t))
        assert [(s["snapshot_id"], s["operation"]) for s in log] == [
            (100, "append"), (200, "overwrite"),
        ]
        snap = iceberg_snapshot(spark, str(t))
        assert snap["snapshot_id"] == 200 and len(snap["files"]) == 2
        with pytest.raises(ValueError, match="not found"):
            iceberg_snapshot(spark, str(t), snapshot_id=999)

    def test_equality_delete_without_ids_rejected(self, spark, tmp_path):
        """An equality delete entry carrying no equality_ids is
        unreadable — reject rather than silently misread."""
        a = _datafile(spark, tmp_path, "a.parquet", [(1, "x")])
        d = _datafile(spark, tmp_path, "del.parquet", [(1, "x")])
        m = _manifest(tmp_path, "m.avro", [_entry(a)])
        dm = _manifest(tmp_path, "dm.avro", [_entry(d, content=2)])
        lst = _mlist(tmp_path, "snap.avro", [(m, 0), (dm, 1)])
        _metadata(
            tmp_path,
            [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": lst,
              "summary": {"operation": "delete"}}],
            current=1, v2=True,
        )
        with pytest.raises(ValueError, match="equality_ids"):
            read_iceberg(spark, str(tmp_path))

    def test_not_a_table(self, spark, tmp_path):
        with pytest.raises(ValueError, match="Iceberg"):
            read_iceberg(spark, str(tmp_path))

    def test_timestamp_time_travel(self, spark, tmp_path):
        """Snapshots at ts 1 and 2: timestamp_ms resolves to the
        newest snapshot at or before the instant."""
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_snapshot_at,
        )

        t = self._table(spark, tmp_path)
        assert iceberg_snapshot_at(spark, str(t), 1) == 100
        assert iceberg_snapshot_at(spark, str(t), 5) == 200
        got = {
            (r.id, r.v)
            for r in read_iceberg(spark, str(t), timestamp_ms=1).collect()
        }
        assert got == {(1, "x"), (2, "y"), (3, "z")}
        with pytest.raises(ValueError, match="at or before"):
            read_iceberg(spark, str(t), timestamp_ms=0)
        with pytest.raises(ValueError, match="not both"):
            read_iceberg(spark, str(t), snapshot_id=100, timestamp_ms=1)


def _delfile(spark, tmp_path, name, rows):
    """Position-delete parquet per the spec: (file_path, pos) rows,
    file_path holding the referenced data file's manifest path."""
    import glob
    import shutil

    stage = tmp_path / "stage" / name
    spark.createDataFrame(rows, "file_path string, pos long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(stage))
    (tmp_path / "data").mkdir(exist_ok=True)
    shutil.move(
        glob.glob(str(stage / "*.parquet"))[0],
        str(tmp_path / "data" / name),
    )
    return f"data/{name}"


class TestPositionDeletes:
    """Round-10: v2 position deletes applied via the (file, row_index)
    anti-join; equality deletes still rejected (TestRead above)."""

    def _table(self, spark, tmp_path, deletes, extra_del_entries=()):
        a = _datafile(
            spark, tmp_path, "a.parquet", [(i, f"a{i}") for i in range(5)]
        )
        b = _datafile(
            spark, tmp_path, "b.parquet", [(i, f"b{i}") for i in range(5, 10)]
        )
        d = _delfile(spark, tmp_path, "pd.parquet", deletes)
        m = _manifest(tmp_path, "m.avro", [_entry(a), _entry(b)])
        dm = _manifest(
            tmp_path, "dm.avro",
            [_entry(d, content=1), *extra_del_entries],
        )
        lst = _mlist(tmp_path, "snap.avro", [(m, 0), (dm, 1)])
        _metadata(
            tmp_path,
            [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": lst,
              "summary": {"operation": "delete"}}],
            current=1, v2=True,
        )
        return tmp_path

    def test_position_deletes_applied(self, spark, tmp_path):
        # drop rows 0 and 3 of a.parquet and row 1 of b.parquet
        t = self._table(spark, tmp_path, [
            ("data/a.parquet", 0), ("data/a.parquet", 3),
            ("data/b.parquet", 1),
        ])
        snap = iceberg_snapshot(spark, str(t))
        assert snap["delete_files"] == 1
        got = {r.id for r in read_iceberg(spark, str(t)).collect()}
        assert got == {1, 2, 4, 5, 7, 8, 9}

    def test_untouched_file_keeps_bulk_scan(self, spark, tmp_path):
        # only a.parquet is referenced; b survives whole
        t = self._table(spark, tmp_path, [("data/a.parquet", 4)])
        got = {r.id for r in read_iceberg(spark, str(t)).collect()}
        assert got == {0, 1, 2, 3, 5, 6, 7, 8, 9}

    def test_changes_window_with_new_deletes_rejected(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_changes,
        )

        a = _datafile(
            spark, tmp_path, "a.parquet", [(i, f"a{i}") for i in range(3)]
        )
        m1 = _manifest(tmp_path, "m1.avro", [_entry(a)])
        l1 = _mlist(tmp_path, "s1.avro", [(m1, 0)])
        d = _delfile(spark, tmp_path, "pd.parquet", [("data/a.parquet", 0)])
        dm = _manifest(tmp_path, "dm.avro", [_entry(d, content=1)])
        l2 = _mlist(tmp_path, "s2.avro", [(m1, 0), (dm, 1)])
        snaps = [
            {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": l1,
             "summary": {"operation": "append"}},
            {"snapshot-id": 2, "timestamp-ms": 2, "manifest-list": l2,
             "summary": {"operation": "delete"}},
        ]
        _metadata(tmp_path, snaps, current=2, v2=True)
        # rows visible at snapshot 1 become invisible at 2 — the
        # file SET never changed, only the delete set did
        with pytest.raises(ValueError, match="position-delete"):
            iceberg_changes(spark, str(tmp_path), since_snapshot_id=1)


class TestSchemaMapping:
    def test_types(self):
        node = {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "d", "required": True,
                 "type": "decimal(12, 2)"},
                {"id": 2, "name": "ts", "required": False,
                 "type": "timestamptz"},
                {"id": 3, "name": "day", "required": False, "type": "date"},
                {"id": 4, "name": "u", "required": False, "type": "uuid"},
                {"id": 5, "name": "tags", "required": False, "type": {
                    "type": "list", "element-id": 6,
                    "element": "string", "element-required": False,
                }},
                {"id": 7, "name": "kv", "required": False, "type": {
                    "type": "map", "key-id": 8, "value-id": 9,
                    "key": "string", "value": "long",
                    "value-required": False,
                }},
            ],
        }
        s = _iceberg_to_spark(node)
        d = {f.name: f.dataType.simpleString() for f in s.fields}
        assert d == {
            "d": "decimal(12,2)", "ts": "timestamp", "day": "date",
            "u": "string", "tags": "array<string>", "kv": "map<string,bigint>",
        }
        assert [f.nullable for f in s.fields][0] is False
        with pytest.raises(ValueError, match="primitive"):
            _iceberg_to_spark({"type": "struct", "fields": [
                {"id": 1, "name": "x", "required": False, "type": "variant"},
            ]})


class TestCli:
    def test_iceberg_cli(self, spark, tmp_path, capsys):
        from harness_aws_etl_pipeline_spark.cli import main

        t = TestRead()._table(spark, tmp_path)
        rc = main(["iceberg", "--path", str(t), "--snapshots"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert [s["snapshot_id"] for s in rep["snapshots"]] == [100, 200]
        out = tmp_path / "export"
        rc = main([
            "iceberg", "--path", str(t), "--snapshot-id", "100",
            "--output", str(out),
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] == 3 and rep["snapshot_id"] == 100
        assert spark.read.parquet(str(out)).count() == 3


class TestChanges:
    def test_append_only_changes(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_changes,
        )

        t = TestRead()._table(spark, tmp_path)
        # snapshot 100 → 200 removed part b: not representable
        with pytest.raises(ValueError, match="append-only"):
            iceberg_changes(spark, str(t), since_snapshot_id=100)
        # build a pure-append snapshot 300 on top of 200
        d = _datafile(spark, tmp_path, "d.parquet", [(9, "q")])
        m1 = "metadata/m1.avro"  # from _table
        m2 = "metadata/m2.avro"
        m3 = _manifest(tmp_path, "m3.avro", [_entry(d)])
        l3 = _mlist(tmp_path, "snap-3.avro", [(m2, 0), (m3, 0)])
        snaps = [
            {"snapshot-id": 100, "timestamp-ms": 1,
             "manifest-list": "metadata/snap-1.avro",
             "summary": {"operation": "append"}},
            {"snapshot-id": 200, "timestamp-ms": 2,
             "manifest-list": "metadata/snap-2.avro",
             "summary": {"operation": "overwrite"}},
            {"snapshot-id": 300, "timestamp-ms": 3,
             "manifest-list": l3, "summary": {"operation": "append"}},
        ]
        _metadata(tmp_path, snaps, current=300, version=2)
        got = {
            (r.id, r.v)
            for r in iceberg_changes(
                spark, str(t), since_snapshot_id=200
            ).collect()
        }
        assert got == {(9, "q")}
        assert iceberg_changes(
            spark, str(t), since_snapshot_id=300, to_snapshot_id=300
        ).count() == 0


# ---------------------------------------------------------------------------
# Round 11: v2 EQUALITY deletes (the Flink streaming-upsert staple)
# ---------------------------------------------------------------------------

_ENTRY_SCHEMA_EQ = json.dumps({
    "type": "record", "name": "manifest_entry_eq",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "data_file_eq",
            "fields": [
                {"name": "content", "type": ["null", "int"]},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "equality_ids",
                 "type": ["null", {"type": "array", "items": "int"}]},
            ],
        }},
    ],
})


def _eq_entry(path, seq, content=0, equality_ids=None):
    return {
        "status": 1,
        "sequence_number": seq,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": 1,
            "equality_ids": equality_ids,
        },
    }


def _eq_manifest(tmp_path, name, entries):
    p = tmp_path / "metadata" / name
    p.parent.mkdir(exist_ok=True)
    p.write_bytes(write_avro_bytes(_ENTRY_SCHEMA_EQ, entries))
    return f"metadata/{name}"


def _typed_file(spark, tmp_path, name, rows, ddl):
    import glob
    import shutil

    stage = tmp_path / "stage" / name
    spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(stage))
    (tmp_path / "data").mkdir(exist_ok=True)
    shutil.move(
        glob.glob(str(stage / "*.parquet"))[0],
        str(tmp_path / "data" / name),
    )
    return f"data/{name}"


class TestEqualityDeletes:
    def _table(self, spark, tmp_path, entries):
        m = _eq_manifest(tmp_path, "m.avro", entries)
        lst = _mlist(tmp_path, "snap.avro", [(m, 0)])
        _metadata(
            tmp_path,
            [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": lst,
              "summary": {"operation": "overwrite"}}],
            current=1, v2=True,
        )
        return tmp_path

    def test_sequence_scoped_equality_delete(self, spark, tmp_path):
        """Delete on id at seq 2 hits the seq-1 data file but NOT the
        seq-3 re-insert of the same key — the spec's strict
        lower-sequence rule."""
        a = _datafile(
            spark, tmp_path, "a.parquet", [(1, "x"), (2, "y"), (3, "z")]
        )
        b = _datafile(spark, tmp_path, "b.parquet", [(2, "y2")])
        ed = _typed_file(
            spark, tmp_path, "ed.parquet", [(2,), (3,)], "id long"
        )
        t = self._table(spark, tmp_path, [
            _eq_entry(a, 1),
            _eq_entry(b, 3),
            _eq_entry(ed, 2, content=2, equality_ids=[1]),
        ])
        snap = iceberg_snapshot(spark, str(t))
        assert snap["delete_files"] == 1
        assert snap["equality_delete_files"][0]["columns"] == ["id"]
        got = {(r.id, r.v) for r in read_iceberg(spark, str(t)).collect()}
        assert got == {(1, "x"), (2, "y2")}

    def test_multi_column_and_multi_set_deletes(self, spark, tmp_path):
        """Two delete files with different equality column sets fold
        out as independent anti-joins; a composite (id, v) delete
        matches both columns null-safely."""
        a = _datafile(
            spark, tmp_path, "a.parquet",
            [(1, "x"), (1, "q"), (2, "y"), (None, None)],
        )
        ed1 = _typed_file(
            spark, tmp_path, "ed1.parquet", [(1, "x")], "id long, v string"
        )
        ed2 = _typed_file(
            spark, tmp_path, "ed2.parquet",
            [(None,)], "id long",
        )
        t = self._table(spark, tmp_path, [
            _eq_entry(a, 1),
            _eq_entry(ed1, 2, content=2, equality_ids=[1, 2]),
            _eq_entry(ed2, 2, content=2, equality_ids=[1]),
        ])
        got = {(r.id, r.v) for r in read_iceberg(spark, str(t)).collect()}
        # (1,"x") dies to the composite; (None,None) dies null-safely
        assert got == {(1, "q"), (2, "y")}

    def test_equality_plus_position_deletes(self, spark, tmp_path):
        a = _datafile(
            spark, tmp_path, "a.parquet",
            [(1, "x"), (2, "y"), (3, "z")],
        )
        pd_ = _delfile(spark, tmp_path, "pd.parquet", [("data/a.parquet", 0)])
        ed = _typed_file(spark, tmp_path, "ed.parquet", [(3,)], "id long")
        t = self._table(spark, tmp_path, [
            _eq_entry(a, 1),
            _eq_entry(pd_, 2, content=1),
            _eq_entry(ed, 2, content=2, equality_ids=[1]),
        ])
        got = {(r.id, r.v) for r in read_iceberg(spark, str(t)).collect()}
        assert got == {(2, "y")}

    def test_unknown_field_id_rejected(self, spark, tmp_path):
        a = _datafile(spark, tmp_path, "a.parquet", [(1, "x")])
        ed = _typed_file(spark, tmp_path, "ed.parquet", [(1,)], "id long")
        t = self._table(spark, tmp_path, [
            _eq_entry(a, 1),
            _eq_entry(ed, 2, content=2, equality_ids=[99]),
        ])
        with pytest.raises(ValueError, match="field ids"):
            read_iceberg(spark, str(t))

    def test_changes_window_with_new_equality_deletes_rejected(
        self, spark, tmp_path
    ):
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_changes,
        )

        a = _datafile(spark, tmp_path, "a.parquet", [(1, "x")])
        m1 = _eq_manifest(tmp_path, "m1.avro", [_eq_entry(a, 1)])
        l1 = _mlist(tmp_path, "s1.avro", [(m1, 0)])
        ed = _typed_file(spark, tmp_path, "ed.parquet", [(1,)], "id long")
        m2 = _eq_manifest(tmp_path, "m2.avro", [
            _eq_entry(a, 1), _eq_entry(ed, 2, content=2, equality_ids=[1]),
        ])
        l2 = _mlist(tmp_path, "s2.avro", [(m2, 0)])
        snaps = [
            {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": l1,
             "summary": {"operation": "append"}},
            {"snapshot-id": 2, "timestamp-ms": 2, "manifest-list": l2,
             "summary": {"operation": "delete"}},
        ]
        _metadata(tmp_path, snaps, current=2, v2=True)
        with pytest.raises(ValueError, match="equality-delete"):
            iceberg_changes(spark, str(tmp_path), since_snapshot_id=1)


class TestChangeRows:
    """Round 13: iceberg_changes(change_rows=True) — the batch twin
    of iceberg_nojar's readChangeFeed."""

    def test_upsert_and_delete_replay(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_delete_where,
            iceberg_upsert,
        )
        from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
            write_iceberg,
        )
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_changes,
            iceberg_snapshots,
            read_iceberg,
        )

        t = str(tmp_path / "t")
        write_iceberg(
            spark,
            spark.range(4).withColumn("v", F.lit("a")),
            t,
        )
        s0 = iceberg_snapshots(spark, t)[-1]["snapshot_id"]
        # position delete first (delete_where refuses tables carrying
        # live equality deletes), then the eq-delete upsert
        iceberg_delete_where(spark, t, "id = 2")
        iceberg_upsert(
            spark,
            t,
            spark.createDataFrame(
                [(1, "up"), (9, "n")], "id long, v string"
            ),
            keys=["id"],
        )
        ch = iceberg_changes(spark, t, s0, change_rows=True)
        got = {
            (r.id, r.v, r._change_type, r._commit_version)
            for r in ch.collect()
        }
        assert got == {
            (2, "a", "delete", 2),  # position delete: full preimage
            # equality deletes resolve FULL preimages from the prior
            # snapshot; the key-9 delete matches no live row and
            # correctly vanishes (deleting a nonexistent row is a no-op)
            (1, "a", "delete", 3),
            (1, "up", "insert", 3),
            (9, "n", "insert", 3),
        }
        # applying the changelog (per version, deletes first) over the
        # base snapshot reproduces the table
        state = {i: "a" for i in range(4)}
        for _id, _v, ct, _cv in sorted(
            got, key=lambda x: (x[3], x[2] != "delete")
        ):
            if ct == "delete":
                state.pop(_id, None)
            else:
                state[_id] = _v
        assert state == {
            r.id: r.v for r in read_iceberg(spark, t).collect()
        }

    def test_compaction_skipped_appends_flow(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.sinks.compact import (
            iceberg_compact,
        )
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_delete_where,
        )
        from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
            write_iceberg,
        )
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_changes,
            iceberg_snapshots,
        )

        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(4).withColumn("v", F.lit("a")), t)
        s0 = iceberg_snapshots(spark, t)[-1]["snapshot_id"]
        iceberg_delete_where(spark, t, "id = 0")
        iceberg_compact(spark, t)
        write_iceberg(
            spark,
            spark.createDataFrame([(9, "b")], "id long, v string"),
            t,
            mode="append",
        )
        got = {
            (r.id, r._change_type)
            for r in iceberg_changes(
                spark, t, s0, change_rows=True
            ).collect()
        }
        assert got == {(0, "delete"), (9, "insert")}

    def test_upsert_and_changes_cli(self, spark, tmp_path, capsys):
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.cli import main
        from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
            write_iceberg,
        )
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_snapshots,
            read_iceberg,
        )

        t = str(tmp_path / "t")
        write_iceberg(
            spark, spark.range(3).withColumn("v", F.lit("a")), t
        )
        s0 = iceberg_snapshots(spark, t)[-1]["snapshot_id"]
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, "up"), (5, "n")], "id long, v string"
        ).write.parquet(src)
        rc = main([
            "iceberg", "--path", t, "--upsert", src, "--keys", "id",
        ])
        assert rc == 0
        json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert {
            (r.id, r.v) for r in read_iceberg(spark, t).collect()
        } == {(0, "a"), (1, "up"), (2, "a"), (5, "n")}
        rc = main([
            "iceberg", "--path", t, "--changes-since", str(s0),
            "--change-rows", "--show", "10",
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "iceberg_changes" and rep["change_rows"]
        got = {
            (p["id"], p["_change_type"]) for p in rep["preview"]
        }
        # key-5 delete matches no prior row and vanishes
        assert got == {
            (1, "delete"), (1, "insert"), (5, "insert"),
        }

    def test_equality_delete_null_key_preimage(self, spark, tmp_path):
        """Null-safe preimage resolution — the spec treats null
        equality-delete values as IS NULL, matching the read path."""
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )
        from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
            write_iceberg,
        )
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_changes,
            iceberg_snapshots,
        )

        t = str(tmp_path / "t")
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(None, "a"), (1, "b")], "id long, v string"
            ),
            t,
        )
        s0 = iceberg_snapshots(spark, t)[-1]["snapshot_id"]
        iceberg_upsert(
            spark,
            t,
            spark.createDataFrame([(None, "A2")], "id long, v string"),
            keys=["id"],
        )
        got = {
            (r.id, r.v, r._change_type)
            for r in iceberg_changes(
                spark, t, s0, change_rows=True
            ).collect()
        }
        assert got == {
            (None, "a", "delete"),
            (None, "A2", "insert"),
        }

    def test_change_rows_across_schema_evolution(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
            write_iceberg,
        )
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_changes,
            iceberg_snapshots,
        )

        t = str(tmp_path / "t")
        write_iceberg(
            spark, spark.createDataFrame([("g1", 1)], "g string, x long"), t
        )
        s0 = iceberg_snapshots(spark, t)[-1]["snapshot_id"]
        write_iceberg(
            spark,
            spark.createDataFrame(
                [("g1", 2, 9.5)], "g string, x long, score double"
            ),
            t,
            mode="append",
        )
        got = [
            tuple(r)
            for r in iceberg_changes(
                spark, t, s0, change_rows=True
            ).collect()
        ]
        # latest (evolved) schema labels the change rows
        assert got == [("g1", 2, 9.5, "insert", 2)]
