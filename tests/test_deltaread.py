"""Delta-protocol reader (sources/deltaread.py): hand-written logs
per PROTOCOL.md — snapshot fold, remove semantics, time travel,
partition-value recovery, checkpoint replay, protocol-2 rejection,
history."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sources.deltaread import (
    delta_history,
    delta_snapshot,
    read_delta,
)

_SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _meta(partition_cols=()):
    return {
        "metaData": {
            "id": "tbl-1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _SCHEMA_JSON,
            "partitionColumns": list(partition_cols),
            "configuration": {},
        }
    }


def _commit(tmp_path, version, actions):
    log = tmp_path / "_delta_log"
    log.mkdir(exist_ok=True)
    (log / f"{version:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions)
    )


def _datafile(spark, tmp_path, name, rows):
    p = tmp_path / "stage" / name
    spark.createDataFrame(rows, "id long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(p))
    import glob
    import shutil

    src = glob.glob(str(p / "*.parquet"))[0]
    shutil.move(src, str(tmp_path / name))
    return name


def _add(name, pv=None):
    return {
        "add": {
            "path": name,
            "partitionValues": pv or {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


class TestSnapshotFold:
    def _basic_table(self, spark, tmp_path):
        a = _datafile(spark, tmp_path, "part-a.parquet", [(1, "x"), (2, "y")])
        b = _datafile(spark, tmp_path, "part-b.parquet", [(3, "z")])
        c = _datafile(spark, tmp_path, "part-c.parquet", [(4, "w")])
        _commit(
            tmp_path, 0,
            [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
             _meta(), _add(a), _add(b),
             {"commitInfo": {"operation": "WRITE", "timestamp": 1000}}],
        )
        _commit(
            tmp_path, 1,
            [{"remove": {"path": b, "dataChange": True}}, _add(c),
             {"commitInfo": {"operation": "MERGE", "timestamp": 2000}}],
        )
        return tmp_path

    def test_read_latest_and_time_travel(self, spark, tmp_path):
        t = self._basic_table(spark, tmp_path)
        latest = {(r.id, r.v) for r in read_delta(spark, str(t)).collect()}
        assert latest == {(1, "x"), (2, "y"), (4, "w")}
        v0 = {(r.id, r.v) for r in read_delta(spark, str(t), version=0).collect()}
        assert v0 == {(1, "x"), (2, "y"), (3, "z")}

    def test_history_and_snapshot_shape(self, spark, tmp_path):
        t = self._basic_table(spark, tmp_path)
        h = delta_history(spark, str(t))
        assert [(x["version"], x["operation"], x["num_adds"], x["num_removes"])
                for x in h] == [(0, "WRITE", 2, 0), (1, "MERGE", 1, 1)]
        snap = delta_snapshot(spark, str(t), 1)
        assert snap["version"] == 1
        assert sorted(snap["files"]) == ["part-a.parquet", "part-c.parquet"]
        assert snap["partition_columns"] == []

    def test_timestamp_time_travel(self, spark, tmp_path):
        """AS OF TIMESTAMP: newest commit at or before the instant
        (commitInfo timestamps: v0@1000, v1@2000 in the fixture)."""
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_version_at,
        )

        t = self._basic_table(spark, tmp_path)
        assert delta_version_at(spark, str(t), 1000) == 0
        assert delta_version_at(spark, str(t), 1999) == 0
        assert delta_version_at(spark, str(t), 2000) == 1
        got = {
            (r.id, r.v)
            for r in read_delta(spark, str(t), timestamp_ms=1500).collect()
        }
        assert got == {(1, "x"), (2, "y"), (3, "z")}
        with pytest.raises(ValueError, match="at or before"):
            read_delta(spark, str(t), timestamp_ms=1)
        with pytest.raises(ValueError, match="not both"):
            read_delta(spark, str(t), version=0, timestamp_ms=1500)

    def test_timestamp_travel_without_commitinfo(self, spark, tmp_path):
        """commitInfo is OPTIONAL in the spec: a newer commit without a
        timestamp must resolve via the commit file's mtime, not be
        silently skipped in favor of an older version."""
        import time as _time

        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_version_at,
        )

        t = self._basic_table(spark, tmp_path)
        d = _datafile(spark, tmp_path, "part-d.parquet", [(9, "q")])
        _commit(tmp_path, 2, [_add(d)])  # no commitInfo action at all
        now_ms = int(_time.time() * 1000) + 60_000
        assert delta_version_at(spark, str(t), now_ms) == 2
        got = {
            (r.id, r.v)
            for r in read_delta(spark, str(t), timestamp_ms=now_ms).collect()
        }
        assert (9, "q") in got

    def test_version_out_of_range_and_not_delta(self, spark, tmp_path):
        t = self._basic_table(spark, tmp_path)
        with pytest.raises(ValueError, match="out of range"):
            read_delta(spark, str(t), version=9)
        with pytest.raises(ValueError, match="not a Delta table"):
            read_delta(spark, str(tmp_path / "nowhere"))

    def test_unsupported_reader_feature_rejected(self, spark, tmp_path):
        """columnMapping + deletionVectors are readable since round 10;
        anything else in readerFeatures still rejects loudly."""
        a = _datafile(spark, tmp_path, "p.parquet", [(1, "x")])
        _commit(
            tmp_path, 0,
            [{"protocol": {"minReaderVersion": 3,
                           "readerFeatures": ["deletionVectors",
                                              "v2Checkpoint"]}},
             _meta(), _add(a)],
        )
        with pytest.raises(ValueError, match="v2Checkpoint"):
            read_delta(spark, str(tmp_path))

    def test_supported_reader_features_accepted(self, spark, tmp_path):
        a = _datafile(spark, tmp_path, "p.parquet", [(1, "x")])
        _commit(
            tmp_path, 0,
            [{"protocol": {"minReaderVersion": 3,
                           "readerFeatures": ["deletionVectors",
                                              "columnMapping"]}},
             _meta(), _add(a)],
        )
        assert read_delta(spark, str(tmp_path)).count() == 1


class TestDeletionVectors:
    """Round-10: protocol ≥ 2 DV decode — inline z85 and UUID-file
    storage, partitioned tables, DV-update replacement, cardinality
    cross-check. Fixtures are written through sources/dvcodec (the
    same wire format the decoder reads — z85, roaring, framing are
    unit-pinned against spec vectors in test_dvcodec.py)."""

    def _dv_add(self, name, dv, pv=None):
        a = _add(name, pv)
        a["add"]["deletionVector"] = dv
        return a

    def _inline(self, indexes):
        from harness_aws_etl_pipeline_spark.sources.dvcodec import (
            encode_dv_blob,
            z85_encode,
        )

        blob = encode_dv_blob(indexes)
        # z85 works in 4-byte groups → zero-pad the tail (the decoder
        # tolerates up to 3 trailing zero bytes on inline blobs)
        blob_p = blob + b"\x00" * ((-len(blob)) % 4)
        return {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(blob_p),
            "sizeInBytes": len(blob),
            "cardinality": len(set(indexes)),
        }

    def test_inline_dv_removes_rows(self, spark, tmp_path):
        a = _datafile(
            spark, tmp_path, "a.parquet",
            [(i, f"r{i}") for i in range(6)],
        )
        dv = self._inline([1, 4])
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"]}},
            _meta(), self._dv_add(a, dv),
        ])
        got = {r.id for r in read_delta(spark, str(tmp_path)).collect()}
        assert got == {0, 2, 3, 5}

    def test_file_dv_uuid_storage(self, spark, tmp_path):
        import uuid

        from harness_aws_etl_pipeline_spark.sources.dvcodec import (
            encode_dv_blob,
            frame_dv_file,
            z85_encode,
        )

        a = _datafile(
            spark, tmp_path, "a.parquet",
            [(i, f"r{i}") for i in range(10)],
        )
        b = _datafile(
            spark, tmp_path, "b.parquet",
            [(i, f"r{i}") for i in range(10, 20)],
        )
        u = uuid.uuid4()
        blob_a = encode_dv_blob([0, 9])       # drops ids 0, 9
        blob_b = encode_dv_blob([5])          # drops id 15
        data, offsets = frame_dv_file([blob_a, blob_b])
        prefix = "ab"
        (tmp_path / prefix).mkdir()
        (tmp_path / prefix / f"deletion_vector_{u}.bin").write_bytes(data)
        enc = prefix + z85_encode(u.bytes)

        def dv(off, size, card):
            return {"storageType": "u", "pathOrInlineDv": enc,
                    "offset": off, "sizeInBytes": size, "cardinality": card}

        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 3,
                          "readerFeatures": ["deletionVectors"]}},
            _meta(),
            self._dv_add(a, dv(offsets[0], len(blob_a), 2)),
            self._dv_add(b, dv(offsets[1], len(blob_b), 1)),
        ])
        got = {r.id for r in read_delta(spark, str(tmp_path)).collect()}
        assert got == (set(range(20)) - {0, 9, 15})

    def test_dv_update_replaces_and_partitions_survive(self, spark, tmp_path):
        """A DV update re-adds the same path with a bigger DV (remove +
        add in one commit, per the protocol); the fold keeps the last
        add. Partition literals still attach to DV'd files."""
        schema = json.dumps({
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "g", "type": "integer", "nullable": True, "metadata": {}},
            ],
        })
        meta = _meta(["g"])
        meta["metaData"]["schemaString"] = schema
        a = _datafile(spark, tmp_path, "g1.parquet",
                      [(i, f"r{i}") for i in range(5)])
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 3,
                          "readerFeatures": ["deletionVectors"]}},
            meta, _add(a, {"g": "7"}),
        ])
        _commit(tmp_path, 1, [
            {"remove": {"path": a, "dataChange": True}},
            self._dv_add(a, self._inline([0]), {"g": "7"}),
        ])
        _commit(tmp_path, 2, [
            {"remove": {"path": a, "dataChange": True}},
            self._dv_add(a, self._inline([0, 3]), {"g": "7"}),
        ])
        df = read_delta(spark, str(tmp_path))
        assert {(r.id, r.g) for r in df.collect()} == {
            (1, 7), (2, 7), (4, 7)
        }
        # time travel sees the older, smaller DV
        assert {r.id for r in read_delta(spark, str(tmp_path), 1).collect()} \
            == {1, 2, 3, 4}

    def test_large_dv_bitmap_container_through_read_lake(
        self, spark, tmp_path
    ):
        """>4096 deleted positions in one container (the BITMAP
        container encoding) through the full read path, dispatched via
        read_lake — the integration face a user actually calls."""
        import uuid

        from harness_aws_etl_pipeline_spark.sources.dvcodec import (
            encode_dv_blob,
            frame_dv_file,
            z85_encode,
        )
        from harness_aws_etl_pipeline_spark.sources.lakeread import read_lake

        n = 12000
        a = _datafile(
            spark, tmp_path, "big.parquet",
            [(i, f"r{i}") for i in range(n)],
        )
        dropped = list(range(0, 10000))  # one dense bitmap container+
        blob = encode_dv_blob(dropped)
        data, offsets = frame_dv_file([blob])
        u = uuid.uuid4()
        (tmp_path / f"deletion_vector_{u}.bin").write_bytes(data)
        dv = {"storageType": "u", "pathOrInlineDv": z85_encode(u.bytes),
              "offset": offsets[0], "sizeInBytes": len(blob),
              "cardinality": len(dropped)}
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 3,
                          "readerFeatures": ["deletionVectors"]}},
            _meta(), self._dv_add(a, dv),
        ])
        df = read_lake(spark, str(tmp_path))
        assert df.count() == n - len(dropped)
        assert df.agg({"id": "min"}).collect()[0][0] == 10000

    def test_grouped_dv_scan_equals_per_file_path(self, spark, tmp_path):
        """>32 DV'd files route through the grouped _metadata.file_path
        scan (bounded driver plan); its rows must equal the per-file
        literal path bit-for-bit."""
        files = []
        for i in range(36):
            nm = _datafile(
                spark, tmp_path, f"f{i:02d}.parquet",
                [(i * 10 + j, f"r{i}-{j}") for j in range(4)],
            )
            files.append(nm)
        adds = []
        for i, nm in enumerate(files):
            dv = self._inline([i % 4])  # drop one row per file
            adds.append(self._dv_add(nm, dv))
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 3,
                          "readerFeatures": ["deletionVectors"]}},
            _meta(), *adds,
        ])
        grouped = {
            (r.id, r.v) for r in read_delta(spark, str(tmp_path)).collect()
        }
        # force the per-file path by raising the threshold
        import harness_aws_etl_pipeline_spark.sources.deltaread as dr

        src = open(dr.__file__).read()
        assert "len(dv_reads) <= 32" in src  # threshold the test assumes
        expected = {
            (i * 10 + j, f"r{i}-{j}")
            for i in range(36)
            for j in range(4)
            if j != i % 4
        }
        assert grouped == expected
        assert len(grouped) == 36 * 3

    def test_cardinality_mismatch_rejected(self, spark, tmp_path):
        a = _datafile(spark, tmp_path, "a.parquet", [(1, "x"), (2, "y")])
        dv = self._inline([0])
        dv["cardinality"] = 5
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 3,
                          "readerFeatures": ["deletionVectors"]}},
            _meta(), self._dv_add(a, dv),
        ])
        with pytest.raises(ValueError, match="cardinality mismatch"):
            read_delta(spark, str(tmp_path)).collect()


class TestColumnMapping:
    def _mapped_meta(self, partition_cols=()):
        schema = json.dumps({
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "col-aa11"}},
                {"name": "v", "type": "string", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": "col-bb22"}},
            ],
        })
        return {
            "metaData": {
                "id": "tbl-cm",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema,
                "partitionColumns": list(partition_cols),
                "configuration": {"delta.columnMapping.mode": "name"},
            }
        }

    def _physfile(self, spark, tmp_path, name, rows):
        p = tmp_path / "stage" / name
        spark.createDataFrame(
            rows, "`col-aa11` long, `col-bb22` string"
        ).coalesce(1).write.mode("overwrite").parquet(str(p))
        import glob
        import shutil

        shutil.move(glob.glob(str(p / "*.parquet"))[0], str(tmp_path / name))
        return name

    def test_name_mapping_reads_logical_names(self, spark, tmp_path):
        a = self._physfile(spark, tmp_path, "m.parquet", [(1, "x"), (2, "y")])
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            self._mapped_meta(), _add(a),
        ])
        df = read_delta(spark, str(tmp_path))
        assert df.columns == ["id", "v"]
        assert {(r.id, r.v) for r in df.collect()} == {(1, "x"), (2, "y")}

    def test_mapping_with_dv_composes(self, spark, tmp_path):
        a = self._physfile(
            spark, tmp_path, "m.parquet", [(i, f"r{i}") for i in range(4)]
        )
        dv = TestDeletionVectors()._inline([2])
        add = _add(a)
        add["add"]["deletionVector"] = dv
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 3,
                          "readerFeatures": ["columnMapping",
                                             "deletionVectors"]}},
            self._mapped_meta(), add,
        ])
        assert {r.id for r in read_delta(spark, str(tmp_path)).collect()} \
            == {0, 1, 3}

    def _idfile(self, spark, tmp_path, name, fields, rows):
        """Parquet with explicit parquet field ids (what Delta id-mode
        writers produce). fields = [(physical_name, type, field_id)]."""
        import glob
        import shutil

        from pyspark.sql import types as T

        st = T.StructType(
            [
                T.StructField(n, t, True, {"parquet.field.id": i})
                for n, t, i in fields
            ]
        )
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        p = tmp_path / "stage" / name
        spark.createDataFrame(rows, st).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(p))
        shutil.move(glob.glob(str(p / "*.parquet"))[0], str(tmp_path / name))
        return name

    def _id_meta(self, fields):
        """fields = [(logical, type_str_or_node, field_id, phys)]"""
        schema = json.dumps({
            "type": "struct",
            "fields": [
                {"name": n, "type": t, "nullable": True,
                 "metadata": {"delta.columnMapping.id": i,
                              "delta.columnMapping.physicalName": p}}
                for n, t, i, p in fields
            ],
        })
        return {
            "metaData": {
                "id": "tbl-id",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema,
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "id"},
            }
        }

    def test_id_mode_resolves_by_field_id(self, spark, tmp_path):
        from pyspark.sql import types as T

        a = self._idfile(
            spark, tmp_path, "m.parquet",
            [("col-aa11", T.LongType(), 1), ("col-bb22", T.StringType(), 2)],
            [(1, "x"), (2, "y")],
        )
        meta = self._id_meta(
            [("id", "long", 1, "col-aa11"), ("v", "string", 2, "col-bb22")]
        )
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            meta, _add(a),
        ])
        df = read_delta(spark, str(tmp_path))
        assert df.columns == ["id", "v"]
        assert {(r.id, r.v) for r in df.collect()} == {(1, "x"), (2, "y")}

    def test_id_mode_rename_and_drop_readd_cycle(self, spark, tmp_path):
        """The in-place-upgrade shape id mode exists for: a column is
        renamed (same id), another dropped and re-added under a NEW id
        — old files must resolve the rename and yield null for the
        re-added column, never the dropped column's stale bytes."""
        from pyspark.sql import types as T

        f1 = self._idfile(
            spark, tmp_path, "f1.parquet",
            [("col-aa11", T.LongType(), 1), ("col-bb22", T.StringType(), 2)],
            [(1, "old")],
        )
        f2 = self._idfile(
            spark, tmp_path, "f2.parquet",
            [("col-aa11", T.LongType(), 1), ("col-cc33", T.StringType(), 3)],
            [(2, "new")],
        )
        # schema: id renamed to ident (id 1); v (id 2) dropped; w
        # re-added as id 3
        meta = self._id_meta(
            [("ident", "long", 1, "col-aa11"), ("w", "string", 3, "col-cc33")]
        )
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            meta, _add(f1), _add(f2),
        ])
        got = {(r.ident, r.w) for r in read_delta(spark, str(tmp_path)).collect()}
        assert got == {(1, None), (2, "new")}

    def test_id_mode_nested_field_resolution(self, spark, tmp_path):
        from pyspark.sql import types as T

        inner = T.StructType(
            [T.StructField("col-x", T.LongType(), True,
                           {"parquet.field.id": 11})]
        )
        a = self._idfile(
            spark, tmp_path, "n.parquet",
            [("col-s", inner, 10)],
            [((5,),)],
        )
        schema = json.dumps({
            "type": "struct",
            "fields": [
                {"name": "s", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 10,
                              "delta.columnMapping.physicalName": "col-s"},
                 "type": {"type": "struct", "fields": [
                     {"name": "x_renamed", "type": "long", "nullable": True,
                      "metadata": {"delta.columnMapping.id": 11,
                                   "delta.columnMapping.physicalName":
                                   "col-x"}}]}},
            ],
        })
        meta = {
            "metaData": {
                "id": "t", "format": {"provider": "parquet", "options": {}},
                "schemaString": schema, "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "id"},
            }
        }
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            meta, _add(a),
        ])
        got = read_delta(spark, str(tmp_path)).collect()
        assert [r.s.x_renamed for r in got] == [5]

    def test_id_mode_missing_id_rejected(self, spark, tmp_path):
        a = self._physfile(spark, tmp_path, "m.parquet", [(1, "x")])
        meta = self._mapped_meta()  # has physicalName but NO ids? it has ids
        # strip the ids to simulate a malformed id-mode table
        schema = json.loads(meta["metaData"]["schemaString"])
        for f in schema["fields"]:
            f["metadata"].pop("delta.columnMapping.id", None)
        meta["metaData"]["schemaString"] = json.dumps(schema)
        meta["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 2}}, meta, _add(a),
        ])
        with pytest.raises(ValueError, match="columnMapping.id"):
            read_delta(spark, str(tmp_path))

    def test_one_level_nested_mapping_reads(self, spark, tmp_path):
        """Round 12: ONE nested struct level restores by name (was a
        loud rejection through r11); deeper nesting still rejects —
        pinned by TestNameModeNested.test_deeper_nesting_still_rejects."""
        schema = json.dumps({
            "type": "struct",
            "fields": [
                {"name": "s", "nullable": True, "metadata":
                 {"delta.columnMapping.physicalName": "col-s"},
                 "type": {"type": "struct", "fields": [
                     {"name": "x", "type": "long", "nullable": True,
                      "metadata":
                      {"delta.columnMapping.physicalName": "col-x"}}]}},
            ],
        })
        meta = {
            "metaData": {
                "id": "t", "format": {"provider": "parquet", "options": {}},
                "schemaString": schema, "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "name"},
            }
        }
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 2}}, meta,
        ])
        df = read_delta(spark, str(tmp_path))
        assert df.columns == ["s"]
        assert df.schema["s"].dataType.fieldNames() == ["x"]
        assert df.count() == 0

    def test_mapped_partition_values_use_physical_keys(self, spark, tmp_path):
        schema = json.dumps({
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "col-aa11"}},
                {"name": "g", "type": "integer", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "col-gg33"}},
            ],
        })
        meta = {
            "metaData": {
                "id": "t", "format": {"provider": "parquet", "options": {}},
                "schemaString": schema, "partitionColumns": ["g"],
                "configuration": {"delta.columnMapping.mode": "name"},
            }
        }
        p = tmp_path / "stage" / "p.parquet"
        spark.createDataFrame([(1,)], "`col-aa11` long").coalesce(1)\
            .write.mode("overwrite").parquet(str(p))
        import glob
        import shutil

        shutil.move(glob.glob(str(p / "*.parquet"))[0],
                    str(tmp_path / "p.parquet"))
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 2}}, meta,
            _add("p.parquet", {"col-gg33": "9"}),
        ])
        got = read_delta(spark, str(tmp_path)).collect()
        assert [(r.id, r.g) for r in got] == [(1, 9)]


class TestPartitioned:
    def test_partition_values_recovered_typed(self, spark, tmp_path):
        schema = json.dumps({
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "g", "type": "integer", "nullable": True, "metadata": {}},
            ],
        })
        meta = _meta(["g"])
        meta["metaData"]["schemaString"] = schema
        a = _datafile(spark, tmp_path, "g1.parquet", [(1, "x")])
        b = _datafile(spark, tmp_path, "g2.parquet", [(2, "y")])
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 1}}, meta,
            _add(a, {"g": "1"}), _add(b, {"g": "2"}),
        ])
        got = {
            (r.id, r.v, r.g) for r in read_delta(spark, str(tmp_path)).collect()
        }
        assert got == {(1, "x", 1), (2, "y", 2)}
        df = read_delta(spark, str(tmp_path))
        assert dict(df.dtypes)["g"] == "int"  # typed per table schema
        # partition pruning happens on the reattached literal
        assert df.filter(F.col("g") == 2).count() == 1


class TestCheckpoint:
    def test_checkpoint_replay_skips_earlier_commits(self, spark, tmp_path):
        t = TestSnapshotFold()._basic_table(spark, tmp_path)
        # write a v1 checkpoint holding the LIVE file set, then delete
        # the JSON commits it supersedes — replay must come from it
        cp_schema = (
            "add struct<path:string,partitionValues:map<string,string>,"
            "size:long,dataChange:boolean>, "
            "metaData struct<id:string,schemaString:string,"
            "partitionColumns:array<string>>, "
            "protocol struct<minReaderVersion:int,"
            "readerFeatures:array<string>>"
        )
        rows = [
            (("part-a.parquet", {}, 1, True), None, None),
            (("part-c.parquet", {}, 1, True), None, None),
            (None, ("tbl-1", _SCHEMA_JSON, []), None),
            (None, None, (1, None)),
        ]
        cp = spark.createDataFrame(rows, cp_schema)
        cp.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "cpstage")
        )
        import glob
        import shutil

        src = glob.glob(str(tmp_path / "cpstage" / "*.parquet"))[0]
        shutil.move(
            src,
            str(tmp_path / "_delta_log" / "00000000000000000001.checkpoint.parquet"),
        )
        # delete commits 0 and 1: only the checkpoint carries them now
        (tmp_path / "_delta_log" / f"{0:020d}.json").unlink()
        (tmp_path / "_delta_log" / f"{1:020d}.json").unlink()
        _commit(t, 2, [{"remove": {"path": "part-a.parquet",
                                   "dataChange": True}}])
        got = {(r.id, r.v) for r in read_delta(spark, str(t)).collect()}
        assert got == {(4, "w")}
        snap = delta_snapshot(spark, str(t))
        assert snap["version"] == 2


class TestCli:
    def test_delta_cli(self, spark, tmp_path, capsys):
        from harness_aws_etl_pipeline_spark.cli import main

        t = TestSnapshotFold()._basic_table(spark, tmp_path)
        rc = main(["delta", "--path", str(t), "--history"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert [h["version"] for h in rep["history"]] == [0, 1]

        out = tmp_path / "export"
        rc = main([
            "delta", "--path", str(t), "--version", "0",
            "--output", str(out),
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["version"] == 0 and rep["rows"] == 3
        assert spark.read.parquet(str(out)).count() == 3


class TestSnapTableExport:
    def test_snaptable_reads_back_as_delta_with_time_travel(
        self, spark, tmp_path
    ):
        """The inverse interop loop: SnapTable history → _delta_log →
        read_delta must equal snaptable.read at EVERY version."""
        from harness_aws_etl_pipeline_spark.sinks.deltaexport import (
            export_delta_log,
        )
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        t = SnapTable(spark, str(tmp_path / "t"))
        t.write(
            spark.range(10).withColumn("v", F.lit("a")), mode="overwrite"
        )
        t.write(
            spark.range(10, 15).withColumn("v", F.lit("b")), mode="append"
        )
        t.delete_where("id >= 12")
        rep = export_delta_log(spark, t.path)
        assert rep["delta_versions"] == 3 and rep["base_snap_version"] == 0
        for dv, sv in enumerate(t.versions()):
            want = {
                (r.id, r.v) for r in t.read(version=sv).collect()
            }
            got = {
                (r.id, r.v)
                for r in read_delta(spark, t.path, version=dv).collect()
            }
            assert got == want, (dv, sv)
        h = delta_history(spark, t.path)
        assert [x["operation"] for x in h] == ["OVERWRITE", "APPEND", "DELETE"]

    def test_checkpointed_export_folds_without_json_commits(
        self, spark, tmp_path
    ):
        """checkpoint=True writes a classic parquet checkpoint at the
        final version + _last_checkpoint; the snapshot folds from it
        even with every JSON commit deleted, and a later re-export
        (remapped history) clears the stale checkpoint."""
        import glob as _glob
        import json as _json

        from harness_aws_etl_pipeline_spark.sinks.deltaexport import (
            export_delta_log,
        )
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        t = SnapTable(spark, str(tmp_path / "t"))
        t.write(spark.range(6).withColumn("v", F.lit("a")), mode="overwrite")
        t.write(spark.range(6, 9).withColumn("v", F.lit("b")), mode="append")
        rep = export_delta_log(spark, t.path, checkpoint=True)
        assert rep["checkpoint_version"] == 1
        log = tmp_path / "t" / "_delta_log"
        lc = _json.loads((log / "_last_checkpoint").read_text())
        assert lc["version"] == 1
        # delete the JSON commits: the checkpoint alone must carry it
        for p in _glob.glob(str(log / "*.json")):
            import os as _os

            _os.unlink(p)
        got = {(r.id, r.v) for r in read_delta(spark, t.path).collect()}
        assert got == {(r.id, r.v) for r in t.read().collect()}
        assert delta_snapshot(spark, t.path)["version"] == 1
        # remapped re-export clears the stale checkpoint artifacts
        t.write(spark.range(9, 11).withColumn("v", F.lit("c")), mode="append")
        t.expire_snapshots(keep_last=1)
        rep = export_delta_log(spark, t.path)
        assert rep["delta_versions"] == 1 and rep["checkpoint_version"] is None
        assert not _glob.glob(str(log / "*checkpoint*"))
        assert not (log / "_last_checkpoint").exists()
        assert read_delta(spark, t.path).count() == t.read().count()

    def test_reexport_after_expiry_deletes_stale_commits(
        self, spark, tmp_path
    ):
        """Round-10: re-export after expire_snapshots remaps history to
        start at delta version 0 — commit files beyond the new length
        from the previous (longer) export must be deleted, or a Delta
        reader folds the remapped base plus the old-mapping tail into
        a corrupted snapshot."""
        from harness_aws_etl_pipeline_spark.sinks.deltaexport import (
            export_delta_log,
        )
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        t = SnapTable(spark, str(tmp_path / "t"))
        t.write(spark.range(4).withColumn("v", F.lit("a")), mode="overwrite")
        t.write(
            spark.range(4, 7).withColumn("v", F.lit("b")), mode="append"
        )
        t.delete_where("id >= 6")
        rep = export_delta_log(spark, t.path)
        assert rep["delta_versions"] == 3
        t.expire_snapshots(keep_last=1)
        rep = export_delta_log(spark, t.path)
        assert rep["delta_versions"] == 1
        # stale 1.json / 2.json are gone — the latest snapshot is
        # version 0 and reads exactly the retained rows
        import glob as _glob

        left = sorted(
            int(p.rsplit("/", 1)[-1][:-5])
            for p in _glob.glob(str(tmp_path / "t" / "_delta_log" / "*.json"))
        )
        assert left == [0]
        snap = delta_snapshot(spark, t.path)
        assert snap["version"] == 0
        got = {(r.id, r.v) for r in read_delta(spark, t.path).collect()}
        assert got == {(r.id, r.v) for r in t.read().collect()}

    def test_export_idempotent_and_refreshable(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltaexport import (
            export_delta_log,
        )
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        t = SnapTable(spark, str(tmp_path / "t"))
        t.write(spark.range(3), mode="overwrite")
        export_delta_log(spark, t.path)
        n1 = read_delta(spark, t.path).count()
        t.write(spark.range(3, 5), mode="append")
        rep = export_delta_log(spark, t.path)  # refresh after new commit
        assert rep["delta_versions"] == 2
        assert n1 == 3 and read_delta(spark, t.path).count() == 5
        # snaptable's own readers are untouched by the coexisting log
        assert t.read().count() == 5


class TestChanges:
    def test_append_only_changes(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = TestSnapshotFold()._basic_table(spark, tmp_path)
        # (0, 1] rewrote part-b away → not representable append-only
        with pytest.raises(ValueError, match="append-only"):
            delta_changes(spark, str(t), since_version=0)
        # add a pure append commit and diff (1, 2]
        d = _datafile(spark, tmp_path, "part-d.parquet", [(9, "q")])
        _commit(tmp_path, 2, [_add(d)])
        got = {
            (r.id, r.v)
            for r in delta_changes(spark, str(t), since_version=1).collect()
        }
        assert got == {(9, "q")}
        # empty window
        assert delta_changes(
            spark, str(t), since_version=2, to_version=2
        ).count() == 0

    def test_in_window_rewrite_caught(self, spark, tmp_path):
        """Round-10 guard: a file added AND removed inside the same
        window is invisible to the by-path snapshot diff; the
        per-commit replay must still raise."""
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        a = _datafile(spark, tmp_path, "a.parquet", [(1, "x")])
        b = _datafile(spark, tmp_path, "b.parquet", [(2, "y")])
        c = _datafile(spark, tmp_path, "c.parquet", [(3, "z")])
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 1}}, _meta(), _add(a),
        ])
        _commit(tmp_path, 1, [_add(b)])
        _commit(tmp_path, 2, [
            {"remove": {"path": b, "dataChange": True}}, _add(c),
        ])
        # (0, 2]: b was added at v1 and rewritten away at v2 — the
        # final file SET is {a, c}, a pure superset of v0's {a}, so
        # the old set-diff guard passed silently
        with pytest.raises(ValueError, match="append-only"):
            delta_changes(spark, str(tmp_path), since_version=0)

    def test_append_then_compact_in_window_emitted(self, spark, tmp_path):
        """r11 ADVICE: rows appended at v1 then compacted at v2 — both
        inside the window — must surface via the compacted output
        (dataChange=false add), not be silently dropped; a later
        re-compaction of that output keeps the lineage alive."""
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        a = _datafile(spark, tmp_path, "a.parquet", [(1, "x")])
        b = _datafile(spark, tmp_path, "b.parquet", [(2, "y")])
        c = _datafile(spark, tmp_path, "c.parquet", [(2, "y")])
        d = _datafile(spark, tmp_path, "d.parquet", [(2, "y")])
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 1}}, _meta(), _add(a),
        ])
        _commit(tmp_path, 1, [_add(b)])
        cadd = _add(c)
        cadd["add"]["dataChange"] = False
        _commit(tmp_path, 2, [
            {"remove": {"path": b, "dataChange": False}}, cadd,
        ])
        got = {
            (r.id, r.v)
            for r in delta_changes(spark, str(tmp_path), 0).collect()
        }
        assert got == {(2, "y")}
        # chain: the absorbing output is itself compacted away at v3
        dadd = _add(d)
        dadd["add"]["dataChange"] = False
        _commit(tmp_path, 3, [
            {"remove": {"path": c, "dataChange": False}}, dadd,
        ])
        got = {
            (r.id, r.v)
            for r in delta_changes(spark, str(tmp_path), 0).collect()
        }
        assert got == {(2, "y")}
        # a window past the append sees pure pre-window compaction: empty
        assert delta_changes(spark, str(tmp_path), 2).count() == 0

    def test_mixed_compaction_of_pre_window_files_raises(
        self, spark, tmp_path
    ):
        """A rewrite that merges in-window appends WITH pre-window
        files double-counts pre-window rows in its outputs — the
        window is honestly unrepresentable."""
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        a = _datafile(spark, tmp_path, "a.parquet", [(1, "x")])
        b = _datafile(spark, tmp_path, "b.parquet", [(2, "y")])
        c = _datafile(spark, tmp_path, "c.parquet", [(1, "x"), (2, "y")])
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 1}}, _meta(), _add(a),
        ])
        _commit(tmp_path, 1, [_add(b)])
        cadd = _add(c)
        cadd["add"]["dataChange"] = False
        _commit(tmp_path, 2, [
            {"remove": {"path": a, "dataChange": False}},
            {"remove": {"path": b, "dataChange": False}},
            cadd,
        ])
        with pytest.raises(ValueError, match="pre-window"):
            delta_changes(spark, str(tmp_path), 0)
        # the same v2 viewed from since=1 is PURE pre-window
        # compaction: representable, zero new rows
        assert delta_changes(spark, str(tmp_path), 1).count() == 0

    def test_in_window_dv_update_caught(self, spark, tmp_path):
        """A DV update re-adds the SAME path (no path-set change at
        all) — only the per-commit remove replay sees it."""
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        a = _datafile(spark, tmp_path, "a.parquet", [(0, "x"), (1, "y")])
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 3,
                          "readerFeatures": ["deletionVectors"]}},
            _meta(), _add(a),
        ])
        dv_add = _add(a)
        dv_add["add"]["deletionVector"] = TestDeletionVectors()._inline([0])
        _commit(tmp_path, 1, [
            {"remove": {"path": a, "dataChange": True}}, dv_add,
        ])
        with pytest.raises(ValueError, match="append-only"):
            delta_changes(spark, str(tmp_path), since_version=0)


class TestReadLake:
    def test_detection_and_dispatch(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltaexport import (
            export_delta_log,
        )
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable
        from harness_aws_etl_pipeline_spark.sources.lakeread import (
            detect_lake_format,
            read_lake,
        )

        # snaptable — and after exporting a delta log, STILL snaptable
        # (native metadata wins on ambiguous layouts)
        st = SnapTable(spark, str(tmp_path / "snap"))
        st.write(spark.range(4), mode="overwrite")
        assert detect_lake_format(spark, st.path) == "snaptable"
        export_delta_log(spark, st.path)
        assert detect_lake_format(spark, st.path) == "snaptable"
        assert read_lake(spark, st.path).count() == 4

        # delta (hand-written log from the suite fixture)
        d = TestSnapshotFold()._basic_table(spark, tmp_path / "dl")
        assert detect_lake_format(spark, str(d)) == "delta"
        assert read_lake(spark, str(d), version=0).count() == 3

        # plain parquet and nothing-at-all
        spark.range(2).write.parquet(str(tmp_path / "pq"))
        assert detect_lake_format(spark, str(tmp_path / "pq")) == "parquet"
        assert read_lake(spark, str(tmp_path / "pq")).count() == 2
        import pytest as _pytest

        (tmp_path / "empty").mkdir()
        with _pytest.raises(ValueError, match="recognizable"):
            read_lake(spark, str(tmp_path / "empty"))

    def test_lake_detects_hudi_iceberg_avro(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.lakeread import (
            detect_lake_format,
            read_lake,
        )
        from tests.test_hudiread import TestHudi
        from tests.test_icebergread import TestRead as IceRead
        from tests.test_avroread import RECORDS, SCHEMA
        from harness_aws_etl_pipeline_spark.sources.avroread import (
            write_avro_bytes,
        )

        (tmp_path / "hu").mkdir()
        (tmp_path / "ib").mkdir()
        h = TestHudi()._table(spark, tmp_path / "hu")
        assert detect_lake_format(spark, str(h)) == "hudi"
        assert read_lake(spark, str(h)).count() == 3

        i = IceRead()._table(spark, tmp_path / "ib")
        assert detect_lake_format(spark, str(i)) == "iceberg"
        assert read_lake(spark, str(i), snapshot_id=100).count() == 3

        av = tmp_path / "av"
        av.mkdir()
        (av / "x.avro").write_bytes(write_avro_bytes(SCHEMA, RECORDS))
        assert detect_lake_format(spark, str(av)) == "avro"
        assert read_lake(spark, str(av)).count() == 3


class TestNameModeNested:
    """Round 12: NAME-mode column mapping one nested struct level —
    inner fields restore by physicalName; deeper nesting rejects."""

    def _nested_meta(self, deep=False):
        inner = {
            "type": "struct",
            "fields": [
                {"name": "x", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 3,
                              "delta.columnMapping.physicalName": "col-x3"}},
                {"name": "y", "type": "string", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 4,
                              "delta.columnMapping.physicalName": "col-y4"}},
            ],
        }
        if deep:
            inner["fields"].append({
                "name": "z",
                "type": {
                    "type": "struct",
                    "fields": [{
                        "name": "w", "type": "long", "nullable": True,
                        "metadata": {
                            "delta.columnMapping.id": 9,
                            "delta.columnMapping.physicalName": "col-w9",
                        },
                    }],
                },
                "nullable": True,
                "metadata": {"delta.columnMapping.id": 8,
                             "delta.columnMapping.physicalName": "col-z8"},
            })
        schema = json.dumps({
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "col-aa11"}},
                {"name": "s", "type": inner, "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": "col-ss22"}},
            ],
        })
        return {
            "metaData": {
                "id": "tbl-nm",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema,
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "name"},
            }
        }

    def test_nested_rename_round_trips(self, spark, tmp_path):
        import glob
        import shutil

        p = tmp_path / "stage" / "n.parquet"
        spark.createDataFrame(
            [(1, (10, "a")), (2, None)],
            "`col-aa11` long, "
            "`col-ss22` struct<`col-x3`: long, `col-y4`: string>",
        ).coalesce(1).write.mode("overwrite").parquet(str(p))
        shutil.move(
            glob.glob(str(p / "*.parquet"))[0], str(tmp_path / "n.parquet")
        )
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            self._nested_meta(), _add("n.parquet"),
        ])
        df = read_delta(spark, str(tmp_path))
        assert df.columns == ["id", "s"]
        assert df.schema["s"].dataType.fieldNames() == ["x", "y"]
        rows = {tuple(r) for r in df.select(
            "id", "s.x", "s.y"
        ).collect()}
        assert rows == {(1, 10, "a"), (2, None, None)}
        # a NULL struct stays null (not a struct of nulls)
        assert df.where("s is null").count() == 1

    def test_deeper_nesting_still_rejects(self, spark, tmp_path):
        import glob
        import shutil

        p = tmp_path / "stage" / "n.parquet"
        spark.createDataFrame(
            [(1,)], "`col-aa11` long"
        ).coalesce(1).write.mode("overwrite").parquet(str(p))
        shutil.move(
            glob.glob(str(p / "*.parquet"))[0], str(tmp_path / "n.parquet")
        )
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            self._nested_meta(deep=True), _add("n.parquet"),
        ])
        with pytest.raises(ValueError, match="nested level"):
            read_delta(spark, str(tmp_path))


class TestCliWriteAndCdf:
    def test_cli_write_delete_cdf_changes(self, spark, tmp_path, capsys):
        """Round 12 CLI surface: delta --write / --delete-where --cdf /
        --changes-since --cdf end to end."""
        from harness_aws_etl_pipeline_spark.cli import main

        src = tmp_path / "src"
        spark.createDataFrame(
            [(i, "a") for i in range(6)], "id long, v string"
        ).write.parquet(str(src))
        t = tmp_path / "t"
        rc = main(["delta", "--path", str(t), "--write", str(src)])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "delta_write" and rep["version"] == 0

        rc = main([
            "delta", "--path", str(t),
            "--delete-where", "id = 2", "--cdf",
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows_deleted"] == 1
        import glob as _glob

        assert _glob.glob(str(t / "_change_data" / "*.parquet"))

        rc = main([
            "delta", "--path", str(t), "--changes-since", "0", "--cdf",
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] == 1 and rep["cdf"] is True
        assert rep["preview"][0]["_change_type"] == "delete"
        assert rep["preview"][0]["id"] == 2


class TestNestedIdMappedPruning:
    def test_nested_field_select_survives_pruning(self, spark, tmp_path):
        """Nested schema pruning rebuilds pruned struct types without
        field metadata, which broke fieldId resolution of nested
        id-mapped fields (select("s.a") returned NULLs while
        select("s") read fine). The mapped read plan disables nested
        pruning for the session when such a table is scanned."""
        from tests.test_deltadml import TestNestedIdMappedDml

        t = TestNestedIdMappedDml()._nested_id_table(spark, tmp_path)
        df = read_delta(spark, t)
        assert sorted(
            r["a"] for r in df.select(df.s.a.alias("a")).collect()
        ) == [0, 10, 20, 30]
        assert df.filter("s.a = 20").count() == 1
