"""Round 13: LakeRollup — incrementally-maintained gold rollups over
ANY lake table via lake_changes, with retraction-aware (sum/count)
folding for change-row sources."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.plans.lakeview import LakeRollup
from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable


def _rows(view):
    return {
        (r.g, r.cnt, r.rev)
        for r in view.read().select("g", "cnt", "rev").collect()
    }


def _mk(spark, tmp_path, src, change_rows=False, name="v"):
    return LakeRollup(
        spark,
        src,
        str(tmp_path / f"view_{name}"),
        name,
        group_cols=["g"],
        aggs={
            "cnt": ("count", F.lit(1)),
            "rev": ("sum", F.col("x")),
        },
        change_rows=change_rows,
    )


class TestSnapTableSource:
    def test_cdf_fold_through_dml(self, spark, tmp_path):
        src = str(tmp_path / "src")
        t = SnapTable(spark, src)
        t.write(
            spark.createDataFrame(
                [("a", 10), ("a", 20), ("b", 5)], "g string, x long"
            ),
            mode="overwrite",
        )
        t.set_properties({"delta.enableChangeDataFeed": "true"})
        v = _mk(spark, tmp_path, src, change_rows=True)
        assert v.refresh()["skipped"] is False
        assert _rows(v) == {("a", 2, 30), ("b", 1, 5)}
        # delete + merge-update fold exactly via retraction
        t.delete_where("g = 'b'")
        t.merge(
            spark.createDataFrame(
                [("a", 100), ("c", 7)], "g string, x long"
            ),
            key_cols=["g"],
        )
        # the merge replaces BOTH 'a' rows with one (keyed replace)
        assert v.refresh()["skipped"] is False
        assert _rows(v) == {("a", 1, 100), ("b", 0, 0), ("c", 1, 7)}
        # replay short-circuits on the ledger
        assert v.refresh()["skipped"] is True

    def test_append_only_policy_error_on_rewrite(self, spark, tmp_path):
        src = str(tmp_path / "src")
        t = SnapTable(spark, src)
        t.write(
            spark.createDataFrame([("a", 1)], "g string, x long"),
            mode="overwrite",
        )
        v = _mk(spark, tmp_path, src)
        v.refresh()
        t.delete_where("g = 'a'")
        with pytest.raises(ValueError, match="delete"):
            v.refresh()

    def test_minmax_rejected_in_change_mode(self, spark, tmp_path):
        with pytest.raises(ValueError, match="retractable"):
            LakeRollup(
                spark,
                str(tmp_path / "s"),
                str(tmp_path / "v"),
                "v",
                group_cols=["g"],
                aggs={"m": ("max", F.col("x"))},
                change_rows=True,
            )


class TestDeltaSource:
    def test_cdf_update_retraction(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
        )
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            write_delta,
        )

        src = str(tmp_path / "src")
        write_delta(
            spark,
            spark.createDataFrame(
                [("a", 10, 1), ("b", 5, 2)], "g string, x long, id long"
            ),
            src,
        )
        v = _mk(spark, tmp_path, src, change_rows=True)
        v.refresh()
        assert _rows(v) == {("a", 1, 10), ("b", 1, 5)}
        delta_merge(
            spark,
            spark.createDataFrame(
                [("a", 90, 1), ("c", 3, 9)], "g string, x long, id long"
            ),
            src,
            keys=["id"],
            change_data=True,
        )
        v.refresh()
        assert _rows(v) == {("a", 1, 90), ("b", 1, 5), ("c", 1, 3)}

    def test_append_only_delta(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            write_delta,
        )

        src = str(tmp_path / "src")
        write_delta(
            spark,
            spark.createDataFrame([("a", 1)], "g string, x long"),
            src,
        )
        v = _mk(spark, tmp_path, src)
        v.refresh()
        write_delta(
            spark,
            spark.createDataFrame([("a", 2), ("b", 7)], "g string, x long"),
            src,
        )
        v.refresh()
        assert _rows(v) == {("a", 2, 3), ("b", 1, 7)}


class TestIcebergSource:
    def test_position_delete_retraction(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_delete_where,
        )
        from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
            write_iceberg,
        )

        src = str(tmp_path / "src")
        write_iceberg(
            spark,
            spark.createDataFrame(
                [("a", 10, 1), ("a", 20, 2), ("b", 5, 3)],
                "g string, x long, id long",
            ),
            src,
        )
        v = _mk(spark, tmp_path, src, change_rows=True)
        v.refresh()
        assert _rows(v) == {("a", 2, 30), ("b", 1, 5)}
        # position deletes carry full pre-images: exact retraction
        iceberg_delete_where(spark, src, "id = 2")
        v.refresh()
        assert _rows(v) == {("a", 1, 10), ("b", 1, 5)}

    def test_equality_delete_retraction(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )
        from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
            write_iceberg,
        )

        src = str(tmp_path / "src")
        write_iceberg(
            spark,
            spark.createDataFrame(
                [("a", 10, 1)], "g string, x long, id long"
            ),
            src,
        )
        v = _mk(spark, tmp_path, src, change_rows=True)
        v.refresh()
        # equality-delete upsert: change capture resolves FULL
        # preimages from the prior snapshot, so retraction is exact
        iceberg_upsert(
            spark,
            src,
            spark.createDataFrame([("a", 99, 1)], "g string, x long, id long"),
            keys=["id"],
        )
        v.refresh()
        assert _rows(v) == {("a", 1, 99)}


class TestHudiSource:
    def test_append_only_hudi(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            write_hudi,
        )

        src = str(tmp_path / "src")
        write_hudi(
            spark,
            spark.createDataFrame([("a", 1)], "g string, x long"),
            src,
        )
        v = _mk(spark, tmp_path, src)
        v.refresh()
        write_hudi(
            spark,
            spark.createDataFrame([("b", 4)], "g string, x long"),
            src,
        )
        v.refresh()
        assert _rows(v) == {("a", 1, 1), ("b", 1, 4)}

    def test_change_rows_rejected(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            write_hudi,
        )

        src = str(tmp_path / "src")
        write_hudi(
            spark,
            spark.createDataFrame([("a", 1)], "g string, x long"),
            src,
        )
        with pytest.raises(ValueError, match="POST-images"):
            _mk(spark, tmp_path, src, change_rows=True)


class TestCli:
    def test_lakeview_cli_refresh(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            write_delta,
        )

        src = str(tmp_path / "src")
        write_delta(
            spark,
            spark.createDataFrame(
                [("a", 10), ("a", 5), ("b", 1)], "g string, x long"
            ),
            src,
        )
        view = str(tmp_path / "view")
        argv = [
            "lakeview", "--source", src, "--view", view, "--name", "rv",
            "--group-cols", "g",
            "--agg", "cnt=count:1", "--agg", "rev=sum:x",
            "--change-rows",
        ]
        rc = main(argv)
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] == 2 and rep["skipped"] is False
        assert rep["preview"][0] == {"g": "a", "cnt": 2, "rev": 15}
        # append + re-run folds the delta
        write_delta(
            spark,
            spark.createDataFrame([("b", 9)], "g string, x long"),
            src,
        )
        rc = main(argv)
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert {(p["g"], p["cnt"], p["rev"]) for p in rep["preview"]} == {
            ("a", 2, 15),
            ("b", 2, 10),
        }


class TestNullGroupGuard:
    def test_incremental_fold_rejects_null_groups(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            write_delta,
        )

        src = str(tmp_path / "src")
        write_delta(
            spark,
            spark.createDataFrame([("a", 1)], "g string, x long"),
            src,
        )
        v = _mk(spark, tmp_path, src)
        v.refresh()
        write_delta(
            spark,
            spark.createDataFrame([(None, 9)], "g string, x long"),
            src,
        )
        with pytest.raises(ValueError, match="NULL group"):
            v.refresh()

    def test_lake_cli_dispatch(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        src = str(tmp_path / "in")
        spark.createDataFrame(
            [("a", 1), ("b", 2)], "g string, x long"
        ).write.parquet(src)
        t = str(tmp_path / "t")
        rc = main([
            "lake", "--path", t, "--write", src, "--format", "delta",
        ])
        assert rc == 0
        json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        rc = main(["lake", "--path", t, "--show", "5"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["format"] == "delta" and rep["rows"] == 2
        # append then incremental consume from version 0
        src2 = str(tmp_path / "in2")
        spark.createDataFrame([("c", 3)], "g string, x long").write.parquet(
            src2
        )
        rc = main(["lake", "--path", t, "--write", src2])
        assert rc == 0
        capsys.readouterr()
        rc = main(["lake", "--path", t, "--changes-since", "0"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] == 1 and rep["preview"][0]["g"] == "c"

    def test_expired_cursor_raises_loudly(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.plans.lakeview import (
            LakeRollup,
        )
        from harness_aws_etl_pipeline_spark.sinks.compact import (
            iceberg_expire_snapshots,
        )
        from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
            write_iceberg,
        )

        t = str(tmp_path / "src")
        write_iceberg(
            spark, spark.createDataFrame([("a", 1)], "g string, x long"), t
        )
        v = LakeRollup(
            spark, t, str(tmp_path / "v"), "v",
            group_cols=["g"],
            aggs={"cnt": ("count", F.lit(1))},
        )
        v.refresh()
        for val in (2, 3):
            write_iceberg(
                spark,
                spark.createDataFrame([("b", val)], "g string, x long"),
                t,
                mode="append",
            )
        iceberg_expire_snapshots(spark, t, keep_last=1)
        with pytest.raises(ValueError, match="expired"):
            v.refresh()
