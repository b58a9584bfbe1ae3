"""As-of join semantics: latest-prior matching, >= ties, unmatched
nulls, tolerance expiry."""

from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.asof import as_of_join


def _dfs(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 10:00:00"),
            (2, "u1", "2024-01-01 12:00:00"),
            (3, "u2", "2024-01-01 09:00:00"),  # before any right row
            (4, "u3", "2024-01-01 10:00:00"),  # exact-tie with right
        ],
        "event_id long, user_id string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 09:30:00", 10.0),
            ("u1", "2024-01-01 11:00:00", 20.0),
            ("u2", "2024-01-01 11:00:00", 30.0),
            ("u3", "2024-01-01 10:00:00", 40.0),
        ],
        "user_id string, p_ts string, p_value double",
    ).withColumn("p_ts", F.to_timestamp("p_ts"))
    return left, right


class TestRangeJoin:
    def test_matches_inequality_join(self, spark):
        from harness_aws_etl_pipeline_spark.operators.asof import range_join

        points = spark.createDataFrame(
            [(i, "u1" if i % 2 else "u2", f"2024-01-01 {i:02d}:15:00") for i in range(10)],
            "pid long, k string, t string",
        ).withColumn("t", F.to_timestamp("t"))
        intervals = spark.createDataFrame(
            [
                ("u1", "2024-01-01 01:00:00", "2024-01-01 04:00:00"),
                ("u2", "2024-01-01 02:00:00", "2024-01-01 02:16:00"),
                ("u1", "2024-01-01 05:15:00", "2024-01-01 07:15:00"),
            ],
            "k string, s string, e string",
        ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))

        bucketed = range_join(points, intervals, "t", "s", "e", on="k",
                              bucket_width_seconds=1800)
        naive = points.join(
            intervals,
            (points.k == intervals.k) & (points.t >= intervals.s) & (points.t < intervals.e),
        )
        got = sorted((r["pid"], str(r["s"])) for r in bucketed.collect())
        want = sorted((r["pid"], str(r["s"])) for r in naive.collect())
        assert got == want and len(got) == 4

    def test_degenerate_interval_matches_nothing(self, spark):
        from harness_aws_etl_pipeline_spark.operators.asof import range_join

        pts = spark.createDataFrame(
            [(1, "2024-01-01 02:00:00")], "pid long, t string"
        ).withColumn("t", F.to_timestamp("t"))
        iv = spark.createDataFrame(
            [
                ("2024-01-01 02:00:00", "2024-01-01 02:00:00"),  # empty
                ("2024-01-01 03:00:00", "2024-01-01 01:00:00"),  # negative
            ],
            "s string, e string",
        ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
        assert range_join(pts, iv, "t", "s", "e").count() == 0

    def test_exclusive_end_boundary(self, spark):
        from harness_aws_etl_pipeline_spark.operators.asof import range_join

        pts = spark.createDataFrame(
            [(1, "2024-01-01 02:00:00")], "pid long, t string"
        ).withColumn("t", F.to_timestamp("t"))
        iv = spark.createDataFrame(
            [("2024-01-01 01:00:00", "2024-01-01 02:00:00")], "s string, e string"
        ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
        assert range_join(pts, iv, "t", "s", "e").count() == 0  # end exclusive

    def test_fractional_second_end_reaches_boundary_bucket(self, spark):
        from harness_aws_etl_pipeline_spark.operators.asof import range_join

        # interval end = bucket boundary + 0.5s; a point just past the
        # boundary is a true match. unix_timestamp truncates to whole
        # seconds, which used to drop the interval's last bucket.
        pts = spark.createDataFrame(
            [(1, "2024-01-01 00:01:00.2")], "pid long, t string"
        ).withColumn("t", F.to_timestamp("t"))
        iv = spark.createDataFrame(
            [("2024-01-01 00:00:30", "2024-01-01 00:01:00.5")], "s string, e string"
        ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
        assert range_join(pts, iv, "t", "s", "e", bucket_width_seconds=60).count() == 1


class TestAsOfJoin:
    def test_latest_prior_and_ties(self, spark):
        left, right = _dfs(spark)
        out = {
            r["event_id"]: r["p_value_asof"]
            for r in as_of_join(
                left, right, "user_id", "ts", "p_ts", ["p_value"]
            ).collect()
        }
        assert out[1] == 10.0  # 09:30 is latest ≤ 10:00
        assert out[2] == 20.0  # 11:00 supersedes 09:30
        assert out[3] is None  # nothing at or before 09:00
        assert out[4] == 40.0  # exact timestamp tie matches (>=)

    def test_duplicate_right_timestamps_deterministic(self, spark):
        # two right rows at the identical (key, time): the carried
        # value must be the greatest value tuple, independent of
        # partitioning
        left = spark.createDataFrame(
            [(1, "u1", "2024-01-01 10:00:00")], "event_id long, user_id string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        right = spark.createDataFrame(
            [("u1", "2024-01-01 09:00:00", 5.0), ("u1", "2024-01-01 09:00:00", 9.0)],
            "user_id string, p_ts string, p_value double",
        ).withColumn("p_ts", F.to_timestamp("p_ts"))
        for nparts in (1, 4):
            got = as_of_join(
                left, right.repartition(nparts), "user_id", "ts", "p_ts", ["p_value"]
            ).first()["p_value_asof"]
            assert got == 9.0

    def test_null_on_matched_row_preserved_not_stale(self, spark):
        # the matched right row carries ALL its columns — including its
        # NULLs. Carrying columns independently would skip the NULL and
        # surface the STALE 09:00 price, and could mix columns from
        # different right rows.
        left = spark.createDataFrame(
            [(1, "u1", "2024-01-01 12:00:00")],
            "event_id long, user_id string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        right = spark.createDataFrame(
            [
                ("u1", "2024-01-01 09:00:00", 10.0, "old"),
                ("u1", "2024-01-01 11:00:00", None, "new"),
            ],
            "user_id string, p_ts string, p_value double, tag string",
        ).withColumn("p_ts", F.to_timestamp("p_ts"))
        row = as_of_join(
            left, right, "user_id", "ts", "p_ts", ["p_value", "tag"]
        ).first()
        assert row["p_value_asof"] is None  # matched row's NULL, not 10.0
        assert row["tag_asof"] == "new"  # same single matched row
        assert str(row["p_ts_asof"]) == "2024-01-01 11:00:00"

    def test_row_count_preserved(self, spark):
        left, right = _dfs(spark)
        assert as_of_join(left, right, "user_id", "ts", "p_ts").count() == left.count()

    def test_tolerance_expires_stale_matches(self, spark):
        left, right = _dfs(spark)
        out = {
            r["event_id"]: r["p_value_asof"]
            for r in as_of_join(
                left, right, "user_id", "ts", "p_ts", ["p_value"],
                tolerance_seconds=3600,
            ).collect()
        }
        assert out[1] == 10.0  # 30 min old — fresh
        assert out[2] == 20.0  # 60 min old — on the boundary, kept
        assert out[4] == 40.0
        # make the only u1@12:00 candidate 2.5h old → expires
        right_old = right.filter(F.col("p_value") != 20.0)
        out2 = {
            r["event_id"]: r["p_value_asof"]
            for r in as_of_join(
                left, right_old, "user_id", "ts", "p_ts", ["p_value"],
                tolerance_seconds=3600,
            ).collect()
        }
        assert out2[2] is None

    def test_subsecond_tolerance(self, spark):
        # 0.5 s tolerance with 0.4 s and 0.6 s gaps — whole-second
        # unix_timestamp math judges both gaps as 0 s and wrongly
        # keeps the 0.6 s match
        left = spark.createDataFrame(
            [
                (1, "a", "2024-01-01 10:00:00.9"),  # 0.4 s after right
                (2, "b", "2024-01-01 10:00:01.1"),  # 0.6 s after right
            ],
            "event_id long, user_id string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        right = spark.createDataFrame(
            [
                ("a", "2024-01-01 10:00:00.5", 1.0),
                ("b", "2024-01-01 10:00:00.5", 2.0),
            ],
            "user_id string, p_ts string, p_value double",
        ).withColumn("p_ts", F.to_timestamp("p_ts"))
        out = {
            r["event_id"]: r["p_value_asof"]
            for r in as_of_join(
                left, right, "user_id", "ts", "p_ts", ["p_value"],
                tolerance_seconds=0.5,
            ).collect()
        }
        assert out[1] == 1.0  # 0.4 s old — inside tolerance
        assert out[2] is None  # 0.6 s old — expired

    def test_microsecond_end_exclusivity_buckets(self, spark):
        from harness_aws_etl_pipeline_spark.operators.asof import range_join

        # end − 1 µs is the last instant inside the interval; end
        # itself is out. Exact at timestamp resolution — no float
        # epsilon involved.
        pts = spark.createDataFrame(
            [(1, "2024-01-01 00:00:59.999999"), (2, "2024-01-01 00:01:00")],
            "pid long, t string",
        ).withColumn("t", F.to_timestamp("t"))
        iv = spark.createDataFrame(
            [("2024-01-01 00:00:00", "2024-01-01 00:01:00")], "s string, e string"
        ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
        got = {r["pid"] for r in range_join(pts, iv, "t", "s", "e",
                                            bucket_width_seconds=60).collect()}
        assert got == {1}

    def test_pre_epoch_timestamps(self, spark):
        from harness_aws_etl_pipeline_spark.operators.asof import range_join

        # negative epoch micros: floor (not truncate-toward-zero)
        # bucketing must agree between the point and interval sides
        pts = spark.createDataFrame(
            [(1, "1969-12-31 23:59:30")], "pid long, t string"
        ).withColumn("t", F.to_timestamp("t"))
        iv = spark.createDataFrame(
            [("1969-12-31 23:59:00", "1970-01-01 00:00:30")], "s string, e string"
        ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
        assert range_join(pts, iv, "t", "s", "e", bucket_width_seconds=60).count() == 1


class TestIntervalOverlapJoin:
    def _naive(self, left, right, on=None):
        cond = (F.col("l_s") < F.col("r_e")) & (F.col("r_s") < F.col("l_e"))
        if on:
            return left.join(right, on).filter(cond)
        return left.crossJoin(right).filter(cond)

    def test_matches_naive_join_and_emits_each_pair_once(self, spark):
        from harness_aws_etl_pipeline_spark.operators.asof import (
            interval_overlap_join,
        )

        # intervals spanning 1..9 hourly buckets: multi-bucket overlaps
        # must still come out exactly once
        left = spark.createDataFrame(
            [
                (i, "k1" if i % 2 else "k2",
                 f"2024-01-01 {i:02d}:00:00", f"2024-01-01 {i + (i % 3) * 4 + 1:02d}:30:00")
                for i in range(8)
            ],
            "lid long, k string, l_s string, l_e string",
        ).withColumn("l_s", F.to_timestamp("l_s")).withColumn("l_e", F.to_timestamp("l_e"))
        right = spark.createDataFrame(
            [
                (j, "k1" if j % 3 else "k2",
                 f"2024-01-01 {j:02d}:45:00", f"2024-01-01 {j + 2:02d}:10:00")
                for j in range(10)
            ],
            "rid long, k string, r_s string, r_e string",
        ).withColumn("r_s", F.to_timestamp("r_s")).withColumn("r_e", F.to_timestamp("r_e"))

        for on in (None, "k"):
            got = interval_overlap_join(
                left, right, "l_s", "l_e", "r_s", "r_e", on=on,
                bucket_width_seconds=3600,
            )
            pairs = sorted((r["lid"], r["rid"]) for r in got.collect())
            want = sorted(
                (r["lid"], r["rid"]) for r in self._naive(left, right, on).collect()
            )
            assert pairs == want
            assert len(pairs) == len(set(pairs))  # no duplicate emission
            assert len(pairs) > 0

    def test_touching_endpoints_do_not_overlap(self, spark):
        from harness_aws_etl_pipeline_spark.operators.asof import (
            interval_overlap_join,
        )

        left = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", "2024-01-01 10:00:00")],
            "lid long, l_s string, l_e string",
        ).withColumn("l_s", F.to_timestamp("l_s")).withColumn("l_e", F.to_timestamp("l_e"))
        right = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", "2024-01-01 20:00:00"),  # touches: no
             (2, "2024-01-01 09:59:59", "2024-01-01 20:00:00")],  # overlaps: yes
            "rid long, r_s string, r_e string",
        ).withColumn("r_s", F.to_timestamp("r_s")).withColumn("r_e", F.to_timestamp("r_e"))
        got = interval_overlap_join(
            left, right, "l_s", "l_e", "r_s", "r_e", bucket_width_seconds=3600
        )
        assert [r["rid"] for r in got.collect()] == [2]

    def test_degenerate_intervals_dropped_both_sides(self, spark):
        from harness_aws_etl_pipeline_spark.operators.asof import (
            interval_overlap_join,
        )

        left = spark.createDataFrame(
            [(1, "2024-01-01 05:00:00", "2024-01-01 05:00:00"),  # empty
             (2, "2024-01-01 05:00:00", "2024-01-01 06:00:00")],
            "lid long, l_s string, l_e string",
        ).withColumn("l_s", F.to_timestamp("l_s")).withColumn("l_e", F.to_timestamp("l_e"))
        right = spark.createDataFrame(
            [(1, "2024-01-01 05:30:00", "2024-01-01 05:15:00"),  # inverted
             (2, "2024-01-01 05:30:00", "2024-01-01 07:00:00")],
            "rid long, r_s string, r_e string",
        ).withColumn("r_s", F.to_timestamp("r_s")).withColumn("r_e", F.to_timestamp("r_e"))
        got = interval_overlap_join(
            left, right, "l_s", "l_e", "r_s", "r_e", bucket_width_seconds=600
        )
        assert [(r["lid"], r["rid"]) for r in got.collect()] == [(2, 2)]
