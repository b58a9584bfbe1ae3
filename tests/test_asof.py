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
