"""Unit tests per transform operator (mirrors the reference's
tests/unit/test_transformer.py coverage: column cleaning, null drop,
dedup, date cast — plus the profiling ops it only checked implicitly)."""

from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators import (
    add_date_partitions,
    add_row_hash,
    cast_date_like_columns,
    deduplicate_exact,
    drop_null_rows,
    fill_nulls,
    flag_nulls,
    infer_numeric_columns,
    normalize_column_names,
    normalize_name,
    null_counts,
    numeric_parse_ratios,
    profile,
    validate,
)
from harness_aws_etl_pipeline_spark.operators.dedup import (
    deduplicate_by_hash,
    duplicate_count,
)


class TestNormalize:
    def test_normalize_name(self):
        assert normalize_name(" First Name ") == "first_name"
        assert normalize_name("Total$Amount!!") == "totalamount"
        assert normalize_name("a__b___c") == "a_b_c"
        assert normalize_name("_x_") == "x"

    def test_normalize_columns(self, spark):
        df = spark.createDataFrame([(1, 2, 3)], ["First Name", "AMOUNT ($)", "ok_col"])
        out = normalize_column_names(df)
        assert out.columns == ["first_name", "amount", "ok_col"]

    def test_collision_suffix(self, spark):
        df = spark.createDataFrame([(1, 2)], ["A B", "a_b"])
        out = normalize_column_names(df)
        assert out.columns == ["a_b", "a_b_2"]


class TestNulls:
    def test_drop(self, df_with_nulls):
        assert drop_null_rows(df_with_nulls).count() == 1

    def test_fill(self, df_with_nulls):
        out = fill_nulls(df_with_nulls)
        rows = {r["id"]: r for r in out.collect()}
        assert rows[2]["name"] == "" and rows[3]["amount"] == 0.0

    def test_flag(self, df_with_nulls):
        out = flag_nulls(df_with_nulls)
        assert "name_is_null" in out.columns and "amount_is_null" in out.columns
        assert "id_is_null" not in out.columns  # no nulls in id
        flagged = out.filter(F.col("name_is_null")).count()
        assert flagged == 2

    def test_null_counts_single_pass(self, df_with_nulls):
        assert null_counts(df_with_nulls) == {"id": 0, "name": 2, "amount": 2}


class TestDedup:
    def test_exact(self, spark):
        df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id long, v string")
        assert deduplicate_exact(df).count() == 2

    def test_by_hash_matches_exact(self, spark):
        df = spark.createDataFrame(
            [(i % 5, f"v{i % 5}") for i in range(100)], "id long, v string"
        )
        assert deduplicate_by_hash(df).count() == deduplicate_exact(df).count() == 5

    def test_duplicate_count(self, spark):
        df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id long, v string")
        assert duplicate_count(df) == 1


class TestCasts:
    def test_date_cast_by_name(self, sample_df):
        out = cast_date_like_columns(sample_df)
        assert dict(out.dtypes)["created_date"].startswith("timestamp")
        assert out.filter(F.col("created_date").isNull()).count() == 0

    def test_date_cast_invalid_to_null(self, spark):
        df = spark.createDataFrame([("nope",), ("2024-01-01",)], "event_date string")
        out = cast_date_like_columns(df)
        assert out.filter(F.col("event_date").isNull()).count() == 1

    def test_numeric_inference(self, spark):
        df = spark.createDataFrame(
            [("1.5", "x"), ("2", "y"), ("bad", "z"), ("4.0", "w"), ("5", "v")],
            "mostly_num string, never_num string",
        )
        ratios = numeric_parse_ratios(df)
        assert ratios["mostly_num"] == 0.8 and ratios["never_num"] == 0.0
        out = infer_numeric_columns(df, threshold=0.75)
        assert dict(out.dtypes)["mostly_num"] == "double"
        assert dict(out.dtypes)["never_num"] == "string"

    def test_numeric_inference_respects_threshold(self, spark):
        df = spark.createDataFrame([("1",), ("x",)], "half string")
        out = infer_numeric_columns(df, threshold=0.8)
        assert dict(out.dtypes)["half"] == "string"


class TestDerive:
    def test_row_hash_stable_and_content_dependent(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        h1 = {r["id"]: r["_row_hash"] for r in add_row_hash(df).collect()}
        h2 = {r["id"]: r["_row_hash"] for r in add_row_hash(df).collect()}
        assert h1 == h2  # deterministic
        assert h1[1] != h1[2]  # content-dependent

    def test_date_partitions(self, sample_df):
        out = add_date_partitions(cast_date_like_columns(sample_df))
        row = out.filter(F.col("id") == 1).first()
        assert (row["_year"], row["_month"], row["_day"]) == (2024, 1, 15)

    def test_date_partitions_noop_without_timestamp(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        assert add_date_partitions(df).columns == ["id"]


class TestProfile:
    def test_profile(self, df_with_nulls):
        p = profile(df_with_nulls)
        assert p["row_count"] == 4
        assert p["total_nulls"] == 4
        assert sorted(p["columns_with_nulls"]) == ["amount", "name"]

    def test_validate_id_warning(self, spark):
        df = spark.createDataFrame([(i, f"u{i}") for i in range(200)], "id long, u string")
        rep = validate(df, min_rows=100)
        assert any("likely an identifier" in w for w in rep["warnings"])
