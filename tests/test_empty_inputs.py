"""Empty-input robustness: every major operator must degrade to an
empty (or neutral) result, never throw — at 100 TB a filter that
matches nothing is an everyday event, not an edge case."""

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _empty_vecs(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>")


class TestEmptyInputs:
    def test_transform_pipeline(self, spark):
        from harness_aws_etl_pipeline_spark.pipeline import transform

        df = spark.createDataFrame([], "id long, name string, created_date string")
        out, stats = transform(df)
        assert out.count() == 0 and stats["rows_in"] == 0

    def test_profile_and_nulls(self, spark):
        from harness_aws_etl_pipeline_spark.operators import null_counts, profile

        df = spark.createDataFrame([], "a long, b string")
        assert profile(df)["row_count"] == 0
        assert null_counts(df) == {"a": 0, "b": 0}

    def test_dedup_family(self, spark):
        from harness_aws_etl_pipeline_spark.operators.dedup_api import deduplicate

        docs = _empty_docs(spark)
        for method in ("exact", "hash", "ngram", "minhash", "simhash"):
            assert deduplicate(docs, method=method).count() == 0, method

    def test_dedup_family_vector_and_image(self, spark):
        from harness_aws_etl_pipeline_spark.operators.dedup_api import deduplicate

        vecs = spark.createDataFrame([], "doc_id long, embedding array<float>")
        # dim must be explicit on an empty frame (nothing to probe)
        assert deduplicate(
            vecs, method="semantic", id_col="doc_id", dim=4, k=2
        ).count() == 0
        media = spark.createDataFrame([], "doc_id long, payload binary")
        assert deduplicate(media, method="image").count() == 0

    def test_similarity_family(self, spark):
        from harness_aws_etl_pipeline_spark.operators.dedup_api import (
            similarity_search,
        )

        vecs = _empty_vecs(spark)
        for method in ("brute", "brute_arrow"):
            assert similarity_search(vecs, vecs, method=method).count() == 0, method

    def test_span_and_url_ops(self, spark):
        from harness_aws_etl_pipeline_spark.operators.spandedup import (
            duplicated_spans,
            remove_duplicated_spans,
        )
        from harness_aws_etl_pipeline_spark.operators.urlops import (
            add_url_columns,
            cap_per_host,
            dedup_by_url,
        )

        docs = _empty_docs(spark)
        assert duplicated_spans(docs, k=8).count() == 0
        assert remove_duplicated_spans(docs, k=8).count() == 0
        urls = spark.createDataFrame([], "doc_id long, url string")
        assert add_url_columns(urls).count() == 0
        assert dedup_by_url(urls).count() == 0
        assert cap_per_host(urls, 5).count() == 0

    def test_repeat_to_budget_unlisted_domains(self, spark):
        from harness_aws_etl_pipeline_spark.operators.mixing import (
            repeat_to_budget,
        )

        df = spark.createDataFrame(
            [(1, "some words here", "web")],
            "doc_id long, text string, source string",
        )
        # weights name a domain with data; an unlisted domain yields 0
        out = repeat_to_budget(df, {"web": 1}, budget_tokens=100)
        assert out.count() >= 1
        out2 = out.filter(F.col("source") == "nope")
        assert out2.count() == 0

    def test_text_ops(self, spark):
        from harness_aws_etl_pipeline_spark.operators.textops import (
            chunk_documents,
            tf_idf,
        )

        docs = _empty_docs(spark)
        assert chunk_documents(docs).count() == 0
        assert tf_idf(docs).count() == 0

    def test_asof_and_range(self, spark):
        from harness_aws_etl_pipeline_spark.operators.asof import (
            as_of_join,
            range_join,
        )

        left = spark.createDataFrame([], "id long, k string, t timestamp")
        right = spark.createDataFrame([], "k string, rt timestamp, v double")
        assert as_of_join(left, right, "k", "t", "rt", ["v"]).count() == 0
        iv = spark.createDataFrame([], "s timestamp, e timestamp")
        assert range_join(left, iv, "t", "s", "e").count() == 0

    def test_clustering(self, spark):
        from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
            near_dup_clusters,
        )

        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
        assert near_dup_clusters(pairs).count() == 0

    def test_expectations(self, spark):
        from harness_aws_etl_pipeline_spark.meta.expectations import (
            check,
            expect_not_null,
        )

        df = spark.createDataFrame([], "a string")
        report = check(df, [expect_not_null("a")])
        assert report["rows"] == 0 and report["passed"]
