"""Python UDTF surface (operators/udtf.py): parity with the
expression-path chunker, LATERAL SQL invocation, and edge contracts."""

from __future__ import annotations

import pytest

from harness_aws_etl_pipeline_spark.operators.udtf import (
    ChunkTextUDTF,
    chunk_documents_udtf,
    register_udtfs,
)


class TestChunkUdtf:
    def test_equals_expression_path_on_real_docs(self, spark):
        """The UDTF must emit EXACTLY the rows
        textops.chunk_documents builds from array expressions — the
        guard that keeps the imperative and declarative chunkers from
        drifting."""
        from harness_aws_etl_pipeline_spark.operators.textops import (
            chunk_documents,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        a = {
            tuple(r)
            for r in chunk_documents(
                docs, chunk_tokens=32, overlap=8
            ).collect()
        }
        b = {
            tuple(r)
            for r in chunk_documents_udtf(
                spark, docs, chunk_tokens=32, overlap=8
            ).collect()
        }
        assert a == b and len(a) > 0

    def test_lateral_sql_invocation(self, spark):
        register_udtfs(spark)
        spark.createDataFrame(
            [(1, "a b c d e"), (2, None), (3, "   ")],
            "doc_id long, text string",
        ).createOrReplaceTempView("udtf_docs")
        got = spark.sql(
            """
            SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
            FROM udtf_docs d, LATERAL chunk_text(d.text, 3, 1) c
            """
        ).collect()
        rows = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
                for r in got}
        # 5 tokens, chunk 3, overlap 1, stride 2 -> ceil((5-1)/2) = 2
        assert rows == {
            (1, 0): ("a b c", 3),
            (1, 1): ("c d e", 3),
        }
        # NULL and whitespace-only docs emit nothing (no (2,*), (3,*))

    def test_short_doc_single_chunk_and_guard(self, spark):
        register_udtfs(spark)
        spark.createDataFrame(
            [(9, "x")], "doc_id long, text string"
        ).createOrReplaceTempView("udtf_docs2")
        got = spark.sql(
            "SELECT c.* FROM udtf_docs2 d, "
            "LATERAL chunk_text(d.text, 4, 2) c"
        ).collect()
        assert [(r["chunk_idx"], r["chunk_text"], r["n_tokens"]) for r in got] == [
            (0, "x", 1)
        ]
        with pytest.raises(Exception, match="overlap"):
            spark.sql(
                "SELECT c.* FROM udtf_docs2 d, "
                "LATERAL chunk_text(d.text, 4, 4) c"
            ).collect()

    def test_java_whitespace_class(self):
        """Plain-python check: the tokenizer splits on exactly Java's
        \\s set, so \\x0b separates but \\x1c (Python-\\s-only) does
        not."""
        from harness_aws_etl_pipeline_spark.operators.udtf import _JAVA_WS

        assert ChunkTextUDTF is not None  # surface import pinned
        assert _JAVA_WS.split("a\x0bb") == ["a", "b"]
        assert _JAVA_WS.split("a\x1cb") == ["a\x1cb"]
