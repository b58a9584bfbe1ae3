"""Python UDTFs — the table-valued corner of the UDF surface (§2.12).

The reference's extension points are row/frame-level hooks
(transformer.py's per-column coercions); this engine's §2.12 surface
already covers column rules, filter rules, pandas batch rules, and a
pandas UDAF. Spark 4 adds the remaining shape: the Python
USER-DEFINED TABLE FUNCTION — one input row → many output rows,
callable from SQL via LATERAL (the table-function composition spot
the DataFrame API reaches with explode/transform).

``ChunkTextUDTF`` is the demonstrator: the SAME chunking contract as
``operators/textops.py:chunk_documents`` (whitespace tokens, stride =
chunk − overlap, short tail kept, ≤overlap docs get one chunk),
re-expressed imperatively. The expression path stays the production
path — built-ins are codegen'd and shuffle-free, while a UDTF pays a
Python worker round trip per partition — but the UDTF is the right
tool when per-row logic stops being expressible as array expressions
(stateful tokenizers, external segmenters). Equality with the
expression path on every document is test-pinned, which is exactly
the guard that keeps the two from drifting.

Tokenization matches the JVM side bit-for-bit: Java's ``\\s`` is
``[ \\t\\n\\x0B\\f\\r]`` — spelled out here because Python's ``\\s``
is wider (it adds \\x1c-\\x1f and unicode spaces under re.UNICODE).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

__all__ = ["ChunkTextUDTF", "register_udtfs", "chunk_documents_udtf"]

_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


@udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
class ChunkTextUDTF:
    """LATERAL-callable chunker: ``chunk_text(text, chunk_tokens,
    overlap)`` → one row per overlapping token window."""

    def eval(self, text: str, chunk_tokens: int = 128, overlap: int = 16):
        if chunk_tokens is None or overlap is None:
            raise ValueError("chunk_tokens/overlap must not be NULL")
        if overlap >= chunk_tokens:
            raise ValueError("overlap must be smaller than chunk_tokens")
        if text is None:
            return
        toks = [t for t in _JAVA_WS.split(text) if t != ""]
        n = len(toks)
        if n == 0:
            return
        stride = chunk_tokens - overlap
        n_chunks = (
            1 if n <= overlap else -(-(n - overlap) // stride)
        )
        for i in range(n_chunks):
            window = toks[i * stride : i * stride + chunk_tokens]
            yield i, " ".join(window), min(n - i * stride, chunk_tokens)


def register_udtfs(spark) -> None:
    """Register the table functions for SQL use:
    ``SELECT d.doc_id, c.* FROM docs d,
    LATERAL chunk_text(d.text, 128, 16) c``."""
    spark.udtf.register("chunk_text", ChunkTextUDTF)


def chunk_documents_udtf(
    spark,
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
):
    """DataFrame face of the UDTF (LATERAL join under the hood) —
    same output schema as ``textops.chunk_documents``."""
    register_udtfs(spark)
    view = f"__udtf_src_{id_col}_{text_col}"
    df.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.{id_col} AS doc_id,
               c.chunk_idx, c.chunk_text, c.n_tokens
        FROM {view} d,
        LATERAL chunk_text(d.{text_col}, {int(chunk_tokens)},
                           {int(overlap)}) c
        """
    )
