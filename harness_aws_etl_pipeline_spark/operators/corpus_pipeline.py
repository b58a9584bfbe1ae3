"""[EXT] End-to-end corpus preparation pipeline.

The single entry point that strings the training-data operators into
the published corpus-prep order (C4/RefinedWeb/Dolma all share this
shape):

    unicode/whitespace normalization → quality gate → line dedup
    → decontamination → document dedup → domain mixing
    → sequence packing

Each stage is optional (pass None to skip) and individually tuned;
``prepare_corpus`` returns the prepared DataFrame plus a per-stage
report of rows in/out — the artifact corpus teams actually review
before a training run.

Scale notes:
- With ``report=True`` (default) each enabled stage is persisted and
  counted — one extra action per stage, the price of the numbers.
  ``report=False`` returns a single fused lazy plan (no counts, no
  persists) for production runs where the stage yields are already
  known.
- Stage ORDER is the published one for cost reasons, not taste:
  the cheap pure-column gate runs first (shrinks everything after),
  line dedup before document dedup (boilerplate inflates shingle
  overlap and masks real near-dups), decontamination before fuzzy
  dedup (a contaminated doc must not survive as its cluster's
  canonical), packing last (operates on what ships).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["prepare_corpus"]


def prepare_corpus(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: str | None = None,
    filter_preset: str | None = None,
    filter_thresholds: dict | None = None,
    line_dedup_min_count: int | None = None,
    span_dedup_k: int | None = None,
    benchmark: DataFrame | None = None,
    decontam_n: int = 13,
    dedup_method: str | None = None,
    dedup_threshold: float = 0.8,
    mix_weights: dict[str, int] | None = None,
    mix_domain_col: str = "source",
    pack_capacity: int | None = None,
    url_col: str | None = None,
    robots_rules: "DataFrame | None" = None,
    max_docs_per_host: int | None = None,
    url_columns: bool = False,
    suffix_rules: dict | None = None,
    html_col: str | None = None,
    pdf_col: str | None = None,
    office_col: str | None = None,
    report: bool = True,
) -> tuple[DataFrame, list[dict]]:
    """Run the enabled stages in order; returns ``(prepared, report)``.

    ``report`` rows: ``{"stage", "rows_in", "rows_out", "removed"}``
    per enabled stage (empty list when ``report=False``).  When
    ``pack_capacity`` is set the result gains ``n_tokens``, ``bin_id``
    and ``_truncated`` columns (packing assigns, it does not drop).

    ``url_col`` enables the web-corpus keying family FIRST in the
    chain (key-based thinning is cheap — run it before the expensive
    text gates): canonical-URL dedup, then ``max_docs_per_host`` caps
    if set (both two-phase salted-bucket, hot-key safe).
    ``url_columns=True`` additionally materializes
    ``url_norm/url_host/url_domain/url_path_depth`` — with
    ``suffix_rules`` (``load_suffix_list``) the domain column is
    real-PSL eTLD+1, so ``mix_domain_col="url_domain"`` gives
    domain-weighted mixing over registered domains.
    """
    stages: list[tuple[str, object]] = []

    if pdf_col is not None:
        # binary PDFs → text before everything else (the html_col
        # pattern one format earlier): downstream stages score the
        # EXTRACTED text; malformed payloads yield NULL text and fall
        # to the null gate rather than failing the batch
        from harness_aws_etl_pipeline_spark.operators.pdf import (
            pdf_extract_column,
        )

        stages.append(
            (
                "pdf_extract",
                lambda d: pdf_extract_column(
                    d, pdf_col=pdf_col, text_col=text_col, pages_col=None
                ),
            )
        )

    if office_col is not None:
        # docx/pptx/xlsx → text, same 1:1 NULL-isolating contract
        from harness_aws_etl_pipeline_spark.operators.office import (
            office_extract_column,
        )

        stages.append(
            (
                "office_extract",
                lambda d: office_extract_column(
                    d, office_col=office_col, text_col=text_col,
                    kind_col=None,
                ),
            )
        )

    if html_col is not None:
        # markup → text before anything else: every downstream stage
        # (normalize, gates, dedup) scores the EXTRACTED text, and the
        # harvested links feed the URL family if a caller routes them
        from harness_aws_etl_pipeline_spark.operators.html import (
            strip_html_columns,
        )

        stages.append(
            (
                "html_extract",
                lambda d: strip_html_columns(
                    d, html_col=html_col, text_col=text_col,
                    title_col=None, links_col=None,
                ),
            )
        )

    if url_col is not None:
        from harness_aws_etl_pipeline_spark.operators.urlops import (
            add_url_columns,
            cap_per_host,
            dedup_by_url,
        )

        if robots_rules is not None:
            from harness_aws_etl_pipeline_spark.operators.robots import (
                robots_filter,
            )

            stages.append(
                (
                    "robots_filter",
                    lambda d: robots_filter(d, robots_rules, url_col=url_col),
                )
            )
        stages.append(
            (
                "url_dedup",
                lambda d: dedup_by_url(d, url_col=url_col, id_col=id_col),
            )
        )
        if max_docs_per_host is not None:
            stages.append(
                (
                    f"host_cap[{max_docs_per_host}]",
                    lambda d: cap_per_host(
                        d, max_docs_per_host, url_col=url_col, id_col=id_col
                    ),
                )
            )
        if url_columns:
            stages.append(
                (
                    "url_columns",
                    lambda d: add_url_columns(
                        d, url_col=url_col, suffix_rules=suffix_rules
                    ),
                )
            )

    if normalize is not None:
        from harness_aws_etl_pipeline_spark.operators.textclean import (
            clean_text,
            normalize_unicode,
        )
        from pyspark.sql import functions as F

        form = normalize  # "NFKC" etc.; validated by normalize_unicode
        stages.append(
            (
                f"normalize[{form}]",
                lambda d: normalize_unicode(d, text_col, form).withColumn(
                    text_col, clean_text(F.col(text_col))
                ),
            )
        )
    if filter_preset is not None:
        from harness_aws_etl_pipeline_spark.operators.filters import (
            apply_quality_filters,
        )

        kw = dict(filter_thresholds or {})
        stages.append(
            (
                f"filter[{filter_preset}]",
                lambda d: apply_quality_filters(
                    d, filter_preset, text_col=text_col, mode="filter", **kw
                ),
            )
        )
    if line_dedup_min_count is not None:
        from harness_aws_etl_pipeline_spark.operators.linededup import (
            remove_frequent_lines,
        )

        stages.append(
            (
                "line_dedup",
                lambda d: remove_frequent_lines(
                    d, min_count=line_dedup_min_count,
                    text_col=text_col, id_col=id_col,
                ).drop("_lines_removed"),
            )
        )
    if span_dedup_k is not None:
        from harness_aws_etl_pipeline_spark.operators.spandedup import (
            remove_duplicated_spans,
        )

        stages.append(
            (
                f"span_dedup[k={span_dedup_k}]",
                lambda d: remove_duplicated_spans(
                    d, k=span_dedup_k, id_col=id_col, text_col=text_col
                ),
            )
        )
    if benchmark is not None:
        from harness_aws_etl_pipeline_spark.operators.decontam import decontaminate

        stages.append(
            (
                "decontam",
                lambda d: decontaminate(
                    d, benchmark, n=decontam_n,
                    id_col=id_col, text_col=text_col,
                ),
            )
        )
    if dedup_method is not None:
        from harness_aws_etl_pipeline_spark.operators.dedup_api import deduplicate

        subset = [text_col] if dedup_method in ("exact", "hash") else None
        stages.append(
            (
                f"dedup[{dedup_method}]",
                lambda d: deduplicate(
                    d, method=dedup_method, id_col=id_col,
                    text_col=text_col, threshold=dedup_threshold,
                    subset=subset,
                ),
            )
        )
    if mix_weights is not None:
        from harness_aws_etl_pipeline_spark.operators.mixing import sample_to_mix

        stages.append(
            (
                "mix",
                lambda d: sample_to_mix(
                    d, mix_weights, key=id_col,
                    domain_col=mix_domain_col, text_col=text_col,
                ),
            )
        )
    if pack_capacity is not None:
        from harness_aws_etl_pipeline_spark.operators.packing import pack_sequences

        def _pack(d: DataFrame) -> DataFrame:
            assignments = pack_sequences(
                d, pack_capacity, text_col=text_col, id_col=id_col
            )
            return d.join(assignments, id_col)

        stages.append(("pack", _pack))

    out = df
    rows: list[dict] = []
    prev_cnt = None
    for name, fn in stages:
        if report:
            if prev_cnt is None:
                prev_cnt = out.count()
            nxt = fn(out).persist()
            cnt = nxt.count()
            rows.append(
                {
                    "stage": name,
                    "rows_in": prev_cnt,
                    "rows_out": cnt,
                    "removed": prev_cnt - cnt,
                }
            )
            if out is not df:
                out.unpersist()
            out, prev_cnt = nxt, cnt
        else:
            out = fn(out)
    if report and out is not df:
        # release the last stage's cache: leaving it persisted leaks a
        # CacheManager entry per call (the engine-wide no-leak policy —
        # see operators/memo.py); callers that will iterate the result
        # repeatedly should persist it themselves
        out.unpersist()
    return out, rows
