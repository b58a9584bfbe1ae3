"""[EXT] Distributed quality classifier (hashed-feature logistic
regression).

Rule gates (``operators/filters.py``) are step functions; production
pipelines follow them with a LEARNED scorer — the fastText-style
recipe: label a seed set (gate survivors vs rejects, or a trusted
reference corpus vs raw crawl), train a linear model over hashed
bag-of-words features, and keep documents by predicted probability.
The smooth score ranks borderline documents the way no rule bundle
can.

Same "small model, distributed data" split as PCA / BPE / IVF:

- **Features** are hashed unigram counts (``crc32(token) % dim`` —
  process-stable, seed-free), L2-normalized per document, built
  inside Arrow batches; the dense vector never materializes as a
  DataFrame column during training.
- **Training is full-batch gradient descent**: each iteration is ONE
  distributed pass emitting per-batch partials ``(Xᵀr, Σr, logloss,
  n)`` — a (dim+3)-double payload per batch — summed driver-side
  into one weight update.  ``iters`` passes total; at 100 TB you
  train on a deterministic sample (``max_rows`` routes through
  ``sampling.sample_exact_n``), which is what production quality
  classifiers do anyway.
- **Scoring is distributed** (``mapInPandas``): weights ride the task
  closure.

Determinism: gradient sums are float reductions — partition-order
low-bit variation, same caveat as PCA; tests pin tolerance-based
invariants, not bit equality (no DuckDB oracle by nature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_quality_classifier", "score_quality", "save_model", "load_model"]


def _features(texts, dim: int):
    """Batch of texts → (n × dim) L2-normalized hashed-count matrix."""
    import zlib

    import numpy as np

    mat = np.zeros((len(texts), dim))
    for i, t in enumerate(texts):
        if not isinstance(t, str):
            continue
        for w in t.lower().split():
            mat[i, zlib.crc32(w.encode("utf-8")) % dim] += 1.0
    norms = np.linalg.norm(mat, axis=1)
    return mat / np.where(norms == 0.0, 1.0, norms)[:, None]


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    *,
    dim: int = 4096,
    iters: int = 20,
    lr: float = 2.0,
    l2: float = 1e-4,
    max_rows: int | None = None,
    id_col: str = "doc_id",
    tol: float = 1e-5,
) -> dict:
    """Train on ``(text_col, label_col ∈ {0,1})`` rows.

    Returns ``{"weights": list[dim], "bias": float, "dim": dim,
    "losses": [per-iteration mean logloss], "n": rows}``.  Stops early
    when the loss improves by less than ``tol``.
    """
    import numpy as np

    src = df.select(id_col, text_col, label_col)
    if max_rows is not None:
        from harness_aws_etl_pipeline_spark.operators.sampling import (
            sample_exact_n,
        )

        src = sample_exact_n(src, max_rows, key=id_col)
    src = src.select(
        F.col(text_col).alias("__t"),
        F.col(label_col).cast("double").alias("__y"),
    ).persist()
    try:
        n_total = src.count()
        if n_total == 0:
            raise ValueError("no training rows")

        from collections.abc import Iterator as _Iter

        import pandas as pd

        w = np.zeros(dim)
        b = 0.0
        losses: list[float] = []
        for _ in range(iters):
            w_b, b_b = w, b  # closure snapshot for this pass

            def _grad(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
                # accumulate gradient partials across the WHOLE batch
                # iterator; one (dim+3)-double row per task, so the
                # per-iteration collect is task-count-bounded
                gp = np.zeros(dim)
                gbp = llp = 0.0
                np_ = 0
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    x = _features(list(pdf["__t"]), dim)
                    y = pdf["__y"].to_numpy(dtype=float)
                    z = x @ w_b + b_b
                    p = 1.0 / (1.0 + np.exp(-z))
                    r = p - y
                    eps = 1e-12
                    llp += -(
                        y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)
                    ).sum()
                    gp += x.T @ r
                    gbp += float(r.sum())
                    np_ += len(pdf)
                if np_:
                    yield pd.DataFrame(
                        {
                            "g": [gp.tolist()],
                            "gb": [gbp],
                            "loss": [float(llp)],
                            "n": [np_],
                        }
                    )

            parts = src.mapInPandas(
                _grad, "g array<double>, gb double, loss double, n long"
            ).collect()
            g = np.zeros(dim)
            gb = loss = 0.0
            for r_ in parts:
                g += np.asarray(r_["g"])
                gb += r_["gb"]
                loss += r_["loss"]
            loss = loss / n_total
            losses.append(round(float(loss), 6))
            w = w - lr * (g / n_total + l2 * w)
            b = b - lr * (gb / n_total)
            if len(losses) >= 2 and losses[-2] - losses[-1] < tol:
                break
        return {
            "weights": w.tolist(),
            "bias": float(b),
            "dim": dim,
            "losses": losses,
            "n": int(n_total),
        }
    finally:
        src.unpersist()


def score_quality(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Add ``out_col`` — P(label=1) per document, NULL for NULL text."""
    import numpy as np

    from collections.abc import Iterator as _Iter

    import pandas as pd

    w = np.asarray(model["weights"])
    b = float(model["bias"])
    dim = int(model["dim"])
    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    out_schema = f"{fields}, `{out_col}` double"

    def _score(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{out_col: pd.Series([], dtype="float64")})
                continue
            x = _features(list(pdf[text_col]), dim)
            p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
            vals = [
                float(pi) if isinstance(t, str) else None
                for pi, t in zip(p, pdf[text_col])
            ]
            yield pdf.assign(
                **{out_col: pd.Series(vals, index=pdf.index, dtype="object")}
            )

    return df.mapInPandas(_score, out_schema)


def save_model(model: dict, path: str, spark=None) -> None:
    """Persist a trained classifier as versioned JSON through the FS
    adapter (local or Hadoop-scheme paths)."""
    import json

    from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

    payload = json.dumps(
        {"format": "quality-logreg-v1", **model}, ensure_ascii=False
    ).encode("utf-8")
    get_fs(path, spark).write_bytes(path, payload)


def load_model(path: str, spark=None) -> dict:
    """Inverse of :func:`save_model` (validates the format tag)."""
    import json

    from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

    doc = json.loads(get_fs(path, spark).read_bytes(path).decode("utf-8"))
    if doc.pop("format", None) != "quality-logreg-v1":
        raise ValueError(f"not a quality-logreg model file: {path}")
    return doc
