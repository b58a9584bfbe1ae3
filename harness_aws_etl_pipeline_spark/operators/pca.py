"""[EXT] Distributed PCA over embedding columns.

Dimensionality reduction is the standard pre-step for large-scale
vector work: ANN in 16 PCA dims is ~4× cheaper per distance than in 64
raw dims with little recall loss, whitened embeddings cluster better
(SemDeDup's recipe PCA-whitens before k-means), and the explained-
variance curve is the diagnostic for "how much of this embedding is
signal".

Same "small model, distributed data" split as ``ivf_centroids`` and
``train_bpe``:

- **Moment accumulation is distributed**: one Arrow pass emits per-
  batch partials ``(n, Σv, Σv·vᵀ)`` — a d + d² payload per batch
  (d=64 → 33 KB), reduced driver-side.  Nothing corpus-sized ever
  reaches the driver; no shuffle at all (the partials collapse through
  a single collect of batch-count rows).
- **Eigendecomposition is driver-side numpy** on the d×d covariance —
  microseconds of work on a model-sized matrix.
- **Projection is distributed** (``mapInPandas`` matmul): the (k×d)
  component matrix rides the task closure.

Determinism note: the covariance is accumulated in floating point, so
its LOW BITS depend on partition order; components are therefore
reproducible to float tolerance, not bit-exactly, across different
partitionings (unlike the hash-exact operators in this engine — this
is inherent to any parallel float reduction and is why PCA has no
DuckDB value-oracle; tests pin tolerance-based invariants instead).
Component SIGNS are canonicalized (largest-|coefficient| entry made
positive) so the tolerance comparison is meaningful.

Invalid vectors (NULL/ragged/NaN) are skipped in fitting and project
to NULL — the tolerance contract shared by the similarity family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.similarity import _dim_of, _vec_matrix

__all__ = ["pca_fit", "pca_project", "explained_variance_ratio", "save_pca", "load_pca"]


def pca_fit(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> dict:
    """Fit a k-component PCA model.

    Returns ``{"mean": list[d], "components": list[k][d] (rows are
    unit eigenvectors, variance-descending), "explained_variance":
    list[k], "total_variance": float, "dim": d, "n": rows used}``.
    Raises on an empty/all-invalid corpus or ``k > dim``.
    """
    import numpy as np

    if dim is None:
        dim = _dim_of(df, vec_col)
    if k < 1 or k > dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")

    from collections.abc import Iterator as _Iter

    import pandas as pd

    d = dim

    def _partials(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        # accumulate (n, Σv, Σv·vᵀ) across the WHOLE batch iterator and
        # emit one row per task — the driver collect is task-count-
        # bounded (32 × (d + d²) doubles), not rows/10k-bounded
        n = 0
        s = np.zeros(d)
        ss = np.zeros((d, d))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat, valid = _vec_matrix(pdf[vec_col], d)
            mat = mat[valid]
            if mat.shape[0] == 0:
                continue
            n += int(mat.shape[0])
            s += mat.sum(axis=0)
            ss += mat.T @ mat
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(_partials, "n long, s array<double>, ss array<double>")
        .collect()
    )  # ONE row per task with any valid vectors — bounded by task count
    if not rows:
        raise ValueError("no valid vectors to fit PCA on")
    n = sum(r["n"] for r in rows)
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    # symmetrize against float drift before eigh
    cov = (cov + cov.T) / 2.0
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k × d
    evs = np.maximum(evals[order], 0.0)
    # canonical signs: the largest-|coeff| entry of each component > 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": evs.tolist(),
        "total_variance": float(np.maximum(np.trace(cov), 0.0)),
        "dim": d,
        "n": int(n),
    }


def explained_variance_ratio(model: dict) -> list[float]:
    """Fraction of total variance captured per component."""
    tv = model["total_variance"]
    if tv <= 0:
        return [0.0 for _ in model["explained_variance"]]
    return [v / tv for v in model["explained_variance"]]


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """Add ``out_col`` — the centered projection ``(v − mean)·Cᵀ`` as
    ``array<float>`` (k-dim).  ``whiten=True`` additionally scales
    each coordinate by ``1/√eigenvalue`` (unit variance per component
    — the SemDeDup preprocessing).  Invalid vectors project to NULL.
    """
    import numpy as np

    from collections.abc import Iterator as _Iter

    import pandas as pd

    d = model["dim"]
    mean = np.asarray(model["mean"])
    comps = np.asarray(model["components"])
    if whiten:
        scale = 1.0 / np.sqrt(np.maximum(model["explained_variance"], 1e-12))
        comps = comps * scale[:, None]

    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    out_schema = f"{fields}, `{out_col}` array<float>"

    def _proj(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{out_col: pd.Series([], dtype="object")})
                continue
            mat, valid = _vec_matrix(pdf[vec_col], d)
            proj = (mat - mean) @ comps.T
            vals = [
                [float(x) for x in row] if ok else None
                for row, ok in zip(proj, valid)
            ]
            yield pdf.assign(
                **{out_col: pd.Series(vals, index=pdf.index, dtype="object")}
            )

    return df.mapInPandas(_proj, out_schema)


def save_pca(model: dict, path: str, spark=None) -> None:
    """Persist a PCA model as versioned JSON through the FS adapter."""
    import json

    from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

    payload = json.dumps(
        {"format": "pca-model-v1", **model}, ensure_ascii=False
    ).encode("utf-8")
    get_fs(path, spark).write_bytes(path, payload)


def load_pca(path: str, spark=None) -> dict:
    """Inverse of :func:`save_pca` (validates the format tag)."""
    import json

    from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

    doc = json.loads(get_fs(path, spark).read_bytes(path).decode("utf-8"))
    if doc.pop("format", None) != "pca-model-v1":
        raise ValueError(f"not a pca model file: {path}")
    return doc
