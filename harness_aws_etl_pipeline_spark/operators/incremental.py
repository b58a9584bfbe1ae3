"""Incremental near-dup deduplication against a growing corpus.

The batch operators in :mod:`dedup_fuzzy` answer "which documents in
THIS dataset are near-duplicates of each other". A production
training-data pipeline asks a different question every day: "which of
today's documents duplicate anything we have EVER accepted" — and
re-running the self-join over the whole corpus per batch is O(corpus)
when the new work is O(batch).

:class:`IncrementalDeduper` makes the corpus state explicit and
cheap:

* **State = MinHash signatures only**, kept in a
  :class:`~harness_aws_etl_pipeline_spark.sinks.snaptable.SnapTable`
  (``doc_id, signature array<long>``). At 64 hashes that is ~0.5 KB
  per document regardless of document size — a 1B-doc corpus carries
  ~0.5 TB of state, scanned column-pruned and joined bucket-blocked,
  while the raw 100 TB of text is never re-read.
* **Per batch**: one Arrow pass computes the batch's signatures;
  LSH banding blocks batch×batch (internal dups) and batch×state
  (dups against everything accepted so far); estimated Jaccard
  verifies candidates; connected components pick one canonical per
  internal cluster. Cost is O(batch + touched buckets), not
  O(corpus).
* **Survivors' signatures are APPENDED to the state table** in one
  atomic snapshot commit carrying the batch's ``(app_id, batch_id)``
  ledger entry — a replayed batch (foreachBatch retry, rerun job) is
  detected and skipped BEFORE any recompute, so the state never
  double-counts and downstream sees exactly-once acceptance.

The reference has no incremental path at all (every run re-reads its
input prefix, ``etl/extractor.py``); this is the [EXT] scale design
that makes the fuzzy-dedup family usable as a daily pipeline rather
than a one-shot audit.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
    _SIG_MEMO,
    minhash_join_signatures,
    minhash_lsh_candidates,
    minhash_signatures,
    near_dup_clusters,
)
from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

__all__ = [
    "IncrementalAnnIndex",
    "IncrementalDeduper",
    "IncrementalDistinct",
    "IncrementalDrift",
    "IncrementalEmbeddingDeduper",
    "IncrementalEwma",
    "IncrementalHeavyHitters",
    "IncrementalLinkGraph",
    "IncrementalQuantiles",
    "IncrementalSpanDeduper",
    "IncrementalTransitions",
]


def _maintain_state(
    table: SnapTable,
    target_file_bytes: int,
    keep_last: int,
    vacuum_min_age_seconds: float,
) -> dict:
    if table.current_version() is None:
        # maintenance slot fired before the first batch ever landed —
        # nothing to compact/expire/vacuum, not an error
        return {
            "compacted": 0,
            "snapshots_expired": 0,
            "dirs_vacuumed": 0,
            "version": None,
        }
    compacted = table.compact(target_file_bytes=target_file_bytes)
    expired = table.expire_snapshots(keep_last=keep_last)
    vacuumed = table.vacuum(min_age_seconds=vacuum_min_age_seconds)
    return {
        "compacted": compacted.get("compacted", 0),
        "snapshots_expired": expired["expired"],
        "dirs_vacuumed": len(vacuumed["removed"]),
        "version": table.current_version(),
    }


def _cluster_losers(spark, pairs: DataFrame, id_type: str, out_id: str) -> DataFrame:
    """(out_id, kept_id) for every doc that loses its internal
    near-dup cluster. ``pairs`` must be MATERIALIZED (checkpointed) —
    the isEmpty probe is then free, and clean batches (the steady-state
    common case) skip the connected-components jobs entirely.
    near_dup_clusters labels each component with its MIN doc_id, so
    the keeper is the cluster_id itself — no extra groupBy/join."""
    if pairs.isEmpty():
        return spark.createDataFrame([], f"{out_id} {id_type}, kept_id {id_type}")
    clusters = near_dup_clusters(pairs)
    return clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(out_id), F.col("cluster_id").alias("kept_id")
    )


def _est_jaccard(num_hashes: int):
    return (
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
        ).cast("double")
        / F.lit(num_hashes)
    )


class IncrementalDeduper:
    """Near-dup gatekeeper for an append-only corpus.

    ``process_batch(docs)`` returns which documents to accept and the
    duplicate evidence, and commits the accepted signatures to the
    state table. All knobs (shingle ``n``, ``num_hashes``, ``bands``,
    ``threshold``, ``max_bucket_size``, ``hash_fn``) are fixed at
    construction — signatures in the state are only comparable when
    every batch used the same family.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        n: int = 5,
        num_hashes: int = 64,
        bands: int = 16,
        threshold: float = 0.5,
        max_bucket_size: int = 1000,
        hash_fn: str = "blake2b",
    ):
        if num_hashes % bands:
            raise ValueError("num_hashes must divide evenly into bands")
        self.spark = spark
        self.table = SnapTable(spark, state_path)
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.threshold = threshold
        self.max_bucket_size = max_bucket_size
        self.hash_fn = hash_fn

    # ------------------------------------------------------------------

    def state_signatures(self) -> DataFrame | None:
        if self.table.current_version() is None:
            return None
        return self.table.read()

    def maintain(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        keep_last: int = 7,
        vacuum_min_age_seconds: float = 24 * 3600,
    ) -> dict:
        """State housekeeping for a long-running gate: every batch
        appends one txn directory, so after a year of daily batches
        the state scan opens ~365 small files. Bin-pack them, keep
        the last ``keep_last`` snapshots for audit/time-travel, and
        vacuum what nothing references. Run from the same scheduler
        slot as the batches (commit races against an in-flight batch
        retry safely on both sides)."""
        return _maintain_state(
            self.table, target_file_bytes, keep_last, vacuum_min_age_seconds
        )

    def process_batch(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        txn: tuple[str, int] | None = None,
        pre_commit: "Callable[[DataFrame], None] | None" = None,
    ) -> dict:
        """Dedup ``docs`` against itself and the accepted corpus.

        Returns::

            {"accepted_ids":    DataFrame[doc_id]     # commit these
             "dups_vs_state":   DataFrame[doc_id, state_id, est_jaccard]
             "dups_in_batch":   DataFrame[doc_id, kept_id, est_jaccard]
             "unsigned_ids":    DataFrame[doc_id]     # < n tokens, no
                                                      # signature — pass
                                                      # through unchecked
             "state_version":   int, "skipped": bool}

        Acceptance rule: a document is accepted unless it matches the
        state (``dups_vs_state``) or loses its internal cluster
        (every cluster keeps its MIN doc_id — deterministic, so a
        replayed batch reproduces the same survivors). Accepted
        signatures are appended in ONE snapshot commit with the
        ``txn`` ledger entry; a replayed ``txn`` short-circuits
        before any Spark job runs.
        """
        if self.table.txn_committed(txn):
            return {
                "accepted_ids": None,
                "dups_vs_state": None,
                "dups_in_batch": None,
                "unsigned_ids": None,
                "state_version": self.table.current_version(),
                "skipped": True,
            }
        src = docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        sigs = _SIG_MEMO.get_or_persist(
            minhash_signatures(
                src, "doc_id", "text", self.n, self.num_hashes,
                hash_fn=self.hash_fn,
            )
        )
        # docs too short to shingle have no signature: they can never
        # match anything, so they bypass the gate (surfaced for the
        # caller to route — usually straight to quality filtering)
        unsigned = src.select("doc_id").join(
            sigs.select("doc_id"), "doc_id", "left_anti"
        )

        # --- batch-internal near-dups -------------------------------
        internal_pairs = minhash_lsh_candidates(
            sigs, self.bands, self.rows_per_band, self.max_bucket_size
        )
        sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("signature").alias("sig_a"))
        sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("signature").alias("sig_b"))
        internal = (
            internal_pairs.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn("est_jaccard", _est_jaccard(self.num_hashes))
            .filter(F.col("est_jaccard") >= self.threshold)
            .select("doc_a", "doc_b", "est_jaccard")
            # evidence sets are near-dup EDGES — tiny relative to the
            # batch — and every downstream consumer (clusters, the
            # accept anti-join, the state write, caller counts) walks
            # them; one eager materialization stops the LSH join from
            # re-running per consumer
            .localCheckpoint(eager=True)
        )
        internal_losers = _cluster_losers(
            self.spark,
            internal.select("doc_a", "doc_b"),
            sigs.schema["doc_id"].dataType.simpleString(),
            "doc_id",
        )
        # evidence rows: loser → its cluster keeper, with the pair's
        # jaccard when the direct edge exists (cluster transitivity
        # can link docs with no direct edge — est_jaccard is null there)
        edge_j = internal.select(
            F.col("doc_a").alias("x"), F.col("doc_b").alias("y"), "est_jaccard"
        ).unionByName(
            internal.select(
                F.col("doc_b").alias("x"), F.col("doc_a").alias("y"), "est_jaccard"
            )
        )
        dups_in_batch = internal_losers.join(
            edge_j,
            (internal_losers.doc_id == edge_j.x)
            & (internal_losers.kept_id == edge_j.y),
            "left",
        ).select("doc_id", "kept_id", "est_jaccard")

        # --- batch × accepted-corpus near-dups ----------------------
        state = self.state_signatures()
        if state is not None:
            dups_vs_state = (
                minhash_join_signatures(
                    sigs,
                    state,
                    self.bands,
                    self.rows_per_band,
                    self.threshold,
                    self.num_hashes,
                    self.max_bucket_size,
                )
                .select(
                    F.col("left_id").alias("doc_id"),
                    F.col("right_id").alias("state_id"),
                    "est_jaccard",
                )
                .localCheckpoint(eager=True)
            )
        else:
            id_type = sigs.schema["doc_id"].dataType.simpleString()
            dups_vs_state = self.spark.createDataFrame(
                [],
                f"doc_id {id_type}, state_id {id_type}, est_jaccard double",
            )

        drop = (
            internal_losers.select("doc_id")
            .unionByName(dups_vs_state.select("doc_id"))
            .distinct()
        )
        accepted_sigs = sigs.join(drop, "doc_id", "left_anti")
        if pre_commit is not None:
            # exactly-once composition hook: runs BEFORE the state
            # commit, with the accepted+unsigned id set. A caller that
            # writes downstream output here via an IDEMPOTENT sink
            # (keyed upsert / same-txn snapshot write) converges under
            # every crash ordering: crash before → full deterministic
            # recompute (state unchanged); crash after the hook but
            # before the commit → recompute is identical, the hook's
            # idempotent write rewrites the same rows, commit lands;
            # replay after the commit → txn short-circuit skips both.
            pre_commit(
                accepted_sigs.select("doc_id").unionByName(unsigned)
            )
        out = self.table.write(
            accepted_sigs,
            mode="append",
            txn=txn,
        )
        return {
            "accepted_ids": accepted_sigs.select("doc_id"),
            "dups_vs_state": dups_vs_state,
            "dups_in_batch": dups_in_batch,
            "unsigned_ids": unsigned,
            "state_version": out["version"],
            "skipped": False,
        }


class IncrementalEmbeddingDeduper:
    """Vector-space twin of :class:`IncrementalDeduper`: gates each
    batch of embeddings against every vector ever accepted.

    State = the accepted ``(vec_id, embedding)`` rows themselves — at
    768 float32 dims that is ~3 KB/vector, and unlike text there is
    no cheaper sufficient statistic: exact-cosine verification needs
    the vector. Blocking reuses the seeded sign-LSH from
    :func:`similarity.embedding_join` (identical hyperplanes across
    batches by construction — the hash family is a pure function of
    the seed), so each batch pays one Arrow bucket pass over the
    batch plus a capped (table, bucket) join against the state.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        threshold: float = 0.9,
        dim: int | None = None,
        num_tables: int = 6,
        bits: int = 10,
        max_bucket_size: int = 2000,
    ):
        self.spark = spark
        self.table = SnapTable(spark, state_path)
        self.threshold = threshold
        self.dim = dim
        self.num_tables = num_tables
        self.bits = bits
        self.max_bucket_size = max_bucket_size

    def maintain(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        keep_last: int = 7,
        vacuum_min_age_seconds: float = 24 * 3600,
    ) -> dict:
        """Same housekeeping as :meth:`IncrementalDeduper.maintain`."""
        return _maintain_state(
            self.table, target_file_bytes, keep_last, vacuum_min_age_seconds
        )

    def process_batch(
        self,
        vecs: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        txn: tuple[str, int] | None = None,
    ) -> dict:
        """Contract of :meth:`IncrementalDeduper.process_batch` with
        cosine ≥ threshold as the duplicate criterion (6dp-rounded,
        matching :func:`similarity.embedding_near_dup_pairs`), and two
        deliberate differences: there is NO ``unsigned_ids`` key
        (every vector is sketchable — no too-short bypass exists), and
        ``dups_in_batch`` carries (vec_id, kept_id) without a
        similarity column (the cosine evidence for cross-state
        matches is in ``dups_vs_state``)."""
        from harness_aws_etl_pipeline_spark.operators.similarity import (
            embedding_join,
            embedding_near_dup_pairs,
        )

        if self.table.txn_committed(txn):
            return {
                "accepted_ids": None,
                "dups_vs_state": None,
                "dups_in_batch": None,
                "state_version": self.table.current_version(),
                "skipped": True,
            }
        src = vecs.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        )
        internal = embedding_near_dup_pairs(
            src,
            threshold=self.threshold,
            dim=self.dim,
            num_tables=self.num_tables,
            bits=self.bits,
            max_bucket_size=self.max_bucket_size,
        ).localCheckpoint(eager=True)
        internal_losers = _cluster_losers(
            self.spark,
            internal.select(
                F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
            ),
            src.schema["vec_id"].dataType.simpleString(),
            "vec_id",
        )

        state = (
            self.table.read()
            if self.table.current_version() is not None
            else None
        )
        if state is not None:
            dups_vs_state = (
                embedding_join(
                    src,
                    state,
                    threshold=self.threshold,
                    dim=self.dim,
                    num_tables=self.num_tables,
                    bits=self.bits,
                    max_bucket_size=self.max_bucket_size,
                )
                .select(
                    F.col("left_id").alias("vec_id"),
                    F.col("right_id").alias("state_id"),
                    "cosine",
                )
                .localCheckpoint(eager=True)
            )
        else:
            id_type = src.schema["vec_id"].dataType.simpleString()
            dups_vs_state = self.spark.createDataFrame(
                [], f"vec_id {id_type}, state_id {id_type}, cosine double"
            )

        drop = (
            internal_losers.select("vec_id")
            .unionByName(dups_vs_state.select("vec_id"))
            .distinct()
        )
        accepted = src.join(drop, "vec_id", "left_anti")
        out = self.table.write(accepted, mode="append", txn=txn)
        return {
            "accepted_ids": accepted.select("vec_id"),
            "dups_vs_state": dups_vs_state,
            "dups_in_batch": internal_losers,
            "state_version": out["version"],
            "skipped": False,
        }


class IncrementalSpanDeduper:
    """Duplicated-span gate for an append-only corpus — the
    substring-level sibling of :class:`IncrementalDeduper`.

    State = every distinct k-gram ever seen with its canonical first
    occurrence ``(gram, doc_id, pos)`` — one row per distinct gram
    (8-byte hash + id + int), kept in a snapshot table with the same
    txn ledger.  A batch is marked against ITSELF (batch-internal
    canonical firsts) and against the state (any state gram wins),
    spans are islands-merged, and the cleaned batch text is rebuilt;
    the batch's NEW grams are appended in one exactly-once commit.

    Processing batches in arrival order is equivalent to running
    :func:`spandedup.remove_duplicated_spans` over the concatenated
    corpus with arrival-order canonical firsts, up to the k-token
    boundary effect every window-based ExactSubstr shares: grams that
    enter the state from inside a removed island tail can remove a
    future occurrence whose canonical text was itself cut — bounded
    by k tokens per span edge, and documented rather than hidden.

    Streaming-composition caveat (vs :class:`IncrementalDeduper`'s
    pre_commit contract): ``cleaned`` is deterministic given the
    PRE-COMMIT state, but a replay AFTER the commit cannot recompute
    it against the current state (the batch's own grams are now
    present and would mark every occurrence).  A foreachBatch
    composition must therefore write its output inside ``pre_commit``
    (idempotent sink) — after the ledger skip there is nothing to
    recompute, which is exactly the crash-ordering convergence the
    doc-level gate documents; do NOT recompute cleaned post-commit.

    Scale: the per-batch cost is one position-gram pass over the
    BATCH plus joins keyed on the 8-byte gram hash against the state
    (shuffle join; AQE handles hot boilerplate grams).  The state
    grows with distinct corpus grams — same storage class as the
    signature state, maintained with :func:`IncrementalDeduper.maintain`'s
    compaction through ``maintain()``.

    State-growth bound (round 6, opt-in): with ``track_hits=True``
    every state row carries ``(batch_seq, last_seq)`` — the commit
    sequence that inserted the gram and the last sequence that SAW it
    again — and the commit becomes a keyed merge (new grams inserted,
    hit grams' ``last_seq`` refreshed; still one exactly-once txn).
    ``maintain(prune_singletons_older_than=N)`` then drops grams that
    were never seen twice (``last_seq == batch_seq``) and are older
    than ``N`` commits, so state size plateaus at roughly the
    distinct-gram footprint of the last N batches plus the recurring
    (boilerplate) set, which is never pruned because its ``last_seq``
    keeps advancing.  RECALL CONSEQUENCE (documented, counted): a
    pruned singleton that recurs later is re-inserted as a NEW
    canonical first — that one recurrence survives the gate; only
    occurrences after it are removed again.  This is bounded-memory
    ExactSubstr: duplicates at a distance greater than the prune
    horizon cost exactly one missed removal each.  Cost: the merge
    rewrites only files holding the batch's hit grams (gram-clustered
    files keep hot boilerplate co-located), vs the pure append of
    ``track_hits=False``.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        k: int = 50,
        track_hits: bool = False,
    ):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.spark = spark
        self.table = SnapTable(spark, state_path)
        self.k = k
        self.track_hits = track_hits

    def state_grams(self) -> DataFrame | None:
        if self.table.current_version() is None:
            return None
        return self.table.read()

    def maintain(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        keep_last: int = 7,
        vacuum_min_age_seconds: float = 24 * 3600,
        prune_singletons_older_than: int | None = None,
    ) -> dict:
        """Compaction + snapshot expiry (as the doc-level gate), plus
        the optional singleton-age pruning policy (class docstring —
        needs a ``track_hits=True`` state).  Returns the compaction
        dict plus ``pruned_grams``."""
        pruned = 0
        if prune_singletons_older_than is not None:
            state = self.state_grams()
            if state is not None and "last_seq" in state.columns:
                cur = self.table.current_version() or 0
                cutoff = cur - int(prune_singletons_older_than)
                before = self.table.count_rows()
                self.table.delete_where(
                    (F.col("last_seq") == F.col("batch_seq"))
                    & (F.col("batch_seq") <= cutoff)
                )
                pruned = before - self.table.count_rows()
        out = _maintain_state(
            self.table, target_file_bytes, keep_last, vacuum_min_age_seconds
        )
        out["pruned_grams"] = pruned
        return out

    def clean_batch(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> dict:
        """The PURE half: ``{"cleaned", "spans"}`` as a deterministic
        function of (batch, current state) — no commit, so it is safe
        to call during a replay whose gram commit already landed has
        NOT happened yet (see the streaming caveat above; pair with
        :meth:`commit_grams`)."""
        from harness_aws_etl_pipeline_spark.operators.spandedup import (
            merge_positions_to_spans,
            position_grams,
            remove_spans,
        )

        src = docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        pg = position_grams(src, self.k).persist()
        try:
            firsts = pg.groupBy("gram").agg(
                F.count(F.lit(1)).alias("__cnt"),
                F.min(F.struct("doc_id", "pos")).alias("__first"),
            )
            internal = (
                pg.join(firsts, "gram")
                .filter(
                    (F.col("__cnt") >= 2)
                    & ~(
                        (F.col("doc_id") == F.col("__first.doc_id"))
                        & (F.col("pos") == F.col("__first.pos"))
                    )
                )
                .select("doc_id", "pos")
            )
            state = self.state_grams()
            if state is not None:
                vs_state = pg.join(
                    state.select("gram"), "gram", "left_semi"
                ).select("doc_id", "pos")
                marked = internal.unionByName(vs_state).distinct()
            else:
                marked = internal
            # spans are small (edges of duplication, not the corpus):
            # materialize once so the rebuild and the caller's reads
            # don't re-run the gram joins
            spans = merge_positions_to_spans(marked, self.k).localCheckpoint(
                eager=True
            )
        finally:
            pg.unpersist()
        cleaned = remove_spans(docs, spans, id_col=id_col, text_col=text_col)
        return {"cleaned": cleaned, "spans": spans}

    def commit_grams(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        txn: tuple[str, int] | None = None,
    ) -> dict:
        """The COMMIT half: append the batch's new distinct grams
        (with their batch-canonical firsts) to the state, exactly once
        per ``txn``.  Grams come from the PRE-clean batch text — the
        arrival-order ExactSubstr policy.  Returns ``{"new_grams",
        "state_version", "skipped"}``."""
        from harness_aws_etl_pipeline_spark.operators.spandedup import (
            position_grams,
        )

        if self.table.txn_committed(txn):
            return {
                "new_grams": 0,
                "state_version": self.table.current_version(),
                "skipped": True,
            }
        src = docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        firsts = position_grams(src, self.k).groupBy("gram").agg(
            F.min(F.struct("doc_id", "pos")).alias("__first"),
        )
        new_rows = firsts.select(
            "gram",
            F.col("__first.doc_id").alias("doc_id"),
            F.col("__first.pos").alias("pos"),
        )
        state = self.state_grams()
        if state is not None:
            new_rows = new_rows.join(state.select("gram"), "gram", "left_anti")
        if self.track_hits:
            # hit-tracking commit: new grams stamped with this commit's
            # sequence, previously-seen grams refreshed (last_seq only
            # — canonical first and insert age are preserved), in ONE
            # exactly-once keyed merge
            cur = self.table.current_version()
            seq = (cur + 1) if cur is not None else 0
            new_rows = (
                new_rows.withColumn("batch_seq", F.lit(seq).cast("long"))
                .withColumn("last_seq", F.lit(seq).cast("long"))
                .localCheckpoint(eager=True)
            )
            n_new = int(new_rows.count())
            if state is not None:
                # legacy states (track_hits=False history) lack the
                # seq columns — treat their rows as inserted "now"
                bseq = (
                    F.coalesce(F.col("batch_seq"), F.lit(seq))
                    if "batch_seq" in state.columns
                    else F.lit(seq)
                )
                hit_rows = state.join(
                    firsts.select("gram"), "gram", "left_semi"
                ).select(
                    "gram",
                    "doc_id",
                    "pos",
                    bseq.cast("long").alias("batch_seq"),
                    F.lit(seq).cast("long").alias("last_seq"),
                )
                upsert = new_rows.unionByName(hit_rows).localCheckpoint(
                    eager=True
                )
            else:
                upsert = new_rows
            out = self.table.merge(upsert, key_cols=["gram"], txn=txn)
            return {
                "new_grams": n_new,
                "hit_grams": int(upsert.count()) - n_new,
                "state_version": out["version"],
                "skipped": False,
            }
        new_rows = new_rows.localCheckpoint(eager=True)
        out = self.table.write(new_rows, mode="append", txn=txn)
        return {
            "new_grams": int(new_rows.count()),
            "state_version": out["version"],
            "skipped": False,
        }

    def process_batch(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        txn: tuple[str, int] | None = None,
        pre_commit: "Callable[[DataFrame], None] | None" = None,
    ) -> dict:
        """:meth:`clean_batch` + :meth:`commit_grams` in one call.

        Returns::

            {"cleaned":   DataFrame  # the batch with spans cut out
             "spans":     DataFrame[doc_id, span_start, span_end]
             "new_grams": int        # grams appended to the state
             "state_version": int, "skipped": bool}

        ``cleaned`` is a deterministic function of (batch, state), so
        a replayed batch reproduces it exactly; ``pre_commit(cleaned)``
        runs BEFORE the state commit (the same exactly-once
        composition hook as :class:`IncrementalDeduper`).
        """
        if self.table.txn_committed(txn):
            return {
                "cleaned": None,
                "spans": None,
                "new_grams": 0,
                "state_version": self.table.current_version(),
                "skipped": True,
            }
        halves = self.clean_batch(docs, id_col, text_col)
        if pre_commit is not None:
            pre_commit(halves["cleaned"])
        out = self.commit_grams(docs, id_col, text_col, txn)
        res = {
            "cleaned": halves["cleaned"],
            "spans": halves["spans"],
            "new_grams": out["new_grams"],
            "state_version": out["state_version"],
            "skipped": False,
        }
        if "hit_grams" in out:
            res["hit_grams"] = out["hit_grams"]
        return res


class IncrementalHeavyHitters:
    """Streaming/daily heavy hitters over an unbounded key domain.

    :func:`~harness_aws_etl_pipeline_spark.operators.sketches.
    heavy_hitters` answers "top keys of THIS dataset"; a monitoring
    pipeline asks "top keys EVER, updated per batch, without re-reading
    history". This keeps one space-saving summary as durable state
    (``capacity`` rows — KBs to MBs, independent of how many batches
    or distinct keys flowed through) and folds each batch in with the
    Agarwal et al. mergeable-summaries algebra the one-shot operator
    already uses across partitions:

    * **per batch**: partition summaries of the batch
      (``sketches.partition_summaries``) are merged TOGETHER WITH the
      prior state (riding as one more source, pid −1, floor = the
      state's absent-key bound) via ``sketches.merged_bounds``;
    * **trim**: the merged candidates are cut back to ``capacity``
      rows ranked by upper bound; the new floor is
      ``max(Σ floors, (capacity+1)-th upper bound)`` — sound for
      evicted keys (their UB is ≤ the cutoff) AND never-tracked keys
      (bounded by the summed floors), so ``count_min ≤ true ≤
      count_max`` holds across any number of batches;
    * **exactly-once**: the state write is one snapshot commit
      carrying the batch's ``(app_id, batch_id)`` ledger entry — a
      replayed batch short-circuits before any Spark job (the same
      txn pattern as the dedup gates; plug ``process_batch`` straight
      into ``foreachBatch``).

    Exactness: while no partition of any batch ever evicts AND the
    state never trims (capacity covers the global distinct count),
    the state equals the exact running groupBy — pinned by tests;
    under pressure the bounds stay sound and ``guaranteed`` marks
    certain members of the true top-k.
    """

    _STATE_SCHEMA = "key string, cnt long, err long, is_floor boolean"

    def __init__(self, spark: SparkSession, state_path: str, capacity: int = 1024):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.spark = spark
        self.table = SnapTable(spark, state_path)
        self.capacity = capacity

    # ------------------------------------------------------------------

    def state_summary(self) -> DataFrame | None:
        """The tracked ``(key, cnt, err)`` rows plus the floor row
        (key NULL, ``is_floor``) — ``cnt − err ≤ true ≤ cnt`` per
        tracked key, ``true ≤ floor`` for everything else."""
        if self.table.current_version() is None:
            return None
        return self.table.read()

    def maintain(
        self,
        target_file_bytes: int = 16 * 1024 * 1024,
        keep_last: int = 7,
        vacuum_min_age_seconds: float = 24 * 3600,
    ) -> dict:
        return _maintain_state(
            self.table, target_file_bytes, keep_last, vacuum_min_age_seconds
        )

    def process_batch(
        self,
        df: DataFrame,
        col: str,
        weight: str | None = None,
        txn: tuple[str, int] | None = None,
    ) -> dict:
        """Fold one batch into the running summary.

        Returns ``{"state_version", "skipped", "tracked_keys",
        "floor"}``; read the current ranking any time with
        :meth:`top`."""
        from harness_aws_etl_pipeline_spark.operators.sketches import (
            _hh_source,
            merged_bounds,
            partition_summaries,
        )

        if self.table.txn_committed(txn):
            return {
                "state_version": self.table.current_version(),
                "skipped": True,
                "tracked_keys": None,
                "floor": None,
            }
        batch_summ = partition_summaries(_hh_source(df, col, weight), self.capacity)
        state = self.state_summary()
        if state is not None:
            state_summ = state.select(
                F.lit(-1).alias("pid"), "key", "cnt", "err", "is_floor"
            )
            batch_summ = batch_summ.unionByName(state_summ)
        summ = batch_summ.persist()
        try:
            merged = merged_bounds(summ)
            ranked = merged.withColumn(
                "_rk",
                F.row_number().over(
                    Window.orderBy(F.desc("count_max"), F.asc("key"))
                ),
            ).persist()
            cutoff = ranked.agg(
                F.max(
                    F.when(F.col("_rk") > self.capacity, F.col("count_max"))
                ).alias("_cut"),
                F.max("_tf").alias("_tf"),
            )
            new_state = (
                ranked.where(F.col("_rk") <= self.capacity)
                .select(
                    "key",
                    F.col("count_max").alias("cnt"),
                    (F.col("count_max") - F.col("count_min")).alias("err"),
                    F.lit(False).alias("is_floor"),
                )
                .unionByName(
                    cutoff.select(
                        F.lit(None).cast("string").alias("key"),
                        F.greatest(
                            F.coalesce(F.col("_cut"), F.lit(0)), F.col("_tf")
                        ).alias("cnt"),
                        F.lit(0).cast("long").alias("err"),
                        F.lit(True).alias("is_floor"),
                    )
                )
                # the state is capacity+1 rows — materialize so the
                # overwrite below doesn't re-run the merge against the
                # table it is replacing
                .localCheckpoint(eager=True)
            )
            out = self.table.write(new_state, mode="overwrite", txn=txn)
            tracked = new_state.where(~F.col("is_floor")).count()
            floor = new_state.where("is_floor").first()["cnt"]
        finally:
            summ.unpersist()
            try:
                ranked.unpersist()
            except Exception:
                pass
        return {
            "state_version": out["version"],
            "skipped": False,
            "tracked_keys": tracked,
            "floor": int(floor),
        }

    def top(self, k: int = 10) -> DataFrame:
        """Current top-``k``: ``(rank, key, count_min, count_max,
        guaranteed)`` — same contract as the one-shot operator, over
        everything ever folded in."""
        state = self.state_summary()
        if state is None:
            return self.spark.createDataFrame(
                [],
                "rank int, key string, count_min long, count_max long,"
                " guaranteed boolean",
            )
        floor = state.where("is_floor").select(F.col("cnt").alias("_tf"))
        ranked = (
            state.where(~F.col("is_floor"))
            .select(
                "key",
                (F.col("cnt") - F.col("err")).alias("count_min"),
                F.col("cnt").alias("count_max"),
            )
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.orderBy(F.desc("count_max"), F.asc("key"))
                ),
            )
        )
        outside = ranked.agg(
            F.max(F.when(F.col("rank") > k, F.col("count_max"))).alias("_ob")
        )
        return (
            ranked.where(F.col("rank") <= k)
            .crossJoin(F.broadcast(outside))
            .crossJoin(F.broadcast(floor))
            .select(
                F.col("rank").cast("int").alias("rank"),
                "key",
                "count_min",
                "count_max",
                (
                    F.col("count_min")
                    > F.greatest(F.coalesce(F.col("_ob"), F.lit(0)), F.col("_tf"))
                ).alias("guaranteed"),
            )
            .orderBy("rank")
        )


class IncrementalQuantiles:
    """Streaming/daily quantiles over an unbounded value stream.

    ``operators/quantiles.py`` answers "the exact p99 of THIS
    dataset"; a monitoring pipeline asks "the running p99 over
    everything ever folded in, updated per batch, without re-reading
    history". This keeps one WEIGHTED QUANTILE SUMMARY as durable
    state — at most ``capacity`` ``(value, weight)`` rows plus a meta
    row ``(n, err)`` — and folds each batch with a deterministic
    mergeable algebra (no randomness anywhere, so the state is
    byte-reproducible across runs and partitionings):

    * **per batch**: ``batch_k`` evenly spaced EXACT order statistics
      of the batch (``quantiles.exact_quantiles`` — the two-level
      rank selection, one range shuffle, no buffering aggregate)
      become a weighted summary whose rank error is
      ``max(block weight) − 1`` — zero while batches are smaller
      than ``batch_k``;
    * **merge**: summaries union and their errors ADD — the rank
      estimate of a union is the sum of the two estimates, each
      within its own bound;
    * **compress**: when the union exceeds ``capacity`` rows, it is
      re-stratified to ``capacity`` rows by weighted rank (driver-
      side over ≤ capacity + batch_k rows — the same bounded-
      metadata collect budget as a model/manifest read), adding
      ``max(new block weight − kept row's own weight)`` to the
      error bound;
    * **exactly-once**: the state write is one snapshot commit with
      the batch's ``(app_id, batch_id)`` ledger entry — replays
      short-circuit before any Spark job (``foreachBatch``-ready).

    Soundness invariant (pinned by tests): for every reported
    quantile, ``rank_lo ≤ true rank of the reported value ≤
    rank_hi`` where the window is the accumulated error bound — and
    while batches stay under ``batch_k`` and no compression fires,
    the summary is EXACT (err = 0). State size is KBs regardless of
    how many values flowed through.
    """

    _STATE_SCHEMA = (
        "value double, weight long, is_meta boolean, n long, err long"
    )

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        capacity: int = 256,
        batch_k: int = 128,
    ):
        if capacity < 8 or batch_k < 2:
            raise ValueError("capacity must be >= 8 and batch_k >= 2")
        self.spark = spark
        self.table = SnapTable(spark, state_path)
        self.capacity = capacity
        self.batch_k = batch_k

    # ------------------------------------------------------------------

    def state_summary(self) -> DataFrame | None:
        if self.table.current_version() is None:
            return None
        return self.table.read()

    def maintain(
        self,
        target_file_bytes: int = 16 * 1024 * 1024,
        keep_last: int = 7,
        vacuum_min_age_seconds: float = 24 * 3600,
    ) -> dict:
        return _maintain_state(
            self.table, target_file_bytes, keep_last, vacuum_min_age_seconds
        )

    # ------------------------------------------------------------------

    def _read_state(self) -> tuple[list[tuple[float, int]], int, int]:
        state = self.state_summary()
        if state is None:
            return [], 0, 0
        rows = state.collect()
        meta = next(r for r in rows if r["is_meta"])
        data = sorted(
            ((r["value"], r["weight"]) for r in rows if not r["is_meta"]),
        )
        return data, meta["n"], meta["err"]

    @staticmethod
    def _compress(
        data: list[tuple[float, int]], capacity: int
    ) -> tuple[list[tuple[float, int]], int]:
        """Re-stratify a sorted weighted summary to ≤ capacity rows by
        weighted rank; returns (rows, added error bound)."""
        if len(data) <= capacity:
            return data, 0
        total = sum(w for _, w in data)
        out: list[tuple[float, int]] = []
        added = 0
        cum = 0
        prev_cut = 0
        i = 0
        for j in range(1, capacity + 1):
            target = -(-j * total // capacity)  # ceil
            while cum < target and i < len(data):
                v, w = data[i]
                cum += w
                i += 1
            if cum > prev_cut:
                new_w = cum - prev_cut
                out.append((v, new_w))
                added = max(added, new_w - w)
                prev_cut = cum
            if i >= len(data):
                break
        return out, added

    def process_batch(
        self,
        df: DataFrame,
        col: str,
        txn: tuple[str, int] | None = None,
    ) -> dict:
        """Fold one batch of ``df[col]`` (NULLs skipped) into the
        running summary. Returns ``{"state_version", "skipped", "n",
        "err", "rows"}``."""
        from harness_aws_etl_pipeline_spark.operators.quantiles import (
            exact_quantiles,
        )

        if self.table.txn_committed(txn):
            return {
                "state_version": self.table.current_version(),
                "skipped": True,
                "n": None,
                "err": None,
                "rows": None,
            }
        data, n, err = self._read_state()
        src = df.select(F.col(col).cast("double").alias("__v")).where(
            F.col("__v").isNotNull()
        )
        n_b = src.count()
        if n_b > 0:
            k = min(self.batch_k, n_b)
            qs = [(i + 1) / k for i in range(k)]
            qs[-1] = 1.0
            stats = exact_quantiles(src, "__v", qs).collect()
            # distinct ranks only (small batches repeat ranks); block
            # weights from consecutive rank gaps sum exactly to n_b
            seen: dict[int, float] = {}
            for r in stats:
                seen[r["rank"]] = r["value"]
            prev = -1
            batch_rows: list[tuple[float, int]] = []
            err_b = 0
            for rank in sorted(seen):
                w = rank - prev
                batch_rows.append((seen[rank], w))
                err_b = max(err_b, w - 1)
                prev = rank
            data = sorted(data + batch_rows)
            n += n_b
            err += err_b
            data, added = self._compress(data, self.capacity)
            err += added
        new_state = self.spark.createDataFrame(
            [(v, w, False, None, None) for v, w in data]
            + [(None, None, True, n, err)],
            self._STATE_SCHEMA,
        ).coalesce(1)
        out = self.table.write(new_state, mode="overwrite", txn=txn)
        return {
            "state_version": out["version"],
            "skipped": False,
            "n": n,
            "err": err,
            "rows": len(data),
        }

    # ------------------------------------------------------------------

    def quantiles(self, qs: list[float]) -> list[dict]:
        """Point estimates with sound rank windows: for each ``q``,
        the summary value whose cumulative weight first reaches
        ``ceil(q·n)``, with ``[rank_lo, rank_hi]`` = cumulative
        weight ± the accumulated error bound (clamped to [1, n]) —
        the TRUE rank of the reported value (1-based count of stream
        elements ≤ it) always falls inside the window."""
        for q in qs:
            if not (0.0 <= q <= 1.0):
                raise ValueError(f"quantile {q} outside [0, 1]")
        data, n, err = self._read_state()
        out = []
        for q in qs:
            if not data:
                out.append(
                    {"q": q, "value": None, "rank_lo": None,
                     "rank_hi": None, "n": 0, "err": err}
                )
                continue
            target = max(1, min(n, math.ceil(q * n)))
            cum = 0
            val, est = data[-1][0], n
            for i, (v, w) in enumerate(data):
                cum += w
                if cum >= target:
                    # absorb trailing rows carrying the SAME value
                    # (merged summaries can split one value across
                    # rows) — the rank window is anchored on the full
                    # cumulative weight through the value
                    for v2, w2 in data[i + 1 :]:
                        if v2 != v:
                            break
                        cum += w2
                    val, est = v, cum
                    break
            out.append(
                {
                    "q": q,
                    "value": val,
                    "rank_lo": max(1, est - err),
                    "rank_hi": min(n, est + err),
                    "n": n,
                    "err": err,
                }
            )
        return out


class IncrementalTransitions:
    """Streaming/daily Markov transition matrix over an event stream.

    ``operators/eventseq.py:transition_counts`` answers "the matrix of
    THIS dataset"; a monitoring pipeline asks "the matrix so far,
    updated per batch, without re-reading history". Two pieces of
    durable state in one snapshot table:

    * the **matrix rows** (kind 'm'): exact (prev_state, state, cnt) —
      at most |states|² rows;
    * the **per-actor tail** (kind 'l'): each actor's LAST (state,
      order) seen so far — what stitches the transition that SPANS a
      batch boundary (the batch's first event per actor transitions
      from the stored tail, not from nothing).

    Per batch: one lag window for within-batch steps, one
    min_by/max_by aggregate per actor for the batch's endpoints, one
    join against the stored tails for the boundary steps, one grouped
    sum to fold the matrix. Everything after the actor-key Exchange
    operates on per-actor/per-pair aggregates.

    Ordering contract: batches must be per-actor monotone (each
    actor's events in batch N start at or after their stored tail —
    true for time-ordered ingestion, e.g. AvailableNow file streams).
    A batch that violates it (late replay of older events) still
    counts its WITHIN-batch steps exactly, but its boundary step is
    dropped rather than miscounted, the drop is reported
    (``late_actors``), and the stored tail KEEPS whichever endpoint
    is newest (a late batch never regresses an actor's tail, so the
    next in-order batch still stitches from fresh state).

    Exactly-once: the state write is one snapshot commit carrying the
    batch's ``(app_id, batch_id)`` ledger entry — a replayed batch
    short-circuits before any Spark job (same txn pattern as the
    dedup gates; plug ``process_batch`` into ``foreachBatch``).

    Exactness: under the ordering contract the matrix after N batches
    EQUALS ``transition_counts`` over the concatenated stream —
    pinned by tests.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        key_col: str,
        order_col: str,
        state_col: str,
        tie_cols: list[str] | None = None,
    ):
        self.spark = spark
        self.table = SnapTable(spark, state_path)
        self.key_col = key_col
        self.order_col = order_col
        self.state_col = state_col
        self.tie_cols = list(tie_cols or [])

    # ------------------------------------------------------------------

    def state_summary(self) -> DataFrame | None:
        if self.table.current_version() is None:
            return None
        return self.table.read()

    def maintain(
        self,
        target_file_bytes: int = 16 * 1024 * 1024,
        keep_last: int = 7,
        vacuum_min_age_seconds: float = 24 * 3600,
    ) -> dict:
        return _maintain_state(
            self.table, target_file_bytes, keep_last, vacuum_min_age_seconds
        )

    def _ord_struct(self, prefix: str = ""):
        cols = [F.col(prefix + self.order_col)] + [
            F.col(prefix + c) for c in self.tie_cols
        ]
        return F.struct(*cols)

    def process_batch(self, df: DataFrame, txn: tuple[str, int] | None = None) -> dict:
        """Fold one batch in; returns ``{"state_version", "skipped",
        "pairs_tracked", "actors_tracked", "late_actors"}``."""
        if self.table.txn_committed(txn):
            return {
                "state_version": self.table.current_version(),
                "skipped": True,
                "pairs_tracked": None,
                "actors_tracked": None,
                "late_actors": None,
            }
        k, o, s = self.key_col, self.order_col, self.state_col
        src = df.select(k, o, s, *self.tie_cols)
        w = Window.partitionBy(k).orderBy(
            F.col(o), *[F.col(c) for c in self.tie_cols]
        )
        within = (
            src.withColumn("_prev", F.lag(s).over(w))
            .where(F.col("_prev").isNotNull())
            .groupBy(
                F.col("_prev").alias("prev_state"), F.col(s).alias("state")
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        ends = src.groupBy(F.col(k).alias("actor")).agg(
            F.min_by(F.col(s), self._ord_struct()).alias("first_state"),
            F.min(self._ord_struct()).alias("first_ord"),
            F.max_by(F.col(s), self._ord_struct()).alias("last_state"),
            F.max(self._ord_struct()).alias("last_ord"),
        )
        state = self.state_summary()
        if state is not None:
            matrix = state.where(F.col("kind") == "m").select(
                "prev_state", "state", "cnt"
            )
            tails = state.where(F.col("kind") == "l").select(
                "actor",
                F.col("state").alias("tail_state"),
                F.col("last_ord").alias("tail_ord"),
            )
        else:
            matrix = tails = None
        if tails is not None:
            j = ends.join(tails, "actor", "left")
            boundary = (
                j.where(
                    F.col("tail_state").isNotNull()
                    & (F.col("tail_ord") <= F.col("first_ord"))
                )
                .groupBy(
                    F.col("tail_state").alias("prev_state"),
                    F.col("first_state").alias("state"),
                )
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            late = j.where(
                F.col("tail_state").isNotNull()
                & (F.col("tail_ord") > F.col("first_ord"))
            ).count()
            # keep whichever endpoint is NEWER: a late batch (all of
            # its events before the stored tail) must not regress the
            # tail to older state/ord, or the next in-order batch
            # would stitch its boundary from stale state
            _tail_newer = F.col("tail_ord").isNotNull() & (
                F.col("tail_ord") > F.col("last_ord")
            )
            new_tails = (
                j.select(
                    "actor",
                    F.when(_tail_newer, F.col("tail_state"))
                    .otherwise(F.col("last_state"))
                    .alias("state"),
                    F.when(_tail_newer, F.col("tail_ord"))
                    .otherwise(F.col("last_ord"))
                    .alias("last_ord"),
                )
                .unionByName(
                    tails.join(ends, "actor", "left_anti").select(
                        "actor",
                        F.col("tail_state").alias("state"),
                        F.col("tail_ord").alias("last_ord"),
                    )
                )
            )
            folded = within.unionByName(boundary)
            if matrix is not None:
                folded = folded.unionByName(matrix)
        else:
            late = 0
            new_tails = ends.select(
                "actor", F.col("last_state").alias("state"), "last_ord"
            )
            folded = within
        new_matrix = folded.groupBy("prev_state", "state").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )
        new_state = (
            new_matrix.select(
                F.lit("m").alias("kind"),
                "prev_state",
                "state",
                "cnt",
                F.lit(None).cast("string").alias("actor"),
                F.lit(None)
                .cast(new_tails.schema["last_ord"].dataType)
                .alias("last_ord"),
            )
            .unionByName(
                new_tails.select(
                    F.lit("l").alias("kind"),
                    F.lit(None).cast("string").alias("prev_state"),
                    "state",
                    F.lit(None).cast("long").alias("cnt"),
                    "actor",
                    "last_ord",
                )
            )
            # materialize before the overwrite re-reads the table
            .localCheckpoint(eager=True)
        )
        out = self.table.write(new_state, mode="overwrite", txn=txn)
        pairs = new_state.where(F.col("kind") == "m").count()
        actors = new_state.where(F.col("kind") == "l").count()
        return {
            "state_version": out["version"],
            "skipped": False,
            "pairs_tracked": pairs,
            "actors_tracked": actors,
            "late_actors": int(late),
        }

    def matrix(self) -> DataFrame:
        """Current exact matrix: ``(prev_state, state, cnt, p)`` —
        same contract as the one-shot operator, over everything ever
        folded in."""
        state = self.state_summary()
        if state is None:
            return self.spark.createDataFrame(
                [], "prev_state string, state string, cnt long, p double"
            )
        counts = state.where(F.col("kind") == "m").select(
            "prev_state", "state", "cnt"
        )
        row_total = Window.partitionBy("prev_state")
        return counts.withColumn(
            "p",
            F.col("cnt").cast("double")
            / F.sum("cnt").over(row_total).cast("double"),
        )


class IncrementalEwma:
    """Streaming EWMA per series: exponential smoothing that SURVIVES
    micro-batches. ``timeseries.ewma`` smooths one bounded frame; a
    monitoring stream needs each batch smoothed as a CONTINUATION of
    everything before it — the recurrence's whole state is one double
    per series, so the durable state is exactly (group, s, last_ord):
    KBs per thousand series, independent of stream length.

    Per batch: the per-group fold (same fixed IEEE chain as the batch
    operator — ``α·x + (1−α)·s``) seeds its accumulator from the
    stored ``s`` instead of NULL, so batch boundaries are invisible in
    the output; the new state is the fold's final value. Rows at or
    before a series' stored ``last_ord`` are DROPPED and counted
    (``late_rows``) rather than corrupting the recurrence — the same
    per-series monotone contract as :class:`IncrementalTransitions`.

    Exactly-once: snapshot commit with the batch txn ledger; replays
    short-circuit. Smoothed rows come back eagerly materialized
    (``localCheckpoint``) so the caller can write them idempotently
    BEFORE the state they correspond to is the committed one.

    Exactness: folding batches b₁..bₙ equals ``timeseries.ewma`` over
    their concatenation, bit for bit — pinned by tests.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        order_col: str,
        value_col: str,
        group_cols: list[str],
        alpha: float = 0.3,
    ):
        if not group_cols:
            raise ValueError("group_cols must be non-empty (one series per group)")
        if not 0.0 < float(alpha) <= 1.0:
            raise ValueError(f"alpha must be in (0, 1]: {alpha}")
        self.spark = spark
        self.table = SnapTable(spark, state_path)
        self.order_col = order_col
        self.value_col = value_col
        self.group_cols = list(group_cols)
        self.alpha = float(alpha)

    def state_summary(self) -> DataFrame | None:
        if self.table.current_version() is None:
            return None
        return self.table.read()

    def maintain(
        self,
        target_file_bytes: int = 16 * 1024 * 1024,
        keep_last: int = 7,
        vacuum_min_age_seconds: float = 24 * 3600,
    ) -> dict:
        return _maintain_state(
            self.table, target_file_bytes, keep_last, vacuum_min_age_seconds
        )

    def process_batch(self, df: DataFrame, txn: tuple[str, int] | None = None) -> dict:
        """Fold one batch; returns ``{"smoothed": DataFrame(groups,
        order, value, ewma), "state_version", "skipped", "series",
        "rows", "late_rows"}`` — ``smoothed`` is eagerly materialized
        and NULL when the batch was a replay."""
        if self.table.txn_committed(txn):
            return {
                "smoothed": None,
                "state_version": self.table.current_version(),
                "skipped": True,
                "series": None,
                "rows": None,
                "late_rows": None,
            }
        groups, o, v = self.group_cols, self.order_col, self.value_col
        a, oma = self.alpha, 1.0 - self.alpha
        src = df.select(*groups, o, v)
        state = self.state_summary()
        if state is not None:
            src = src.join(state, on=groups, how="left")
            late_pred = F.col("last_ord").isNotNull() & (
                F.col(o) <= F.col("last_ord")
            )
            late = src.where(late_pred).count()
            src = src.where(~F.coalesce(late_pred, F.lit(False)))
        else:
            late = 0
            src = (
                src.withColumn("s", F.lit(None).cast("double"))
                .withColumn(
                    "last_ord", F.lit(None).cast(df.schema[o].dataType)
                )
            )
        assembled = src.groupBy(*groups).agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(o).alias("o"),
                        F.col(v).cast("double").alias("v"),
                    )
                )
            ).alias("_series"),
            F.first("s").alias("_s0"),
        )

        def step(acc, x):
            s = F.when(acc["s"].isNull(), x["v"]).otherwise(
                F.lit(a) * x["v"] + F.lit(oma) * acc["s"]
            )
            return F.struct(
                s.alias("s"), F.concat(acc["out"], F.array(s)).alias("out")
            )

        init = F.struct(
            F.col("_s0").alias("s"),
            F.array().cast("array<double>").alias("out"),
        )
        folded = assembled.withColumn(
            "_ew", F.aggregate("_series", init, step)["out"]
        )
        smoothed = (
            folded.select(
                *groups, F.explode(F.arrays_zip("_series", "_ew")).alias("_z")
            )
            .select(
                *groups,
                F.col("_z._series.o").alias(o),
                F.col("_z._series.v").alias(v),
                F.col("_z._ew").alias("ewma"),
            )
            .localCheckpoint(eager=True)
        )
        new_tail = folded.where(F.size("_series") > 0).select(
            *groups,
            F.element_at("_ew", -1).alias("s"),
            F.element_at("_series", -1)["o"].alias("last_ord"),
        )
        if state is not None:
            batch_keys = new_tail.select(*groups)
            new_tail = new_tail.unionByName(
                state.join(batch_keys, on=groups, how="left_anti")
            )
        new_state = new_tail.localCheckpoint(eager=True)
        out = self.table.write(new_state, mode="overwrite", txn=txn)
        return {
            "smoothed": smoothed,
            "state_version": out["version"],
            "skipped": False,
            "series": new_state.count(),
            "rows": smoothed.count(),
            "late_rows": int(late),
        }


class IncrementalDrift:
    """Streaming drift monitor: fold batches of CURRENT data against a
    PINNED reference distribution, without re-reading history.

    ``operators/drift.py`` compares two bounded frames; a monitoring
    DAG instead pins a reference snapshot once and asks after every
    micro-batch "has the stream drifted yet?". The durable state is
    the pair of exact per-category count tables — ``(side, value,
    cnt)`` with side 'r' (reference) / 'c' (accumulated current) — so
    state is O(|categories|) regardless of stream length, and every
    derived statistic is exact: folding batches b₁..bₙ yields the
    same cells as ``drift_cells(ref, b₁ ∪ … ∪ bₙ)`` (pinned by
    tests).

    Categorical by contract: values are compared as strings. For a
    numeric column, bin it first on a PINNED grid
    (``operators/drift.py:grid_bin`` with the reference's lo/hi) and
    feed the bin label — the grid must not drift with the stream,
    which is exactly why the monitor does not re-derive it per
    batch.

    Per batch: one map-side-combinable groupBy over the batch + one
    |categories|-row merge — no joins against the facts, no windows.
    Exactly-once: one snapshot commit carrying the batch txn ledger
    (same pattern as the dedup gates); replays short-circuit before
    any Spark job. ``set_reference`` RESETS the accumulated current
    side — a new baseline starts a fresh comparison.
    """

    def __init__(self, spark: SparkSession, state_path: str, col: str):
        self.spark = spark
        self.table = SnapTable(spark, state_path)
        self.col = col

    # ------------------------------------------------------------------

    def state_summary(self) -> DataFrame | None:
        if self.table.current_version() is None:
            return None
        return self.table.read()

    def maintain(
        self,
        target_file_bytes: int = 16 * 1024 * 1024,
        keep_last: int = 7,
        vacuum_min_age_seconds: float = 24 * 3600,
    ) -> dict:
        return _maintain_state(
            self.table, target_file_bytes, keep_last, vacuum_min_age_seconds
        )

    def _batch_counts(self, df: DataFrame, side: str) -> DataFrame:
        v = F.col(self.col).cast("string")
        return (
            df.where(v.isNotNull())
            .groupBy(v.alias("value"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .select(F.lit(side).alias("side"), "value", "cnt")
        )

    def set_reference(
        self, df: DataFrame, txn: tuple[str, int] | None = None
    ) -> dict:
        """Pin the reference distribution (one groupBy); resets the
        accumulated current side."""
        if self.table.txn_committed(txn):
            return {
                "state_version": self.table.current_version(),
                "skipped": True,
                "categories": None,
            }
        ref = self._batch_counts(df, "r").localCheckpoint(eager=True)
        out = self.table.write(ref, mode="overwrite", txn=txn)
        return {
            "state_version": out["version"],
            "skipped": False,
            "categories": ref.count(),
        }

    def process_batch(
        self, df: DataFrame, txn: tuple[str, int] | None = None
    ) -> dict:
        """Fold one batch of current data; returns ``{"state_version",
        "skipped", "batch_rows", "categories"}``."""
        if self.table.txn_committed(txn):
            return {
                "state_version": self.table.current_version(),
                "skipped": True,
                "batch_rows": None,
                "categories": None,
            }
        state = self.state_summary()
        if state is None:
            raise ValueError(
                "IncrementalDrift: set_reference must run before batches"
            )
        cur = self._batch_counts(df, "c")
        merged = (
            state.unionByName(cur)
            .groupBy("side", "value")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .localCheckpoint(eager=True)
        )
        out = self.table.write(merged, mode="overwrite", txn=txn)
        rows = merged.where(F.col("side") == "c").agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n"),
            F.count(F.lit(1)).alias("k"),
        ).first()
        return {
            "state_version": out["version"],
            "skipped": False,
            "batch_rows": int(rows["n"]),
            "categories": int(rows["k"]),
        }

    def cells(self) -> DataFrame:
        """Exact contingency table so far: ``(value, ref_cnt,
        cur_cnt)`` — identical to ``drift_cells(reference,
        concat(batches))``."""
        state = self.state_summary()
        if state is None:
            return self.spark.createDataFrame(
                [], "value string, ref_cnt long, cur_cnt long"
            )
        return (
            state.groupBy("value")
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("side") == "r", F.col("cnt"))),
                    F.lit(0),
                ).cast("long").alias("ref_cnt"),
                F.coalesce(
                    F.sum(F.when(F.col("side") == "c", F.col("cnt"))),
                    F.lit(0),
                ).cast("long").alias("cur_cnt"),
            )
        )

    def report(self) -> DataFrame:
        """1 row: ``(n_ref, n_cur, categories, tvd_num decimal(38,0),
        tvd double, chi2 double)`` from the stored cells — the integer
        numerator is the value to alert on reproducibly; tvd/chi2 are
        the human-readable scores (same math as tvd_drift /
        chi2_drift)."""
        dec = "decimal(38,0)"
        d = self.cells()
        totals = d.agg(
            F.coalesce(F.sum("ref_cnt"), F.lit(0)).cast("long").alias("n1"),
            F.coalesce(F.sum("cur_cnt"), F.lit(0)).cast("long").alias("n2"),
            F.count(F.lit(1)).cast("long").alias("k"),
        )
        j = d.crossJoin(F.broadcast(totals))
        num = F.abs(
            F.col("ref_cnt").cast(dec) * F.col("n2").cast(dec)
            - F.col("cur_cnt").cast(dec) * F.col("n1").cast(dec)
        )
        row_tot = (F.col("ref_cnt") + F.col("cur_cnt")).cast("double")
        n = (F.col("n1") + F.col("n2")).cast("double")
        e1 = row_tot * F.col("n1").cast("double") / n
        e2 = row_tot * F.col("n2").cast("double") / n
        # expectations are 0 exactly when a whole SIDE is empty (every
        # cell has row_tot > 0) — the chi2 output is NULL then anyway,
        # so guard the division rather than divide by zero under ANSI
        term = F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            (F.col("ref_cnt").cast("double") - e1) ** 2 / e1
            + (F.col("cur_cnt").cast("double") - e2) ** 2 / e2,
        )
        return (
            j.groupBy("n1", "n2", "k")
            .agg(
                F.coalesce(F.sum(num), F.lit(0).cast(dec)).alias("tvd_num"),
                F.sum(term).alias("_chi2"),
            )
            .select(
                F.col("n1").alias("n_ref"),
                F.col("n2").alias("n_cur"),
                F.col("k").alias("categories"),
                F.col("tvd_num").cast(dec).alias("tvd_num"),
                F.when(
                    (F.col("n1") > 0) & (F.col("n2") > 0),
                    F.col("tvd_num").cast("double")
                    / (
                        2.0
                        * F.col("n1").cast("double")
                        * F.col("n2").cast("double")
                    ),
                ).alias("tvd"),
                F.when(
                    (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("k") > 1),
                    F.col("_chi2"),
                ).alias("chi2"),
            )
        )


# ----------------------------------------------------- link graph


class IncrementalLinkGraph:
    """Incrementally maintained link graph with warm-start rank
    refresh — PageRank/HITS over a crawl that grows batch by batch,
    without re-reading history and without cold-starting the power
    iteration each time.

    The reference recomputes nothing incrementally (one-shot jobs,
    ``etl/transformer.py``); this is the [EXT] scale path for the
    corpus-curation rank signals (:mod:`linkgraph`): a daily crawl
    adds millions of edges, and both "fold the new edges in" and
    "refresh the ranks" must cost O(new + state), not O(history).

    * **State = the folded edge multiset** ``(src, dst, w)`` in a
      :class:`~harness_aws_etl_pipeline_spark.sinks.snaptable.SnapTable`.
      ``add_edges`` commits ONE pre-folded batch delta per call
      (append, O(batch) write) carrying the batch txn ledger —
      replays short-circuit before any Spark job, same exactly-once
      contract as the dedup gates. :meth:`edges` folds lazily
      (groupBy-sum over the appended deltas); :meth:`maintain`
      rewrites the physical fold so read cost doesn't creep with
      batch count.
    * **Fold identity**: weighted edges are DEFINED bit-identical to
      multiset expansion (``linkgraph.pagerank`` weight contract), so
      a cold rank run on the folded state equals the run on the
      concatenation of every raw batch — pinned by tests.
    * **Warm start**: the last rank/hub vectors are kept in sibling
      snapshot tables and passed as ``init_ranks`` / ``init_hubs``;
      with ``tol`` the refresh on a slightly-grown graph converges in
      a handful of iterations instead of dozens (measured 45 → 2 on
      the test fixture). Power iteration has a unique fixed point, so
      the warm result equals the cold one within integer floor noise.

    Rank vectors are derived data — their tables carry no txn ledger
    (recomputable at will); only edge ingestion is exactly-once.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        src: str = "src",
        dst: str = "dst",
        weight: str | None = None,
    ):
        self.spark = spark
        self.src, self.dst, self.weight = src, dst, weight
        base = state_path.rstrip("/")
        self.edges_table = SnapTable(spark, f"{base}/edges")
        self.ranks_table = SnapTable(spark, f"{base}/ranks")
        self.hits_table = SnapTable(spark, f"{base}/hits")

    # ------------------------------------------------------------------

    def _batch_edges(self, df: DataFrame) -> DataFrame:
        w = (
            F.col(self.weight).cast("long")
            if self.weight
            else F.lit(1).cast("long")
        )
        return (
            df.select(
                F.col(self.src).cast("string").alias("src"),
                F.col(self.dst).cast("string").alias("dst"),
                w.alias("w"),
            )
            .where(
                F.col("src").isNotNull()
                & F.col("dst").isNotNull()
                & (F.col("w") >= 1)
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").cast("long").alias("w"))
        )

    def add_edges(
        self, df: DataFrame, txn: tuple[str, int] | None = None
    ) -> dict:
        """Fold one batch of edges into the state (append of the
        batch's pre-folded delta). Returns ``{"state_version",
        "skipped", "edge_rows"}``."""
        if self.edges_table.txn_committed(txn):
            return {
                "state_version": self.edges_table.current_version(),
                "skipped": True,
                "edge_rows": None,
            }
        batch = self._batch_edges(df).localCheckpoint(eager=True)
        out = self.edges_table.write(batch, mode="append", txn=txn)
        return {
            "state_version": out["version"],
            "skipped": False,
            "edge_rows": batch.count(),
        }

    def edges(self) -> DataFrame:
        """The folded multiset ``(src, dst, w)`` — groupBy-sum over
        the appended batch deltas."""
        if self.edges_table.current_version() is None:
            return self.spark.createDataFrame(
                [], "src string, dst string, w long"
            )
        return (
            self.edges_table.read()
            .groupBy("src", "dst")
            .agg(F.sum("w").cast("long").alias("w"))
        )

    # ------------------------------------------------------------------

    def pagerank(
        self,
        iterations: int = 30,
        tol: float | None = 1e-7,
        warm_start: bool = True,
        **kw,
    ) -> DataFrame:
        """Refresh PageRank on the current folded graph, warm-started
        from the previous vector when one exists; stores the new
        vector for the next refresh and returns the full
        ``linkgraph.pagerank`` frame (``_pr_iterations`` metadata
        included)."""
        from harness_aws_etl_pipeline_spark.operators.linkgraph import (
            pagerank as _pagerank,
        )

        init = None
        if warm_start and self.ranks_table.current_version() is not None:
            init = self.ranks_table.read().select("node", "rank_scaled")
        out = _pagerank(
            self.edges(),
            src="src",
            dst="dst",
            weight="w",
            iterations=iterations,
            tol=tol,
            init_ranks=init,
            **kw,
        )
        self.ranks_table.write(
            out.select("node", "rank_scaled"), mode="overwrite"
        )
        return out

    def hits(
        self,
        iterations: int = 20,
        tol: float | None = 1e-7,
        warm_start: bool = True,
        **kw,
    ) -> DataFrame:
        """Refresh HITS hubs/authorities, warm-started from the
        previous hub vector; stores ``(node, hub_scaled,
        auth_scaled)`` for the next refresh."""
        from harness_aws_etl_pipeline_spark.operators.linkgraph import (
            hits as _hits,
        )

        init = None
        if warm_start and self.hits_table.current_version() is not None:
            init = self.hits_table.read().select("node", "hub_scaled")
        out = _hits(
            self.edges(),
            src="src",
            dst="dst",
            weight="w",
            iterations=iterations,
            tol=tol,
            init_hubs=init,
            **kw,
        )
        self.hits_table.write(
            out.select("node", "hub_scaled", "auth_scaled"), mode="overwrite"
        )
        return out

    # ------------------------------------------------------------------

    def maintain(
        self,
        target_file_bytes: int = 16 * 1024 * 1024,
        keep_last: int = 7,
        vacuum_min_age_seconds: float = 24 * 3600,
    ) -> dict:
        """Compact/expire/vacuum all three state tables AND rewrite
        the edge fold (so reads stop paying the per-batch groupBy over
        an ever-longer delta log). Single-writer, like every other
        read-fold-overwrite maintenance path here."""
        folded = None
        if self.edges_table.current_version() is not None:
            folded = self.edges().localCheckpoint(eager=True)
            self.edges_table.write(folded, mode="overwrite")
        out = {
            "edges": _maintain_state(
                self.edges_table,
                target_file_bytes,
                keep_last,
                vacuum_min_age_seconds,
            ),
            "ranks": _maintain_state(
                self.ranks_table,
                target_file_bytes,
                keep_last,
                vacuum_min_age_seconds,
            ),
            "hits": _maintain_state(
                self.hits_table,
                target_file_bytes,
                keep_last,
                vacuum_min_age_seconds,
            ),
            "edges_folded": folded.count() if folded is not None else 0,
        }
        return out


# ----------------------------------------------------- ANN index


class IncrementalAnnIndex:
    """Incrementally maintained IVF-PQ ANN index — the embedding
    corpus grows daily, the index follows in O(batch), and the probe
    setting is re-derived from measured coverage instead of guessed.

    A 100 TB deployment cannot re-train + re-encode the whole corpus
    per ingest. The standard production split (Jégou et al.; FAISS
    practice) is: quantizers are TRAINED ONCE on a seed sample and
    FROZEN; new vectors are only ASSIGNED + ENCODED against them —
    a pure per-row projection, so incremental ingestion is
    embarrassingly parallel and bit-identical to having encoded the
    vector at build time (pinned by tests).

    * **State = the index rows** ``(id, centroid_id, pq_code)`` in a
      :class:`~harness_aws_etl_pipeline_spark.sinks.snaptable.SnapTable`
      (m bytes + a long per vector); the frozen model + centroids are
      versionless JSON artifacts beside it (save_pq / save_ivf).
    * **Per batch**: one Arrow assign+encode pass, one append commit
      carrying the batch txn ledger — replays short-circuit before
      any Spark job (same exactly-once contract as the dedup gates).
    * **Probe maintenance**: :meth:`recalibrate` re-measures the
      probed-list coverage curve (``pq.calibrate_nprobe``) against
      the CURRENT corpus and persists the chosen nprobe — searches
      default to it. Distribution drift (new clusters the frozen
      coarse quantizer splits badly) shows up as a rising calibrated
      nprobe / falling coverage, and :meth:`stats` exposes list
      occupancy imbalance — the retrain signals.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.id_col, self.vec_col = id_col, vec_col
        base = state_path.rstrip("/")
        self.table = SnapTable(spark, f"{base}/index")
        self._model_path = f"{base}/model.json"
        self._cents_path = f"{base}/centroids.json"
        self._settings_path = f"{base}/settings.json"
        self._model: dict | None = None
        self._cents = None

    # ------------------------------------------------------------------

    def _fs(self):
        from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

        return get_fs(self._settings_path, self.spark)

    def model(self) -> dict:
        if self._model is None:
            from harness_aws_etl_pipeline_spark.operators.pq import load_pq

            self._model = load_pq(self._model_path, self.spark)
        return self._model

    def centroids(self) -> DataFrame:
        if self._cents is None:
            from harness_aws_etl_pipeline_spark.operators.similarity import (
                load_ivf,
            )

            self._cents = load_ivf(self._cents_path, self.spark)
        return self._cents

    def settings(self) -> dict:
        import json

        try:
            raw = self._fs().read_bytes(self._settings_path)
        except Exception:  # noqa: BLE001 - absent settings = defaults
            return {}
        return json.loads(raw.decode("utf-8"))

    # ------------------------------------------------------------------

    def build(
        self,
        df: DataFrame,
        nlist: int = 16,
        m: int = 8,
        k: int = 256,
        dim: int | None = None,
        txn: tuple[str, int] | None = None,
    ) -> dict:
        """Train the frozen quantizers on ``df`` (the seed corpus) and
        write the initial index. Replays short-circuit via the txn
        ledger like every other gate here."""
        from harness_aws_etl_pipeline_spark.operators.pq import (
            build_ivfpq,
            save_pq,
        )
        from harness_aws_etl_pipeline_spark.operators.similarity import (
            save_ivf,
        )

        if self.table.txn_committed(txn):
            return {
                "state_version": self.table.current_version(),
                "skipped": True,
                "indexed": None,
            }
        index, cents, model = build_ivfpq(
            df,
            nlist=nlist,
            m=m,
            k=k,
            dim=dim,
            id_col=self.id_col,
            vec_col=self.vec_col,
        )
        index = index.localCheckpoint(eager=True)
        save_pq(model, self._model_path, self.spark)
        save_ivf(cents, self._cents_path, self.spark)
        self._model, self._cents = model, cents
        out = self.table.write(index, mode="overwrite", txn=txn)
        return {
            "state_version": out["version"],
            "skipped": False,
            "indexed": index.count(),
        }

    def add_batch(
        self, df: DataFrame, txn: tuple[str, int] | None = None
    ) -> dict:
        """Assign + encode one batch against the FROZEN quantizers and
        append it — bit-identical to having indexed these rows at
        build time (encoding is a pure per-row projection)."""
        from harness_aws_etl_pipeline_spark.operators.pq import (
            _cent_arrays,
            _encode_residual,
        )
        from harness_aws_etl_pipeline_spark.operators.similarity import (
            _assign_nearest,
        )

        if self.table.txn_committed(txn):
            return {
                "state_version": self.table.current_version(),
                "skipped": True,
                "indexed": None,
                "rejected": None,
            }
        model, cents = self.model(), self.centroids()
        assigned = _assign_nearest(
            df.select(self.id_col, self.vec_col),
            cents,
            self.id_col,
            self.vec_col,
        )
        cids, cunit = _cent_arrays(cents)
        enc = _encode_residual(
            assigned, model, cids, cunit, vec_col=self.vec_col
        ).localCheckpoint(eager=True)
        rows = enc.filter(
            F.col("centroid_id").isNotNull() & F.col("pq_code").isNotNull()
        ).select(self.id_col, "centroid_id", "pq_code")
        out = self.table.write(rows, mode="append", txn=txn)
        n_ok = rows.count()
        return {
            "state_version": out["version"],
            "skipped": False,
            "indexed": n_ok,
            "rejected": enc.count() - n_ok,
        }

    def index(self) -> DataFrame:
        return self.table.read()

    # ------------------------------------------------------------------

    def search(
        self,
        queries: DataFrame,
        topk: int = 10,
        nprobe: int | None = None,
        min_candidates: int | None = None,
        rerank_with: DataFrame | None = None,
        shortlist: int | None = None,
    ) -> DataFrame:
        """IVF-PQ top-k over the current index. ``nprobe`` defaults to
        the last :meth:`recalibrate` result (falling back to 4)."""
        from harness_aws_etl_pipeline_spark.operators.pq import ivfpq_topk

        if nprobe is None and min_candidates is None:
            nprobe = int(self.settings().get("nprobe", 4))
        return ivfpq_topk(
            self.index(),
            queries,
            self.model(),
            self.centroids(),
            nprobe=nprobe if nprobe is not None else 4,
            topk=topk,
            id_col=self.id_col,
            vec_col=self.vec_col,
            rerank_with=rerank_with,
            shortlist=shortlist,
            min_candidates=min_candidates,
        )

    def recalibrate(
        self,
        sample_queries: DataFrame,
        corpus: DataFrame,
        target_recall: float = 0.9,
        topk: int = 10,
    ) -> dict:
        """Re-derive nprobe from the measured coverage curve on the
        CURRENT index and persist it as the search default. ``corpus``
        supplies raw vectors for the exact top-k (the index keeps
        codes only)."""
        import json

        from harness_aws_etl_pipeline_spark.operators.pq import (
            calibrate_nprobe,
        )

        cal = calibrate_nprobe(
            self.index(),
            self.centroids(),
            sample_queries,
            corpus,
            target_recall=target_recall,
            topk=topk,
            id_col=self.id_col,
            vec_col=self.vec_col,
        )
        payload = {
            "nprobe": cal["nprobe"],
            "target_recall": target_recall,
            "scan_fraction": cal["scan_fraction"],
        }
        self._fs().write_bytes(
            self._settings_path,
            json.dumps(payload, ensure_ascii=False).encode("utf-8"),
        )
        return cal

    def stats(self) -> dict:
        """Occupancy shape of the inverted lists — imbalance rising
        over batches is the coarse-quantizer retrain signal."""
        rows = (
            self.index()
            .groupBy("centroid_id")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .collect()
        )
        occ = sorted(int(r["c"]) for r in rows)
        total = sum(occ)
        return {
            "vectors": total,
            "lists": len(occ),
            "max_list": occ[-1] if occ else 0,
            "imbalance": (occ[-1] * len(occ) / total) if total else 0.0,
            "state_version": self.table.current_version(),
        }

    def maintain(
        self,
        target_file_bytes: int = 16 * 1024 * 1024,
        keep_last: int = 7,
        vacuum_min_age_seconds: float = 24 * 3600,
    ) -> dict:
        return _maintain_state(
            self.table, target_file_bytes, keep_last, vacuum_min_age_seconds
        )


# ----------------------------------------------------- distinct count


class IncrementalDistinct:
    """Durable distinct-count synopsis: a KMV sketch as snapshot-table
    state — "how many distinct keys have we EVER accepted" answered
    after every batch without re-reading history and without the
    full-width distinct shuffle an exact count would cost.

    State is the k smallest distinct md5 hashes (≤ k short strings,
    regardless of stream length or key cardinality). Per batch: one
    O(batch) sketch pass (:func:`kmv.kmv_sketch` — per-partition
    k-min, no distinct shuffle on the input), then a
    k-smallest-of-the-union merge with the stored state (≤ 2k rows).
    Because "the k smallest values of a fixed hash" is a pure SET
    property, folding batches is BIT-IDENTICAL to sketching the whole
    concatenated history — pinned by tests — and the estimate is
    exact below k distinct. Exactly-once via the snapshot commit's
    txn ledger, replays short-circuit before any Spark job (same
    contract as every other gate here).

    The sketch composes with the rest of the KMV family: hand
    :meth:`sketch` to ``kmv_jaccard`` to ask "how much does this
    month's corpus overlap everything ever seen" at synopsis cost.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        col: str,
        k: int = 1024,
    ):
        if k < 2:
            raise ValueError("k must be >= 2 (the estimator divides by k-1)")
        self.spark = spark
        self.table = SnapTable(spark, state_path)
        self.col = col
        self.k = k

    # ------------------------------------------------------------------

    def sketch(self) -> DataFrame:
        """The current synopsis ``(h string)`` — empty frame before
        the first batch."""
        if self.table.current_version() is None:
            return self.spark.createDataFrame([], "h string")
        return self.table.read()

    def process_batch(
        self, df: DataFrame, txn: tuple[str, int] | None = None
    ) -> dict:
        """Fold one batch; returns ``{"state_version", "skipped",
        "sketch_rows", "distinct_est", "exact"}``."""
        from harness_aws_etl_pipeline_spark.operators.kmv import (
            kmv_merge,
            kmv_sketch,
        )

        if self.table.txn_committed(txn):
            return {
                "state_version": self.table.current_version(),
                "skipped": True,
                "sketch_rows": None,
                "distinct_est": None,
                "exact": None,
            }
        batch = kmv_sketch(df, self.col, k=self.k)
        if self.table.current_version() is None:
            merged = batch
        else:
            merged = kmv_merge(self.table.read(), batch, k=self.k)
        merged = merged.localCheckpoint(eager=True)
        out = self.table.write(merged, mode="overwrite", txn=txn)
        est = self._estimate(merged)
        return {
            "state_version": out["version"],
            "skipped": False,
            "sketch_rows": int(est["sketch_rows"]),
            "distinct_est": float(est["distinct_est"]),
            "exact": bool(est["exact"]),
        }

    def _estimate(self, sk: DataFrame):
        from harness_aws_etl_pipeline_spark.operators.kmv import (
            kmv_distinct_estimate,
        )

        return kmv_distinct_estimate(sk, self.k).first()

    def estimate(self) -> DataFrame:
        """1-row ``(sketch_rows, exact, distinct_est)`` over the
        stored synopsis (``kmv_distinct_estimate`` semantics: exact
        below k)."""
        from harness_aws_etl_pipeline_spark.operators.kmv import (
            kmv_distinct_estimate,
        )

        return kmv_distinct_estimate(self.sketch(), self.k)

    def maintain(
        self,
        target_file_bytes: int = 16 * 1024 * 1024,
        keep_last: int = 7,
        vacuum_min_age_seconds: float = 24 * 3600,
    ) -> dict:
        return _maintain_state(
            self.table, target_file_bytes, keep_last, vacuum_min_age_seconds
        )
