"""Keyed upsert (merge) into a hive-partitioned table — the
incremental-load primitive the append/overwrite sinks can't express:
rows in the incoming batch REPLACE existing rows with the same key;
everything else is preserved.

Spark-first mechanics, no table format required:

1. The incoming batch's partition values are collected (a model-sized
   list — partitions, not rows) and turned into an explicit partition
   filter, so the existing-data scan reads ONLY the touched partitions
   (partition pruning, visible as PartitionFilters in the scan).
2. Keys that MOVED partition (their old copy lives outside the batch's
   partitions) are detected with a column-pruned key+partition scan of
   the rest of the table; their old partitions join the touched set so
   the stale copies are dropped, never duplicated. Pass
   ``moved_keys="assume_stable"`` to skip that scan when the pipeline
   guarantees partition-stable keys (the usual date-partition
   contract) — then the merge cost is strictly proportional to the
   touched partitions.
3. Survivors = touched-partition rows whose key is NOT in the batch
   (left_anti against the batch's distinct keys — broadcast when
   small).
4. Survivors ∪ batch is written with
   ``spark.sql.sources.partitionOverwriteMode=dynamic`` so ONLY the
   touched partitions are rewritten. A moved-key partition that ends
   up empty is removed directly (dynamic overwrite can't rewrite a
   partition absent from the output).

In the default mode the merged plan is localCheckpoint'ed before the
overwrite because Spark cannot overwrite a path it is still lazily
reading from. ``staged=True`` implements the stage-and-swap
alternative — write to a temp sibling, back each touched live
partition dir up into ``tmp/.old`` by rename, rename the staged dirs
into place — which needs no checkpoint and loses nothing at any kill
point: the next run restores stranded backups before merging
(:func:`_recover_staged`). What stage-and-swap still can't give is
atomic MULTI-partition visibility (a reader between two swaps sees a
mix of old and new partitions); a transactional table format
(Delta/Iceberg MERGE) remains the upgrade path for that.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.fs import (
    get_fs,
    join_path,
    partition_dirname,
)


def _recover_staged(fs, path: str, tmp: str) -> None:
    """Clean up after a crashed staged upsert, restoring before
    deleting: the swap loop renames each live partition dir into
    ``tmp/.old/`` BEFORE renaming its staged replacement in, so a kill
    at any point leaves every row either at its destination or under
    ``.old``. Any backed-up partition whose destination is missing
    (killed between backup and rename-in) is renamed back; then the
    whole staging dir is dropped. Runs before the table is read so the
    restored partitions are part of the merge."""
    old_root = join_path(tmp, ".old")
    if fs.exists(old_root):
        for reldir in fs.list_file_dirs(old_root):
            dest = join_path(path, reldir) if reldir else path
            if not fs.exists(dest):
                fs.mkdirs(posixpath.dirname(dest))
                if not fs.rename(join_path(old_root, reldir), dest):
                    raise IOError(
                        f"staged upsert recovery: could not restore "
                        f"partition {reldir!r} from {old_root!r}"
                    )
    fs.delete(tmp, recursive=True)


def _part_filter(partition_by: list[str], parts: list[tuple]):
    """Membership filter over partition tuples, NULL-safe.

    ``struct(...).isin(...)`` evaluates to SQL NULL when a partition
    column is NULL, so rows in a null partition would be silently
    excluded from the existing/survivor scan while the batch still
    overwrote that partition — survivors lost. ``<=>`` (eqNullSafe)
    per column treats NULL as an ordinary value.
    """
    if not parts:
        return F.lit(False)
    clauses = []
    for p in parts:
        conj = F.lit(True)
        for c, v in zip(partition_by, p):
            conj = conj & F.col(c).eqNullSafe(F.lit(v))
        clauses.append(conj)
    out = clauses[0]
    for cl in clauses[1:]:
        out = out | cl
    return out


def upsert_partitioned(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    partition_by: list[str],
    fmt: str = "parquet",
    moved_keys: str = "scan",
    staged: bool = False,
) -> dict:
    """Merge ``df`` into the partitioned table at ``path`` by key.

    ``moved_keys``: ``"scan"`` (default) detects keys whose previous
    row lives in a different partition and drops the stale copy;
    ``"assume_stable"`` skips the detection scan — only safe when a
    key's partition value never changes.

    ``staged=True`` writes the merged output to a temp sibling first,
    then swaps each touched partition directory into place with FS
    renames (backup-old-into-``tmp/.old`` + rename-new per
    partition). Two wins over the default dynamic-overwrite path: no
    ``localCheckpoint`` materialization (the write target isn't the
    path being read), and no data is ever lost to a crash — a kill
    between renames strands the old dir in ``tmp/.old``, and the next
    upsert against the table restores it before merging. The default
    path remains for sinks where extra temp-dir rename/list cost
    (object-store request pricing, or object stores whose "rename" is
    copy+delete) matters more than the narrower crash window.

    Returns ``{"partitions_touched": n, "rows_upserted": n, ...}``.
    First write (no existing table) degrades to a plain partitioned
    write.
    """
    if not key_cols or not partition_by:
        raise ValueError("upsert_partitioned needs key_cols and partition_by")
    if moved_keys not in ("scan", "assume_stable"):
        raise ValueError('moved_keys must be "scan" or "assume_stable"')
    spark: SparkSession = df.sparkSession
    fs = get_fs(path, spark)
    tmp = path.rstrip("/") + ".__upserting__"
    if fs.exists(tmp):
        # leftover from a crashed staged run — restore any partition
        # stranded in tmp/.old BEFORE reading the table, whichever
        # mode this run uses, so the merge sees the recovered rows
        _recover_staged(fs, path, tmp)

    batch_parts = [
        tuple(r) for r in df.select(*partition_by).distinct().collect()
    ]
    if not fs.exists(path):
        df.write.mode("overwrite").partitionBy(*partition_by).format(fmt).save(path)
        return {
            "partitions_touched": len(batch_parts),
            "rows_upserted": df.count(),
            "created": True,
        }

    table = spark.read.format(fmt).load(path)
    batch_keys = df.select(*key_cols).distinct()

    stale_parts: list[tuple] = []
    if moved_keys == "scan":
        # keys that moved partition: their old copy sits OUTSIDE the
        # batch partitions and would otherwise survive as a duplicate.
        # Column-pruned scan (keys + partition values only) — reads no
        # payload columns and rewrites nothing unless movers exist.
        stale_parts = [
            tuple(r)
            for r in table.filter(~_part_filter(partition_by, batch_parts))
            .join(F.broadcast(batch_keys), key_cols, "leftsemi")
            .select(*partition_by)
            .distinct()
            .collect()
        ]
    # Dedupe by DIRECTORY NAME, not tuple value: batch_parts carry the
    # batch's Python types while stale_parts carry the table read's
    # partition-inferred types, so the same partition can appear as
    # both ('10',) and (10,). Two tuples naming one directory must be
    # processed once — in the staged swap, a second pass over the same
    # dirname would delete the partition just renamed into place.
    touched_by_dir: dict[str, tuple] = {}
    for p in batch_parts + stale_parts:
        touched_by_dir.setdefault(partition_dirname(partition_by, p), tuple(p))
    touched = list(touched_by_dir.values())

    # explicit partition filter → the scan prunes to touched partitions
    existing = table.filter(_part_filter(partition_by, touched))
    survivors = existing.join(F.broadcast(batch_keys), key_cols, "left_anti")
    merged = survivors.unionByName(df.select(*survivors.columns))

    if staged:
        merged.write.mode("overwrite").partitionBy(*partition_by).format(
            fmt
        ).save(tmp)
        # Decide "did the merge produce this partition?" by checking
        # the staged DIRECTORY, not by re-reading tmp through Spark:
        # the re-read re-infers partition-column types (a string '10'
        # comes back as int 10), so a value-level membership test can
        # miss a staged partition — deleting the old dir and never
        # renaming the new one in. The dirname is type-independent and
        # one exists() per partition replaces a whole Spark job.
        #
        # Swap = backup-then-rename, never delete-then-rename: the old
        # dir moves (metadata rename) into tmp/.old before the staged
        # dir moves in, so a kill at ANY point leaves every row either
        # at its destination or under tmp/.old, where the next run's
        # _recover_staged restores it. Hadoop FileSystem.rename reports
        # failure by RETURNING FALSE, not raising — check both renames
        # and raise with all copies still intact.
        for reldir in touched_by_dir:
            dest = join_path(path, reldir)
            staged_src = join_path(tmp, reldir)
            has_staged = fs.exists(staged_src)
            if fs.exists(dest):
                backup = join_path(tmp, ".old", reldir)
                fs.mkdirs(posixpath.dirname(backup))
                if not fs.rename(dest, backup):
                    raise IOError(
                        f"staged upsert: backup rename of partition "
                        f"{reldir!r} failed; table untouched, staged "
                        f"output preserved at {tmp!r}"
                    )
            if has_staged:
                # multi-level partitioning: the parent dirs of a brand-
                # new partition combination may not exist yet
                fs.mkdirs(posixpath.dirname(dest))
                if not fs.rename(staged_src, dest):
                    raise IOError(
                        f"staged upsert: rename of partition {reldir!r} "
                        f"failed; old data recoverable from "
                        f"{tmp!r}/.old by the next run"
                    )
        fs.delete(tmp, recursive=True)
        return {
            "partitions_touched": len(touched),
            "rows_upserted": df.count(),
            "created": False,
            "staged": True,
        }

    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(*partition_by).format(fmt).save(
            path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    if stale_parts:
        # a moved-key partition left with zero rows is absent from the
        # output, so dynamic overwrite couldn't rewrite it — remove it.
        # Compare by dirname: stale_parts carry the table read's
        # inferred types while merged carries the union's resolved type
        # (the batch's), so (10,) vs ('10',) would otherwise delete a
        # partition that still has survivors.
        present_dirs = {
            partition_dirname(partition_by, tuple(r))
            for r in merged.select(*partition_by).distinct().collect()
        }
        for p in stale_parts:
            reldir = partition_dirname(partition_by, p)
            if reldir not in present_dirs:
                # scheme-agnostic delete (Hadoop FileSystem), and the
                # directory name uses Spark's own escaping — incl.
                # __HIVE_DEFAULT_PARTITION__ for NULL values
                fs.delete(join_path(path, reldir), recursive=True)
    return {
        "partitions_touched": len(touched),
        "rows_upserted": df.count(),
        "created": False,
    }
