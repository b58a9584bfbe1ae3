"""Filesystem adapter for the sink layer.

The sinks need a handful of metadata/maintenance operations (exists,
recursive delete, rename, directory size) around what
``DataFrameWriter`` itself does. Doing those with ``os``/``shutil``
only works for local paths — at the stated design point the table
lives on an object store or HDFS, where a silent ``os.path`` no-op
turns "drop the stale partition" into duplicate keys.

:class:`HadoopFS` routes every operation through the JVM's
``org.apache.hadoop.fs.FileSystem`` (the same abstraction Spark's own
committers use), so the SAME code path works for ``file:``, ``hdfs:``,
``s3a:`` … — whatever connector the cluster has. When no JVM is
reachable (Spark Connect, or no active session), :func:`get_fs` falls
back to a local-``os`` implementation for schemeless/``file:`` paths
and REFUSES loudly for remote schemes rather than silently doing
nothing.
"""

from __future__ import annotations

import os
import posixpath
import shutil

from pyspark.sql import SparkSession

__all__ = ["get_fs", "HadoopFS", "LocalFS", "escape_partition_value"]

# Hive/Spark's partition-path escape set (see Spark's
# ExternalCatalogUtils.escapePathName): control chars plus the
# characters that are path- or shell-significant.
_ESCAPE_CHARS = set('"#%\'*/:=?\\{[]^\x7f') | {chr(i) for i in range(0x20)}


def escape_partition_value(v) -> str:
    """Render one partition value the way Spark names its directory:
    ``None`` → ``__HIVE_DEFAULT_PARTITION__``, booleans lowercase,
    special characters %-escaped."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(v, bool):
        return "true" if v else "false"
    s = str(v)
    return "".join(
        f"%{ord(c):02X}" if c in _ESCAPE_CHARS else c for c in s
    )


def partition_dirname(partition_by: list[str], values: tuple) -> str:
    """``a=1/b=__HIVE_DEFAULT_PARTITION__`` — the relative directory
    Spark wrote for this partition tuple."""
    return "/".join(
        f"{c}={escape_partition_value(v)}"
        for c, v in zip(partition_by, values)
    )


class LocalFS:
    """``os``/``shutil`` implementation — valid only for local paths."""

    @staticmethod
    def _local(path: str) -> str:
        if path.startswith("file:"):
            path = path.removeprefix("file:")
        if "://" in path:
            raise ValueError(
                f"LocalFS cannot operate on remote path {path!r}; a "
                "SparkSession (JVM Hadoop FileSystem) is required for "
                "non-local schemes"
            )
        return path

    def exists(self, path: str) -> bool:
        return os.path.exists(self._local(path))

    def delete(self, path: str, recursive: bool = True) -> bool:
        p = self._local(path)
        if not os.path.exists(p):
            return False
        if os.path.isdir(p):
            if recursive:
                shutil.rmtree(p, ignore_errors=True)
            else:
                os.rmdir(p)
        else:
            os.remove(p)
        return True

    def rename(self, src: str, dst: str) -> bool:
        shutil.move(self._local(src), self._local(dst))
        return True

    def rename_if_absent(self, src: str, dst: str) -> bool:
        """Rename refusing to replace an existing destination — the
        compare-and-swap the snapshot commit protocol builds on. On a
        local FS ``os.rename`` silently overwrites, so use a hard link
        (atomic, fails with EEXIST when dst exists) and unlink src.
        On filesystems without hard links, fall back to an O_EXCL
        exclusive-create copy — still an atomic winner-takes-all (a
        checked ``exists + move`` here once let two racing committers
        BOTH report success, one silently overwriting the other)."""
        s, d = self._local(src), self._local(dst)
        try:
            os.link(s, d)
        except FileExistsError:
            return False
        except OSError:
            try:
                fd = os.open(d, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            try:
                with open(s, "rb") as fsrc, os.fdopen(fd, "wb") as fdst:
                    shutil.copyfileobj(fsrc, fdst)
            except BaseException:
                os.remove(d)
                raise
            os.remove(s)
            return True
        os.remove(s)
        return True

    def write_bytes(self, path: str, data: bytes) -> None:
        p = self._local(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)

    def read_bytes(self, path: str) -> bytes:
        with open(self._local(path), "rb") as f:
            return f.read()

    def list_children(self, path: str) -> list[str]:
        """Immediate child names (files and dirs), not recursive."""
        p = self._local(path)
        if not os.path.isdir(p):
            return []
        return sorted(os.listdir(p))

    def mkdirs(self, path: str) -> None:
        os.makedirs(self._local(path), exist_ok=True)

    def tree_size(self, path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(self._local(path)):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total

    def file_count(self, path: str, suffix: str = "") -> int:
        n = 0
        for _root, _dirs, files in os.walk(self._local(path)):
            n += sum(1 for f in files if f.endswith(suffix))
        return n

    def list_file_dirs(self, path: str) -> list[str]:
        root = self._local(path)
        if not os.path.exists(root):
            return []
        out = []
        for r, _dirs, files in os.walk(root):
            if files:
                rel = os.path.relpath(r, root)
                out.append("" if rel == "." else rel.replace(os.sep, "/"))
        return sorted(out)

    def list_files(self, path: str) -> list[tuple[str, float, int]]:
        """(relative path, mtime epoch-seconds, byte size) for every
        file under ``path`` — ONE walk serves the retention sweep's
        age test and its bytes accounting."""
        root = self._local(path)
        if not os.path.exists(root):
            return []
        out = []
        for r, _dirs, files in os.walk(root):
            for f in files:
                full = os.path.join(r, f)
                try:
                    st = os.stat(full)
                except OSError:
                    continue
                rel = os.path.relpath(full, root).replace(os.sep, "/")
                out.append((rel, st.st_mtime, st.st_size))
        return sorted(out)

    def prune_empty_dirs(self, path: str) -> int:
        """Remove directories left empty (e.g. partitions whose files
        all expired), bottom-up; the root itself survives."""
        root = self._local(path)
        if not os.path.isdir(root):
            return 0
        removed = 0
        # bottom-up, and re-listdir per dir: a child pruned this walk
        # still sits in the cached `dirs` list os.walk handed out
        for r, _dirs, _files in os.walk(root, topdown=False):
            if r != root and not os.listdir(r):
                try:
                    os.rmdir(r)
                    removed += 1
                except OSError:
                    pass
        return removed


class HadoopFS:
    """``org.apache.hadoop.fs.FileSystem`` via the session JVM —
    scheme-agnostic (file/hdfs/s3a/…); the path's own scheme picks the
    connector."""

    def __init__(self, spark: SparkSession):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, jpath):
        return jpath.getFileSystem(self._conf)

    def exists(self, path: str) -> bool:
        p = self._jpath(path)
        return self._fs(p).exists(p)

    def delete(self, path: str, recursive: bool = True) -> bool:
        p = self._jpath(path)
        return self._fs(p).delete(p, recursive)

    def rename(self, src: str, dst: str) -> bool:
        s, d = self._jpath(src), self._jpath(dst)
        return self._fs(s).rename(s, d)

    def rename_if_absent(self, src: str, dst: str) -> bool:
        """Rename refusing to replace an existing destination.

        LOCAL paths delegate to :meth:`LocalFS.rename_if_absent`'s
        hard-link CAS: Hadoop's Raw/ChecksumLocalFileSystem rename
        bottoms out in ``java.io.File.renameTo``, which OVERWRITES an
        existing destination on POSIX — so the obvious ``exists() +
        rename()`` here is a broken compare-and-swap (two racing
        committers can both pass the exists check and both report
        success, one silently replacing the other's manifest; the
        round-9 concurrent-writer soak caught exactly that as a lost
        snapshot version).

        On real HDFS the NameNode rejects a rename onto an existing
        FILE atomically (rename returns False), so exists+rename is
        sound there — the explicit exists() guards only the
        rename-INTO-existing-DIRECTORY semantics."""
        from urllib.parse import urlparse

        if urlparse(src).scheme in ("", "file") and urlparse(
            dst
        ).scheme in ("", "file"):
            return LocalFS().rename_if_absent(src, dst)
        s, d = self._jpath(src), self._jpath(dst)
        fs = self._fs(s)
        if fs.exists(d):
            return False
        return fs.rename(s, d)

    def write_bytes(self, path: str, data: bytes) -> None:
        p = self._jpath(path)
        fs = self._fs(p)
        out = fs.create(p, True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def read_bytes(self, path: str) -> bytes:
        p = self._jpath(path)
        fs = self._fs(p)
        inp = fs.open(p)
        try:
            # py4j copies a Java byte[] back as Python bytes; a py4j
            # bytearray passed INTO read() would not see the mutation,
            # so read fully JVM-side (commons-io ships with Spark)
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(inp)
            return bytes(data)
        finally:
            inp.close()

    def list_children(self, path: str) -> list[str]:
        """Immediate child names (files and dirs), not recursive."""
        p = self._jpath(path)
        fs = self._fs(p)
        if not fs.exists(p):
            return []
        return sorted(
            st.getPath().getName() for st in fs.listStatus(p)
        )

    def mkdirs(self, path: str) -> None:
        p = self._jpath(path)
        self._fs(p).mkdirs(p)

    def tree_size(self, path: str) -> int:
        p = self._jpath(path)
        fs = self._fs(p)
        if not fs.exists(p):
            return 0
        # getContentSummary is one namenode/LIST round-trip, not a walk
        return fs.getContentSummary(p).getLength()

    def file_count(self, path: str, suffix: str = "") -> int:
        p = self._jpath(path)
        fs = self._fs(p)
        if not fs.exists(p):
            return 0
        it = fs.listFiles(p, True)
        n = 0
        while it.hasNext():
            if it.next().getPath().getName().endswith(suffix):
                n += 1
        return n

    def list_file_dirs(self, path: str) -> list[str]:
        p = self._jpath(path)
        fs = self._fs(p)
        if not fs.exists(p):
            return []
        root = fs.makeQualified(p).toUri().getPath()
        it = fs.listFiles(p, True)
        seen: set[str] = set()
        while it.hasNext():
            parent = it.next().getPath().getParent().toUri().getPath()
            rel = parent[len(root):].lstrip("/")
            seen.add(rel)
        return sorted(seen)

    def list_files(self, path: str) -> list[tuple[str, float, int]]:
        """(relative path, mtime epoch-seconds, byte size) for every
        file under ``path`` — ONE recursive LIST serves the retention
        sweep's age test and its bytes accounting."""
        p = self._jpath(path)
        fs = self._fs(p)
        if not fs.exists(p):
            return []
        root = fs.makeQualified(p).toUri().getPath()
        it = fs.listFiles(p, True)
        out: list[tuple[str, float, int]] = []
        while it.hasNext():
            st = it.next()
            rel = st.getPath().toUri().getPath()[len(root):].lstrip("/")
            out.append((rel, st.getModificationTime() / 1000.0, st.getLen()))
        return sorted(out)

    def prune_empty_dirs(self, path: str) -> int:
        """Remove directories left empty, bottom-up; the root itself
        survives. (On object stores "directories" are synthetic, so
        this is a cheap no-op-ish pass; on HDFS it keeps the namespace
        tidy.)"""
        p = self._jpath(path)
        fs = self._fs(p)
        if not fs.exists(p):
            return 0
        removed = 0

        def _prune(jp) -> bool:
            """Depth-first; returns True if jp is (now) empty."""
            nonlocal removed
            empty = True
            for st in fs.listStatus(jp):
                if st.isDirectory():
                    if _prune(st.getPath()):
                        fs.delete(st.getPath(), False)
                        removed += 1
                    else:
                        empty = False
                else:
                    empty = False
            return empty

        _prune(p)
        return removed


def get_fs(path: str, spark: SparkSession | None = None):
    """FS adapter for ``path``: Hadoop FileSystem when a JVM session is
    available (any scheme), else :class:`LocalFS` (local paths only —
    remote schemes without a JVM raise instead of silently no-op'ing).
    """
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is not None and getattr(spark, "_jvm", None) is not None:
        try:
            return HadoopFS(spark)
        except Exception:  # pragma: no cover - Connect-style sessions
            pass
    return LocalFS()


def join_path(base: str, *parts: str) -> str:
    """Scheme-preserving path join (os.path.join would mangle
    ``s3a://bucket`` on Windows and never handles schemes)."""
    return posixpath.join(base.rstrip("/"), *parts)
