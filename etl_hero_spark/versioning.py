"""Manifest-based table versioning — snapshot isolation and time travel
on plain parquet (the Iceberg/Delta core idea at its minimum: a table
IS its manifest, data files are immutable, a commit is one atomic
manifest write).

Why this shape survives 100 TB: commits never rewrite data (each
version's files are written once and referenced forever), readers of
version N are untouched by later commits (snapshot isolation for free),
and time travel is "read the files version N lists" — no copy, no log
replay. Garbage collection is the only maintenance: files referenced by
no retained manifest.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, "_manifests", f"v{version:06d}.json")


def latest_version(table_dir: str) -> int | None:
    d = os.path.join(table_dir, "_manifests")
    if not os.path.isdir(d):
        return None
    vs = [
        int(n[1:-5])
        for n in os.listdir(d)
        if n.startswith("v") and n.endswith(".json")
    ]
    return max(vs) if vs else None


def commit_version(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as a NEW immutable version: data files land under a
    unique subdirectory (never touching earlier versions' files), then
    one manifest JSON lists them. The manifest write is the commit
    point — a reader either sees the complete new version or the old
    one, never a half-written state. Returns the new version number."""
    v = (latest_version(table_dir) or 0) + 1
    data_dir = os.path.join(table_dir, f"data-v{v:06d}-{uuid.uuid4().hex[:8]}")
    df.write.mode("error").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, n)
        for n in os.listdir(data_dir)
        if n.startswith("part-") and not n.endswith(".crc")
    )
    mp = _manifest_path(table_dir, v)
    os.makedirs(os.path.dirname(mp), exist_ok=True)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": v, "files": files}, f)
    os.replace(tmp, mp)  # atomic on POSIX: the commit point
    return v


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time travel: the table exactly as of ``version`` (default
    latest). Reads only the files that version's manifest lists —
    later commits are invisible, earlier versions stay readable."""
    v = version if version is not None else latest_version(table_dir)
    if v is None:
        raise ValueError(f"no versions committed at {table_dir!r}")
    with open(_manifest_path(table_dir, v)) as f:
        files = json.load(f)["files"]
    return spark.read.parquet(*files)


def vacuum(table_dir: str, keep_last: int = 2) -> int:
    """Garbage collection: delete data files referenced ONLY by
    manifests older than the ``keep_last`` most recent, then the old
    manifests themselves. Returns the number of files removed. Readers
    of retained versions are unaffected (their files are all kept)."""
    import shutil

    latest = latest_version(table_dir)
    if latest is None:
        return 0
    keep = set(range(max(1, latest - keep_last + 1), latest + 1))
    keep_files: set = set()
    drop_manifests = []
    for v_dir in [os.path.join(table_dir, "_manifests")]:
        for n in sorted(os.listdir(v_dir)):
            v = int(n[1:-5])
            with open(os.path.join(v_dir, n)) as f:
                files = json.load(f)["files"]
            if v in keep:
                keep_files.update(files)
            else:
                drop_manifests.append((os.path.join(v_dir, n), files))
    removed = 0
    for mpath, files in drop_manifests:
        for fp in files:
            if fp not in keep_files and os.path.exists(fp):
                os.remove(fp)
                removed += 1
        os.remove(mpath)
    # drop now-empty data dirs
    for n in os.listdir(table_dir):
        p = os.path.join(table_dir, n)
        if n.startswith("data-v") and os.path.isdir(p):
            if not any(
                f.startswith("part-") for f in os.listdir(p)
            ):
                shutil.rmtree(p, ignore_errors=True)
    return removed


class CommitConflictError(RuntimeError):
    """The table advanced past the expected base version."""


def commit_version_if(
    df: DataFrame, table_dir: str, expected_base: int | None
) -> int:
    """Optimistic-concurrency commit: succeed only if the table is
    still at ``expected_base`` (None = empty table). Two writers racing
    from the same base cannot both win — the loser re-reads, re-applies
    its change on the new base, retries. This check-then-rename window
    is the whole coordination a manifest table needs (real lakehouses
    close the remaining race with an atomic rename-no-overwrite or a
    lock service; POSIX os.replace + the re-check below covers the
    single-host form)."""
    cur = latest_version(table_dir)
    if cur != expected_base:
        raise CommitConflictError(
            f"table at version {cur}, expected {expected_base} — "
            "re-read latest, re-apply the change, retry"
        )
    v = commit_version(df, table_dir)
    if v != (expected_base or 0) + 1:
        raise CommitConflictError(
            f"lost the commit race: landed v{v}, expected "
            f"v{(expected_base or 0) + 1}"
        )
    return v


def commit_merge(
    table_dir: str,
    changes: DataFrame,
    key_cols,
    ts_col: str = "ts",
    max_retries: int = 3,
) -> int:
    """The lakehouse write path in one call: read latest -> latest-wins
    merge_upsert of the change batch -> optimistic commit as a new
    version; on a conflict, re-read and re-apply (the merge is
    idempotent per (base, changes), so retries are safe). Every prior
    version remains readable — UPSERT plus time travel on plain
    parquet."""
    from etl_hero_spark.cdc import merge_upsert

    spark = changes.sparkSession
    for _ in range(max_retries):
        base_v = latest_version(table_dir)
        if base_v is None:
            merged = changes
        else:
            merged = merge_upsert(
                read_version(spark, table_dir, base_v),
                changes,
                key_cols,
                ts_col,
            )
        try:
            return commit_version_if(merged, table_dir, base_v)
        except CommitConflictError:
            continue
    raise CommitConflictError(
        f"gave up after {max_retries} conflicted commits at {table_dir!r}"
    )
