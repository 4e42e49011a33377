"""deltalite — a minimal Delta-Lake-style transactional table format.

The reference stores everything in Delta Lake via delta-rs
(/root/reference/news_insights/collector.py:219-226 append,
/root/reference/visualizer.py:40-45 scan, README.md:12 time travel).
``delta-spark`` is not available in this environment, so this module
provides the same storage contract on plain parquet + a JSON commit log:

* **ACID append/overwrite** — data files land in a per-commit directory,
  then a single commit file is published atomically (write-tmp +
  ``os.link``, which fails if the version exists → optimistic retry).
  Readers either see a commit entirely or not at all; a crash before the
  commit file leaves only invisible orphan data.
* **Schema enforcement** — appends must match the table schema exactly
  (delta-rs rejects drift on append the same way).
* **Time travel** — ``read(..., version=N)`` replays the log to N.
* **Idempotent writer commits** — ``append(..., app_id=, epoch=)`` skips
  the write if (app_id, epoch) already committed. This is the engine's
  exactly-once primitive for streaming ``foreachBatch`` retries, and the
  direct fix for the reference's state-before-write loss bug
  (collector.py:113-115 saves the dedup ledger before storage happens at
  :233-240 — a crash between the two loses data silently). Here the
  "state" IS the commit: data and watermark publish in one atomic op.

Scale notes: the commit protocol is driver-side metadata only (one tiny
JSON per commit — executors never touch the log); data writes are
ordinary distributed ``df.write.parquet``. On a real cluster the
``os.link`` claim becomes the object store's conditional-put, which is
exactly how Delta/Iceberg commit services work; file listings per commit
keep reads O(|log|) not O(listing the data dir).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_LOG_DIR = "_log"
_DATA_DIR = "data"
_CHANGE_DIR = "_change_data"
_VERSION_DIGITS = 20


class SchemaMismatchError(ValueError):
    pass


class ConcurrentCommitError(RuntimeError):
    pass


class ChangeDataUnavailableError(RuntimeError):
    """An overwrite-type commit in the requested range captured no
    change data (upsert ran without change_data=True, or compact/
    overwrite rewrote the table) — row-level changes cannot be
    reconstructed for it, mirroring Delta's CDF-not-enabled error."""


@dataclass(frozen=True)
class Commit:
    version: int
    action: str  # "append" | "overwrite"
    files: tuple[str, ...]  # relative to table root
    schema_json: str
    app_id: str | None = None
    epoch: int | None = None
    #: per-file column stats for data skipping: {rel_path: {col: [min, max]}}
    stats: dict | None = None
    #: relative path of this commit's change-data folder (CDF), if the
    #: writer captured row-level changes (upsert with change_data=True)
    cdf_dir: str | None = None
    #: False for commits that rearrange bytes without changing rows
    #: (compact/OPTIMIZE) — Delta's ``dataChange:false``. The CDF reader
    #: skips these instead of raising, so a follower can advance past a
    #: compaction. Absent in pre-existing logs -> True.
    data_change: bool = True


def _log_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG_DIR, f"{version:0{_VERSION_DIGITS}d}.json")


def _read_log(table: str) -> list[Commit]:
    log_dir = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(log_dir):
        return []
    commits = []
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(log_dir, name)) as fh:
            d = json.load(fh)
        commits.append(
            Commit(
                version=d["version"],
                action=d["action"],
                files=tuple(d["files"]),
                schema_json=d["schema"],
                app_id=d.get("app_id"),
                epoch=d.get("epoch"),
                stats=d.get("stats"),
                cdf_dir=d.get("cdf"),
                data_change=d.get("data_change", True),
            )
        )
    return commits


def _publish(table: str, commit: Commit) -> None:
    """Atomically publish one commit file; raises FileExistsError if the
    version was claimed by a concurrent writer (caller retries)."""
    path = _log_path(table, commit.version)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = json.dumps(
        {
            "version": commit.version,
            "action": commit.action,
            "files": list(commit.files),
            "schema": commit.schema_json,
            "app_id": commit.app_id,
            "epoch": commit.epoch,
            "stats": commit.stats,
            "cdf": commit.cdf_dir,
            "data_change": commit.data_change,
            "committed_at": time.time(),
        }
    )
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        os.link(tmp, path)  # atomic claim: fails iff version exists
    finally:
        os.unlink(tmp)


def table_exists(table: str) -> bool:
    return bool(_read_log(table))


def latest_version(table: str) -> int:
    log = _read_log(table)
    return log[-1].version if log else -1


def has_committed(table: str, app_id: str, epoch: int) -> bool:
    """True iff this (app_id, epoch) already published a commit — the
    idempotence check for exactly-once foreachBatch sinks."""
    return any(
        c.app_id == app_id and c.epoch == epoch for c in _read_log(table)
    )


def _collect_file_stats(
    table: str, rel_files: tuple[str, ...], stats_cols: list[str]
) -> dict:
    """Per-file min/max from parquet footers (Delta data-skipping stats).
    Footer reads are metadata-only — no row data is scanned."""
    import pyarrow.parquet as pq

    out: dict = {}
    for rel in rel_files:
        meta = pq.ParquetFile(os.path.join(table, rel)).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        col_stats: dict = {}
        for col in stats_cols:
            if col not in idx:
                continue
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                lo, hi = min(mins), max(maxs)
                if isinstance(lo, bytes):
                    lo, hi = lo.decode("utf-8", "replace"), hi.decode("utf-8", "replace")
                if not isinstance(lo, (str, int, float, bool)):
                    lo, hi = str(lo), str(hi)
                col_stats[col] = [lo, hi]
        if col_stats:
            out[rel] = col_stats
    return out


def merge_schemas(
    table_schema: T.StructType, df_schema: T.StructType
) -> T.StructType:
    """Delta-style additive schema evolution: the merged schema keeps
    every table column (original order) and appends the incoming
    frame's NEW columns as nullable. A column present in both with a
    different type is a hard error — silent type coercion is how lakes
    corrupt; Delta rejects it too."""
    existing = {f.name: f for f in table_schema.fields}
    out = list(table_schema.fields)
    for f in df_schema.fields:
        prev = existing.get(f.name)
        if prev is None:
            out.append(T.StructField(f.name, f.dataType, nullable=True))
        elif prev.dataType != f.dataType:
            raise SchemaMismatchError(
                f"type conflict on {f.name}: table={prev.dataType} "
                f"df={f.dataType}"
            )
    return T.StructType(out)


def write(
    df: DataFrame,
    table: str,
    mode: str = "append",
    app_id: str | None = None,
    epoch: int | None = None,
    max_retries: int = 10,
    stats_cols: list[str] | None = None,
    merge_schema: bool = False,
    data_change: bool = True,
) -> int | None:
    """Write ``df`` as one atomic commit; returns the committed version,
    or None when the (app_id, epoch) commit already exists (idempotent
    replay — the data is NOT rewritten).

    ``merge_schema=True`` enables additive evolution on append: new
    nullable columns join the table schema; readers null-fill them for
    pre-evolution files (the scan always applies the LATEST commit's
    schema, so no data rewrite happens — same mechanics as Delta's
    ``mergeSchema``). Type changes are rejected either way."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    if app_id is not None and epoch is not None and has_committed(table, app_id, epoch):
        return None

    commit_schema_json = df.schema.json()
    log = _read_log(table)
    if log and mode == "append":
        current = log[-1].schema_json
        if current != commit_schema_json:
            if not merge_schema:
                raise SchemaMismatchError(
                    f"append schema drift for {table}: table={current} "
                    f"df={df.schema.json()}"
                )
            merged = merge_schemas(
                T.StructType.fromJson(json.loads(current)), df.schema
            )
            commit_schema_json = merged.json()

    commit_dir = f"commit-{uuid.uuid4().hex}"
    abs_dir = os.path.join(table, _DATA_DIR, commit_dir)
    df.write.mode("errorifexists").parquet(abs_dir)
    rel_files = tuple(
        os.path.join(_DATA_DIR, commit_dir, name)
        for name in sorted(os.listdir(abs_dir))
        if name.endswith(".parquet")
    )
    stats = _collect_file_stats(table, rel_files, stats_cols) if stats_cols else None

    for _ in range(max_retries):
        # Re-check idempotence inside the retry loop: a concurrent replay
        # of the same epoch may have won the race.
        if (
            app_id is not None
            and epoch is not None
            and has_committed(table, app_id, epoch)
        ):
            return None
        version = latest_version(table) + 1
        try:
            _publish(
                table,
                Commit(
                    version=version,
                    action=mode,
                    files=rel_files,
                    schema_json=commit_schema_json,
                    app_id=app_id,
                    epoch=epoch,
                    stats=stats,
                    data_change=data_change,
                ),
            )
            return version
        except FileExistsError:
            continue  # lost the optimistic race; retry at the next version
    raise ConcurrentCommitError(f"could not commit to {table} after retries")


def upsert(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key_cols: list[str],
    app_id: str | None = None,
    epoch: int | None = None,
    change_data: bool = False,
) -> int | None:
    """MERGE analog: rows matching ``key_cols`` are replaced by ``df``'s
    version, unmatched rows are inserted — in ONE atomic commit.

    Copy-on-write at file granularity, like Delta's MERGE: one metadata
    scan finds the data files that actually contain matched keys
    (``input_file_name`` + a broadcast semi-join on the keys); untouched
    files are carried into the new snapshot by reference, only affected
    files are rewritten (minus matched rows) alongside the new data.
    Time travel keeps working — prior commits still reference the old
    files.

    Concurrency is serializable-by-abort: the commit claims exactly
    ``base_version + 1``; if any other writer committed since the
    snapshot was taken, the claim fails and ConcurrentCommitError is
    raised (re-run the merge on the new snapshot) — clobbering a
    concurrent append silently, as a blind overwrite-retry would, is the
    one thing a MERGE must never do."""
    if app_id is not None and epoch is not None and has_committed(table, app_id, epoch):
        return None
    if not table_exists(table):
        return write(df, table, "append", app_id=app_id, epoch=epoch)

    from urllib.parse import unquote, urlparse

    import pyspark.sql.functions as F

    abs_files, schema_json = snapshot_files(table)
    base_version = latest_version(table)
    if schema_json != df.schema.json():
        raise SchemaMismatchError(
            f"upsert schema drift for {table}: table={schema_json} "
            f"df={df.schema.json()}"
        )
    schema = T.StructType.fromJson(json.loads(schema_json))
    keys = df.select(*key_cols).distinct()

    def _norm(uri: str) -> str:
        parsed = urlparse(uri)
        return os.path.abspath(unquote(parsed.path) if parsed.scheme else uri)

    affected = {
        _norm(r.src_file)
        for r in (
            spark.read.schema(schema)
            .parquet(*abs_files)
            .withColumn("src_file", F.input_file_name())
            .join(F.broadcast(keys), list(key_cols), "left_semi")
            .select("src_file")
            .distinct()
            .collect()  # driver-side METADATA only: one row per data file
        )
    }
    table_abs = os.path.abspath(table)
    kept_rel, rewrite_abs = [], []
    for f in abs_files:
        if os.path.abspath(f) in affected:
            rewrite_abs.append(f)
        else:
            kept_rel.append(os.path.relpath(os.path.abspath(f), table_abs))

    survivors = (
        spark.read.schema(schema)
        .parquet(*rewrite_abs)
        .join(F.broadcast(keys), list(key_cols), "left_anti")
        if rewrite_abs
        else spark.createDataFrame([], schema)
    )
    out = survivors.unionByName(df.select(*[f.name for f in schema.fields]))

    commit_dir = f"commit-{uuid.uuid4().hex}"
    abs_dir = os.path.join(table, _DATA_DIR, commit_dir)
    out.write.mode("errorifexists").parquet(abs_dir)
    new_rel = tuple(
        os.path.join(_DATA_DIR, commit_dir, name)
        for name in sorted(os.listdir(abs_dir))
        if name.endswith(".parquet")
    )

    cdf_rel: str | None = None
    if change_data:
        # Row-level change capture (Delta CDF semantics): rows whose key
        # already existed emit an update_preimage (the replaced row) and
        # an update_postimage (df's version); brand-new keys emit
        # inserts. The preimage scan touches only the rewritten files —
        # the same ones the merge already reads — so CDF costs one extra
        # write of |changes| rows, never a table scan. The folder is
        # referenced by the commit record ONLY on a successful claim, so
        # a lost commit race leaves an orphan (vacuumable), never a
        # phantom change set.
        preimage = (
            spark.read.schema(schema)
            .parquet(*rewrite_abs)
            .join(F.broadcast(keys), list(key_cols), "left_semi")
            if rewrite_abs
            else spark.createDataFrame([], schema)
        )
        old_keys = preimage.select(*key_cols).distinct()
        postimage = df.join(F.broadcast(old_keys), list(key_cols), "left_semi")
        inserts = df.join(F.broadcast(old_keys), list(key_cols), "left_anti")
        changes = (
            preimage.withColumn("_change_type", F.lit("update_preimage"))
            .unionByName(
                postimage.withColumn(
                    "_change_type", F.lit("update_postimage")
                )
            )
            .unionByName(inserts.withColumn("_change_type", F.lit("insert")))
        )
        cdf_rel = os.path.join(_CHANGE_DIR, commit_dir)
        changes.write.mode("errorifexists").parquet(
            os.path.join(table, cdf_rel)
        )

    if app_id is not None and epoch is not None and has_committed(table, app_id, epoch):
        return None
    version = base_version + 1
    try:
        _publish(
            table,
            Commit(
                version=version,
                action="overwrite",
                files=tuple(kept_rel) + new_rel,
                schema_json=schema_json,
                app_id=app_id,
                epoch=epoch,
                cdf_dir=cdf_rel,
            ),
        )
    except FileExistsError:
        raise ConcurrentCommitError(
            f"{table} changed since the merge snapshot (version "
            f"{base_version}); re-run the merge against the new snapshot"
        ) from None
    return version


def delete_keys(
    spark: SparkSession,
    keys_df: DataFrame,
    table: str,
    key_cols: list[str],
    change_data: bool = False,
) -> int:
    """Row-level DELETE (``MERGE ... WHEN MATCHED THEN DELETE`` /
    ``DELETE WHERE key IN (...)``) — the GDPR-erasure primitive a corpus
    owner asks for first. Copy-on-write at file granularity, the same
    shape as :func:`upsert`: one metadata scan finds the files that
    actually CONTAIN a matched key (broadcast semi-join on
    ``input_file_name``), only those are rewritten minus the matched
    rows; untouched files carry over by reference, and everything
    publishes as ONE atomic overwrite commit (serializable-by-abort,
    like upsert — a concurrent commit fails the claim rather than being
    clobbered).

    ``change_data=True`` captures the deleted rows as ``delete``-typed
    preimages in the commit's CDF folder (Delta's change type for
    erasure), so an incremental consumer can propagate the deletion
    downstream instead of re-diffing snapshots."""
    from urllib.parse import unquote, urlparse

    import pyspark.sql.functions as F

    abs_files, schema_json = snapshot_files(table)
    base_version = latest_version(table)
    schema = T.StructType.fromJson(json.loads(schema_json))
    keys = keys_df.select(*key_cols).distinct()

    def _norm(uri: str) -> str:
        parsed = urlparse(uri)
        return os.path.abspath(unquote(parsed.path) if parsed.scheme else uri)

    affected = {
        _norm(r.src_file)
        for r in (
            spark.read.schema(schema)
            .parquet(*abs_files)
            .withColumn("src_file", F.input_file_name())
            .join(F.broadcast(keys), list(key_cols), "left_semi")
            .select("src_file")
            .distinct()
            .collect()  # driver-side METADATA only: one row per data file
        )
    }
    table_abs = os.path.abspath(table)
    kept_rel, rewrite_abs = [], []
    for f in abs_files:
        if os.path.abspath(f) in affected:
            rewrite_abs.append(f)
        else:
            kept_rel.append(os.path.relpath(os.path.abspath(f), table_abs))

    commit_dir = f"commit-{uuid.uuid4().hex}"
    new_rel: tuple[str, ...] = ()
    if rewrite_abs:
        survivors = (
            spark.read.schema(schema)
            .parquet(*rewrite_abs)
            .join(F.broadcast(keys), list(key_cols), "left_anti")
        )
        abs_dir = os.path.join(table, _DATA_DIR, commit_dir)
        survivors.write.mode("errorifexists").parquet(abs_dir)
        new_rel = tuple(
            os.path.join(_DATA_DIR, commit_dir, name)
            for name in sorted(os.listdir(abs_dir))
            if name.endswith(".parquet")
        )

    cdf_rel: str | None = None
    if change_data:
        deleted = (
            spark.read.schema(schema)
            .parquet(*rewrite_abs)
            .join(F.broadcast(keys), list(key_cols), "left_semi")
            if rewrite_abs
            else spark.createDataFrame([], schema)
        )
        changes = deleted.withColumn("_change_type", F.lit("delete"))
        cdf_rel = os.path.join(_CHANGE_DIR, commit_dir)
        changes.write.mode("errorifexists").parquet(
            os.path.join(table, cdf_rel)
        )

    version = base_version + 1
    try:
        _publish(
            table,
            Commit(
                version=version,
                action="overwrite",
                files=tuple(kept_rel) + new_rel,
                schema_json=schema_json,
                cdf_dir=cdf_rel,
            ),
        )
    except FileExistsError:
        raise ConcurrentCommitError(
            f"{table} changed since the delete snapshot (version "
            f"{base_version}); re-run against the new snapshot"
        ) from None
    return version


def restore(table: str, to_version: int) -> int:
    """RESTORE TO VERSION for deltalite (the twin of
    ``delta_compat.restore_delta``, so both engines carry the full verb
    set): publish ONE ``overwrite`` commit whose file list, schema, and
    skipping stats are exactly ``to_version``'s resolved state. Pure
    metadata — no data file is read or written; the restored files are
    the originals still on disk. History is append-only (time travel to
    the pre-restore state keeps working), and a restore whose files
    VACUUM already deleted is refused loudly before anything publishes.
    The commit carries no CDF (``read_changes`` raises its standard
    uncaptured-overwrite error for it, like an uncaptured real-format
    restore)."""
    log = _read_log(table)
    if not log:
        raise FileNotFoundError(f"no deltalite table at {table}")
    if to_version > log[-1].version:
        raise ValueError(
            f"cannot restore {table} to future version {to_version}"
        )
    files: list[str] = []
    stats: dict = {}
    schema_json = log[0].schema_json
    for c in log:
        if c.version > to_version:
            break
        if c.action == "overwrite":
            files = list(c.files)
            stats = dict(c.stats or {})
        else:
            files.extend(c.files)
            stats.update(c.stats or {})
        schema_json = c.schema_json
    missing = [f for f in files if not os.path.exists(os.path.join(table, f))]
    if missing:
        raise FileNotFoundError(
            f"RESTORE to version {to_version} needs {len(missing)} data "
            f"file(s) already removed by vacuum (e.g. {missing[0]!r}); "
            "the snapshot is unrecoverable"
        )
    version = log[-1].version + 1
    _publish(
        table,
        Commit(
            version=version,
            action="overwrite",
            files=tuple(files),
            schema_json=schema_json,
            stats={f: stats[f] for f in files if f in stats} or None,
        ),
    )
    return version


def snapshot_files(
    table: str,
    version: int | None = None,
    skip: tuple | None = None,
) -> tuple[list[str], str]:
    """Resolve the (file list, schema json) visible at ``version``
    (latest when None), honoring overwrite resets.

    ``skip=(col, lo, hi)`` applies data skipping: files whose recorded
    [min, max] for ``col`` cannot intersect [lo, hi] are pruned without
    touching them. Files with no recorded stats are conservatively
    kept."""
    log = _read_log(table)
    if not log:
        raise FileNotFoundError(f"no deltalite table at {table}")
    files: list[str] = []
    stats: dict = {}
    schema_json = log[0].schema_json
    for c in log:
        if version is not None and c.version > version:
            break
        if c.action == "overwrite":
            files = list(c.files)
            stats = dict(c.stats or {})
        else:
            files.extend(c.files)
            stats.update(c.stats or {})
        schema_json = c.schema_json
    if skip is not None:
        col, lo, hi = skip
        kept = []
        for f in files:
            rng = (stats.get(f) or {}).get(col)
            if rng is None or not (hi < rng[0] or lo > rng[1]):
                kept.append(f)
        files = kept
    return [os.path.join(table, f) for f in files], schema_json


def read_changes(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change Data Feed read: every row-level change committed in
    ``[from_version, to_version]`` with ``_change_type`` ∈
    {insert, update_preimage, update_postimage} and
    ``_commit_version`` columns — what an incremental downstream
    consumer (a CDC MERGE into a mart, a streaming backfill) applies
    instead of re-diffing snapshots.

    Append commits synthesize inserts directly from their data files
    (no capture needed — exactly Delta's behavior); overwrite commits
    must have been written with ``change_data=True`` or
    :class:`ChangeDataUnavailableError` is raised. Scale: the read is
    O(|changed rows| in range), never a snapshot scan."""
    log = _read_log(table)
    if not log:
        raise FileNotFoundError(f"no deltalite table at {table}")
    hi = to_version if to_version is not None else log[-1].version
    schema = T.StructType.fromJson(json.loads(log[0].schema_json))
    parts: list[DataFrame] = []
    for c in log:
        if c.version < from_version or c.version > hi:
            continue
        if c.cdf_dir is not None:
            part = spark.read.schema(
                T.StructType(
                    list(T.StructType.fromJson(json.loads(c.schema_json)))
                    + [T.StructField("_change_type", T.StringType())]
                )
            ).parquet(os.path.join(table, c.cdf_dir))
        elif not c.data_change:
            # compact/OPTIMIZE: bytes moved, no rows changed — Delta's
            # CDF skips dataChange:false commits; a follower must be
            # able to advance past them, not error out.
            continue
        elif c.action == "append":
            part = (
                spark.read.schema(
                    T.StructType.fromJson(json.loads(c.schema_json))
                )
                .parquet(*[os.path.join(table, f) for f in c.files])
                .withColumn("_change_type", F.lit("insert"))
            )
        else:
            raise ChangeDataUnavailableError(
                f"{table} version {c.version}: overwrite commit without "
                "captured change data (upsert(change_data=True))"
            )
        parts.append(
            part.withColumn(
                "_commit_version", F.lit(c.version).cast("bigint")
            )
        )
    if not parts:
        base = T.StructType(
            list(schema)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        )
        return spark.createDataFrame([], base)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def follow_changes(
    spark: SparkSession,
    table: str,
    apply_fn,
    *,
    start_version: int = 0,
    max_cycles: int | None = None,
    interval_s: float = 30.0,
    sleep_fn=None,
) -> int:
    """CDC follower: poll the commit log and hand each batch of newly
    committed versions to ``apply_fn(changes_df, from_v, to_v)`` exactly
    once, in commit order — the incremental-consumer loop that turns the
    Change Data Feed into a live downstream MERGE (the CDC analog of
    feeds.run_polling_ingest; like there, the loop adds no correctness:
    each version's change set is read once and versions never reorder).

    Returns the next unapplied version (the cursor). A durable consumer
    persists that cursor atomically with its sink — the same
    (app_id, epoch) idempotent-commit discipline the streaming medallion
    uses — so a crashed follower resumes with ``start_version=cursor``
    and re-applies nothing. ``max_cycles=None`` polls forever; tests
    inject a no-op ``sleep_fn`` and bounded cycles."""
    import time

    sleep_fn = sleep_fn or time.sleep
    cursor = start_version
    cycle = 0
    while True:
        latest = latest_version(table)
        if latest >= cursor:
            changes = read_changes(spark, table, cursor, latest)
            apply_fn(changes, cursor, latest)
            cursor = latest + 1
        cycle += 1
        if max_cycles is not None and cycle >= max_cycles:
            return cursor
        sleep_fn(interval_s)


def compact(
    spark: SparkSession,
    table: str,
    target_partitions: int = 1,
    sort_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> int:
    """OPTIMIZE analog: rewrite the current snapshot as one overwrite
    commit with ``target_partitions`` files. Streaming appends produce
    one small file set per epoch; at scale the read path degrades with
    file count, so periodic compaction keeps scans dense. Time travel to
    pre-compaction versions still works — old files are referenced by
    old commits and never deleted here (a vacuum would be a separate,
    retention-driven step).

    ``sort_by`` is the OPTIMIZE ZORDER-lite path: range-repartition +
    sort on the given columns so each output file covers a disjoint
    value range, which makes the recorded min/max stats tight — a
    skipping read on the cluster column then prunes to ~1/N of the
    files instead of none (appends interleave values, so their stats
    spans overlap completely). Stats are recorded for ``stats_cols``
    (default: the sort columns). Single-dimension clustering;
    ``zorder_by`` is the true multi-dimension path."""
    snapshot = read(spark, table)
    if zorder_by:
        if sort_by:
            raise ValueError("sort_by and zorder_by are exclusive")
        snapshot = _zorder(spark, snapshot, zorder_by, target_partitions)
        stats_cols = stats_cols or zorder_by
    elif sort_by:
        snapshot = snapshot.repartitionByRange(
            target_partitions, *sort_by
        ).sortWithinPartitions(*sort_by)
        stats_cols = stats_cols or sort_by
    else:
        snapshot = snapshot.coalesce(target_partitions)
    # dataChange:false — same rows, new layout; CDF consumers skip it
    version = write(
        snapshot, table, mode="overwrite", stats_cols=stats_cols,
        data_change=False,
    )
    assert version is not None
    return version


_Z_BITS = 12  # bucket resolution per dimension (4096 cells/dim)


def _interleave_expr(cols: list[str]) -> str:
    """SQL expression interleaving the low ``_Z_BITS`` bits of the given
    integer bucket columns into one z-value (bit i of dim d lands at
    position i*ndims + d) — pure JVM integer ops, codegen-friendly."""
    n = len(cols)
    terms = [
        f"shiftleft(shiftright({c}, {i}) & 1, {i * n + d})"
        for i in range(_Z_BITS)
        for d, c in enumerate(cols)
    ]
    return " + ".join(terms)


def _zorder(
    spark: SparkSession,
    df: DataFrame,
    cols: list[str],
    target_partitions: int,
) -> DataFrame:
    """True multi-dimension Z-order clustering: each dimension is
    normalized to a 12-bit bucket rank by min/max (ONE tiny aggregate,
    broadcast back — no global sort, unlike an ntile ranking, so the
    normalization itself scales), the per-dimension bits interleave
    into a z-value, and files are range-partitioned + sorted on it.
    Locality in z implies locality in EVERY dimension, so recorded
    min/max stats are tight on all z-ordered columns at once — a
    skipping read prunes on any of them, where a lexicographic sort
    only prunes on its leading column."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    ).withColumn("__jk", F.lit(1))
    z_input = df.withColumn("__jk", F.lit(1)).join(F.broadcast(bounds), "__jk")
    cells = (1 << _Z_BITS) - 1
    bucket_cols = []
    for c in cols:
        b = f"__zb_{c}"
        z_input = z_input.withColumn(
            b,
            F.least(
                F.lit(cells),
                F.floor(
                    (F.col(c).cast("double") - F.col(f"__lo_{c}"))
                    / F.expr(f"nullif(__hi_{c} - __lo_{c}, 0.0)")
                    * (cells + 1)
                ).cast("int"),
            ),
        ).fillna({b: 0})
        bucket_cols.append(b)
    z_input = z_input.withColumn("__z", F.expr(_interleave_expr(bucket_cols)))
    return (
        z_input.repartitionByRange(target_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__jk", "__z", *bucket_cols, *[f"__lo_{c}" for c in cols],
              *[f"__hi_{c}" for c in cols])
    )


def history(table: str) -> list[Commit]:
    """The table's commit log, oldest first (DESCRIBE HISTORY analog)."""
    return _read_log(table)


def vacuum(
    table: str, keep_versions: int = 0, min_age_s: float = 0.0
) -> list[str]:
    """VACUUM analog: delete data files referenced only by snapshots
    older than ``latest - keep_versions`` (plus uncommitted orphans from
    crashed writers). Time travel to vacuumed versions stops working —
    exactly Delta's retention trade. ``min_age_s`` is the safety window
    for concurrent writers mid-commit (their data exists before their
    commit file does; Delta's default retention serves the same
    purpose — never vacuum with 0 age while writers are live).

    Returns the deleted paths relative to the table root."""
    log = _read_log(table)
    if not log:
        return []
    latest = log[-1].version
    referenced: set[str] = set()
    for v in range(max(0, latest - keep_versions), latest + 1):
        files, _ = snapshot_files(table, version=v)
        referenced.update(os.path.abspath(f) for f in files)
    data_root = os.path.join(table, _DATA_DIR)
    if not os.path.isdir(data_root):
        return []
    import shutil

    now = time.time()
    deleted = []
    # Commit-dir granularity: a commit's files enter snapshots all
    # together, so a directory either has referenced parquet (live) or
    # none (vacuumable along with its _SUCCESS/.crc sidecars).
    for entry in sorted(os.listdir(data_root)):
        commit_dir = os.path.join(data_root, entry)
        if not os.path.isdir(commit_dir):
            continue
        paths = [
            os.path.join(dp, n)
            for dp, _dirs, names in os.walk(commit_dir)
            for n in names
        ]
        if any(os.path.abspath(p) in referenced for p in paths):
            continue
        if any(now - os.path.getmtime(p) < min_age_s for p in paths):
            continue
        deleted.extend(os.path.relpath(p, table) for p in paths)
        shutil.rmtree(commit_dir)
    return sorted(deleted)


def read(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    skip: tuple | None = None,
) -> DataFrame:
    """Lazy DataFrame over the table snapshot at ``version`` (time
    travel); filters/projections push into the parquet scan as usual.
    ``skip=(col, lo, hi)`` prunes whole files by commit-recorded stats
    before Spark ever lists them — the caller still applies the exact
    row-level filter (skipping is a superset guarantee, like Delta's)."""
    files, schema_json = snapshot_files(table, version, skip=skip)
    schema = T.StructType.fromJson(json.loads(schema_json))
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)
