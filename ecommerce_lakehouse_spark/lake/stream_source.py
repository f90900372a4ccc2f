"""LakeTable as a Structured Streaming SOURCE via Spark 4's Python Data
Source API — the analogue of Delta's streaming source
(``spark.readStream.format("delta")``; the reference depends on
delta-spark, requirements.txt:3, whose tables are tailable the same way).

Semantics (Delta-parity):

- **Offsets are table versions**: ``{"version": N}`` means every row
  committed through manifest vN has been emitted, so checkpointed
  restarts resume exactly-once from the next commit.
- **A microbatch emits the rows ADDED in (start, end]**: an append's new
  data dir(s), read file-parallel on the executors as Arrow record
  batches (one ``InputPartition`` per parquet file — the driver touches
  only the tiny JSON manifests, never row data).
- **Non-append data commits raise by default** (merge / delete / update /
  overwrite / restore / generated-column backfill), exactly like Delta's
  source. ``ignoreChanges=true`` re-emits the rewritten rows instead
  (Delta's documented contract: downstream deduplicates). The
  table-creating commit (v1) counts as initial data, not a change.
- **compact/optimize are skipped**: physical reorganizations with no
  logical row change (Delta's ``dataChange=false`` files).
- **Metadata-only commits** (add/drop constraint) add no data dirs and
  emit nothing.

Options: ``path`` (table root, required), ``startingVersion`` (int, or
``"earliest"`` / ``"latest"``; default ``latest`` = only commits after
stream start, the Kafka ``startingOffsets=latest`` posture),
``ignoreChanges`` (default false), ``readChangeFeed`` (default false:
rows arrive with ``_change_type``/``_commit_version`` appended, Delta's
streaming CDF shape; append commits only — rewrites need the diff
compute of the batch ``LakeTable.changes()`` API and raise),
``maxCommitsPerTrigger`` (int, default unlimited: Delta's
``maxFilesPerTrigger`` analogue at this source's offset granularity —
each microbatch advances at most N commits, so a stream catching up on
deep history paces itself instead of loading everything into one batch;
best-effort like Delta's, and ``Trigger.AvailableNow`` runs snapshot
latestOffset once, so a capped availableNow drain advances N commits per
invocation and resumes from the checkpoint on the next).

Scale: offset planning is manifest-file reads on the driver; row bytes
move only executor-side (pyarrow, one task per file). Requires storage
visible to the executors — same contract as every lake read.
"""

from __future__ import annotations

import json
import os
from typing import Iterator
from urllib.parse import unquote

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _latest_version(root: str) -> int:
    with open(os.path.join(root, "_manifest", "_LATEST")) as f:
        return int(f.read().strip())


def _load_manifest(root: str, version: int) -> dict:
    with open(os.path.join(root, "_manifest", f"v{version:08d}.json")) as f:
        return json.load(f)


# physical-only reorganizations: no logical row change (Delta dataChange=false)
_PHYSICAL_OPS = ("compact", "optimize", "optimize-zorder", "auto-compact")


def _entry_path(e) -> str:
    return e["path"] if isinstance(e, dict) else e


def _entry_norm(e) -> tuple[str, list[dict], list[str] | None]:
    if isinstance(e, dict):
        return e["path"], e.get("exclude") or [], e.get("live_files")
    return e, [], None


def _parquet_files(d: str) -> list[str]:
    """Hive-relative paths of the parquet files under a data dir."""
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"laketable source: data dir {d} referenced by the manifest is "
            "missing (vacuumed?). Start the stream from a later "
            "startingVersion — silently skipping it would lose rows."
        )
    out = []
    for base, _dirs, files in os.walk(d):
        for name in files:
            if name.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(base, name), d))
    return sorted(out)


def _canon(d: dict) -> tuple:
    """Hive-comparable form of a partition tuple (bools lowercase, None
    stays None, everything else str) — mirrors lake.table._row_canon."""
    out = []
    for k in sorted(d):
        v = d[k]
        if isinstance(v, bool):
            v = str(v).lower()
        elif v is not None:
            v = str(v)
        out.append((k, v))
    return tuple(out)


def _live_files(entry) -> list[tuple[str, str]]:
    """(dir, rel) of the files a manifest entry actually exposes:
    honors ``live_files`` subsets (file-pruned DML) and skips files in
    partitions behind the entry's ``exclude`` mask — the same visibility
    LakeTable.read() enforces, so clones/restored snapshots stream the
    rows the table reads, not the raw dir contents."""
    path, excl, live = _entry_norm(entry)
    rels = sorted(live) if live is not None else _parquet_files(path)
    if excl:
        dead = {_canon(row) for row in excl}
        rels = [r for r in rels if _canon(_hive_values(r)) not in dead]
    return [(path, r) for r in rels]


def _hive_values(rel: str) -> dict[str, str | None]:
    """Partition column values encoded in a hive-relative file path."""
    vals: dict[str, str | None] = {}
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            c, v = seg.split("=", 1)
            vals[c] = None if v == _HIVE_NULL else unquote(v)
    return vals


def _snapshot_arrow_schema(root: str):
    """Unified arrow schema of the current snapshot's data dirs (hive
    partition columns included, types by pyarrow's hive inference — the
    same inference the read path uses, so the two always agree).

    A snapshot can have ZERO data dirs (a DELETE removed every row);
    mirror LakeTable.read()'s fallback and infer from the most recent
    version that still had data, instead of handing pyarrow an empty
    unify_schemas call."""
    import pyarrow as pa
    import pyarrow.dataset as pds

    from ecommerce_lakehouse_spark.lake.table import check_table_features

    v = _latest_version(root)
    m = _load_manifest(root, v)
    # the stream decodes snapshot bytes like any reader — gate on
    # protocol features before serving a schema for them
    check_table_features(m, for_write=False, where=root)
    while not m["data_dirs"]:
        v -= 1
        if v < 1:
            raise ValueError(
                f"laketable source at {root}: no version has any data dirs — "
                "cannot infer a stream schema from an always-empty table"
            )
        m = _load_manifest(root, v)
    schemas = []
    for e in m["data_dirs"]:
        schemas.append(pds.dataset(_entry_path(e), partitioning="hive").schema)
    return pa.unify_schemas(schemas)


def _carryover_visibility_changes(m_prev: dict | None, m: dict) -> list[str]:
    """Row-visibility changes among data dirs CARRIED OVER from the
    previous manifest — changes with no new files for a source to emit:
    a partition exclude-mask grow (a DELETE emptied whole partitions), a
    mask shrink (RESTORE re-exposed them), a ``live_files`` change
    (file-pruned DML), or a dir dropped from the manifest entirely.
    Without this check a mask-only data commit would fall through the
    ``no new entries`` skip and silently vanish from the stream
    (contradicting the module contract and Delta's ignoreDeletes
    semantics). Row-level detail for such commits lives in the batch
    diff, lake/cdf.py."""
    if m_prev is None:
        return []
    prev = {p: (e, l) for p, e, l in map(_entry_norm, m_prev["data_dirs"])}
    cur = {p: (e, l) for p, e, l in map(_entry_norm, m["data_dirs"])}
    changes = []
    for p, (ep, lp) in prev.items():
        if p not in cur:
            changes.append(f"data dir dropped: {p}")
            continue
        ec, lc = cur[p]
        if {_canon(r) for r in ep} != {_canon(r) for r in ec}:
            changes.append(f"partition exclude mask changed: {p}")
        elif (lp is None) != (lc is None) or (
            lp is not None and sorted(lp) != sorted(lc)
        ):
            changes.append(f"live_files changed: {p}")
    return changes


class _LakeFilePartition(InputPartition):
    def __init__(self, path: str, rel: str, version: int = 0):
        self.path = path
        self.rel = rel
        self.version = version


def _file_batches(partition: _LakeFilePartition, target) -> Iterator:
    """One parquet file → arrow batches conformed to the stream schema:
    present columns cast, hive partition values materialized as constant
    columns, columns this file predates filled with nulls (unionByName
    semantics, matching LakeTable.read's mergeSchema)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(partition.path)
    hive = _hive_values(partition.rel)
    n = len(tbl)
    cols = []
    for field in target:
        # a physically-present column ALWAYS wins, even for the CDF
        # names: in readChangeFeed mode _change_type/_commit_version are
        # appended to the schema and never stored in files, but a plain
        # stream of a CDC EVENT LOG legitimately carries its own
        # _change_type data column — clobbering it with the "insert"
        # constant silently rewrote delete/update verbs (caught by
        # test_stream_apply_changes_scd2)
        if field.name in tbl.column_names:
            col = tbl.column(field.name).cast(field.type).combine_chunks()
        elif field.name == "_change_type":  # readChangeFeed: appends = inserts
            col = pa.array(["insert"] * n, pa.string())
        elif field.name == "_commit_version":
            col = pa.array([partition.version] * n, pa.int32())
        elif field.name in hive and hive[field.name] is not None:
            col = pa.array([hive[field.name]] * n, pa.string()).cast(field.type)
        else:
            col = pa.nulls(n, field.type)
        cols.append(col)
    yield from pa.table(cols, schema=target).to_batches()


class LakeTableStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        from pyspark.sql.pandas.types import to_arrow_schema

        root = options.get("path")
        if not root:
            raise ValueError("laketable source requires .option('path', <table root>)")
        self._root = root
        self._ignore_changes = str(options.get("ignorechanges", "false")).lower() == "true"
        self._cdf = str(options.get("readchangefeed", "false")).lower() == "true"
        sv = str(options.get("startingversion", "latest")).lower()
        if sv == "latest":
            self._start = _latest_version(root)
        elif sv == "earliest":
            self._start = 0
        else:
            # startingVersion=N means "emit commit N onward"
            self._start = max(0, int(sv) - 1)
        self._arrow_schema = to_arrow_schema(schema)
        mct = options.get("maxcommitspertrigger")
        self._max_commits = int(mct) if mct else None
        self._last_end: int | None = None

    # -- driver-side planning ------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        actual = _latest_version(self._root)
        if self._max_commits is None:
            return {"version": actual}
        # rate limit (Delta maxFilesPerTrigger analogue, commit granule):
        # advance at most N commits past the last planned end. After a
        # restart the base is the configured start until the first
        # partitions() call reveals the checkpointed position.
        base = self._last_end if self._last_end is not None else self._start
        return {"version": min(actual, base + self._max_commits)}

    def partitions(self, start: dict, end: dict):
        # rate-limit base: never below the checkpointed position we just
        # learned (a freshly-restarted reader only knows startingVersion
        # until the engine reveals the real start here)
        known = max(start["version"], end["version"])
        self._last_end = (
            known if self._last_end is None else max(self._last_end, known)
        )
        parts: list[_LakeFilePartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            m = _load_manifest(self._root, v)
            if m.get("column_mapping") or m.get("dropped_columns"):
                # this source serves files under their PHYSICAL schema
                # (pyarrow reads, no mapping layer): streaming across a
                # rename/drop would mix schemas mid-stream. Honest raise;
                # consume column-mapped tables via changes()/read().
                raise ValueError(
                    f"laketable streaming source: {self._root} uses column "
                    "mapping (rename/drop without rewrite) from "
                    f"v{m['version']}; the file-level stream cannot serve "
                    "renamed columns — use batch changes() or read()"
                )
            m_prev = _load_manifest(self._root, v - 1) if v > 1 else None
            prev_dirs = (
                {_entry_path(e) for e in m_prev["data_dirs"]} if m_prev else set()
            )
            new_entries = [
                e for e in m["data_dirs"] if _entry_path(e) not in prev_dirs
            ]
            op = m.get("operation", "")
            prev_dvs = set(m_prev.get("deletion_vectors", [])) if m_prev else set()
            if set(m.get("deletion_vectors", [])) - prev_dvs:
                # merge-on-read DELETE: rows disappeared without any file
                # change — a source cannot emit a retraction. ignoreChanges
                # doubles as Delta's ignoreDeletes here (skip the commit).
                if not self._ignore_changes or self._cdf:
                    raise ValueError(
                        f"laketable stream source at {self._root}: commit "
                        f"v{v} added deletion vectors (merge-on-read "
                        "DELETE); a stream cannot retract rows. Set "
                        "ignoreChanges=true to skip delete-only commits, "
                        "or use the batch LakeTable.changes() API."
                    )
            if op not in _PHYSICAL_OPS and not new_entries:
                # mask-only / file-list-only data commit: rows appeared or
                # disappeared with no new dir to emit (e.g. a partitioned
                # DELETE that emptied every touched partition, or a RESTORE
                # that only flipped masks)
                changed = _carryover_visibility_changes(m_prev, m)
                if changed and (not self._ignore_changes or self._cdf):
                    raise ValueError(
                        f"laketable stream source at {self._root}: commit "
                        f"v{v} ({op!r}) changed row visibility without "
                        f"adding files ({'; '.join(changed)}); a stream "
                        "cannot emit retractions. Set ignoreChanges=true "
                        "to skip such commits, or use the batch "
                        "LakeTable.changes() API."
                    )
            if not new_entries or op in _PHYSICAL_OPS:
                continue
            if m.get("deletion_vectors") and (v == 1 or op != "append"):
                raise ValueError(
                    f"laketable stream source at {self._root}: commit v{v} "
                    f"({op!r}) introduces data dirs while the snapshot "
                    "carries deletion vectors — raw file emission would "
                    "include deleted rows. compact() the table first."
                )
            if op != "append" and v > 1:
                if self._cdf:
                    # a rewrite's deletes/updates need the diff compute the
                    # batch API runs; a source partition can't — be honest
                    raise ValueError(
                        f"laketable stream source at {self._root}: commit "
                        f"v{v} is a {op!r}; readChangeFeed streams serve "
                        "append commits only (appends = inserts). Use the "
                        "batch API LakeTable.changes() for rewrite commits."
                    )
                if not self._ignore_changes:
                    raise ValueError(
                        f"laketable stream source at {self._root}: commit v{v} is a "
                        f"{op!r} (data rewrite); a streaming source tails appends. "
                        "Set ignoreChanges=true to re-emit rewritten rows "
                        "(downstream must dedup), or start from a later "
                        "startingVersion."
                    )
            for e in new_entries:
                for d, rel in _live_files(e):
                    parts.append(_LakeFilePartition(os.path.join(d, rel), rel, v))
        return parts

    # -- executor-side read --------------------------------------------
    def read(self, partition: _LakeFilePartition):
        yield from _file_batches(partition, self._arrow_schema)

    def commit(self, end: dict) -> None:
        # manifests are the source of truth and vacuum() governs their
        # retention; nothing to release per-microbatch
        pass


class LakeTableDataSource(DataSource):
    """``spark.dataSource.register(LakeTableDataSource)`` then
    ``spark.readStream.format("laketable").option("path", root).load()``.

    Batch reads stay on :meth:`LakeTable.read` — the JVM parquet scan
    with manifest pruning is strictly better than a Python-side batch
    reader, so this source intentionally implements only the streaming
    half (the capability the lake layer lacked)."""

    @classmethod
    def name(cls) -> str:
        return "laketable"

    def schema(self):
        import pyarrow as pa
        from pyspark.sql.pandas.types import from_arrow_schema

        root = self.options.get("path")
        if not root:
            raise ValueError("laketable source requires .option('path', <table root>)")
        sch = _snapshot_arrow_schema(root)
        if str(self.options.get("readchangefeed", "false")).lower() == "true":
            # Delta CDF column contract (matches LakeTable.changes)
            sch = sch.append(pa.field("_change_type", pa.string())).append(
                pa.field("_commit_version", pa.int32())
            )
        return from_arrow_schema(sch)

    def streamReader(self, schema):
        return LakeTableStreamReader(self.options, schema)


def register_lake_source(spark) -> None:
    """Idempotent registration of the ``laketable`` streaming format."""
    spark.dataSource.register(LakeTableDataSource)
