"""LakeTable — a minimal lakehouse table format on plain parquet.

Re-expresses the reference's Delta usage (SURVEY §2.2 K1-K7) without
delta-spark (not installed here): versioned copy-on-write commits with an
atomic manifest pointer, partitioned writes, append/overwrite/merge, and
time-travel reads by version.

Layout:
    <root>/
      _manifest/ v00000001.json ...   (one JSON per committed version)
      _manifest/_LATEST               (atomic pointer: rename-swapped)
      data/v00000001/ ... parquet (optionally partitioned subdirs)

Each commit writes a fresh data directory then atomically swaps _LATEST —
readers never see partial writes (same spirit as Delta's log, single-writer
only; a real deployment swaps this class for Delta/Iceberg which provide
multi-writer transaction logs).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from ecommerce_lakehouse_spark.lake.merge import merge_upsert


def _crash_hook(point: str) -> None:
    """Fault-injection seam for the commit protocol (no-op in
    production). tests/test_lake_fault_injection.py monkeypatches this
    to abort a commit at a named internal step and asserts the table
    reads back EITHER exactly the pre-commit version (crash before the
    manifest link) OR exactly the committed version (crash after it) —
    never partial state — and that the next writer is never wedged.
    Points, in commit order: ``commit_enter`` (data files written, no
    manifest yet), ``manifest_tmp_written`` (content durable in a temp
    file, version not claimed), ``manifest_linked`` (commit point
    passed, ``_LATEST`` pointer not yet moved)."""


class ConcurrentWriteError(RuntimeError):
    """Another writer committed a conflicting version this operation
    didn't see.

    LakeTable's commit protocol is optimistic concurrency control in the
    Delta style: an operation snapshots the table version when it starts,
    and the commit (a) refuses if the table moved past that snapshot and
    (b) creates its manifest file with O_EXCL so two writers racing for
    the same version number cannot both win. Logical conflict resolution
    (what delta-spark's commit protocol adds on top) is implemented for
    the common cases: blind appends rebase over any winner, and
    partition-pruned merge/delete/update rebase automatically when every
    intervening winner's touched partitions are disjoint from theirs AND
    the winner's newly-added data cannot affect this operation's read set
    (checked by scanning only the winners' delta dirs). Overlapping
    writers — and full-table rewrites (overwrite/compact/optimize) racing
    anything — still surface this error."""


class SchemaMismatchError(RuntimeError):
    """Incoming rows do not match the table schema under strict mode
    (Delta's default write behavior: new columns and type changes are
    rejected unless schema evolution is explicitly enabled)."""


class ConstraintViolationError(RuntimeError):
    """Incoming rows violate a table CHECK constraint (Delta's
    ``ALTER TABLE .. ADD CONSTRAINT`` invariant enforcement): the write
    is rejected before any commit, listing every violated constraint."""

    def __init__(self, table_root: str, violated: dict[str, str]):
        self.violated = violated
        detail = "; ".join(f"{n}: CHECK ({e})" for n, e in sorted(violated.items()))
        super().__init__(
            f"write to {table_root} violates constraint(s) {detail}"
        )


class UnsupportedTableFeatureError(RuntimeError):
    """The manifest lists a protocol feature this build does not implement
    (Delta's table-features / minReaderVersion contract): refuse LOUDLY
    instead of proceeding — a reader that ignored 'deletion-vectors'
    would resurrect deleted rows; one that ignored 'column-mapping'
    would serve physical column names; a writer that ignored an unknown
    writer feature could corrupt invariants it cannot see."""


# Protocol features this build implements. Features are recorded in the
# manifest the first time a commit exercises the capability and are
# carried forward monotonically (Delta: once a feature is on the table,
# every client must support it). READER features change what bytes mean;
# WRITER features only constrain how commits are produced, so an
# unknown writer feature still permits reads (Delta's reader/writer
# split).
SUPPORTED_READER_FEATURES = frozenset({"deletion-vectors", "column-mapping"})
SUPPORTED_WRITER_FEATURES = frozenset(
    {"check-constraints", "generated-columns", "auto-compaction"}
)


def check_table_features(manifest: dict, *, for_write: bool, where: str) -> None:
    """Gate an operation on the manifest's protocol features. Reads need
    the reader set; writes need BOTH sets (a writer must preserve reader
    features' invariants in the files it produces)."""
    feats = manifest.get("features") or {}
    unknown = set(feats.get("reader", [])) - SUPPORTED_READER_FEATURES
    if for_write:
        unknown |= (
            set(feats.get("writer", []))
            - SUPPORTED_WRITER_FEATURES
            - SUPPORTED_READER_FEATURES
        )
    if unknown:
        mode = "write to" if for_write else "read of"
        raise UnsupportedTableFeatureError(
            f"{mode} {where} requires table feature(s) "
            f"{sorted(unknown)} this build does not implement "
            f"(manifest v{manifest.get('version')}); upgrade the engine "
            "or use a client that supports them"
        )


def _part_key(v):
    """JSON-safe canonical form of a partition value (dates/timestamps
    become strings; comparison happens through a string cast on read)."""
    if v is None or isinstance(v, (int, bool)):
        return v
    return str(v)


def _entry_path(e) -> str:
    return e["path"] if isinstance(e, dict) else e


def _dv_join(df: "DataFrame", dv: "DataFrame", how: str) -> "DataFrame":
    """Join ``df`` against a deletion-vector frame on parquet row identity
    (_metadata file_path + row_index), dropping the id columns after —
    the ONE place the row-identity scheme lives (read path, change feed,
    and DV-row recovery all route through it)."""
    import pyspark.sql.functions as F

    return (
        df.select(
            "*",
            F.col("_metadata.file_path").alias("__file_path"),
            F.col("_metadata.row_index").alias("__row_index"),
        )
        .join(dv, on=["__file_path", "__row_index"], how=how)
        .drop("__file_path", "__row_index")
    )


def _partition_predicate(pcols: list[str], rows: list[dict]):
    """OR-of-AND equality predicate over partition columns for the given
    partition tuples. Values compare through a string cast (partition
    values round-trip the JSON manifest as strings), which Spark still
    evaluates against the in-memory partition spec at planning time —
    i.e. this prunes directories, it doesn't scan-and-drop."""
    import pyspark.sql.functions as F

    pred = F.lit(False)
    for row in rows:
        clause = F.lit(True)
        for c in pcols:
            v = row[c]
            # eqNullSafe (SQL <=>): every clause is TRUE/FALSE, never NULL,
            # so rows whose partition value is NULL survive ~pred exclusion
            # masks instead of being silently dropped by 3-valued logic.
            clause = clause & (
                F.col(c).isNull()
                if v is None
                else F.col(c).cast("string").eqNullSafe(str(v))
            )
        pred = pred | clause
    return pred


def _row_canon(row: dict) -> tuple:
    """Canonical hashable form of a partition tuple for disjointness checks
    and for comparison against hive-path values: None stays None, bools
    lowercase (hive writes true/false), everything else via str."""
    out = []
    for k in sorted(row):
        v = row[k]
        if isinstance(v, bool):
            v = str(v).lower()
        elif v is not None:
            v = str(v)
        out.append((k, v))
    return tuple(out)


def _dir_partition_tuples(path: str, pcols: list[str]) -> set[tuple]:
    """Partition tuples physically present under ``path`` (hive-style
    ``col=value`` dirs; filesystem walk — control-plane, bounded by
    partition count, never data volume)."""
    from urllib.parse import unquote

    found: set[tuple] = set()

    def walk(d: str, depth: int, acc: list):
        if depth == len(pcols):
            found.add(_row_canon(dict(zip(pcols, acc))))
            return
        try:
            names = os.listdir(d)
        except FileNotFoundError:
            return
        prefix = pcols[depth] + "="
        for name in names:
            if name.startswith(prefix):
                v = unquote(name[len(prefix):])
                walk(
                    os.path.join(d, name),
                    depth + 1,
                    acc + [None if v == "__HIVE_DEFAULT_PARTITION__" else v],
                )

    walk(path, 0, [])
    return found


def _apply_column_mapping(df, mapping: dict, dropped: list):
    """Serve a physical frame under the table's LOGICAL schema (Delta
    column mapping): each logical column is the newest-first COALESCE of
    whatever names (logical + physical aliases) the frame carries —
    a mergeSchema scan spanning pre- and post-rename files holds BOTH
    vintages' columns, null-filled per row by file vintage, so coalesce
    reassembles exactly one value per row. Single-name frames reduce to
    a rename. Dead (dropped) names are hidden. Pure projection."""
    import pyspark.sql.functions as F

    for logical, aliases in mapping.items():
        cols = set(df.columns)
        present = [c for c in [logical] + list(aliases) if c in cols]
        if not present or present == [logical]:
            continue
        if len(present) == 1:
            df = df.withColumnRenamed(present[0], logical)
        else:
            keep = [c for c in df.columns if c not in present]
            df = df.select(
                *keep, F.coalesce(*[F.col(c) for c in present]).alias(logical)
            )
    dead = [c for c in dropped if c in df.columns]
    if dead:
        df = df.drop(*dead)
    return df


def _collect_file_stats(d: str) -> dict:
    """Per-file column min/max from parquet FOOTERS (footer-only I/O — the
    local analogue of Delta's data-skipping stats, which are likewise
    collected at write time and stored in the log). Only primitive
    int/float/str/bool columns are recorded; anything else is skipped and
    later treated as "unknown → cannot prune". Keys are paths relative to
    ``d``. On a real cluster this walk runs against the object store via
    the same listing the commit already performs; cost is one footer read
    per written file, amortized into the write."""
    import pyarrow.parquet as pq

    files: dict[str, dict] = {}
    for root, _, names in os.walk(d):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            fp = os.path.join(root, name)
            md = pq.ParquetFile(fp).metadata
            mins: dict[str, object] = {}
            maxs: dict[str, object] = {}
            seen_cols: set[str] = set()
            bad: set[str] = set()
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    c = col.path_in_schema
                    if "." in c:
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        bad.add(c)
                        continue
                    mn, mx = st.min, st.max
                    if not isinstance(mn, (int, float, str, bool)) or not isinstance(
                        mx, (int, float, str, bool)
                    ):
                        bad.add(c)
                        continue
                    seen_cols.add(c)
                    mins[c] = mn if c not in mins else min(mins[c], mn)
                    maxs[c] = mx if c not in maxs else max(maxs[c], mx)
            files[os.path.relpath(fp, d)] = {
                c: [mins[c], maxs[c]] for c in seen_cols - bad
            }
    return files


_BLOOM_SIDECAR = "_bloom.json"


def _bloom_size(n_keys: int, fpp: float) -> tuple[int, int]:
    """Classic Bloom sizing: m bits and k hashes for ``n_keys`` expected
    distinct keys at false-positive rate ``fpp`` (same formula Delta's
    bloom index uses from its ``numItems``/``fpp`` table properties)."""
    import math

    m = max(64, int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))))
    m = ((m + 63) // 64) * 64  # whole 64-bit words
    k = max(1, min(16, round(m / n_keys * math.log(2))))
    return m, k


def _bloom_test(b64: str, positions: list[int]) -> bool:
    """Membership test: True unless some probe bit is UNSET (definitely
    absent). All-set means "maybe present" — never a false negative."""
    import base64

    bits = base64.b64decode(b64)
    return all(bits[p >> 3] & (1 << (p & 7)) for p in positions)


def _ranges_intersect(file_stats: dict | None, key_ranges: dict) -> bool:
    """True unless the footer stats PROVE the file cannot contain any key
    in ``key_ranges`` (missing stats → must assume intersecting)."""
    if not file_stats:
        return True
    for c, (lo, hi) in key_ranges.items():
        fs = file_stats.get(c)
        if not fs or fs[0] is None or fs[1] is None:
            continue
        try:
            if (lo is not None and fs[1] < lo) or (hi is not None and fs[0] > hi):
                return False
        except TypeError:  # incomparable types across engines — no pruning
            continue
    return True


def _local_path(uri: str) -> str:
    """input_file_name() returns file:// URIs; normalize to a local path."""
    from urllib.parse import unquote, urlparse

    if uri.startswith("file:"):
        return unquote(urlparse(uri).path)
    return uri


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._manifest_dir = os.path.join(root, "_manifest")
        # analyzed-DataFrame reuse keyed by (version, rowid flag) — PLAN
        # reuse only, never result caching: the cached object is a lazy
        # DataFrame whose every action still reads the version's parquet.
        # A version's file set is immutable once committed (the manifest
        # link is the commit point), so reuse is always sound; repeated
        # read() calls otherwise re-pay schema inference (a Spark job
        # per call under mergeSchema) and Catalyst re-analysis — the
        # multi-stage pipelines re-read the same version up to 4x per
        # run (guide §7.3: planning time is driver-side wall).
        self._read_cache: dict[tuple[int, bool], DataFrame] = {}

    # ---------------- manifest plumbing ----------------

    def _latest_path(self) -> str:
        return os.path.join(self._manifest_dir, "_LATEST")

    def exists(self) -> bool:
        """K6 create-if-absent check (cleaner than the reference's exception
        sniffing at src/glue_etl.py:465-467).

        A table exists once its FIRST manifest is durably linked — the
        ``_LATEST`` pointer is a roll-forward cache (see
        :meth:`current_version`), so a writer that crashed between
        linking v1 and writing the pointer still created the table."""
        return os.path.exists(self._latest_path()) or os.path.exists(
            os.path.join(self._manifest_dir, "v00000001.json")
        )

    def current_version(self) -> int:
        """Head version. The COMMIT POINT of the protocol is the atomic
        ``os.link`` of a version's manifest (see :meth:`_commit`); the
        ``_LATEST`` pointer is only an O(1) cache of the head and may lag
        by any number of versions if writers crash between the link and
        the pointer swap. Reads roll FORWARD from the pointer over
        contiguously-present manifests — a lagging pointer can therefore
        never hide a durable commit, and a crashed writer can never wedge
        the next one (fault-injection contract:
        tests/test_lake_fault_injection.py). The healed head is written
        back opportunistically so the next read is O(1) again."""
        try:
            with open(self._latest_path()) as f:
                head = int(f.read().strip())
        except FileNotFoundError:
            head = 0
        rolled = head
        while os.path.exists(
            os.path.join(self._manifest_dir, f"v{rolled + 1:08d}.json")
        ):
            rolled += 1
        if rolled == 0:
            # neither pointer nor any manifest: preserve the historical
            # "missing table" contract (callers guard with exists())
            with open(self._latest_path()) as f:
                return int(f.read().strip())
        if rolled > head:
            try:
                fd, tmp = tempfile.mkstemp(dir=self._manifest_dir, suffix=".tmp")
                with os.fdopen(fd, "w") as f:
                    f.write(str(rolled))
                os.replace(tmp, self._latest_path())
            except OSError:
                pass  # healing is best-effort; roll-forward re-applies
        return rolled

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._manifest_dir, f"v{version:08d}.json")) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self._manifest_dir)):
            if name.endswith(".json"):
                out.append(self._manifest(int(name[1:-5])))
        return out

    def _commit(
        self,
        data_dirs: list[str],
        operation: str,
        partition_by: list[str],
        base_version: int | None = None,
        touched: list[dict] | None = None,
        txn: dict | None = None,
        constraints: dict[str, str] | None = None,
        generated: dict[str, str] | None = None,
        deletion_vectors: list[str] | None = None,
        properties: dict | None = None,
        column_mapping: dict[str, list[str]] | None = None,
        dropped_columns: list[str] | None = None,
        features_override: tuple[set, set] | None = None,
    ) -> int:
        _crash_hook("commit_enter")
        current = self.current_version() if self.exists() else 0
        if properties is None:
            # table properties ride every commit (Delta TBLPROPERTIES)
            properties = (
                self._manifest(current).get("properties", {}) if current else {}
            )
        if column_mapping is None:
            # column-mapping metadata rides every commit (Delta column
            # mapping: renames/drops live in the log, not the files)
            column_mapping = (
                self._manifest(current).get("column_mapping", {}) if current else {}
            )
        if dropped_columns is None:
            dropped_columns = (
                self._manifest(current).get("dropped_columns", []) if current else []
            )
        if constraints is None:
            # table-level metadata rides every commit (Delta: constraints
            # live in the log and survive data operations)
            constraints = (
                self._manifest(current).get("constraints", {}) if current else {}
            )
        if generated is None:
            generated = (
                self._manifest(current).get("generated_columns", {}) if current else {}
            )
        if deletion_vectors is None:
            # DVs ride commits that keep the underlying files (appends,
            # metadata); rewrites that materialize them pass [] explicitly
            deletion_vectors = (
                self._manifest(current).get("deletion_vectors", []) if current else []
            )
        if base_version is not None and current != base_version:
            raise ConcurrentWriteError(
                f"{operation}: table advanced v{base_version} -> v{current} "
                "since this operation read it; re-read and retry"
            )
        # protocol features: gate on what the table already requires, then
        # record (monotonically) what this commit starts requiring
        prior_feats = (
            self._manifest(current).get("features", {}) if current else {}
        )
        if current:
            check_table_features(
                self._manifest(current), for_write=True, where=self.root
            )
        if features_override is not None:
            # drop_feature path: start from the caller's sets; the
            # exercise-based additions below still run, so a feature the
            # commit STILL exercises silently re-adds itself (a drop can
            # never leave the manifest lying about its own content)
            reader_feats, writer_feats = (
                set(features_override[0]),
                set(features_override[1]),
            )
        else:
            reader_feats = set(prior_feats.get("reader", []))
            writer_feats = set(prior_feats.get("writer", []))
        if deletion_vectors:
            reader_feats.add("deletion-vectors")
        if column_mapping or dropped_columns:
            reader_feats.add("column-mapping")
        if constraints:
            writer_feats.add("check-constraints")
        if generated:
            writer_feats.add("generated-columns")
        if properties.get("auto_compact"):
            writer_feats.add("auto-compaction")
        version = current + 1
        txns = self._txn_map(current)
        if txn:
            a, tv = txn["app_id"], txn["version"]
            txns[a] = tv if a not in txns else max(txns[a], tv)
        os.makedirs(self._manifest_dir, exist_ok=True)
        manifest = {
            "version": version,
            "operation": operation,
            "data_dirs": data_dirs,
            "partition_by": partition_by,
            # list = partition tuples this commit wrote/rewrote ([] = blind
            # append); None = full-table (overwrite/compact/unpartitioned
            # DML) — used by the rebase protocol's disjointness check.
            "touched_partitions": touched,
            # Delta txn pattern: {"app_id", "version"} for idempotent
            # replays (streaming foreachBatch records its batch id here).
            "txn": txn,
            # accumulated SetTransaction state: O(1) last_txn lookups
            "txns": txns,
            # CHECK constraints: {name: sql_expr}, enforced on every write
            "constraints": constraints,
            # generated columns: {col: sql_expr}, computed/validated on write
            "generated_columns": generated,
            # merge-on-read DELETE sidecars: parquet dirs of
            # (__file_path, __row_index) rows the snapshot excludes
            "deletion_vectors": deletion_vectors,
            # table properties (Delta TBLPROPERTIES): auto_compact,
            # auto_compact_min_files, target_file_bytes — see set_properties
            "properties": properties,
            # Delta column mapping: {logical: [physical aliases,
            # newest-first]} applied at read; renames never rewrite files
            "column_mapping": column_mapping,
            # dead names (DROP COLUMN): hidden from every read; a dropped
            # name stays dead — see drop_column's contract
            "dropped_columns": dropped_columns,
            # protocol features (Delta table-features analogue): reader =
            # "these bytes mean something extra", writer = "commits must
            # uphold an invariant"; monotone — see check_table_features
            "features": {
                "reader": sorted(reader_feats),
                "writer": sorted(writer_feats),
            },
            "committed_at": time.time(),
        }
        mpath = os.path.join(self._manifest_dir, f"v{version:08d}.json")
        # ATOMIC CLAIM: the manifest content is fully written (and synced)
        # to a temp file first, then os.link() publishes it under the
        # version name — link is atomic and fails if the name exists, so
        # exactly one writer wins the version AND a manifest can never be
        # observed truncated (the old O_EXCL-create-then-dump left a
        # partial file owning the version if the writer died mid-dump).
        # The link IS the commit point; the _LATEST pointer below is a
        # cache that current_version() rolls forward over, so dying
        # anywhere after the link still yields a durable, visible commit
        # and dying before it yields exactly the pre-commit table.
        fd, tmp = tempfile.mkstemp(dir=self._manifest_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(manifest, f)
                f.flush()
                os.fsync(f.fileno())
            _crash_hook("manifest_tmp_written")
            try:
                os.link(tmp, mpath)
            except FileExistsError:
                raise ConcurrentWriteError(
                    f"{operation}: lost the race for v{version} "
                    f"(another writer committed it); re-read and retry"
                ) from None
            # POSIX: a new directory entry is only durable once the
            # PARENT DIRECTORY is fsynced — without this, a power loss
            # after the link could roll back an acknowledged commit
            # (the process-crash fault-injection tests cannot see this;
            # it is the power-failure half of the durability contract)
            dfd = os.open(self._manifest_dir, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass
        _crash_hook("manifest_linked")
        # atomic pointer swap: write temp file then rename
        fd, tmp = tempfile.mkstemp(dir=self._manifest_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._latest_path())
        return version

    def last_txn(self, app_id: str) -> int | None:
        """Highest transaction version committed for ``app_id`` (Delta's
        ``txnAppId``/``txnVersion`` idempotent-write pattern), or None.

        O(1): every commit carries the accumulated {app_id: version} map
        (Delta's SetTransaction state, which its checkpoints exist to
        serve) — a streaming writer's replay check reads ONE manifest,
        never the whole log; at 100k commits the walk this replaces is
        the difference between a microbatch and a pause. Tables whose
        head predates the map fall back to the walk once."""
        if not self.exists():
            return None
        m = self._manifest(self.current_version())
        if "txns" in m:
            return m["txns"].get(app_id)
        last = None
        for h in self.history():
            t = h.get("txn")
            if t and t.get("app_id") == app_id:
                last = t["version"] if last is None else max(last, t["version"])
        return last

    def _txn_map(self, current: int) -> dict:
        """Accumulated SetTransaction state as of ``current`` (building it
        by one walk for pre-map tables)."""
        if not current:
            return {}
        m = self._manifest(current)
        if "txns" in m:
            return dict(m["txns"])
        txns: dict[str, int] = {}
        for h in self.history():
            if h["version"] > current:
                break
            t = h.get("txn")
            if t:
                a, v = t["app_id"], t["version"]
                txns[a] = v if a not in txns else max(txns[a], v)
        return txns

    def _commit_rebasing(
        self,
        make_entries,
        operation: str,
        partition_by: list[str],
        base_version: int,
        touched: list[dict] | None,
        txn: dict | None = None,
        delta_check=None,
        blind: bool = False,
        max_retries: int = 5,
        properties: dict | None = None,
    ) -> int:
        """Commit with Delta-style logical conflict auto-resolution.

        ``make_entries(prior_manifest_or_None)`` rebuilds the manifest
        entry list against an arbitrary base. On ``ConcurrentWriteError``,
        the winners (manifests between our base and the new head) are
        examined: a blind append (``touched == []``) rebases over
        anything; a partition-scoped op rebases only if every winner
        recorded a touched-partition list disjoint from ours AND
        ``delta_check`` (given a DataFrame of only the winners' newly
        added data dirs — an incremental scan, never the full table)
        confirms the winner's new rows cannot affect our read set.
        Anything else re-raises: the caller must re-read and retry, since
        its rewritten data itself may be stale."""
        base = base_version
        last_err: ConcurrentWriteError | None = None
        for _ in range(max_retries + 1):
            try:
                return self._commit(
                    make_entries(self._manifest(base) if base else None),
                    operation,
                    partition_by,
                    base_version=base,
                    touched=touched,
                    txn=txn,
                    properties=properties,
                )
            except ConcurrentWriteError as err:
                last_err = err
                head = self.current_version() if self.exists() else 0
                if head <= base:
                    # manifest race without an advanced head (half-committed
                    # writer): nothing to rebase onto
                    raise
                winners = [self._manifest(v) for v in range(base + 1, head + 1)]
                # Metadata changes conflict with EVERYTHING (Delta
                # semantics): a winner that altered constraints or
                # generated columns invalidates this writer's pre-commit
                # validation/computation — even a blind append's rows may
                # lack a column the head now declares generated, or
                # violate a constraint it was never checked against.
                base_meta = self._manifest(base) if base else {}
                for w in winners:
                    if (
                        w.get("constraints", {}) != base_meta.get("constraints", {})
                        or w.get("generated_columns", {})
                        != base_meta.get("generated_columns", {})
                        or (w.get("properties") or {}).get("identity")
                        != (base_meta.get("properties") or {}).get("identity")
                    ):
                        raise ConcurrentWriteError(
                            f"{operation}: a concurrent commit changed table "
                            "metadata (constraints/generated columns/identity "
                            "watermark); re-read and retry so the write is "
                            "validated/allocated against it"
                        ) from err
                if not blind:
                    if touched is None:
                        raise  # full-table op: never auto-rebase
                    # partition-scoped op: every winner must have recorded
                    # a touched list disjoint from ours
                    mine = {_row_canon(r) for r in touched}
                    for w in winners:
                        w_touched = w.get("touched_partitions")
                        if w_touched is None:
                            raise
                        if mine & {_row_canon(r) for r in w_touched}:
                            raise
                    if delta_check is not None:
                        delta_df = self._winners_delta_df(base, winners)
                        if delta_df is not None and not delta_check(delta_df):
                            raise
                base = head
        raise last_err if last_err else ConcurrentWriteError(
            f"{operation}: exceeded rebase retries"
        )

    def _winners_delta_df(self, base: int, winners: list[dict]) -> DataFrame | None:
        """Union of data dirs the winners added beyond our base manifest —
        the winners' write delta, read raw (bounded by what they wrote)."""
        base_paths = (
            {_entry_path(e) for e in self._manifest(base)["data_dirs"]} if base else set()
        )
        new_paths: list[str] = []
        for w in winners:
            for e in w["data_dirs"]:
                p = _entry_path(e)
                if p not in base_paths and p not in new_paths:
                    new_paths.append(p)
        if not new_paths:
            return None
        dfs = [
            self.spark.read.option("mergeSchema", "true").parquet(p) for p in new_paths
        ]
        out = dfs[0]
        for other in dfs[1:]:
            out = out.unionByName(other, allowMissingColumns=True)
        return out

    def _new_data_dir(self) -> str:
        # Unique per writer (Delta-style GUID naming): two racing writers
        # must never share a data dir, or the loser's mode("overwrite")
        # write would clobber the winner's already-committed files before
        # the loser's _commit even runs. The manifest stores paths, so
        # nothing depends on version-number naming.
        n = self.current_version() + 1 if self.exists() else 1
        return os.path.join(self.root, "data", f"v{n:08d}-{uuid.uuid4().hex[:12]}")

    @staticmethod
    def _carry_prior_dirs(
        prior: dict, touched_rows: list[dict], new_dir: str | None
    ) -> list:
        """Manifest entries for a partition-pruned rewrite: every prior
        data dir passes through with ``touched_rows`` added to its
        exclusion mask; the new dir (holding the rewritten partitions) is
        appended unmasked. A prior dir whose physically-present partitions
        are ALL excluded contributes nothing to any future read, so its
        entry is dropped — which lets vacuum() reclaim the dir once the
        old versions age out, instead of storage growing monotonically.

        ``new_dir=None``: the rewrite produced no rows (a DELETE emptied
        every touched partition) — referencing the empty dir would make
        every later read fail parquet schema inference, so it is omitted
        and vacuum reclaims it."""
        pcols = prior["partition_by"]
        entries = []
        for e in prior["data_dirs"]:
            e = dict(e) if isinstance(e, dict) else {"path": e, "exclude": []}
            seen = {tuple(sorted(x.items())) for x in e.get("exclude", [])}
            extra = [t for t in touched_rows if tuple(sorted(t.items())) not in seen]
            e["exclude"] = e.get("exclude", []) + extra
            present = _dir_partition_tuples(e["path"], pcols)
            excluded = {_row_canon(x) for x in e["exclude"]}
            if present and present <= excluded:
                continue  # fully superseded: reclaimable by vacuum
            entries.append(e)
        if new_dir is not None:
            entries.append(new_dir)
        return entries

    def _file_inventory(self, manifest: dict) -> list[tuple]:
        """(dir, relpath, footer_stats|None) for every live parquet file of
        an unpartitioned snapshot. Entries carrying a ``live_files`` list
        (from a prior file-pruned DML) enumerate exactly those; plain dirs
        are walked. Control-plane: bounded by file count."""
        inv = []
        for e in manifest["data_dirs"]:
            dpath = _entry_path(e)
            stats = e.get("files", {}) if isinstance(e, dict) else {}
            if isinstance(e, dict) and e.get("live_files") is not None:
                rels = e["live_files"]
            else:
                rels = sorted(
                    os.path.relpath(os.path.join(root, n), dpath)
                    for root, _, names in os.walk(dpath)
                    for n in names
                    if n.endswith(".parquet")
                )
            for rel in rels:
                inv.append((dpath, rel, stats.get(rel)))
        return inv

    @staticmethod
    def _surviving_file_entries(prior: dict, untouched: list[tuple]) -> list:
        """Manifest entries carrying the untouched files forward by name —
        the files themselves are never copied (byte-identical pass-through,
        like Delta keeping unrewritten AddFiles in the log)."""
        by_dir: dict[str, list] = {}
        for dpath, rel, stats in untouched:
            by_dir.setdefault(dpath, []).append((rel, stats))
        return [
            {
                "path": dpath,
                "live_files": [r for r, _ in rels],
                "files": {r: s for r, s in rels if s},
            }
            for dpath, rels in by_dir.items()
        ]

    def _touched_partitions(self, df, pcols: list[str]) -> list[dict]:
        """Distinct partition tuples present in ``df`` (control-plane
        collect — bounded by partition count, never data volume)."""
        touched = {
            tuple(_part_key(v) for v in r) for r in df.select(*pcols).distinct().collect()
        }
        return [dict(zip(pcols, t)) for t in sorted(touched, key=str)]

    # ---------------- CHECK constraints (Delta invariants) ----------------

    def constraints(self) -> dict[str, str]:
        """Current CHECK constraints ({name: sql_expr})."""
        if not self.exists():
            return {}
        return self._manifest(self.current_version()).get("constraints", {})

    def _enforce_constraints(
        self, df: DataFrame, cons: dict[str, str] | None = None
    ) -> None:
        """Reject ``df`` if any row violates any current constraint (or
        the explicit ``cons`` dict, for writes that set constraints in
        the same commit).

        One Spark job regardless of constraint count: a single aggregate
        computes a violation flag per constraint (NULL-evaluating rows
        violate, matching Delta — a CHECK must be provably TRUE). At
        100 TB this is a map-side-combined boolean agg over the incoming
        batch only, never the table.

        Determinism caveat: validating a DataFrame re-evaluates its plan,
        so for a non-deterministic input the rows checked here may differ
        from the rows a later write materializes. The bulk-ingest paths
        (overwrite/append) therefore validate AFTER the write via
        ``_enforce_constraints_on_entry`` (the written bytes themselves);
        the DML rewrite paths (merge/update/backfill) keep the pre-write
        check and assume a deterministic source frame — their inputs are
        table scans plus caller data, and a non-deterministic caller
        source should be materialized (e.g. localCheckpoint) first."""
        import pyspark.sql.functions as F

        cons = self.constraints() if cons is None else cons
        if not cons:
            return
        names = sorted(cons)
        row = df.agg(
            *[
                F.max(
                    (~F.coalesce(F.expr(cons[n]), F.lit(False))).cast("int")
                ).alias(f"c{i}")
                for i, n in enumerate(names)
            ]
        ).first()
        violated = {
            n: cons[n] for i, n in enumerate(names) if (row[f"c{i}"] or 0) > 0
        }
        if violated:
            raise ConstraintViolationError(self.root, violated)

    def _enforce_constraints_on_entry(
        self, entry: dict, cons: dict[str, str] | None = None
    ) -> None:
        """Enforce CHECK constraints on the rows actually WRITTEN — a
        re-scan of the freshly-written data dir — instead of the incoming
        DataFrame. A non-deterministic input (rand()-derived columns, a
        source that changed between jobs) can evaluate differently in a
        pre-write validation job vs the write itself, letting a
        violating row slip into the commit; Delta closes this by
        enforcing invariants during the write, and scanning the written
        bytes BEFORE publishing the manifest gives the same guarantee:
        what is validated is bit-identical to what readers will see
        (including hive-partition round-tripping). On violation the
        orphan dir is removed and nothing is committed."""
        cons = self.constraints() if cons is None else cons
        if not cons:
            return
        d = entry["path"]
        has_files = any(
            name.endswith(".parquet")
            for _, _, files in os.walk(d)
            for name in files
        )
        if not has_files:  # empty batch: nothing to violate
            return
        try:
            self._enforce_constraints(self.spark.read.parquet(d), cons)
        except ConstraintViolationError:
            import shutil

            shutil.rmtree(d, ignore_errors=True)
            raise

    def generated_columns(self) -> dict[str, str]:
        """Current generated-column definitions ({col: sql_expr})."""
        if not self.exists():
            return {}
        return self._manifest(self.current_version()).get("generated_columns", {})

    def add_generated_column(self, col: str, expr: str) -> int:
        """Delta ``GENERATED ALWAYS AS (expr)``: registers ``col`` so
        every future write either computes it (when the writer omits it)
        or validates the provided values against the expression (writer-
        supplied values that disagree are rejected — Delta semantics).
        Existing rows are backfilled in a copy-on-write commit."""
        if not self.exists():
            raise ValueError("add_generated_column: table does not exist yet")
        import pyspark.sql.functions as F

        prior = self._manifest(self.current_version())
        gen = dict(prior.get("generated_columns", {}))
        if col in gen:
            raise ValueError(f"generated column {col!r} already defined")
        snap = self.read()
        if col in snap.columns:
            raise ValueError(
                f"column {col!r} already exists with writer-authored data; "
                "a generated column cannot shadow it (Delta rejects this too)"
            )
        gen[col] = expr
        backfilled = snap.withColumn(col, F.expr(expr))
        entry = self._write_dir_entry(backfilled, prior["partition_by"])
        return self._commit(
            [entry],
            "add_generated_column",
            prior["partition_by"],
            base_version=prior["version"],
            deletion_vectors=[],
            generated=gen,
        )

    def _apply_generated(
        self, df: DataFrame, gen: dict[str, str] | None = None
    ) -> DataFrame:
        """Compute absent generated columns; validate supplied ones (one
        aggregate job for all disagreements, like constraint checks).
        Callers holding a manifest pass its definitions to avoid a second
        manifest read racing the commit base."""
        import pyspark.sql.functions as F

        gen = self.generated_columns() if gen is None else gen
        if not gen:
            return df
        supplied = [c for c in gen if c in df.columns]
        if supplied:
            row = df.agg(
                *[
                    F.max(
                        (~F.col(c).eqNullSafe(F.expr(gen[c]))).cast("int")
                    ).alias(f"g{i}")
                    for i, c in enumerate(supplied)
                ]
            ).first()
            bad = {
                c: gen[c]
                for i, c in enumerate(supplied)
                if (row[f"g{i}"] or 0) > 0
            }
            if bad:
                raise ConstraintViolationError(
                    self.root,
                    {f"generated:{c}": f"{c} = {e}" for c, e in bad.items()},
                )
        for c, e in gen.items():
            if c not in df.columns:
                df = df.withColumn(c, F.expr(e))
        return df

    def set_identity(self, col: str, start: int = 1, step: int = 1) -> int:
        """``GENERATED BY DEFAULT AS IDENTITY`` (Delta identity columns):
        writes fill ``col`` wherever it is NULL or absent with fresh
        64-bit values, allocated monotonically above a high-watermark
        kept in table properties. BY DEFAULT semantics: explicitly
        supplied values pass through (Delta's GENERATED ALWAYS variant
        forbids them; the BY DEFAULT variant is what CDC/backfill flows
        need). Values are UNIQUE and ascending across commits but NOT
        dense — allocation is map-side (``monotonically_increasing_id``
        ranges per partition, exactly why Delta documents identity gaps),
        and the watermark advances from the written files' footer stats,
        so generation costs zero extra Spark jobs.

        Concurrency: the watermark is table metadata — two writers
        allocating from the same base would mint the same ids, so a
        concurrent identity-watermark change conflicts with EVERYTHING
        (the rebase protocol's metadata check); the loser re-reads and
        re-allocates. If the table already has data in ``col``, the
        watermark starts above the existing maximum."""
        if not self.exists():
            raise ValueError("set_identity: table does not exist yet")
        if step < 1:
            raise ValueError("set_identity: step must be a positive integer")
        prior = self._manifest(self.current_version())
        props = dict(prior.get("properties", {}))
        if props.get("identity"):
            raise ValueError(
                f"set_identity: identity already configured on "
                f"{props['identity']['col']!r}"
            )
        hwm = start
        if col in self.read().columns:
            import pyspark.sql.functions as F

            row = self.read().agg(F.max(col).alias("m")).first()
            if row["m"] is not None:
                hwm = max(start, int(row["m"]) + step)
        props["identity"] = {
            "col": col,
            "start": start,
            "step": step,
            "high_watermark": hwm,
        }
        return self._commit(
            prior["data_dirs"],
            "set-identity",
            prior["partition_by"],
            base_version=prior["version"],
            properties=props,
        )

    def _apply_identity(self, df: DataFrame, prior: dict) -> DataFrame:
        """Fill the identity column's NULL/absent slots with fresh values
        above the watermark (map-side, no shuffle, no extra job)."""
        ident = (prior.get("properties") or {}).get("identity")
        if not ident:
            return df
        import pyspark.sql.functions as F

        col, step, base = ident["col"], ident["step"], ident["high_watermark"]
        gen = (
            F.lit(base).cast("long")
            + F.lit(step).cast("long") * F.monotonically_increasing_id()
        )
        if col not in df.columns:
            return df.withColumn(col, gen)
        return df.withColumn(
            col, F.coalesce(F.col(col).cast("long"), gen)
        )

    def _identity_props_after(self, prior: dict, new_dirs: list[str]) -> dict | None:
        """Post-write properties with the identity watermark advanced past
        every value in ``new_dirs`` — read from parquet FOOTERS (same
        control-plane walk the stats collector does), never the data.
        None when no identity is configured (callers pass it straight to
        _commit, where None means carry-forward)."""
        props = dict(prior.get("properties", {}))
        ident = props.get("identity")
        if not ident:
            return None
        col, step = ident["col"], ident["step"]
        hi = ident["high_watermark"]
        observed = None
        for d in new_dirs:
            for stats in _collect_file_stats(d).values():
                fs = stats.get(col)
                if fs and fs[1] is not None:
                    v = int(fs[1])
                    observed = v if observed is None else max(observed, v)
        if observed is not None:
            hi = max(hi, observed + step)
        props["identity"] = {**ident, "high_watermark": hi}
        return props

    # ---------------- bloom filter indexes ----------------

    def create_bloom_index(
        self, col: str, fpp: float = 0.01, max_keys_per_file: int = 100_000
    ) -> int:
        """CREATE BLOOMFILTER INDEX (Databricks Delta parity): point
        lookups on high-entropy columns (uuids, hashed keys) where min/max
        footer stats prune nothing — every file's [min,max] spans the
        whole domain — get file-level skipping from a per-file Bloom
        filter instead.

        Semantics match Delta's: the index is table metadata; files
        written AFTER creation carry blooms (a ``_bloom.json`` sidecar
        inside each data dir — Spark's scan ignores ``_``-prefixed files),
        pre-existing files stay bloom-less and simply aren't pruned;
        ``compact()``/``optimize()`` rewrites are the backfill path.
        Equality bounds in :meth:`read_skipping` consult the blooms after
        min/max. Native parquet row-group blooms are also enabled for the
        column at write time, so files that survive file-level skipping
        still row-group-skip inside the scan.

        Scale: the bitmap is sized from ``fpp``/``max_keys_per_file``
        (Delta's ``fpp``/``numItems``), built by one distributed pass over
        the written files (hash positions map-side, one bitmap per file
        assembled in an Arrow-batched group), and stored at m/8 bytes per
        file — the same write-amortized cost model as Delta's index files."""
        if not self.exists():
            raise ValueError("create_bloom_index: table does not exist yet")
        if not (0.0 < fpp < 1.0):
            raise ValueError("create_bloom_index: fpp must be in (0, 1)")
        prior = self._manifest(self.current_version())
        if col in (prior.get("partition_by") or []):
            raise ValueError(
                "create_bloom_index: partition columns are pruned by "
                "partition values already; a bloom adds nothing"
            )
        props = dict(prior.get("properties", {}))
        idx = dict(props.get("bloom_index", {}))
        if col in idx:
            raise ValueError(f"create_bloom_index: {col!r} already indexed")
        m, k = _bloom_size(max_keys_per_file, fpp)
        idx[col] = {"fpp": fpp, "m": m, "k": k}
        props["bloom_index"] = idx
        return self._commit(
            prior["data_dirs"],
            "create-bloom-index",
            prior["partition_by"],
            base_version=prior["version"],
            properties=props,
        )

    def _bloom_config(self) -> dict:
        """{col: {fpp,m,k}} for the current version ({} pre-creation)."""
        if not self.exists():
            return {}
        return (
            self._manifest(self.current_version())
            .get("properties", {})
            .get("bloom_index", {})
        )

    def _write_bloom_sidecar(self, d: str, cols: list[str]) -> None:
        """Build per-file Bloom bitmaps for every indexed column present
        in the freshly-written dir ``d`` and drop them in a ``_bloom.json``
        sidecar (lives inside the dir: vacuum reclaims it with the data,
        shallow clones see it, Spark scans ignore it).

        One Spark job: positions are map-side (k seeded xxhash64 of the
        value's string form — string so the read-side literal probe casts
        identically regardless of the literal's Python type), bitmaps
        assemble per (file, col) group in Arrow batches, and only the
        m/8-byte base64 strings come back to the driver."""
        import base64

        import pyspark.sql.functions as F

        cfg = {c: p for c, p in self._bloom_config().items() if c in cols}
        if not cfg:
            return
        back = self.spark.read.parquet(d)
        parts = []
        for c, p in cfg.items():
            if c not in back.columns:
                continue
            pos = [
                F.pmod(
                    F.xxhash64(F.col(c).cast("string"), F.lit(i)), F.lit(p["m"])
                )
                for i in range(p["k"])
            ]
            parts.append(
                back.filter(F.col(c).isNotNull()).select(
                    F.col("_metadata.file_path").alias("f"),
                    F.lit(c).alias("col"),
                    F.explode(F.array(*pos)).alias("pos"),
                )
            )
        if not parts:
            return
        union = parts[0]
        for extra in parts[1:]:
            union = union.unionByName(extra)
        m_by_col = {c: p["m"] for c, p in cfg.items()}

        def build(key, pdf):
            import numpy as np
            import pandas as pd

            m = m_by_col[key[1]]
            arr = np.zeros((m + 7) // 8, dtype=np.uint8)
            pp = pdf["pos"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(arr, pp >> 3, (1 << (pp & 7)).astype(np.uint8))
            return pd.DataFrame(
                {
                    "f": [key[0]],
                    "col": [key[1]],
                    "b64": [base64.b64encode(arr.tobytes()).decode()],
                }
            )

        rows = (
            union.groupBy("f", "col")
            .applyInPandas(build, "f string, col string, b64 string")
            .collect()
        )
        files: dict[str, dict] = {}
        for r in rows:
            rel = os.path.relpath(_local_path(r["f"]), d)
            files.setdefault(rel, {})[r["col"]] = r["b64"]
        sidecar = {"cols": cfg, "files": files}
        with open(os.path.join(d, _BLOOM_SIDECAR), "w") as f:
            json.dump(sidecar, f)

    def _load_bloom(self, d: str) -> dict | None:
        try:
            with open(os.path.join(d, _BLOOM_SIDECAR)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _bloom_probe_positions(self, cfg: dict, value) -> list[int]:
        """The k bit positions the write side set for ``value`` — computed
        with the SAME Spark expressions (xxhash64 over the string cast) in
        a 1-row control-plane job, so engine hash semantics can't drift
        between writer and prober."""
        import pyspark.sql.functions as F

        exprs = [
            F.pmod(
                F.xxhash64(F.lit(value).cast("string"), F.lit(i)),
                F.lit(cfg["m"]),
            ).alias(f"p{i}")
            for i in range(cfg["k"])
        ]
        row = self.spark.range(1).select(*exprs).first()
        return [row[f"p{i}"] for i in range(cfg["k"])]

    def column_mapping(self) -> dict[str, list[str]]:
        """Current {logical: [physical aliases]} rename mapping."""
        if not self.exists():
            return {}
        return self._manifest(self.current_version()).get("column_mapping", {})

    def dropped_columns(self) -> list[str]:
        """Names hidden by DROP COLUMN (dead names — see drop_column)."""
        if not self.exists():
            return []
        return self._manifest(self.current_version()).get("dropped_columns", [])

    def rename_column(self, old: str, new: str) -> int:
        """``ALTER TABLE RENAME COLUMN`` without rewriting a byte (Delta
        column mapping, name mode): a metadata-only commit records
        ``new -> [old, ...older aliases]``; every read — snapshot, time
        travel within this version, CDF — serves existing files' physical
        ``old`` under the logical ``new``, and new writes use ``new``
        directly. Old data and post-rename data coexist; a later frame
        carrying BOTH names keeps them distinct (the alias rename only
        applies when the logical name is absent).

        Partition columns are refused: their name is baked into hive
        paths and every partition-pruning mask — renaming one is a
        rewrite, not metadata. Time travel to pre-rename versions shows
        the old name (the mapping lives in the manifest it was committed
        to, exactly like Delta)."""
        if not self.exists():
            raise ValueError("rename_column: table does not exist yet")
        prior = self._manifest(self.current_version())
        if old in prior["partition_by"]:
            raise ValueError(
                f"rename_column({old!r}): partition columns are baked into "
                "hive paths and pruning masks; rewrite the table instead"
            )
        cur_cols = self.read().columns
        if old not in cur_cols:
            raise ValueError(f"rename_column: no column {old!r} in {cur_cols}")
        mapping = {k: list(v) for k, v in prior.get("column_mapping", {}).items()}
        dropped = prior.get("dropped_columns", [])
        reserved = (
            set(cur_cols)
            | set(dropped)
            | set(mapping)
            | {a for als in mapping.values() for a in als}
        )
        if new in reserved:
            raise ValueError(f"rename_column: name {new!r} already in use")
        mapping[new] = [old] + mapping.pop(old, [])
        return self._commit(
            prior["data_dirs"],
            "rename-column",
            prior["partition_by"],
            base_version=prior["version"],
            column_mapping=mapping,
        )

    def drop_column(self, name: str) -> int:
        """``ALTER TABLE DROP COLUMN`` without rewriting a byte: a
        metadata-only commit adds the name (and its rename aliases) to
        the dead list; reads hide it everywhere. CONTRACT: a dropped
        name stays dead — re-introducing it via schema evolution is
        hidden too (this engine maps columns by NAME, not by Delta's
        field ids, so resurfacing old bytes under a recycled name cannot
        be told apart from the dropped column; dead-forever is the safe
        semantics and it is enforced rather than documented away).
        Pick a fresh name instead."""
        if not self.exists():
            raise ValueError("drop_column: table does not exist yet")
        prior = self._manifest(self.current_version())
        if name in prior["partition_by"]:
            raise ValueError(f"drop_column({name!r}): cannot drop a partition column")
        cur_cols = self.read().columns
        if name not in cur_cols:
            raise ValueError(f"drop_column: no column {name!r} in {cur_cols}")
        mapping = {k: list(v) for k, v in prior.get("column_mapping", {}).items()}
        dead = [name] + mapping.pop(name, [])
        dropped = list(prior.get("dropped_columns", []))
        dropped += [c for c in dead if c not in dropped]
        return self._commit(
            prior["data_dirs"],
            "drop-column",
            prior["partition_by"],
            base_version=prior["version"],
            column_mapping=mapping,
            dropped_columns=dropped,
        )

    def add_constraint(self, name: str, expr: str) -> int:
        """``ALTER TABLE ADD CONSTRAINT name CHECK (expr)``: validates all
        EXISTING rows first (as Delta does), then commits a metadata-only
        version carrying the prior data dirs unchanged."""
        if not self.exists():
            raise ValueError("add_constraint: table does not exist yet")
        cons = self.constraints()
        if name in cons:
            raise ValueError(f"constraint {name!r} already exists")
        import pyspark.sql.functions as F

        bad = self.read().filter(~F.coalesce(F.expr(expr), F.lit(False)))
        if not bad.isEmpty():
            raise ConstraintViolationError(self.root, {name: expr})
        prior = self._manifest(self.current_version())
        return self._commit(
            prior["data_dirs"],
            "add_constraint",
            prior["partition_by"],
            base_version=prior["version"],
            constraints={**cons, name: expr},
        )

    def drop_constraint(self, name: str) -> int:
        """``ALTER TABLE DROP CONSTRAINT``: metadata-only commit."""
        cons = self.constraints()
        if name not in cons:
            raise ValueError(f"no such constraint {name!r}")
        prior = self._manifest(self.current_version())
        return self._commit(
            prior["data_dirs"],
            "drop_constraint",
            prior["partition_by"],
            base_version=prior["version"],
            constraints={k: v for k, v in cons.items() if k != name},
        )

    def drop_feature(self, name: str) -> int:
        """``ALTER TABLE DROP FEATURE`` (Delta 3.x): remove a protocol
        feature so old clients can use the table again — allowed only
        when the CURRENT snapshot no longer exercises the capability
        (deletion vectors compacted away, column mapping absent, ...);
        a drop that would make the manifest lie about its own content is
        refused (and the commit path would silently re-add it anyway —
        see ``_commit``'s features_override).

        Historical versions keep requiring the feature: time travel to
        them stays gated. Delta resolves the same problem by truncating
        history at drop time; keeping the history but keeping it gated
        is strictly more informative (the data is still there for a
        capable client)."""
        if not self.exists():
            raise ValueError("drop_feature: table does not exist yet")
        prior = self._manifest(self.current_version())
        feats = prior.get("features", {})
        reader = set(feats.get("reader", []))
        writer = set(feats.get("writer", []))
        if name not in reader | writer:
            raise ValueError(f"table does not carry feature {name!r}")
        exercised = {
            "deletion-vectors": bool(prior.get("deletion_vectors")),
            "column-mapping": bool(
                prior.get("column_mapping") or prior.get("dropped_columns")
            ),
            "check-constraints": bool(prior.get("constraints")),
            "generated-columns": bool(prior.get("generated_columns")),
            "auto-compaction": bool(
                (prior.get("properties") or {}).get("auto_compact")
            ),
        }
        if exercised.get(name):
            raise ValueError(
                f"cannot drop feature {name!r}: the current snapshot still "
                "exercises it (compact/purge or remove the metadata first)"
            )
        return self._commit(
            prior["data_dirs"],
            "drop_feature",
            prior["partition_by"],
            base_version=prior["version"],
            features_override=(reader - {name}, writer - {name}),
        )

    # ---------------- writers (K1-K6) ----------------

    def _write_dir_entry(self, df: DataFrame, partition_by: list[str]):
        """Write ``df`` into a fresh uniquely-named data dir; return the
        manifest entry. Every dir carries per-file footer min/max stats
        (Delta data-skipping analogue): unpartitioned DML file-prunes on
        them, and read_skipping() uses them on the query side — for
        partitioned dirs the file keys are hive-relative paths, so
        partition values ride along for path-level pruning too. (The
        partition-pruned DML rewrite paths write their dirs directly and
        stay stats-less; reads fall back to plain filters there.)"""
        d = self._new_data_dir()
        w = df.write.mode("overwrite")
        bloom_cols = [c for c in self._bloom_config() if c in df.columns]
        for c in bloom_cols:
            # native parquet row-group blooms ride along for free: scans
            # that survive file-level skipping still skip row groups on
            # pushed-down equality predicates
            w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(d)
        if bloom_cols and not partition_by:
            # file-level bloom sidecar (unpartitioned dirs only — the
            # partitioned read path prunes on partition values; its
            # interior columns keep the row-group blooms above)
            self._write_bloom_sidecar(d, bloom_cols)
        return {"path": d, "files": _collect_file_stats(d)}

    @classmethod
    def convert_from_parquet(
        cls,
        spark: SparkSession,
        path: str,
        partition_by: list[str] | None = None,
    ) -> "LakeTable":
        """CONVERT TO DELTA (in-place, zero-copy): promote an existing
        plain-parquet directory to a LakeTable by writing a v1 manifest
        that REFERENCES the files where they lie — no byte is copied or
        rewritten. Footer min/max stats are collected during the convert
        (one footer read per file, Delta's convert does the same), so
        data skipping and file-pruned DML work immediately; every DML /
        time-travel / CDF / streaming capability then applies on top.

        ``partition_by`` must name the hive layout the directory already
        uses (Delta's ``CONVERT TO DELTA ... PARTITIONED BY`` contract);
        it is validated against the actual paths — a mismatch raises
        before any manifest is written.

        The manifest pins the CURRENT file list (``live_files``): files
        dropped into the directory after the convert are invisible, the
        same isolation Delta's log gives. Later commits write under
        ``<path>/data`` as usual; vacuum never reclaims the original
        directory itself (it only sweeps ``data/``) — the converted
        files are simply aged out of manifests when superseded."""
        t = cls(spark, path)
        if t.exists():
            raise ValueError(f"{path} is already a LakeTable (manifest present)")
        stats = _collect_file_stats(path)
        if not stats:
            raise ValueError(f"{path} contains no parquet files to convert")
        pcols = partition_by or []
        for rel in stats:
            segs = rel.split(os.sep)[:-1]
            hive = [s.split("=", 1)[0] for s in segs if "=" in s]
            if hive != pcols:
                raise ValueError(
                    f"convert_from_parquet(partition_by={pcols}): file "
                    f"{rel!r} has hive layout {hive} — pass the directory's "
                    "actual partition columns"
                )
        entry = {"path": path, "live_files": sorted(stats), "files": stats}
        t._commit([entry], "convert", pcols)
        return t

    def overwrite(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        txn: dict | None = None,
        constraints: dict[str, str] | None = None,
    ) -> int:
        """K1/K4: full overwrite (schema evolution implicit — the new
        version's parquet schema wins). Never auto-rebases: replace-all
        semantics racing any other writer must surface.

        ``constraints`` sets the table's CHECK constraints in the SAME
        commit (CREATE TABLE .. WITH CONSTRAINTS shape): the incoming
        rows are validated against them in one aggregate — cheaper than
        overwrite + per-constraint add_constraint, which would re-scan
        the table once per constraint and burn a commit each."""
        partition_by = partition_by or []
        base = self.current_version() if self.exists() else 0
        base_m = self._manifest(base) if base else {}
        df = self._apply_generated(df, base_m.get("generated_columns", {}))
        df = self._apply_identity(df, base_m)
        entry = self._write_dir_entry(df, partition_by)
        # post-write validation (see _enforce_constraints_on_entry: checks
        # the written bytes, immune to non-deterministic inputs); explicit
        # same-commit constraints merge into one aggregate pass
        self._enforce_constraints_on_entry(
            entry,
            {
                **(self.constraints() if self.exists() else {}),
                **(constraints or {}),
            },
        )
        return self._commit(
            [entry], "overwrite", partition_by, base_version=base, txn=txn,
            constraints=constraints,
            deletion_vectors=[],
            properties=self._identity_props_after(base_m, [entry["path"]]),
        )

    def append(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        schema_mode: str = "merge",
        txn: dict | None = None,
    ) -> int:
        """K2/K3: append — new version references prior data dirs plus the
        new one (no rewrite of existing files). Blind add: on a concurrent
        commit it auto-rebases onto the new head (Delta semantics — blind
        appends read nothing, so they conflict with nothing).

        ``schema_mode``: ``"merge"`` (default here — reads use
        mergeSchema/unionByName, so evolution is implicit) or
        ``"strict"`` (Delta's default posture: reject new columns and
        type changes before anything is written; schema comparison reads
        parquet footers only, never data)."""
        if not self.exists():
            return self.overwrite(df, partition_by, txn=txn)
        if schema_mode == "strict":
            current = {f.name: f.dataType.simpleString() for f in self.read().schema.fields}
            incoming = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            extra = sorted(set(incoming) - set(current))
            mismatched = sorted(
                c for c in incoming.keys() & current.keys() if incoming[c] != current[c]
            )
            if extra or mismatched:
                raise SchemaMismatchError(
                    f"append to {self.root} under schema_mode='strict': "
                    f"new columns {extra}, type changes "
                    f"{[(c, current[c], incoming[c]) for c in mismatched]}"
                )
        elif schema_mode != "merge":
            raise ValueError(f"schema_mode must be 'merge' or 'strict', got {schema_mode!r}")
        prior = self._manifest(self.current_version())
        partition_by = partition_by or prior["partition_by"]
        if partition_by != prior["partition_by"]:
            # Delta parity: appends cannot change the partitioning scheme
            # (mixed hive layouts would break mask-based DML pruning);
            # repartitioning a table is an explicit overwrite.
            raise SchemaMismatchError(
                f"append to {self.root}: partition_by={partition_by} differs "
                f"from the table's {prior['partition_by']}; use overwrite() "
                "to change partitioning"
            )
        df = self._apply_generated(df, prior.get("generated_columns", {}))
        df = self._apply_identity(df, prior)
        entry = self._write_dir_entry(df, partition_by)
        self._enforce_constraints_on_entry(entry)
        # Record the partitions this append wrote (filesystem walk of the
        # freshly-written dir — no extra Spark job) so OTHER writers'
        # disjointness checks see them; the append itself rebases blindly.
        touched = (
            [dict(t) for t in sorted(_dir_partition_tuples(_entry_path(entry), partition_by), key=str)]
            if partition_by
            else []
        )
        v = self._commit_rebasing(
            lambda head: (head["data_dirs"] if head else []) + [entry],
            "append",
            partition_by,
            base_version=prior["version"],
            touched=touched,
            txn=txn,
            blind=True,
            properties=self._identity_props_after(prior, [entry["path"]]),
        )
        if self.properties().get("auto_compact"):
            # follow-up physical-only commit; the append above is already
            # durable and its version is what we return
            self._auto_compact()
        return v

    def merge(
        self,
        updates: DataFrame,
        keys: list[str],
        txn: dict | None = None,
        _delete_keys: DataFrame | None = None,
        _operation: str = "merge",
    ) -> int:
        """K5/K6: MERGE upsert with create-if-absent fallback (reference
        src/glue_etl.py:439-497, Delta ``whenMatchedUpdateAll /
        whenNotMatchedInsertAll``).

        Partition-pruned copy-on-write (the Delta-at-scale behavior: rewrite
        only matched files, never the whole table): the set of *touched*
        partitions is the union of the updates' partition values and the
        partitions of target rows whose keys match an update (so a key that
        moved partitions is still rewritten, exactly like Delta's
        touched-file inner join). Only those partitions are read, merged,
        and rewritten into the new data dir; every other partition's files
        pass through into the new manifest untouched — at 100 TB a daily
        increment rewrites only the partitions it lands in.

        Unpartitioned tables use FILE-level pruning instead (Delta's data
        skipping): per-file footer min/max stats recorded at write time
        narrow the candidate files by key range, then one column-pruned
        scan of only the candidates finds the exactly-touched files
        (Delta's touched-file inner join); every other file passes through
        into the new manifest untouched, byte-identical.

        Schema evolution (Delta ``withSchemaEvolution()`` semantics,
        SURVEY K4): updates may carry NEW columns — merged/inserted rows
        store them, untouched partitions/files pass through under their
        old schema (never rewritten for a metadata change), and the read
        path's mergeSchema/unionByName serves old rows with NULLs in the
        new columns. Contract locked by
        tests/test_lake_table.py::test_merge_schema_evolution_new_column.

        ``_delete_keys`` (internal, used by :meth:`apply_changes`): a
        key-columns frame whose rows are REMOVED in the same commit —
        the touched-partition/file discovery spans both key sets, and
        the rewritten slice is anti-joined before writing, so a CDC
        batch of upserts + deletes lands as one pruned commit.
        """
        import pyspark.sql.functions as F

        if not self.exists():
            return self.overwrite(updates, txn=txn)
        prior = self._manifest(self.current_version())
        self._reject_cow_with_dvs(prior, "merge")
        updates = self._apply_generated(updates, prior.get("generated_columns", {}))
        if (prior.get("properties") or {}).get("identity"):
            # MERGE + identity: matched keys must KEEP the target row's id
            # (the update payload usually omits it), only true inserts
            # allocate — so carry target ids over by key first, then fill
            ident = prior["properties"]["identity"]
            icol = ident["col"]
            tgt_ids = self.read().select(*keys, F.col(icol).alias("__tgt_id"))
            if icol not in updates.columns:
                updates = updates.withColumn(icol, F.lit(None).cast("long"))
            updates = (
                updates.join(tgt_ids, on=keys, how="left")
                .withColumn(icol, F.coalesce(F.col(icol).cast("long"), F.col("__tgt_id")))
                .drop("__tgt_id")
            )
            updates = self._apply_identity(updates, prior)
        self._enforce_constraints(updates)
        key_frame = updates.select(*keys)
        if _delete_keys is not None:
            key_frame = key_frame.unionByName(_delete_keys.select(*keys))
        key_frame = key_frame.distinct()
        pcols = prior["partition_by"]
        if not pcols:
            inventory = self._file_inventory(prior)
            # key ranges of the updates: one tiny agg (collects 1 row)
            rng = key_frame.agg(
                *[F.min(k).alias(f"{k}__lo") for k in keys],
                *[F.max(k).alias(f"{k}__hi") for k in keys],
            ).first()
            key_ranges = {}
            for k in keys:
                lo, hi = rng[f"{k}__lo"], rng[f"{k}__hi"]
                if isinstance(lo, (int, float, str, bool)) and isinstance(
                    hi, (int, float, str, bool)
                ):
                    key_ranges[k] = (lo, hi)
            candidates = [
                f for f in inventory if _ranges_intersect(f[2], key_ranges)
            ]
            # exact touched-file check (Delta's matched-file join): scan
            # only the candidates, key columns only, semi-join the updates
            touched_paths: set[str] = set()
            if candidates:
                cand_paths = [os.path.join(d_, rel) for d_, rel, _ in candidates]
                scan = _apply_column_mapping(
                    self.spark.read.option("mergeSchema", "true").parquet(
                        *cand_paths
                    ),
                    prior.get("column_mapping", {}),
                    prior.get("dropped_columns", []),
                ).select(*keys, F.input_file_name().alias("__file"))
                hit = (
                    scan.join(key_frame, on=keys, how="left_semi")
                    .select("__file")
                    .distinct()
                    .collect()
                )
                touched_paths = {_local_path(r["__file"]) for r in hit}
            touched = [
                f
                for f in candidates
                if os.path.abspath(os.path.join(f[0], f[1])) in touched_paths
            ]
            target = (
                _apply_column_mapping(
                    self.spark.read.option("mergeSchema", "true").parquet(
                        *[os.path.join(d_, rel) for d_, rel, _ in touched]
                    ),
                    prior.get("column_mapping", {}),
                    prior.get("dropped_columns", []),
                )
                if touched
                else self.read().limit(0)
            )
            merged = merge_upsert(target, updates, keys)
            if _delete_keys is not None:
                merged = merged.join(_delete_keys, on=keys, how="left_anti")
            entry = self._write_dir_entry(merged, [])
            untouched = [f for f in inventory if f not in touched]
            # a CDC batch can delete every touched row: a fileless dir
            # must not enter the manifest (parquet schema inference fails)
            new_entries = [entry] if entry["files"] else []
            v = self._commit(
                self._surviving_file_entries(prior, untouched) + new_entries,
                _operation,
                pcols,
                base_version=prior["version"],
                txn=txn,
                properties=self._identity_props_after(prior, [entry["path"]]),
            )
            if self.properties().get("auto_compact"):
                self._auto_compact()
            return v

        target = self.read()
        # Touched partitions: the updates' own partitions plus partitions
        # of target rows whose keys match (key-column-pruned semi-join —
        # one slim shuffle), so a key that moved partitions is rewritten.
        tgt_matched = target.join(key_frame, on=keys, how="left_semi")
        touched_rows = self._touched_partitions(
            updates.select(*pcols).unionByName(tgt_matched.select(*pcols)), pcols
        )

        merged = merge_upsert(
            target.filter(_partition_predicate(pcols, touched_rows)), updates, keys
        )
        if _delete_keys is not None:
            merged = merged.join(_delete_keys, on=keys, how="left_anti")
        d = self._new_data_dir()
        merged.write.mode("overwrite").partitionBy(*pcols).parquet(d)
        # a CDC batch can delete every row of the touched partitions: a
        # fileless dir must not enter the manifest (same hazard as DELETE)
        if not any(
            name.endswith(".parquet")
            for _b, _d2, files in os.walk(d)
            for name in files
        ):
            d = None

        # Prior dirs pass through with the touched partitions masked out;
        # read() turns the mask into a partition-pruning filter, so those
        # directories are skipped at scan planning, not scanned-and-dropped.
        # On a concurrent commit: auto-rebase iff every winner touched
        # disjoint partitions and its new data contains none of our merge
        # keys (incremental scan of the winners' delta only).
        upd_keys = key_frame

        def _no_key_overlap(winners_delta: DataFrame) -> bool:
            cols = set(winners_delta.columns)
            if not set(keys) <= cols:
                return True  # winner's data has no key columns: can't match
            return (
                winners_delta.select(*keys).join(upd_keys, on=keys, how="left_semi").isEmpty()
            )

        v = self._commit_rebasing(
            lambda head: self._carry_prior_dirs(head, touched_rows, d),
            _operation,
            pcols,
            base_version=prior["version"],
            touched=touched_rows,
            delta_check=_no_key_overlap,
            txn=txn,
            properties=self._identity_props_after(prior, [d] if d else []),
        )
        if self.properties().get("auto_compact"):
            self._auto_compact()
        return v

    def apply_changes(
        self,
        cdc: DataFrame,
        keys: list[str],
        sequence_col: str,
        change_type_col: str = "_change_type",
        txn: dict | None = None,
    ) -> int:
        """APPLY CHANGES INTO (Delta Live Tables' CDC-apply): consume a
        change feed — e.g. another LakeTable's ``changes()`` or the
        ``laketable`` streaming source with ``readChangeFeed`` — into
        this table. Closes the CDC loop this storage layer produces.

        Semantics (DLT parity): per key, the row with the HIGHEST
        ``sequence_col`` wins (out-of-order tolerant — late-arriving
        older changes are ignored); ``update_preimage`` rows are dropped
        before sequencing (they describe the old value; their postimage
        twin carries the same sequence); a winning ``delete`` removes the
        key, any other winning change upserts the row. The caller must
        guarantee ``sequence_col`` totally orders each key's changes
        (our CDF's ``_commit_version`` does: one change per key per
        commit once preimages are dropped). ``change_type_col`` and
        ``sequence_col`` are bookkeeping, not payload — both are dropped
        before the write.

        One MERGE-shaped commit (operation ``apply_changes``):
        upserts and deletes share the touched-partition / touched-file
        discovery, so a CDC batch lands partition- or file-pruned exactly
        like a merge, and the commit is OCC-protected with the same
        winner-overlap checks (delete keys included)."""
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        live = cdc.filter(F.col(change_type_col) != "update_preimage")
        w = Window.partitionBy(*keys).orderBy(F.desc(sequence_col))
        latest = (
            live.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        upserts = (
            latest.filter(F.col(change_type_col) != "delete")
            .drop(change_type_col, sequence_col)
        )
        deletes = (
            latest.filter(F.col(change_type_col) == "delete")
            .select(*keys)
            .distinct()
        )
        return self.merge(
            upserts, keys, txn=txn, _delete_keys=deletes,
            _operation="apply_changes",
        )

    def apply_changes_scd2(
        self,
        cdc: DataFrame,
        keys: list[str],
        sequence_col: str,
        change_type_col: str = "_change_type",
        txn: dict | None = None,
    ) -> int:
        """APPLY CHANGES INTO ... STORED AS SCD TYPE 2 (Delta Live
        Tables' history-keeping CDC apply): instead of keeping only each
        key's latest row, every change opens a new history row and closes
        the previous one. The table carries two bookkeeping columns:
        ``__start_at`` (the ``sequence_col`` value that opened the row)
        and ``__end_at`` (the sequence that closed it; NULL = current).

        Batch semantics: preimages are dropped (their postimage twin
        carries the same sequence); each key's in-batch changes are
        ordered by ``sequence_col`` and each non-delete change becomes an
        interval ``[seq, next_seq)`` — a delete contributes no row but
        closes the interval before it. A key's existing OPEN row joins
        the ordering as one more event at its own ``__start_at``, so the
        first incoming change closes it; CLOSED history rows are never
        rewritten. Requires per-key monotone feeds: an incoming change
        older than an affected key's recorded ``__start_at`` raises
        rather than silently corrupting history (full retroactive
        repair would need delete tombstones this table doesn't keep).

        Lands as ONE merge-shaped commit keyed on ``keys + __start_at``
        (operation ``apply_changes_scd2``): re-opened rows update in
        place, new intervals insert, untouched partitions/files pass
        through — the same pruned-commit shape as :meth:`apply_changes`.

        Scale: the only shuffle beyond the merge itself is the per-key
        ``lead()`` window — partitioned by key, so each task holds one
        key's change count (bounded by commits per batch), never a
        global sort."""
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        live = cdc.filter(F.col(change_type_col) != "update_preimage")
        payload = [
            c for c in live.columns if c not in (change_type_col, sequence_col)
        ]
        events = live.select(
            *payload,
            F.col(sequence_col).alias("__start_at"),
            (F.col(change_type_col) == "delete").alias("__is_delete"),
        )
        if self.exists():
            tgt = self.read()
            affected = tgt.join(
                events.select(*keys).distinct(), on=keys, how="left_semi"
            )
            # late-arriving guard: history already extends past this batch
            late = (
                affected.groupBy(*keys)
                .agg(F.max("__start_at").alias("__hi"))
                .join(events.select(*keys, "__start_at"), on=keys)
                .filter(F.col("__start_at") < F.col("__hi"))
            )
            if not late.isEmpty():
                bad = late.select(*keys, "__start_at", "__hi").first()
                raise ValueError(
                    "apply_changes_scd2: change older than recorded history "
                    f"for key {[bad[k] for k in keys]} "
                    f"(incoming {bad['__start_at']} < recorded {bad['__hi']}); "
                    "SCD2 keeps no delete tombstones, so retroactive repair "
                    "is not possible — feed changes in per-key order"
                )
            open_events = affected.filter(F.col("__end_at").isNull()).select(
                *payload, "__start_at", F.lit(False).alias("__is_delete")
            )
            events = events.unionByName(open_events)
        w = Window.partitionBy(*keys).orderBy("__start_at")
        # (key, seq) dedupe: a replayed feed re-delivers the change that
        # opened the current row — the incoming copy and the open-row event
        # are identical, keep one
        intervals = (
            events.dropDuplicates(keys + ["__start_at"])
            .withColumn("__end_at", F.lead("__start_at").over(w))
            .filter(~F.col("__is_delete"))
            .drop("__is_delete")
        )
        return self.merge(
            intervals,
            keys + ["__start_at"],
            txn=txn,
            _operation="apply_changes_scd2",
        )

    def _touched_files_by_cond(self, prior: dict, cond) -> tuple[list, list]:
        """(touched, untouched) file inventory split for an unpartitioned
        snapshot: a file is touched iff it physically contains a row where
        ``cond`` is TRUE (one column-pruned scan — parquet footer pushdown
        does the skipping — then a bounded distinct-file collect, exactly
        Delta's find-touched-files scan)."""
        import pyspark.sql.functions as F

        inventory = self._file_inventory(prior)
        if not inventory:
            return [], []
        paths = [os.path.join(d_, rel) for d_, rel, _ in inventory]
        scan = _apply_column_mapping(
            self.spark.read.option("mergeSchema", "true").parquet(*paths),
            prior.get("column_mapping", {}),
            prior.get("dropped_columns", []),
        ).withColumn("__file", F.input_file_name())
        hit = (
            scan.filter(F.coalesce(cond, F.lit(False)))
            .select("__file")
            .distinct()
            .collect()
        )
        touched_paths = {_local_path(r["__file"]) for r in hit}
        touched = [
            f
            for f in inventory
            if os.path.abspath(os.path.join(f[0], f[1])) in touched_paths
        ]
        untouched = [f for f in inventory if f not in touched]
        return touched, untouched

    @staticmethod
    def _cond_delta_check(cond):
        """Rebase safety for partition-scoped delete/update: the winners'
        new data must contain no row matching our condition (else a serial
        re-run would have rewritten it too)."""
        import pyspark.sql.functions as F

        def check(winners_delta: DataFrame) -> bool:
            try:
                return winners_delta.filter(F.coalesce(cond, F.lit(False))).isEmpty()
            except Exception:
                return False  # condition not evaluable on winner's schema

        return check

    def delete(self, condition, mode: str = "copy-on-write") -> int:
        """Delta-style ``DELETE FROM t WHERE condition``.

        ``mode="copy-on-write"`` (default): rewrite only what contains
        matches — partition-pruned like merge() on partitioned tables,
        file-pruned on unpartitioned ones; everything else passes through
        byte-identical.

        ``mode="merge-on-read"``: Delta DELETION VECTORS — no data file
        is rewritten at all; the doomed rows' (file, row_index) ids land
        in a parquet sidecar that every scan anti-joins out. The write
        cost is proportional to the DELETED rows, not the touched files —
        the right trade for frequent small deletes on huge files. Reads
        pay the anti-join until ``compact()`` materializes the DVs back
        into clean files (Delta's PURGE)."""
        import pyspark.sql.functions as F

        prior = self._manifest(self.current_version())
        pcols = prior["partition_by"]
        cond = F.expr(condition) if isinstance(condition, str) else condition
        if mode == "merge-on-read":
            return self._delete_merge_on_read(prior, cond)
        if mode != "copy-on-write":
            raise ValueError(
                f"delete mode must be 'copy-on-write' or 'merge-on-read', got {mode!r}"
            )
        self._reject_cow_with_dvs(prior, "delete")
        # SQL/Delta DELETE removes only rows where the condition is TRUE;
        # rows where it evaluates to NULL are kept. filter(~cond) would
        # silently drop them (3-valued logic), so coalesce NULL -> FALSE.
        keep_pred = ~F.coalesce(cond, F.lit(False))
        if not pcols:
            touched, untouched = self._touched_files_by_cond(prior, cond)
            if not touched:
                return self.current_version()  # no-op delete
            kept = (
                self.spark.read.option("mergeSchema", "true")
                .parquet(*[os.path.join(d_, rel) for d_, rel, _ in touched])
                .filter(keep_pred)
            )
            entry = self._write_dir_entry(kept, [])
            # every touched row deleted → the rewrite dir is empty;
            # referencing it would break schema inference on later reads
            new_entries = [entry] if entry["files"] else []
            return self._commit(
                self._surviving_file_entries(prior, untouched) + new_entries,
                "delete",
                pcols,
                base_version=prior["version"],
            )

        target = self.read()
        touched_rows = self._touched_partitions(target.filter(cond), pcols)
        if not touched_rows:
            return self.current_version()  # no-op delete: nothing matched
        kept = target.filter(_partition_predicate(pcols, touched_rows)).filter(keep_pred)
        d = self._new_data_dir()
        kept.write.mode("overwrite").partitionBy(*pcols).parquet(d)
        # a DELETE can empty every touched partition: the dir then holds
        # no parquet files and must not enter the manifest (filesystem
        # check, no extra Spark job; the orphan dir is vacuum-reclaimable)
        has_rows = any(
            name.endswith(".parquet")
            for _b, _d, files in os.walk(d)
            for name in files
        )
        return self._commit_rebasing(
            lambda head: self._carry_prior_dirs(head, touched_rows, d if has_rows else None),
            "delete",
            pcols,
            base_version=prior["version"],
            touched=touched_rows,
            delta_check=self._cond_delta_check(cond),
        )

    def _reject_cow_with_dvs(self, prior: dict, operation: str) -> None:
        """Copy-on-write DML reads files directly (inventory scans,
        pruned rewrites) and would resurrect DV-deleted rows; Delta
        materializes DVs before such operations — here the explicit
        equivalent is compact()."""
        if prior.get("deletion_vectors"):
            raise ValueError(
                f"{operation}: table has active deletion vectors "
                "(merge-on-read deletes); run compact() to materialize "
                "them before copy-on-write DML"
            )

    def _delete_merge_on_read(self, prior: dict, cond) -> int:
        """DELETE via deletion vectors: append a (file, row_index)
        sidecar, keep every data file. See delete() for the contract."""
        import pyspark.sql.functions as F

        if not prior["data_dirs"]:
            return self.current_version()  # empty table: no-op
        doomed = (
            self.read(version=prior["version"], _with_rowids=True)
            .filter(F.coalesce(cond, F.lit(False)))
            .select("__file_path", "__row_index")
        )
        if doomed.isEmpty():
            return self.current_version()  # no-op delete
        dv_dir = os.path.join(self.root, "_dv", uuid.uuid4().hex[:12])
        doomed.write.mode("overwrite").parquet(dv_dir)
        return self._commit(
            prior["data_dirs"],
            "delete-dv",
            prior["partition_by"],
            base_version=prior["version"],
            deletion_vectors=prior.get("deletion_vectors", []) + [dv_dir],
        )

    def update(self, condition, assignments: dict) -> int:
        """Delta-style ``UPDATE t SET col = expr WHERE condition`` as
        copy-on-write, partition-pruned: rewrites only partitions holding
        matching rows (assignments must not change partition columns —
        use merge() for partition-moving updates, which handles the old
        partition correctly)."""
        import pyspark.sql.functions as F

        prior = self._manifest(self.current_version())
        self._reject_cow_with_dvs(prior, "update")
        pcols = prior["partition_by"]
        bad = set(assignments) & set(pcols)
        if bad:
            raise ValueError(f"update() cannot modify partition columns {sorted(bad)}; use merge()")
        gen = prior.get("generated_columns", {})
        bad_gen = set(assignments) & set(gen)
        if bad_gen:
            raise ValueError(
                f"update() cannot SET generated columns {sorted(bad_gen)} "
                "(GENERATED ALWAYS AS values are derived, never assigned)"
            )
        cond = F.expr(condition) if isinstance(condition, str) else condition

        def apply(df):
            for c, expr in assignments.items():
                val = F.expr(expr) if isinstance(expr, str) else expr
                df = df.withColumn(c, F.when(cond, val).otherwise(F.col(c)))
            # recompute generated columns: an updated source column must
            # flow through (the rewrite touches whole rows anyway)
            for c, e in gen.items():
                df = df.withColumn(c, F.expr(e))
            return df

        if not pcols:
            # file-pruned: rewrite only files containing matching rows
            touched, untouched = self._touched_files_by_cond(prior, cond)
            if not touched:
                return self.current_version()
            rewritten = apply(
                _apply_column_mapping(
                    self.spark.read.option("mergeSchema", "true").parquet(
                        *[os.path.join(d_, rel) for d_, rel, _ in touched]
                    ),
                    prior.get("column_mapping", {}),
                    prior.get("dropped_columns", []),
                )
            )
            self._enforce_constraints(rewritten)
            entry = self._write_dir_entry(rewritten, [])
            return self._commit(
                self._surviving_file_entries(prior, untouched) + [entry],
                "update",
                pcols,
                base_version=prior["version"],
            )
        target = self.read()
        touched_rows = self._touched_partitions(target.filter(cond), pcols)
        if not touched_rows:
            return self.current_version()
        rewritten = apply(target.filter(_partition_predicate(pcols, touched_rows)))
        self._enforce_constraints(rewritten)
        d = self._new_data_dir()
        rewritten.write.mode("overwrite").partitionBy(*pcols).parquet(d)
        return self._commit_rebasing(
            lambda head: self._carry_prior_dirs(head, touched_rows, d),
            "update",
            pcols,
            base_version=prior["version"],
            touched=touched_rows,
            delta_check=self._cond_delta_check(cond),
        )

    # ---------------- readers (S4 + time travel) ----------------

    def version_as_of(self, ts: float) -> int:
        """Delta ``timestampAsOf``: the latest version committed at or
        before ``ts`` (unix seconds). Raises if the table didn't exist
        yet at that time."""
        best = None
        for m in self.history():
            if m["committed_at"] <= ts:
                best = m["version"] if best is None else max(best, m["version"])
        if best is None:
            raise ValueError(
                f"no version of {self.root} existed at or before timestamp {ts}"
            )
        return best

    # NOTE: restore() is defined once, below (the vacuum-guarded,
    # metadata-carrying implementation) — an earlier duplicate def that
    # this class shadowed was removed in r09.

    def read(
        self,
        version: int | None = None,
        as_of_timestamp: float | None = None,
        _with_rowids: bool = False,
    ) -> DataFrame:
        if version is not None and as_of_timestamp is not None:
            raise ValueError("pass version OR as_of_timestamp, not both")
        if as_of_timestamp is not None:
            version = self.version_as_of(as_of_timestamp)
        v = version if version is not None else self.current_version()
        cached = self._read_cache.get((v, _with_rowids))
        if cached is not None:
            return cached
        m = self._manifest(v)
        check_table_features(m, for_write=False, where=self.root)
        entries = m["data_dirs"]
        pcols = m["partition_by"]
        dvs = m.get("deletion_vectors", [])
        import pyspark.sql.functions as F

        if not entries:
            # a DELETE removed every row: serve an empty frame with the
            # schema of the most recent version that still had data
            for pv in range(v - 1, 0, -1):
                if self._manifest(pv)["data_dirs"]:
                    return self.read(version=pv).limit(0)
            raise ValueError(f"table {self.root} has no data in any version")
        # one read per commit dir, unioned: multiple partitioned roots can't
        # share a single scan (CONFLICTING_DIRECTORY_STRUCTURES) and schema
        # evolution across commits needs unionByName anyway. Dict entries
        # carry a partition exclusion mask (partitions superseded by a later
        # MERGE) applied as a partition-pruning filter.
        dfs = []
        for e in entries:
            if isinstance(e, dict) and e.get("live_files") is not None:
                # file-pruned DML carried these files forward by name;
                # basePath recovers hive partition columns when the entry
                # points into a partitioned layout (converted tables)
                paths = [os.path.join(e["path"], rel) for rel in e["live_files"]]
                if not paths:
                    continue
                df = (
                    self.spark.read.option("mergeSchema", "true")
                    .option("basePath", e["path"])
                    .parquet(*paths)
                )
            else:
                df = self.spark.read.option("mergeSchema", "true").parquet(_entry_path(e))
            # logical schema (column mapping AS OF the version being read:
            # time travel before a rename shows the old name, like Delta)
            df = _apply_column_mapping(
                df, m.get("column_mapping", {}), m.get("dropped_columns", [])
            )
            if dvs or _with_rowids:
                # stable row identity for merge-on-read DELETE (Delta
                # deletion vectors): parquet-native, no data rewrite
                df = df.select(
                    "*",
                    F.col("_metadata.file_path").alias("__file_path"),
                    F.col("_metadata.row_index").alias("__row_index"),
                )
            excl = e.get("exclude") if isinstance(e, dict) else None
            if excl:
                df = df.filter(~_partition_predicate(pcols, excl))
            dfs.append(df)
        out = dfs[0]
        for other in dfs[1:]:
            out = out.unionByName(other, allowMissingColumns=True)
        if dvs:
            # left-anti on (file, row): the Delta merge-on-read scan shape.
            # The ids were already attached per-entry above, so join and
            # (unless the caller wants them) drop directly.
            dv = self.spark.read.parquet(*dvs)
            out = out.join(dv, on=["__file_path", "__row_index"], how="left_anti")
            if not _with_rowids:
                out = out.drop("__file_path", "__row_index")
        self._read_cache[(v, _with_rowids)] = out
        return out

    def changes(
        self,
        starting_version: int,
        ending_version: int | None = None,
        keys: list[str] | None = None,
    ) -> DataFrame:
        """Change Data Feed (Delta ``table_changes``): row-level changes
        per commit with ``_change_type``/``_commit_version``, derived
        from the manifests reading only what each commit touched — see
        lake/cdf.py for the contract and cost model."""
        from ecommerce_lakehouse_spark.lake.cdf import table_changes

        return table_changes(self, starting_version, ending_version, keys)

    def read_skipping(
        self, bounds: dict[str, tuple], version: int | None = None
    ) -> DataFrame:
        """Data skipping on READ (the query-side use of the same footer
        min/max stats DML pruning uses — Delta's data skipping): files
        whose stats PROVE no row can satisfy ``bounds`` ({col: (lo, hi)},
        None = unbounded side) are never opened; the surviving files then
        get the equivalent row filter, so results are exact, not merely
        file-granular. Pairs with ``optimize(zorder_by=...)``: Z-order
        clustering is what makes per-file ranges narrow enough to skip.

        Falls back to a full filtered read when stats aren't available
        (partitioned snapshots record partition values, not file stats —
        partition pruning via the filter covers those)."""
        import pyspark.sql.functions as F

        v = version if version is not None else self.current_version()
        manifest = self._manifest(v)
        check_table_features(manifest, for_write=False, where=self.root)

        def bound_filter(df: DataFrame) -> DataFrame:
            for c, (lo, hi) in bounds.items():
                if lo is not None:
                    df = df.filter(F.col(c) >= F.lit(lo))
                if hi is not None:
                    df = df.filter(F.col(c) <= F.lit(hi))
            return df

        if manifest.get("deletion_vectors"):
            # footer stats can admit rows a deletion vector removed, and
            # the DV anti-join needs row ids from every surviving file —
            # serve the exact filtered read instead of file pruning
            return bound_filter(self.read(version=v))
        pcols = manifest["partition_by"]
        if pcols:
            return self._read_skipping_partitioned(manifest, bounds, bound_filter, v)
        inventory = self._file_inventory(manifest)
        keep = [
            (d, rel)
            for d, rel, stats in inventory
            if _ranges_intersect(stats, bounds)
        ]
        # bloom skipping: equality bounds on indexed columns test each
        # surviving file's bitmap — an unset probe bit proves absence
        # (false positives only cost an extra file read, never a row)
        eq = {
            c: lo
            for c, (lo, hi) in bounds.items()
            if lo is not None and lo == hi
        }
        bloom_cfg = manifest.get("properties", {}).get("bloom_index", {})
        if keep and eq and any(c in bloom_cfg for c in eq):
            probes = {
                c: self._bloom_probe_positions(bloom_cfg[c], v)
                for c, v in eq.items()
                if c in bloom_cfg
            }
            sidecars: dict[str, dict | None] = {}
            kept = []
            for d, rel in keep:
                if d not in sidecars:
                    sidecars[d] = self._load_bloom(d)
                sc = sidecars[d]
                fb = (sc or {}).get("files", {}).get(rel, {})
                if any(
                    c in fb and not _bloom_test(fb[c], pos)
                    for c, pos in probes.items()
                ):
                    continue  # proven absent from this file
                kept.append((d, rel))
            keep = kept
        keep = [os.path.join(d, rel) for d, rel in keep]
        if not keep:
            return bound_filter(self.read(version=v)).limit(0)
        df = _apply_column_mapping(
            self.spark.read.option("mergeSchema", "true").parquet(*keep),
            manifest.get("column_mapping", {}),
            manifest.get("dropped_columns", []),
        )
        return bound_filter(df)

    def _read_skipping_partitioned(self, manifest, bounds, bound_filter, v):
        """Hybrid skipping for partitioned snapshots: hive path values
        prune on partition-column EQUALITY bounds (string compare of the
        encoded value — range bounds on partition columns stay filter-only
        because path strings don't order numerically), footer stats prune
        on data columns; dirs written by pruned-DML rewrites carry no
        stats and pass through un-skipped. Exclusion masks still apply."""
        import pyspark.sql.functions as F
        from urllib.parse import unquote

        pcols = manifest["partition_by"]
        def hive_str(v):
            # hive writes booleans lowercase — same canonicalization as
            # _row_canon, which exists for exactly this mismatch
            return str(v).lower() if isinstance(v, bool) else str(v)

        eq_bounds = {
            c: hive_str(lo)
            for c, (lo, hi) in bounds.items()
            if c in pcols and lo is not None and lo == hi
        }

        def rel_partition_values(rel: str) -> dict:
            out = {}
            for part in rel.split(os.sep):
                if "=" in part:
                    k, _, val = part.partition("=")
                    out[k] = unquote(val)
            return out

        dfs = []
        for e in manifest["data_dirs"]:
            dpath = _entry_path(e)
            stats = e.get("files") if isinstance(e, dict) else None
            excl = e.get("exclude") if isinstance(e, dict) else None
            if not stats:
                df = self.spark.read.option("mergeSchema", "true").parquet(dpath)
            else:
                keep = []
                for rel, fs in stats.items():
                    pvals = rel_partition_values(rel)
                    if any(
                        c in pvals and pvals[c] != val for c, val in eq_bounds.items()
                    ):
                        continue
                    if not _ranges_intersect(fs, bounds):
                        continue
                    keep.append(os.path.join(dpath, rel))
                if not keep:
                    continue
                df = (
                    self.spark.read.option("mergeSchema", "true")
                    .option("basePath", dpath)
                    .parquet(*keep)
                )
            df = _apply_column_mapping(
                df,
                manifest.get("column_mapping", {}),
                manifest.get("dropped_columns", []),
            )
            if excl:
                df = df.filter(~_partition_predicate(pcols, excl))
            dfs.append(df)
        if not dfs:
            return bound_filter(self.read(version=v)).limit(0)
        out = dfs[0]
        for other in dfs[1:]:
            out = out.unionByName(other, allowMissingColumns=True)
        return bound_filter(out)

    def register(self, name: str, version: int | None = None) -> None:
        """K7 catalog registration (CREATE TABLE ... USING ... LOCATION)."""
        self.read(version).createOrReplaceTempView(name)

    # ---------------- maintenance (§4: OPTIMIZE / VACUUM analogues) -------

    def describe_detail(self) -> dict:
        """Delta ``DESCRIBE DETAIL`` analogue: one dict of table facts —
        location, current version, partition columns, LIVE file count and
        byte size (exclusion masks and ``live_files`` honored, exactly
        the files a read would open), properties, constraints, generated
        columns, deletion-vector sidecar count, created/last-modified
        timestamps, version count. Control-plane only: manifest reads
        plus a filesystem walk, zero Spark jobs."""
        from ecommerce_lakehouse_spark.lake.stream_source import _live_files

        v = self.current_version()
        m = self._manifest(v)
        hist = self.history()
        files = [
            os.path.join(d, rel)
            for e in m["data_dirs"]
            for d, rel in _live_files(e)
        ]
        return {
            "format": "laketable-parquet",
            "location": self.root,
            "version": v,
            "partition_columns": m["partition_by"],
            "num_files": len(files),
            "size_in_bytes": sum(os.path.getsize(f) for f in files),
            "properties": m.get("properties", {}),
            "constraints": m.get("constraints", {}),
            "generated_columns": m.get("generated_columns", {}),
            "num_deletion_vector_files": len(m.get("deletion_vectors", [])),
            "created_at": hist[0].get("committed_at"),
            "last_modified": m.get("committed_at"),
            "num_versions": len(hist),
        }

    # ---------------- table properties + auto-compaction ----------------

    def properties(self) -> dict:
        """Current table properties ({key: value})."""
        if not self.exists():
            return {}
        return self._manifest(self.current_version()).get("properties", {})

    def set_properties(self, props: dict) -> int:
        """Delta ``ALTER TABLE .. SET TBLPROPERTIES`` analogue (reference
        config/settings.py:124-127 sets ``delta.autoOptimize.optimizeWrite``
        / ``autoCompact`` plus 128-512 MB file-size targets per layer).
        Metadata-only commit; keys merge over existing properties.

        Honored keys:
        - ``auto_compact`` (bool): after every append, partitions whose
          live file count crossed ``auto_compact_min_files`` are folded
          into right-sized files as a follow-up physical-only commit
          (see _auto_compact).
        - ``auto_compact_min_files`` (int, default 8): the trigger
          threshold (Delta's ``minNumFiles``; default scaled to local
          test file counts).
        - ``target_file_bytes`` (int, default 128 MiB): output file size
          target, the reference's bronze-layer target."""
        prior = self._manifest(self.current_version())
        return self._commit(
            prior["data_dirs"],
            "set-properties",
            prior["partition_by"],
            base_version=prior["version"],
            properties={**prior.get("properties", {}), **props},
        )

    def _live_partition_file_counts(self, m: dict) -> dict[tuple, int]:
        """{canonical partition tuple: live parquet file count} for a
        partitioned snapshot, honoring exclude masks. Control-plane
        filesystem walk, bounded by file count."""
        from urllib.parse import unquote

        counts: dict[tuple, int] = {}
        for e in m["data_dirs"]:
            d = _entry_path(e)
            excl = e.get("exclude", []) if isinstance(e, dict) else []
            dead = {_row_canon(x) for x in excl}
            for base, _, names in os.walk(d):
                for name in names:
                    if not name.endswith(".parquet"):
                        continue
                    rel = os.path.relpath(os.path.join(base, name), d)
                    vals: dict = {}
                    for seg in rel.split(os.sep)[:-1]:
                        if "=" in seg:
                            c, v = seg.split("=", 1)
                            vals[c] = (
                                None
                                if v == "__HIVE_DEFAULT_PARTITION__"
                                else unquote(v)
                            )
                    key = _row_canon(vals)
                    if key in dead:
                        continue
                    counts[key] = counts.get(key, 0) + 1
        return counts

    def _auto_compact(self) -> int | None:
        """Auto-compaction (Delta ``delta.autoOptimize.autoCompact``):
        invoked after an append when the ``auto_compact`` property is
        set. Partitions (or, unpartitioned, the small-file set) whose
        live file count reached ``auto_compact_min_files`` are rewritten
        toward ``target_file_bytes`` as a SEPARATE commit with operation
        ``auto-compact`` — a physical-only op (_PHYSICAL_OPS), so CDF and
        the streaming source see no logical change, exactly like manual
        compact(). Untouched partitions / right-sized files are carried
        by name, never copied.

        Best-effort janitor: an OCC race is swallowed (the data commit
        this trails is already durable; the next append retries), and
        outstanding deletion vectors skip it (a partial rewrite would
        have to split DV sidecars — run compact() to purge DVs first).
        Returns the compaction commit's version, or None if nothing to
        do."""
        props = self.properties()
        minf = int(props.get("auto_compact_min_files", 8))
        target_bytes = int(props.get("target_file_bytes", 128 << 20))
        prior = self._manifest(self.current_version())
        if prior.get("deletion_vectors"):
            return None
        pcols = prior["partition_by"]
        import math

        try:
            if pcols:
                counts = self._live_partition_file_counts(prior)
                touched = [dict(k) for k, n in sorted(counts.items()) if n >= minf]
                if not touched:
                    return None
                df = self.read().filter(_partition_predicate(pcols, touched))
                # one output file per partition: rows hash to their
                # partition's task, each task writes one file per hive dir
                entry = self._write_dir_entry(df.repartition(*pcols), pcols)
                entries = self._carry_prior_dirs(prior, touched, entry)
                return self._commit(
                    entries, "auto-compact", pcols,
                    base_version=prior["version"], touched=touched,
                    deletion_vectors=[],
                )
            inv = self._file_inventory(prior)
            sized = [
                (d, rel, st, os.path.getsize(os.path.join(d, rel)))
                for d, rel, st in inv
            ]
            small = [x for x in sized if x[3] < target_bytes]
            if len(small) < minf:
                return None
            nout = max(1, math.ceil(sum(x[3] for x in small) / target_bytes))
            if nout >= len(small):
                return None
            df = self.spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(d, rel) for d, rel, _, _ in small]
            )
            entry = self._write_dir_entry(df.coalesce(nout), [])
            untouched = [
                (d, rel, st) for d, rel, st, sz in sized if sz >= target_bytes
            ]
            entries = self._surviving_file_entries(prior, untouched) + [entry]
            return self._commit(
                entries, "auto-compact", [],
                base_version=prior["version"], deletion_vectors=[],
            )
        except ConcurrentWriteError:
            return None

    def fsck(self, dry_run: bool = True) -> dict:
        """FSCK REPAIR TABLE (Delta parity): find manifest references to
        data files that no longer exist in storage and, with
        ``dry_run=False``, commit a repair that drops them.

        The repair surface is exactly the file references the manifest
        carries BY NAME: ``live_files`` entries (from file-pruned DML /
        clones) and whole data dirs — a plain directory entry lists
        storage at read time, so a file deleted from it disappears from
        reads on its own, like a directory-listing table. Deletion
        vectors are the one reference class that REFUSES repair: dropping
        a missing DV would resurrect the rows it deleted, which is data
        corruption, not repair — restore a backup or RESTORE to a
        version before the delete instead.

        The repair is a DATA commit (op ``fsck-repair``, rows vanish):
        streaming tails raise on it unless ignoreChanges (a source
        cannot retract), and a change feed crossing it raises because
        the pre-image of vanished files is unreadable by definition.

        Returns {"missing_files": [(dir, rel)...], "missing_dirs": [...],
        "missing_dvs": [...], "repaired_version": int | None}.
        Control-plane only: existence checks against the file inventory,
        no Spark job."""
        prior = self._manifest(self.current_version())
        missing_files: list[tuple] = []
        missing_dirs: list[str] = []
        repaired: list = []
        for e in prior["data_dirs"]:
            dpath = _entry_path(e)
            if not os.path.isdir(dpath):
                missing_dirs.append(dpath)
                continue
            if isinstance(e, dict) and e.get("live_files") is not None:
                gone = {
                    r
                    for r in e["live_files"]
                    if not os.path.exists(os.path.join(dpath, r))
                }
                if gone:
                    missing_files.extend((dpath, r) for r in sorted(gone))
                    e2 = dict(e)
                    e2["live_files"] = [
                        r for r in e["live_files"] if r not in gone
                    ]
                    e2["files"] = {
                        r: st
                        for r, st in (e.get("files") or {}).items()
                        if r not in gone
                    }
                    if e2["live_files"]:
                        repaired.append(e2)
                    continue
            repaired.append(e)
        dvs = prior.get("deletion_vectors", [])
        missing_dvs = [p for p in dvs if not os.path.exists(p)]
        report = {
            "missing_files": missing_files,
            "missing_dirs": missing_dirs,
            "missing_dvs": missing_dvs,
            "repaired_version": None,
        }
        if dry_run or not (missing_files or missing_dirs or missing_dvs):
            return report
        if missing_dvs:
            raise ValueError(
                f"fsck: deletion vectors missing from storage {missing_dvs}; "
                "dropping them would resurrect deleted rows — restore the "
                "files or RESTORE the table to a version before the delete"
            )
        report["repaired_version"] = self._commit(
            repaired,
            "fsck-repair",
            prior["partition_by"],
            base_version=prior["version"],
        )
        return report

    def compact(
        self, target_partitions: int | None = None, where: str | None = None
    ) -> int:
        """OPTIMIZE analogue: rewrite the snapshot into right-sized files
        (reference docs/data_model.md:302-308's 128-512 MB targets; here
        AQE coalescing + optional repartition pick the file count).

        ``where`` (Delta ``OPTIMIZE ... WHERE``): compact ONLY the
        partitions matching the predicate — at 100 TB you optimize
        yesterday's partition, never the table; untouched partitions'
        files pass through the manifest byte-identical behind an
        exclusion mask, the same pruned-commit shape as MERGE. Deletion
        vectors are carried (new files have new paths, so DVs can't
        name rows in them; rows DVs removed from rewritten files stay
        removed because read() applied them before the rewrite);
        full-table compaction still materializes DVs (Delta PURGE)."""
        prior = self._manifest(self.current_version())
        pcols = prior["partition_by"]
        if where is not None:
            if not pcols:
                raise ValueError(
                    "compact(where=...): partition-scoped compaction needs a "
                    "partitioned table; use plain compact() instead"
                )
            target = self.read()
            touched_rows = self._touched_partitions(target.filter(where), pcols)
            if not touched_rows:
                return self.current_version()
            df = target.filter(_partition_predicate(pcols, touched_rows))
            if target_partitions:
                df = df.repartition(target_partitions, *pcols)
            d = self._new_data_dir()
            df.write.mode("overwrite").partitionBy(*pcols).parquet(d)
            return self._commit(
                self._carry_prior_dirs(prior, touched_rows, d),
                "compact",
                pcols,
                base_version=prior["version"],
                touched=touched_rows,
            )
        df = self.read()
        if target_partitions:
            df = df.repartition(target_partitions, *(pcols or []))
        entry = self._write_dir_entry(df, pcols)
        # DVs may have deleted every row: a fileless dir must not enter
        # the manifest (same hazard the cow delete path guards)
        return self._commit(
            [entry] if entry["files"] else [],
            "compact", pcols, base_version=prior["version"],
            deletion_vectors=[],  # rewrite via read() materializes DVs (Delta PURGE)
        )

    def optimize(self, zorder_by: list[str], target_partitions: int = 8, bits: int = 8) -> int:
        """OPTIMIZE ZORDER analogue (reference docs/etl_processes.md:381-386,
        docs/data_model.md:289,296: `OPTIMIZE ... ZORDER BY (...)`).

        Each key column is binned into 2**bits buckets between its min/max
        (one cheap agg pass — no global sort, no collect of data rows),
        the per-column bucket indices are bit-interleaved into a Morton
        z-value, and the snapshot is range-repartitioned + sorted on it.
        Result: every output file covers a compact hyper-rectangle in ALL
        zorder columns, so min/max footer stats skip files for predicates
        on any of them — unlike a lexicographic sort, which only helps the
        leading column. Columnar min/max skipping is the reader's job
        (Spark's parquet filter pushdown uses the same footers Delta's
        data skipping reads).
        """
        from pyspark.sql import functions as F

        prior = self._manifest(self.current_version())
        df = self.read()
        n_bins = 1 << bits
        bounds = df.agg(
            *[F.min(c).alias(f"{c}_min") for c in zorder_by],
            *[F.max(c).alias(f"{c}_max") for c in zorder_by],
        ).first()
        zval = F.lit(0).cast("long")
        k = len(zorder_by)
        for ci, c in enumerate(zorder_by):
            lo, hi = bounds[f"{c}_min"], bounds[f"{c}_max"]
            if lo is None or hi == lo:
                continue
            bucket = F.least(
                F.floor(
                    (F.col(c).cast("double") - F.lit(float(lo)))
                    / F.lit((float(hi) - float(lo)) / n_bins)
                ).cast("long"),
                F.lit(n_bins - 1),
            )
            for bit in range(bits):
                zval = zval + (F.shiftright(bucket, bit).bitwiseAND(F.lit(1))).cast(
                    "long"
                ) * F.lit(1 << (bit * k + ci))
        clustered = (
            df.withColumn("__z", zval)
            .repartitionByRange(target_partitions, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        entry = self._write_dir_entry(clustered, prior["partition_by"])
        return self._commit(
            [entry], "optimize-zorder", prior["partition_by"],
            base_version=prior["version"], deletion_vectors=[]
        )

    def restore(self, version: int) -> int:
        """RESTORE TABLE ... TO VERSION AS OF (Delta RESTORE): commit a
        new version whose logical state is exactly ``version``'s — the
        manifest re-references that version's data dirs and deletion
        vectors and carries its metadata (constraints, generated
        columns, properties, column mapping). Metadata-only: zero bytes
        are copied or rewritten, so restoring a petabyte table is O(1)
        I/O. RESTORE adds a commit, it never erases one — time travel
        still sees the intermediate versions (the audit trail survives),
        and a second restore can "undo the undo".

        Refused when any file the target manifest references has been
        VACUUMed away (Delta's guard): a restore that cannot serve the
        bytes it advertises would corrupt every later read. Downstream
        semantics fall out of the commit's shape: the change feed
        reports the multiset diff vs the pre-restore version (re-added
        rows surface as inserts, rolled-back rows as deletes), and the
        streaming source treats it as a non-append change (loud unless
        ignoreChanges), matching Delta streaming."""
        current = self.current_version()
        if not 1 <= version <= current:
            raise ValueError(
                f"restore: version {version} out of range 1..{current}"
            )
        m = self._manifest(version)
        check_table_features(m, for_write=False, where=self.root)
        missing = [
            p
            for p in (
                [_entry_path(e) for e in m["data_dirs"]]
                + list(m.get("deletion_vectors", []))
            )
            if not os.path.isdir(_local_path(p))
        ]
        if missing:
            raise ValueError(
                f"restore: v{version} references vacuumed data: {missing[:3]}"
                f"{'...' if len(missing) > 3 else ''} — cannot restore past "
                "a vacuum horizon"
            )
        return self._commit(
            m["data_dirs"],
            "restore",
            m["partition_by"],
            base_version=current,
            touched=None,
            constraints=m.get("constraints", {}),
            generated=m.get("generated_columns", {}),
            deletion_vectors=m.get("deletion_vectors", []),
            properties=m.get("properties", {}),
            column_mapping=m.get("column_mapping", {}),
            dropped_columns=m.get("dropped_columns", []),
        )

    def clone_to(
        self,
        dest_root: str,
        version: int | None = None,
        deep: bool = False,
    ) -> "LakeTable":
        """SHALLOW CLONE (Delta ``CREATE TABLE .. SHALLOW CLONE src
        [VERSION AS OF n]``): a new table whose first commit references
        this table's data dirs at ``version`` by absolute path — zero
        bytes copied, metadata (constraints, generated columns, table
        properties, column mapping) carried. The clone is independent
        from then on: DML copy-on-writes into its OWN data dirs (shared
        dirs are only carried/masked, never rewritten in place), and its
        vacuum() walks only its own data root, so it can never reclaim
        source files. Delta's caveat carries over unchanged: vacuum() on
        the SOURCE may remove files a shallow clone still references.

        ``deep=True`` (Delta DEEP CLONE): the snapshot is MATERIALIZED
        into the clone's own data dir — self-contained, survives source
        vacuum. Implemented as a rewrite of the logical snapshot rather
        than a file-by-file copy: deletion vectors are applied (their
        row addresses name SOURCE file paths and would dangle against
        copies), files come out right-sized, and column-mapped tables
        materialize under their logical schema (dead names stay
        reserved). At 100 TB a deep clone is a full copy either way."""
        v = version if version is not None else self.current_version()
        m = self._manifest(v)
        dest = LakeTable(self.spark, dest_root)
        if dest.exists():
            raise ValueError(f"clone destination {dest_root!r} already exists")
        os.makedirs(os.path.join(dest_root, "data"), exist_ok=True)
        meta = dict(
            constraints=m.get("constraints", {}),
            generated=m.get("generated_columns", {}),
            properties=m.get("properties", {}),
            column_mapping=m.get("column_mapping", {}),
            dropped_columns=m.get("dropped_columns", []),
        )
        if deep:
            entry = dest._write_dir_entry(self.read(version=v), m["partition_by"])
            dest._commit(
                [entry] if entry["files"] else [],
                "clone-deep",
                m["partition_by"],
                deletion_vectors=[],  # applied by read(): rows already gone
                **meta,
            )
            return dest
        dest._commit(
            m["data_dirs"],
            "clone",
            m["partition_by"],
            deletion_vectors=m.get("deletion_vectors", []),
            **meta,
        )
        return dest

    def vacuum(
        self,
        keep_last: int = 2,
        retention_hours: float | None = None,
        dry_run: bool = False,
    ) -> list[str]:
        """VACUUM analogue (reference docs/data_model.md:310-316: age-based
        retention, 7/30/90 days for bronze/silver/gold): delete data dirs
        (and deletion-vector sidecars) referenced by no protected version.

        Protection is TIME-based when ``retention_hours`` is given — every
        version committed within the window survives, so time travel
        anywhere inside the retention period keeps working — with
        ``keep_last`` as a version-count FLOOR on top (Delta posture:
        retention governs, a floor guards against commit-frequency
        changes silently shrinking the window's version count). Without
        ``retention_hours`` the pre-existing version-count behavior is
        unchanged.

        A too-aggressive combination (``keep_last=0`` with a window older
        than the current commit) raises before touching anything rather
        than reclaiming the live snapshot.

        ``dry_run=True`` (Delta ``VACUUM ... DRY RUN``): return the list
        of dirs that WOULD be reclaimed, deleting nothing."""
        import shutil

        cur = self.current_version()
        history = self.history()
        versions = [m["version"] for m in history]
        protected: set[int] = set(versions[-keep_last:]) if keep_last else set()
        if retention_hours is not None:
            cutoff = time.time() - retention_hours * 3600.0
            protected |= {
                m["version"]
                for m in history
                if m.get("committed_at", float("inf")) >= cutoff
            }
            if cur not in protected:
                raise ValueError(
                    f"vacuum(retention_hours={retention_hours}, "
                    f"keep_last={keep_last}): the retention window excludes "
                    f"the CURRENT version v{cur}; refusing to reclaim the "
                    "live snapshot. Raise retention_hours or keep_last."
                )
        elif not keep_last:
            protected = {cur}
        live: set[str] = set()
        live_dv: set[str] = set()
        for v in sorted(protected):
            m = self._manifest(v)
            live.update(_entry_path(e) for e in m["data_dirs"])
            live_dv.update(m.get("deletion_vectors", []))
        removed = []
        data_root = os.path.join(self.root, "data")
        if not os.path.isdir(data_root):
            return removed  # converted table with no post-convert commits
        for name in sorted(os.listdir(data_root)):
            d = os.path.join(data_root, name)
            if d not in live:
                if not dry_run:
                    shutil.rmtree(d)
                removed.append(d)
        dv_root = os.path.join(self.root, "_dv")
        if os.path.isdir(dv_root):
            for name in sorted(os.listdir(dv_root)):
                d = os.path.join(dv_root, name)
                if d not in live_dv:
                    if not dry_run:
                        shutil.rmtree(d)
                    removed.append(d)
        return removed

    # ---------------- statistics (§4: ANALYZE TABLE analogue) -------------

    def analyze(self, columns: list[str] | None = None) -> dict:
        """``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` analogue.

        The reference turns on CBO + histogram statistics
        (src/glue_etl.py:535-539); Catalyst's cost-based rules only bite
        when rowCount / NDV / min-max are real. One aggregation pass
        computes table row count and per-column null count, min, max, and
        approx NDV (HLL — the 100 TB-safe distinct), persisted as a
        version-keyed sidecar under ``_stats/`` so statistics travel with
        time travel and survive restarts. Callers (and humans) use them to
        pick broadcast sides, bucket counts, and partition columns.
        """
        import pyspark.sql.functions as F

        df = self.read()
        atomic = {
            "byte", "short", "integer", "long", "float", "double", "decimal",
            "string", "boolean", "date", "timestamp", "timestamp_ntz",
        }
        cols = columns or [
            f.name for f in df.schema.fields if f.dataType.typeName() in atomic
        ]
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            aggs += [
                F.min(c).alias(f"{c}__min"),
                F.max(c).alias(f"{c}__max"),
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
                F.approx_count_distinct(c).alias(f"{c}__ndv"),
            ]
        row = df.agg(*aggs).collect()[0].asDict()

        def _json(v):
            return v if isinstance(v, (int, float, str, bool, type(None))) else str(v)

        stats = {
            "version": self.current_version(),
            "row_count": row["__n"],
            "columns": {
                c: {
                    "min": _json(row[f"{c}__min"]),
                    "max": _json(row[f"{c}__max"]),
                    "null_count": row[f"{c}__nulls"],
                    "ndv_approx": row[f"{c}__ndv"],
                }
                for c in cols
            },
            "analyzed_at": time.time(),
        }
        stats_dir = os.path.join(self.root, "_stats")
        os.makedirs(stats_dir, exist_ok=True)
        with open(os.path.join(stats_dir, f"v{stats['version']:08d}.json"), "w") as f:
            json.dump(stats, f)
        return stats

    def stats(self, version: int | None = None) -> dict | None:
        """Read the stats sidecar for ``version`` (default: current), or
        None if that version was never analyzed."""
        v = version if version is not None else self.current_version()
        p = os.path.join(self.root, "_stats", f"v{v:08d}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)
