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

from pyspark.sql import DataFrame, SparkSession

from ecommerce_lakehouse_spark.lake.merge import merge_upsert


class ConcurrentWriteError(RuntimeError):
    """Another writer committed a version this operation didn't see.

    LakeTable's commit protocol is optimistic concurrency control in the
    Delta style: an operation snapshots the table version when it starts,
    and the commit (a) refuses if the table moved past that snapshot and
    (b) creates its manifest file with O_EXCL so two writers racing for
    the same version number cannot both win — the loser gets this error
    and must re-read and retry. What is NOT implemented (and what
    delta-spark adds) is logical conflict resolution: a real Delta commit
    re-checks whether the winner's files actually overlap its read set
    and auto-retries when disjoint. Here every conflict surfaces."""


def _part_key(v):
    """JSON-safe canonical form of a partition value (dates/timestamps
    become strings; comparison happens through a string cast on read)."""
    if v is None or isinstance(v, (int, bool)):
        return v
    return str(v)


def _entry_path(e) -> str:
    return e["path"] if isinstance(e, dict) else e


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
            clause = clause & (
                F.col(c).isNull() if v is None else (F.col(c).cast("string") == str(v))
            )
        pred = pred | clause
    return pred


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._manifest_dir = os.path.join(root, "_manifest")

    # ---------------- manifest plumbing ----------------

    def _latest_path(self) -> str:
        return os.path.join(self._manifest_dir, "_LATEST")

    def exists(self) -> bool:
        """K6 create-if-absent check (cleaner than the reference's exception
        sniffing at src/glue_etl.py:465-467)."""
        return os.path.exists(self._latest_path())

    def current_version(self) -> int:
        with open(self._latest_path()) as f:
            return int(f.read().strip())

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
    ) -> int:
        current = self.current_version() if self.exists() else 0
        if base_version is not None and current != base_version:
            raise ConcurrentWriteError(
                f"{operation}: table advanced v{base_version} -> v{current} "
                "since this operation read it; re-read and retry"
            )
        version = current + 1
        os.makedirs(self._manifest_dir, exist_ok=True)
        manifest = {
            "version": version,
            "operation": operation,
            "data_dirs": data_dirs,
            "partition_by": partition_by,
            "committed_at": time.time(),
        }
        mpath = os.path.join(self._manifest_dir, f"v{version:08d}.json")
        try:
            # O_EXCL: exactly one writer can create this version's manifest
            fd = os.open(mpath, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            raise ConcurrentWriteError(
                f"{operation}: lost the race for v{version} "
                f"(another writer committed it); re-read and retry"
            ) from None
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        # atomic pointer swap: write temp file then rename
        fd, tmp = tempfile.mkstemp(dir=self._manifest_dir)
        with os.fdopen(fd, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._latest_path())
        return version

    def _new_data_dir(self) -> str:
        n = self.current_version() + 1 if self.exists() else 1
        return os.path.join(self.root, "data", f"v{n:08d}")

    @staticmethod
    def _carry_prior_dirs(prior: dict, touched_rows: list[dict], new_dir: str) -> list:
        """Manifest entries for a partition-pruned rewrite: every prior
        data dir passes through with ``touched_rows`` added to its
        exclusion mask; the new dir (holding the rewritten partitions)
        is appended unmasked."""
        entries = []
        for e in prior["data_dirs"]:
            e = dict(e) if isinstance(e, dict) else {"path": e, "exclude": []}
            seen = {tuple(sorted(x.items())) for x in e.get("exclude", [])}
            extra = [t for t in touched_rows if tuple(sorted(t.items())) not in seen]
            e["exclude"] = e.get("exclude", []) + extra
            entries.append(e)
        entries.append(new_dir)
        return entries

    def _touched_partitions(self, df, pcols: list[str]) -> list[dict]:
        """Distinct partition tuples present in ``df`` (control-plane
        collect — bounded by partition count, never data volume)."""
        touched = {
            tuple(_part_key(v) for v in r) for r in df.select(*pcols).distinct().collect()
        }
        return [dict(zip(pcols, t)) for t in sorted(touched, key=str)]

    # ---------------- writers (K1-K6) ----------------

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """K1/K4: full overwrite (schema evolution implicit — the new
        version's parquet schema wins)."""
        partition_by = partition_by or []
        base = self.current_version() if self.exists() else 0
        d = self._new_data_dir()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(d)
        return self._commit([d], "overwrite", partition_by, base_version=base)

    def append(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """K2/K3: append — new version references prior data dirs plus the
        new one (no rewrite of existing files)."""
        if not self.exists():
            return self.overwrite(df, partition_by)
        prior = self._manifest(self.current_version())
        partition_by = partition_by or prior["partition_by"]
        d = self._new_data_dir()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(d)
        return self._commit(
            prior["data_dirs"] + [d], "append", partition_by, base_version=prior["version"]
        )

    def merge(self, updates: DataFrame, keys: list[str]) -> int:
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

        Unpartitioned tables fall back to a full-snapshot rewrite (there is
        no prune unit without partitions; file-level pruning would need
        per-file key stats, which Delta itself only gets from data skipping).
        """
        if not self.exists():
            return self.overwrite(updates)
        prior = self._manifest(self.current_version())
        pcols = prior["partition_by"]
        if not pcols:
            merged = merge_upsert(self.read(), updates, keys)
            d = self._new_data_dir()
            merged.write.mode("overwrite").parquet(d)
            return self._commit([d], "merge", pcols, base_version=prior["version"])

        target = self.read()
        # Touched partitions: the updates' own partitions plus partitions
        # of target rows whose keys match (key-column-pruned semi-join —
        # one slim shuffle), so a key that moved partitions is rewritten.
        tgt_matched = target.join(updates.select(*keys).distinct(), on=keys, how="left_semi")
        touched_rows = self._touched_partitions(
            updates.select(*pcols).unionByName(tgt_matched.select(*pcols)), pcols
        )

        merged = merge_upsert(
            target.filter(_partition_predicate(pcols, touched_rows)), updates, keys
        )
        d = self._new_data_dir()
        merged.write.mode("overwrite").partitionBy(*pcols).parquet(d)

        # Prior dirs pass through with the touched partitions masked out;
        # read() turns the mask into a partition-pruning filter, so those
        # directories are skipped at scan planning, not scanned-and-dropped.
        return self._commit(
            self._carry_prior_dirs(prior, touched_rows, d), "merge", pcols,
            base_version=prior["version"],
        )

    def delete(self, condition) -> int:
        """Delta-style ``DELETE FROM t WHERE condition`` as copy-on-write
        (reference's storage layer is Delta, whose DELETE rewrites only
        files containing matches). Partition-pruned like merge(): only
        partitions containing matching rows are rewritten; the rest pass
        through behind the exclusion mask. Unpartitioned tables rewrite
        the snapshot."""
        import pyspark.sql.functions as F

        prior = self._manifest(self.current_version())
        pcols = prior["partition_by"]
        target = self.read()
        if not pcols:
            kept = target.filter(~F.expr(condition) if isinstance(condition, str) else ~condition)
            d = self._new_data_dir()
            kept.write.mode("overwrite").parquet(d)
            return self._commit([d], "delete", pcols, base_version=prior["version"])

        cond = F.expr(condition) if isinstance(condition, str) else condition
        touched_rows = self._touched_partitions(target.filter(cond), pcols)
        if not touched_rows:
            return self.current_version()  # no-op delete: nothing matched
        kept = target.filter(_partition_predicate(pcols, touched_rows)).filter(~cond)
        d = self._new_data_dir()
        kept.write.mode("overwrite").partitionBy(*pcols).parquet(d)
        return self._commit(
            self._carry_prior_dirs(prior, touched_rows, d), "delete", pcols,
            base_version=prior["version"],
        )

    def update(self, condition, assignments: dict) -> int:
        """Delta-style ``UPDATE t SET col = expr WHERE condition`` as
        copy-on-write, partition-pruned: rewrites only partitions holding
        matching rows (assignments must not change partition columns —
        use merge() for partition-moving updates, which handles the old
        partition correctly)."""
        import pyspark.sql.functions as F

        prior = self._manifest(self.current_version())
        pcols = prior["partition_by"]
        bad = set(assignments) & set(pcols)
        if bad:
            raise ValueError(f"update() cannot modify partition columns {sorted(bad)}; use merge()")
        cond = F.expr(condition) if isinstance(condition, str) else condition

        def apply(df):
            for c, expr in assignments.items():
                val = F.expr(expr) if isinstance(expr, str) else expr
                df = df.withColumn(c, F.when(cond, val).otherwise(F.col(c)))
            return df

        target = self.read()
        if not pcols:
            d = self._new_data_dir()
            apply(target).write.mode("overwrite").parquet(d)
            return self._commit([d], "update", pcols, base_version=prior["version"])
        touched_rows = self._touched_partitions(target.filter(cond), pcols)
        if not touched_rows:
            return self.current_version()
        rewritten = apply(target.filter(_partition_predicate(pcols, touched_rows)))
        d = self._new_data_dir()
        rewritten.write.mode("overwrite").partitionBy(*pcols).parquet(d)
        return self._commit(
            self._carry_prior_dirs(prior, touched_rows, d), "update", pcols,
            base_version=prior["version"],
        )

    # ---------------- readers (S4 + time travel) ----------------

    def read(self, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        entries = self._manifest(v)["data_dirs"]
        pcols = self._manifest(v)["partition_by"]
        # one read per commit dir, unioned: multiple partitioned roots can't
        # share a single scan (CONFLICTING_DIRECTORY_STRUCTURES) and schema
        # evolution across commits needs unionByName anyway. Dict entries
        # carry a partition exclusion mask (partitions superseded by a later
        # MERGE) applied as a partition-pruning filter.
        dfs = []
        for e in entries:
            df = self.spark.read.option("mergeSchema", "true").parquet(_entry_path(e))
            excl = e.get("exclude") if isinstance(e, dict) else None
            if excl:
                df = df.filter(~_partition_predicate(pcols, excl))
            dfs.append(df)
        out = dfs[0]
        for other in dfs[1:]:
            out = out.unionByName(other, allowMissingColumns=True)
        return out

    def register(self, name: str, version: int | None = None) -> None:
        """K7 catalog registration (CREATE TABLE ... USING ... LOCATION)."""
        self.read(version).createOrReplaceTempView(name)

    # ---------------- maintenance (§4: OPTIMIZE / VACUUM analogues) -------

    def compact(self, target_partitions: int | None = None) -> int:
        """OPTIMIZE analogue: rewrite current snapshot into right-sized
        files (reference docs/data_model.md:302-308's 128-512 MB targets;
        here AQE coalescing + optional repartition pick the file count)."""
        prior = self._manifest(self.current_version())
        df = self.read()
        if target_partitions:
            df = df.repartition(target_partitions, *(prior["partition_by"] or []))
        d = self._new_data_dir()
        w = df.write.mode("overwrite")
        if prior["partition_by"]:
            w = w.partitionBy(*prior["partition_by"])
        w.parquet(d)
        return self._commit(
            [d], "compact", prior["partition_by"], base_version=prior["version"]
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
        d = self._new_data_dir()
        w = clustered.write.mode("overwrite")
        if prior["partition_by"]:
            w = w.partitionBy(*prior["partition_by"])
        w.parquet(d)
        return self._commit(
            [d], "optimize-zorder", prior["partition_by"], base_version=prior["version"]
        )

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """VACUUM analogue (reference docs/data_model.md:310-316): delete
        data dirs unreferenced by the last ``keep_last`` versions."""
        import shutil

        live: set[str] = set()
        cur = self.current_version()
        versions = [m["version"] for m in self.history()]
        for v in versions[-keep_last:] if keep_last else [cur]:
            live.update(_entry_path(e) for e in self._manifest(v)["data_dirs"])
        removed = []
        data_root = os.path.join(self.root, "data")
        for name in sorted(os.listdir(data_root)):
            d = os.path.join(data_root, name)
            if d not in live:
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
