"""Change Data Feed for LakeTable — Delta's ``table_changes`` analogue.

Delta materializes CDF as change files written alongside each commit;
this implementation derives the same row-level feed at READ time from
the manifests, while preserving Delta's cost profile: for each commit it
reads only the slices that commit touched (new data dirs, dirs or files
it dropped, partitions it newly masked), NEVER two full snapshots.
Logical changes fall out of multiset difference — rows that a rewrite
carried through unchanged appear in both the pre and post slice and
cancel in ``exceptAll``, so a copy-on-write rewrite emits exactly the
rows whose values changed.

Emitted schema: the table's columns plus ``_change_type`` (``insert`` /
``delete``, upgraded to ``update_preimage`` / ``update_postimage`` when
``keys`` identify rows) and ``_commit_version`` — Delta's CDF column
contract.

compact/optimize commits emit nothing by construction (pre == post as a
multiset); they are skipped by name so the feed also never pays for
reading a full physical rewrite twice (Delta: ``dataChange=false``).

Scale: per commit, the work is bounded by the data that commit touched —
a daily partitioned MERGE on a 100 TB table feeds only that day's
partitions through one ``exceptAll`` (a hash-partition shuffle on the
full row), matching Delta's CDF read cost up to the one rewrite factor.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ecommerce_lakehouse_spark.lake.table import LakeTable, _partition_predicate


def _entry_norm(e) -> tuple[str, list[dict], list[str] | None]:
    if isinstance(e, dict):
        return e["path"], e.get("exclude") or [], e.get("live_files")
    return e, [], None


# physical-only reorganizations: no logical row change (Delta dataChange=false)
_PHYSICAL_OPS = ("compact", "optimize", "optimize-zorder", "auto-compact")


def _rel_parquet_files(d: str) -> set[str]:
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"change feed: data dir {d} referenced by the manifest is missing "
            "(vacuumed?). Narrow the version range — silently skipping it "
            "would misreport changes."
        )
    out = set()
    for base, _dirs, files in os.walk(d):
        for name in files:
            if name.endswith(".parquet"):
                out.add(os.path.relpath(os.path.join(base, name), d))
    return out


def _read_slice(
    table: LakeTable,
    path: str,
    files: list[str] | None,
    pcols: list[str],
    minus_mask: list[dict],
    only_mask: list[dict] | None = None,
    minus_dvs: list[str] | None = None,
) -> DataFrame | None:
    """Rows of one data dir restricted to ``files`` (None = all), outside
    ``minus_mask`` partitions, (when given) inside ``only_mask`` ones, and
    excluding rows named by the ``minus_dvs`` deletion vectors — a slice
    must reflect what its snapshot READ, or rows a merge-on-read DELETE
    already removed would re-surface as feed deletes on the next rewrite."""
    import pyspark.sql.functions as F

    if files is not None:
        if not files:
            return None
        reader = table.spark.read.option("mergeSchema", "true").option(
            "basePath", path
        )
        df = reader.parquet(*[os.path.join(path, rel) for rel in sorted(files)])
    else:
        df = table.spark.read.option("mergeSchema", "true").parquet(path)
    # serve the feed under the CURRENT logical schema (Delta CDF does the
    # same for column-mapped tables): pre-rename slices union cleanly
    # with post-rename ones
    from ecommerce_lakehouse_spark.lake.table import _apply_column_mapping

    df = _apply_column_mapping(
        df, table.column_mapping(), table.dropped_columns()
    )
    if minus_mask:
        df = df.filter(~_partition_predicate(pcols, minus_mask))
    if only_mask is not None:
        df = df.filter(_partition_predicate(pcols, only_mask))
    if minus_dvs:
        from ecommerce_lakehouse_spark.lake.table import _dv_join

        df = _dv_join(df, table.spark.read.parquet(*minus_dvs), "left_anti")
    return df


def _mask_minus(a: list[dict], b: list[dict]) -> list[dict]:
    bset = {tuple(sorted((k, str(v)) for k, v in row.items())) for row in b}
    return [
        row
        for row in a
        if tuple(sorted((k, str(v)) for k, v in row.items())) not in bset
    ]


def _union(frames: list[DataFrame]) -> DataFrame | None:
    frames = [f for f in frames if f is not None]
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def _conform(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Give both frames the union of their columns (nulls for missing),
    same order — exceptAll requires positional agreement."""
    import pyspark.sql.functions as F

    for c in b.columns:
        if c not in a.columns:
            a = a.withColumn(c, F.lit(None).cast(b.schema[c].dataType))
    for c in a.columns:
        if c not in b.columns:
            b = b.withColumn(c, F.lit(None).cast(a.schema[c].dataType))
    cols = sorted(a.columns)
    return a.select(*cols), b.select(*cols)


def _version_slices(table: LakeTable, v: int) -> tuple[DataFrame | None, DataFrame | None]:
    """(pre, post): rows visible at v-1 but not carried into v, and rows
    newly visible at v — reading only what commit v touched."""
    m_cur = table._manifest(v)
    m_prev = table._manifest(v - 1) if v > 1 else None
    pcols_prev = m_prev["partition_by"] if m_prev else []
    pcols_cur = m_cur["partition_by"]
    prev = {p: (excl, live) for p, excl, live in map(_entry_norm, m_prev["data_dirs"] if m_prev else [])}
    cur = {p: (excl, live) for p, excl, live in map(_entry_norm, m_cur["data_dirs"])}
    # a slice reflects what its snapshot READ: rows behind that
    # snapshot's deletion vectors were already gone / never visible
    dvs_p = m_prev.get("deletion_vectors", []) if m_prev else []
    dvs_c = m_cur.get("deletion_vectors", [])

    removed: list[DataFrame] = []
    added: list[DataFrame] = []
    for path, (excl_p, live_p) in prev.items():
        if path not in cur:
            removed.append(
                _read_slice(table, path, live_p, pcols_prev, excl_p, minus_dvs=dvs_p)
            )
            continue
        excl_c, live_c = cur[path]
        new_excl = _mask_minus(excl_c, excl_p)
        if new_excl:
            removed.append(
                _read_slice(
                    table, path, live_p, pcols_prev, excl_p,
                    only_mask=new_excl, minus_dvs=dvs_p,
                )
            )
        un_excl = _mask_minus(excl_p, excl_c)
        if un_excl:  # restore() can re-expose masked partitions
            added.append(
                _read_slice(
                    table, path, live_c, pcols_cur, excl_c,
                    only_mask=un_excl, minus_dvs=dvs_c,
                )
            )
        if live_p != live_c:
            all_files = (
                None
                if live_p is not None and live_c is not None
                else _rel_parquet_files(path)
            )
            pf = set(live_p) if live_p is not None else all_files
            cf = set(live_c) if live_c is not None else all_files
            dropped, gained = pf - cf, cf - pf
            if dropped:
                removed.append(
                    _read_slice(
                        table, path, sorted(dropped), pcols_prev, excl_p,
                        minus_dvs=dvs_p,
                    )
                )
            if gained:
                added.append(
                    _read_slice(
                        table, path, sorted(gained), pcols_cur, excl_c,
                        minus_dvs=dvs_c,
                    )
                )
    for path, (excl_c, live_c) in cur.items():
        if path not in prev:
            added.append(
                _read_slice(table, path, live_c, pcols_cur, excl_c, minus_dvs=dvs_c)
            )

    # merge-on-read DELETE (and its rollback): rows appear/vanish with no
    # file change — deletion vectors name them by (file, row_index). Read
    # ONLY the files the DV touches (the sidecar is small; its distinct
    # file list is control-plane) and semi-join the ids back to full rows.
    def _dv_rows(dv_paths: list[str], owners: dict) -> list[DataFrame]:
        from urllib.parse import unquote, urlparse

        from ecommerce_lakehouse_spark.lake.table import _dv_join

        dv = table.spark.read.parquet(*dv_paths)
        files = [r[0] for r in dv.select("__file_path").distinct().collect()]
        # group by owning data dir + basePath so hive partition columns
        # survive the per-file read (a bare file scan would drop them);
        # both sides normalized (the _metadata path is an absolute
        # percent-encoded URI; manifest paths may be relative). A DV file
        # outside the relevant snapshot's dirs contributes no rows to it.
        owner_by_abs = {os.path.abspath(p): p for p in owners}
        by_dir: dict[str, list[str]] = {}
        for f in files:
            local = os.path.abspath(unquote(urlparse(f).path))
            owner = next(
                (
                    orig
                    for ap, orig in owner_by_abs.items()
                    if local.startswith(ap.rstrip("/") + "/")
                ),
                None,
            )
            if owner is not None:
                by_dir.setdefault(owner, []).append(f)
        out = []
        for d, fs in by_dir.items():
            reader = table.spark.read.option("mergeSchema", "true").option(
                "basePath", d
            )
            out.append(_dv_join(reader.parquet(*fs), dv, "left_semi"))
        return out

    new_dvs = [p for p in dvs_c if p not in set(dvs_p)]
    if new_dvs and m_prev is not None:  # rows removed FROM the prior snapshot
        removed.extend(_dv_rows(new_dvs, prev))
    dropped_dvs = [p for p in dvs_p if p not in set(dvs_c)]
    if dropped_dvs:  # restore() to a pre-delete version: rows come back
        added.extend(_dv_rows(dropped_dvs, cur))
    return _union(removed), _union(added)


def table_changes(
    table: LakeTable,
    starting_version: int,
    ending_version: int | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """Delta ``table_changes(tbl, start, end)``: one row per logical
    row-level change in commits [starting_version, ending_version], with
    ``_change_type`` and ``_commit_version`` appended. ``keys`` upgrades
    matched delete+insert pairs to update_preimage/update_postimage."""
    import pyspark.sql.functions as F

    from ecommerce_lakehouse_spark.lake.table import check_table_features

    end = ending_version if ending_version is not None else table.current_version()
    # the feed decodes DV sidecars / mapped columns — gate like a read
    check_table_features(
        table._manifest(table.current_version()), for_write=False, where=table.root
    )
    if starting_version < 1 or end > table.current_version() or starting_version > end:
        raise ValueError(
            f"change feed range [{starting_version}, {end}] outside table "
            f"history [1, {table.current_version()}]"
        )
    frames: list[DataFrame] = []
    for v in range(starting_version, end + 1):
        if table._manifest(v).get("operation") in _PHYSICAL_OPS:
            continue  # physical-only: pre == post by construction
        pre, post = _version_slices(table, v)
        if pre is None and post is None:
            continue  # metadata-only commit
        if pre is None:
            pre = post.limit(0)
        if post is None:
            post = pre.limit(0)
        pre, post = _conform(pre, post)
        # multiset diff in ONE aggregation (not two exceptAll shuffles):
        # tag post +1 / pre -1, sum per whole row — rows a rewrite carried
        # through unchanged net to 0 and vanish; net>0 rows are inserts
        # (with multiplicity), net<0 deletes. Shuffle width = changed data
        # only, bounded by what the commit touched, never a snapshot.
        data_cols = post.columns
        net = (
            post.withColumn("__tag", F.lit(1))
            .unionByName(pre.withColumn("__tag", F.lit(-1)))
            .groupBy(*data_cols)
            .agg(F.sum("__tag").alias("__net"))
            .filter(F.col("__net") != 0)
        )
        if keys:
            # a key appearing on both sides is an update: one window pass
            # over the (small) changed set replaces intersect + two joins
            from pyspark.sql import Window

            w = Window.partitionBy(*keys)
            net = net.withColumn(
                "__has_ins", F.max(F.when(F.col("__net") > 0, 1).otherwise(0)).over(w)
            ).withColumn(
                "__has_del", F.max(F.when(F.col("__net") < 0, 1).otherwise(0)).over(w)
            )
            ctype = F.when(
                F.col("__net") > 0,
                F.when(F.col("__has_del") == 1, F.lit("update_postimage")).otherwise(
                    F.lit("insert")
                ),
            ).otherwise(
                F.when(F.col("__has_ins") == 1, F.lit("update_preimage")).otherwise(
                    F.lit("delete")
                )
            )
        else:
            ctype = F.when(F.col("__net") > 0, F.lit("insert")).otherwise(
                F.lit("delete")
            )
        changed = (
            net.withColumn("_change_type", ctype)
            .withColumn(
                "__copy",
                F.explode(F.expr("array_repeat(1, int(abs(__net)))")),
            )
            .select(*data_cols, "_change_type")
            .withColumn("_commit_version", F.lit(v))
        )
        frames.append(changed)
    if not frames:
        empty = table.read(version=end).limit(0)
        return empty.withColumn("_change_type", F.lit("")).withColumn(
            "_commit_version", F.lit(0)
        )
    return _union(frames)
