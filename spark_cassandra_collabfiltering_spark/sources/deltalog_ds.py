"""The Delta interop reader as a NATIVE Spark data source (r8):

    spark.dataSource.register(DeltaLogDataSource)
    spark.read.format("deltalog").option("root", delta_root).load()
    ... .option("version", N)  # time travel

Read-only by design (writing Delta logs is delta_export's migration
job; this engine's writable table format is the native txn lake). The
same protocol adapter shape as ``format("txnlake")``
(sources/txnlake_ds.py): one input partition per live add-file, each
read executor-side via pyarrow with its deletion vector resolved and
masked IN the task; hive-stripped partition columns re-attach as
Arrow constants; column mapping's physical->logical rename happens at
batch construction; ``pushFilters`` prunes the FILE LIST through the
adds' embedded ``stats`` (minValues/maxValues, parsed once at plan
time) plus exact partition values — log arithmetic, no footer opened
— and returns every filter unhandled so Spark re-applies them
row-exactly above the scan. Pushdown is SESSION-GATED exactly as in
txnlake_ds.py (Spark 4 refuses pushFilters readers unless
``spark.sql.python.filterPushdown.enabled``): the default reader
omits pushFilters so a vanilla session can always load;
``register_deltalog(spark)`` or ``.option("pushdown", "true")``
selects the pruning subclass where the session allows.

All table-state logic lives in sources/delta_interop.py (log replay,
checkpoint seeding, protocol gate) and sources/delta_dv.py (the
RoaringBitmap codec); this module only adapts them to the
DataSourceReader protocol, so the two read surfaces can never
disagree about table state.
"""

from __future__ import annotations

import json
import os
import typing

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from spark_cassandra_collabfiltering_spark.sources import delta_dv, lake
from spark_cassandra_collabfiltering_spark.sources import delta_interop as di
from spark_cassandra_collabfiltering_spark.sources.txnlake_ds import (
    _arrow_type,
    _prunable_bound,
)

if typing.TYPE_CHECKING:  # pragma: no cover
    pass


class _DeltaFilePartition(InputPartition):
    def __init__(self, root, file, part_vals, dv_desc):
        self.root = root
        self.file = file  # absolute data-file path
        self.part_vals = part_vals  # {col: string | None}
        self.dv_desc = dv_desc  # deletionVector descriptor or None


def _delta_file_to_batches(partition, schema: T.StructType, part_cols):
    """One add-file to Arrow batches in logical-schema order: DV
    positions masked, partition constants attached, evolution-missing
    columns as nulls, physical names renamed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(partition.file)
    n = tbl.num_rows
    if partition.dv_desc:
        dead = set(
            delta_dv.resolve_descriptor(partition.root, partition.dv_desc)
        )
        if dead:
            keep = [i for i in range(n) if i not in dead]
            tbl = tbl.take(pa.array(keep, type=pa.int64()))
            n = tbl.num_rows
    arrays, names = [], []
    for f in schema.fields:
        at = _arrow_type(f.dataType)
        phys = (f.metadata or {}).get(di._PHYS_KEY, f.name)
        if f.name in part_cols:
            v = di._typed_part_val(
                partition.part_vals.get(f.name), f.dataType
            )
            arrays.append(pa.array([v] * n, type=at))
        elif phys in tbl.column_names:
            col = tbl.column(phys)
            if at is not None and col.type != at:
                col = col.cast(at)
            arrays.append(col)
        else:  # pre-evolution file
            arrays.append(pa.nulls(n, type=at))
        names.append(f.name)
    yield from pa.table(arrays, names=names).to_batches()


class DeltaLogReader(DataSourceReader):
    def __init__(self, root: str, version: "int | None"):
        self._root = root
        state, _v = di._replay_delta(root, version)
        self._schema = T.StructType.fromJson(
            json.loads(state.meta["schemaString"])
        )
        self._part_cols = list(state.meta.get("partitionColumns") or ())
        self._mapping = {
            f.name: (f.metadata or {}).get(di._PHYS_KEY, f.name)
            for f in self._schema.fields
        }
        from urllib.parse import unquote

        self._adds = [
            (os.path.join(root, unquote(p)), a)
            for p, a in sorted(state.adds.items())
        ]

    def _stat_bounds(self, add: dict, col_phys: str, logical: str):
        """(min, max) proof for one column of one add: exact partition
        value singleton, else the stats JSON minValues/maxValues."""
        pv = add.get("partitionValues") or {}
        if logical in self._part_cols:
            v = pv.get(logical)
            return (v, v) if v is not None else None
        s = add.get("stats")
        if not s:
            return None
        st = json.loads(s)
        lo = (st.get("minValues") or {}).get(col_phys)
        hi = (st.get("maxValues") or {}).get(col_phys)
        if lo is None or hi is None:
            return None
        return (lo, hi)

    def _prune_adds(self, filters):
        bounds = _prunable_bound(filters)
        if not bounds:
            return
        keep = []
        for path, a in self._adds:
            ok = True
            for col, (lo, hi) in bounds.items():
                rng = self._stat_bounds(
                    a, self._mapping.get(col, col), col
                )
                if rng is None:
                    continue  # no proof -> must keep
                mn, mx = rng
                # partition values arrive as strings; type them
                # against the filter value's type via the schema
                if col in self._part_cols:
                    dt = next(
                        f.dataType
                        for f in self._schema.fields
                        if f.name == col
                    )
                    mn = di._typed_part_val(mn, dt)
                    mx = di._typed_part_val(mx, dt)
                lo_c = lake._stat_val(lo) if lo is not None else None
                hi_c = lake._stat_val(hi) if hi is not None else None
                mn = lake._stat_val(mn)
                mx = lake._stat_val(mx)
                if mn is None or mx is None:
                    continue
                if (hi_c is not None and mn > hi_c) or (
                    lo_c is not None and mx < lo_c
                ):
                    ok = False
                    break
            if ok:
                keep.append((path, a))
        self._adds = keep

    def partitions(self):
        return [
            _DeltaFilePartition(
                self._root,
                path,
                dict(a.get("partitionValues") or {}),
                a.get("deletionVector"),
            )
            for path, a in self._adds
        ]

    def read(self, partition):
        yield from _delta_file_to_batches(
            partition, self._schema, self._part_cols
        )


class DeltaLogPushdownReader(DeltaLogReader):
    """DeltaLogReader + Catalyst ``pushFilters`` file pruning — a
    subclass because Spark 4 refuses pushFilters readers in sessions
    where ``spark.sql.python.filterPushdown.enabled`` is false (the
    same session-gating as sources/txnlake_ds.py); select via
    ``.option("pushdown", "true")`` or :func:`register_deltalog`."""

    def pushFilters(self, filters):
        self._prune_adds(filters)
        # file pruning never proves row truth: Spark re-applies all
        return filters


class DeltaLogStreamReader(DataSourceStreamReader):
    """Stream FROM a Delta table (the delta-as-a-streaming-source
    contract): offsets are log versions; micro-batch (start, end] =
    the data files the gap commits ADDED with ``dataChange: true``,
    one input partition per file, decoded executor-side. A commit
    that REWRITES data (removes with dataChange, or an add carrying a
    deletion vector) raises unless ``skipChangeCommits`` — exactly
    Delta's documented semantics; compaction commits (dataChange
    false) skip silently."""

    def __init__(self, root: str, skip_change_commits: bool):
        self._root = root
        self._skip = skip_change_commits

    def initialOffset(self):
        return {"version": -1}

    def latestOffset(self):
        latest = di.delta_latest_version(self._root)
        return {"version": latest if latest is not None else -1}

    def _actions(self, v: int) -> list:
        p = di._commit_path(self._root, v)
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"Delta commit v{v} missing (log truncated); restart "
                "the stream from a newer offset"
            )
        out = []
        with open(p) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def _parts_for(self, v: int) -> list:
        from urllib.parse import unquote

        acts = self._actions(v)
        adds = [a["add"] for a in acts if a.get("add")]
        removes = [a["remove"] for a in acts if a.get("remove")]
        changing = any(r.get("dataChange", True) for r in removes) or any(
            a.get("deletionVector") for a in adds
        )
        if changing:
            if self._skip:
                return []
            raise ValueError(
                f"streaming source hit a data-changing rewrite at "
                f"v{v}; this source streams APPEND-ONLY Delta tables "
                "— set skipChangeCommits to ignore rewrites"
            )
        return [
            _DeltaFilePartition(
                self._root,
                os.path.join(self._root, unquote(a["path"])),
                dict(a.get("partitionValues") or {}),
                None,
            )
            for a in adds
            if a.get("dataChange", True)
        ]

    def partitions(self, start, end):
        parts = []
        for v in range(start["version"] + 1, end["version"] + 1):
            parts += self._parts_for(v)
        return parts

    def read(self, partition):
        state, _ = di._replay_delta(self._root, None)
        schema = T.StructType.fromJson(
            json.loads(state.meta["schemaString"])
        )
        part_cols = list(state.meta.get("partitionColumns") or ())
        yield from _delta_file_to_batches(partition, schema, part_cols)

    def commit(self, end):
        pass  # offsets are durable in the engine's checkpoint


class DeltaLogDataSource(DataSource):
    """format("deltalog") — options: root (required), version (time
    travel). Read-only."""

    @classmethod
    def name(cls):
        return "deltalog"

    def _root(self) -> str:
        root = self.options.get("root")
        if not root:
            raise ValueError("deltalog requires .option('root', <path>)")
        return root

    def schema(self):
        v = self.options.get("version")
        state, _ = di._replay_delta(
            self._root(), None if v is None else int(v)
        )
        return T.StructType.fromJson(json.loads(state.meta["schemaString"]))

    _default_pushdown = False  # see register_deltalog

    def reader(self, schema):
        v = self.options.get("version")
        opt = self.options.get("pushdown")
        push = (
            self._default_pushdown
            if opt is None
            else str(opt).lower() in ("true", "1")
        )
        cls = DeltaLogPushdownReader if push else DeltaLogReader
        return cls(self._root(), None if v is None else int(v))

    def streamReader(self, schema):
        skip = str(
            self.options.get("skipchangecommits", "false")
        ).lower() in ("true", "1")
        return DeltaLogStreamReader(self._root(), skip)

    def writer(self, schema, overwrite):
        raise NotImplementedError(
            "format('deltalog') is read-only interop; write through the "
            "native txn lake and delta_export, or a real Delta writer"
        )


class DeltaLogPushdownDataSource(DeltaLogDataSource):
    """format("deltalog") with pushdown-default reads — register only
    where the session conf allows (use :func:`register_deltalog`)."""

    _default_pushdown = True


def register_deltalog(spark) -> bool:
    """Register ``format("deltalog")`` with the strongest reader the
    session permits — same contract as
    :func:`~spark_cassandra_collabfiltering_spark.sources.txnlake_ds.register_txnlake`:
    enable ``spark.sql.python.filterPushdown.enabled`` at runtime and
    register the pushdown-default variant iff it took effect, else
    the portable variant (identical answers, no plan-time pruning).
    Returns True when pushdown is active."""
    conf = "spark.sql.python.filterPushdown.enabled"
    try:
        spark.conf.set(conf, "true")
    except Exception:
        pass  # static/locked conf: fall through to read the value
    try:
        enabled = str(spark.conf.get(conf)).lower() == "true"
    except Exception:
        enabled = False
    spark.dataSource.register(
        DeltaLogPushdownDataSource if enabled else DeltaLogDataSource
    )
    return enabled
