"""Distributed decode: encoded blocks DataFrame -> transcripts DataFrame.

The independent-reader half of the round-trip contract (reference analogue:
``readParquet`` re-opening the output with a second reader,
``converter/convert_test.go:63-97``). Groups the column blocks of each
(partition, chunk) and reverses the codec kernels; bit-identical by the
codec contract, verified in tests by per-turn ``text`` equality and full
column comparison under stable (conv_id, turn_idx) ordering.

Dynamic schema: each block's meta carries ``ctype`` (str/i32/i64/ts/f64/
bool), so decode rebuilds exactly the columns the table was encoded with —
core six plus any extras — without a hardcoded column list. The output
schema is derived from the blocks' own metadata (the Spark analogue of
reading a Parquet footer) via one tiny driver-side aggregate over the
pruned (column, meta) projection.

Arrow-native like the encode path: string columns are rebuilt directly
from (utf8 buffer, offsets) with no per-row Python.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from . import arrow_ops, codecs
from .blocks import TRANSCRIPT_COLUMNS

# legacy blocks (written before ctype landed) carry only the core columns
_CORE_CTYPES = {
    "conv_id": "str", "role": "str", "text": "str", "tool": "str",
    "turn_idx": "i32", "ts": "ts",
}

_CTYPE_TO_ARROW = {
    "str": pa.string(),
    "i32": pa.int32(),
    "i64": pa.int64(),
    "ts": pa.timestamp("us", tz="UTC"),
    "f64": pa.float64(),
    "bool": pa.bool_(),
}


def _column_order(cols) -> list[str]:
    """Core columns in canonical order, then extras lexically (M2)."""
    core = [c for c in TRANSCRIPT_COLUMNS if c in cols]
    return core + sorted(c for c in cols if c not in set(TRANSCRIPT_COLUMNS))


def group_keys(blocks: DataFrame) -> list[str]:
    """Decode group identity. A streaming warehouse's blocks live under
    ``epoch=N`` partition dirs, so reading the whole warehouse surfaces an
    ``epoch`` column — it MUST be part of the group key or two epochs that
    reuse (partition_id, chunk_idx) would be fused into one corrupt chunk
    (ADVICE r2: the pid-remap alone breaks on restart with a different
    num_partitions)."""
    return ["partition_id", "chunk_idx"] + (
        ["epoch"] if "epoch" in blocks.columns else []
    )


def _decode_one(r: dict, n: int) -> pa.Array:
    payload = bytes(r["payload"] or b"")
    aux = bytes(r["aux"] or b"")
    meta = json.loads(r["meta"])
    ctype = meta.get("ctype") or _CORE_CTYPES.get(r["column"], "str")
    if ctype == "str":
        arr = arrow_ops.decode_string_column(r["codec"], payload, aux, meta, n)
        if pa.types.is_large_string(arr.type):
            arr = arr.cast(pa.string())
        return arr
    values = codecs.decode(r["codec"], payload, aux, meta, n)
    if ctype == "ts":
        return pa.array(np.asarray(values, dtype=np.int64)).cast(
            pa.timestamp("us", tz="UTC")
        )
    if ctype == "i32":
        return pa.array(np.asarray(values, dtype=np.int32), type=pa.int32())
    if ctype == "i64":
        return pa.array(np.asarray(values, dtype=np.int64), type=pa.int64())
    if ctype == "f64":
        return pa.array(np.asarray(values, dtype=np.float64), type=pa.float64())
    if ctype == "bool":
        return pa.array(np.asarray(values, dtype=np.bool_), type=pa.bool_())
    raise ValueError(f"unknown ctype {ctype}")


def decode_chunk_arrow(block_rows: list[dict]) -> pa.Table:
    """Block dicts (one per column present) -> reconstructed Arrow chunk.

    Columns absent from ``block_rows`` are skipped — the column-pruned
    decode path ships only the requested columns' blocks to this UDF.
    """
    by_col = {r["column"]: r for r in block_rows}
    n = int(block_rows[0]["n_rows"])
    order = _column_order(by_col)
    arrays = [_decode_one(by_col[c], n) for c in order]
    schema = pa.schema([pa.field(c, a.type) for c, a in zip(order, arrays)])
    return pa.Table.from_arrays(arrays, schema=schema)


def _decode_group(table: pa.Table) -> pa.Table:
    return decode_chunk_arrow(table.to_pylist())


def _default_array(ctype: str, n: int) -> pa.Array:
    """Typed zero-default column for merged-schema decode — the SAME
    defaults ``normalize_input`` imputes on encode (str "", int 0,
    f64 0.0, bool false, ts epoch-0), so an evolved column reads back
    exactly as if the old rows had been encoded after the evolution."""
    if ctype == "str":
        return pa.nulls(n, pa.string()).fill_null("")
    if ctype == "ts":
        return pa.array(np.zeros(n, dtype=np.int64)).cast(
            pa.timestamp("us", tz="UTC")
        )
    np_dtype = {"i32": np.int32, "i64": np.int64, "f64": np.float64,
                "bool": np.bool_}[ctype]
    return pa.array(np.zeros(n, dtype=np_dtype),
                    type=_CTYPE_TO_ARROW[ctype])


def _decode_group_filling(ctypes: dict):
    """Closure for merged-schema decode: chunks missing a merged column
    emit its typed default array (cloudpickle ships the closure; the
    module import itself still needs shipping.ensure_shipped)."""
    order = _column_order(ctypes)

    def fn(table: pa.Table) -> pa.Table:
        t = decode_chunk_arrow(table.to_pylist())
        n = len(t)
        arrays = [
            t[c].combine_chunks() if c in t.column_names
            else _default_array(ctypes[c], n)
            for c in order
        ]
        return pa.Table.from_arrays(arrays, names=order)

    return fn


def schema_from_ctypes(ctypes: dict[str, str]):
    """(column -> ctype) map -> the decode output Spark schema (canonical
    column order, non-nullable). The map typically comes from the
    manifests' schema_sig (``datasource._ctypes_from_manifests``)."""
    from pyspark.sql import types as T

    to_spark = {
        "str": T.StringType(), "i32": T.IntegerType(), "i64": T.LongType(),
        "ts": T.TimestampType(), "f64": T.DoubleType(), "bool": T.BooleanType(),
    }
    return T.StructType(
        [T.StructField(c, to_spark[ctypes[c]], False)
         for c in _column_order(ctypes)]
    )


def schema_from_blocks(blocks: DataFrame, requested: list[str] | None = None):
    """Output Spark schema from the blocks' own metadata (footer analogue);
    see ``ctypes_from_blocks`` for the derivation and its guarantees."""
    return schema_from_ctypes(ctypes_from_blocks(blocks, requested))


def ctypes_from_blocks(
    blocks: DataFrame,
    requested: list[str] | None = None,
    merge: bool = False,
) -> dict[str, str]:
    """(column -> ctype) map from the blocks' own metadata.

    One driver-side aggregate over the (column, meta) projection — parquet
    column pruning keeps this scan narrow; result is O(columns).

    ``requested`` columns missing from the blocks (e.g. a zone-map-pruned
    scan that matched zero chunks) still get a typed field — core columns
    from their known types, unknown extras as string — so downstream
    filters resolve against an empty result instead of failing analysis.

    ``merge=True`` is additive schema evolution: heterogeneous chunk
    signatures UNION into one superset schema instead of raising, as long
    as no column appears with two different ctypes (that still raises —
    a type change is never guessable). Chunks missing a merged column
    decode with the typed zero-defaults ``normalize_input`` uses.
    """
    import pyspark.sql.functions as F

    # one aggregation over the narrow (keys, column, ctype) projection:
    # every chunk's sorted (column, ctype) signature, deduplicated. A
    # heterogeneous warehouse (a second encode appending different extras,
    # legacy pre-ctype blocks mixed with new, a streaming schema change
    # across epochs) fails LOUDLY here instead of decoding other chunks
    # against one sampled chunk's schema (ADVICE r2). Cost is O(chunks)
    # metadata rows — parquet column pruning keeps the scan narrow.
    per_chunk = (
        blocks.select(
            *group_keys(blocks), "column",
            F.get_json_object("meta", "$.ctype").alias("ctype"),
        )
        .groupBy(*group_keys(blocks))
        .agg(
            F.sort_array(F.collect_list(F.struct("column", "ctype"))).alias("sig"),
            (F.count("*") > F.count_distinct("column")).alias("collided"),
        )
    )
    sigs = per_chunk.select("sig", "collided").distinct().collect()
    if any(r["collided"] for r in sigs):
        raise ValueError(
            "colliding chunk keys: multiple blocks for one column share a "
            "(partition_id, chunk_idx[, epoch]) group — two encode jobs "
            "appended into one blocks dir without distinct partition dirs; "
            "decode refuses to fuse them"
        )
    if len(sigs) > 1 and not merge:
        rendered = sorted(
            str([(e["column"], e["ctype"]) for e in s["sig"]]) for s in sigs
        )
        raise ValueError(
            f"heterogeneous chunk schemas in warehouse ({len(sigs)} distinct "
            "column/ctype sets) — decode refuses to guess; re-encode to one "
            "schema (jobs/compact.py --merge-schemas unifies additive "
            "evolution) or decode subsets. Signatures: " + "; ".join(rendered)
        )
    ctypes: dict[str, str] = {}
    for s in sigs:
        for e in s["sig"]:
            ct = e["ctype"] or _CORE_CTYPES.get(e["column"], "str")
            prev = ctypes.setdefault(e["column"], ct)
            if prev != ct:
                raise ValueError(
                    f"column '{e['column']}' appears with two ctypes "
                    f"({prev} vs {ct}) across chunks — a type CHANGE is "
                    "never merged; re-encode the offending batch"
                )
    if not ctypes:  # zero matching blocks: typed empty result
        for c in requested or TRANSCRIPT_COLUMNS:
            ctypes[c] = _CORE_CTYPES.get(c, "str")
    return ctypes


# the driver-side schema fast lane only engages on small metadata sets;
# past these caps the distributed derivation (one narrow Spark aggregate)
# is the right tool — opening 400k footers on the driver is the anti-move
_FAST_SCHEMA_MAX_FILES = 256
_FAST_SCHEMA_MAX_ROWS = 1_000_000


def _bare_parquet_files(df: DataFrame) -> list[str] | None:
    """Local parquet file paths when ``df`` is a BARE parquet scan — an
    analyzed plan that is exactly one LogicalRelation, no filters or
    projections. Only such a plan is safe to mirror driver-side: any other
    lineage (pruning joins, in-memory encode output, unions) must keep the
    distributed schema derivation. Returns None on any doubt."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRelation":
            return None
        if "arquet" not in plan.relation().fileFormat().toString():
            return None
        files = [
            f[len("file:"):] if f.startswith("file:") else f
            for f in df.inputFiles()
        ]
        if not files or any("://" in f for f in files):
            return None  # remote URIs: keep the distributed path
        return files
    except Exception:
        return None


def _ctypes_fast(
    raw_blocks: DataFrame,
    requested: list[str] | None,
    merge: bool,
) -> dict[str, str] | None:
    """Driver-side mirror of :func:`ctypes_from_blocks` for bare parquet
    scans: the schema-derivation aggregate is O(block-metadata rows), and
    below the caps reading (keys, column, meta) straight from the parquet
    footprint costs milliseconds where the Spark job costs a full
    scheduling round-trip PER DECODE (measured ~0.45 s of the 0.83 s
    decode phase at sf0.1 — r6 guide §1/§5: driver O(metadata) work).

    Same signature semantics, same loud failures (identical messages) for
    collisions / heterogeneous schemas / type changes. Returns None
    whenever the fast lane cannot PROVE equivalence (non-bare plan, caps
    exceeded, unreadable files) — the caller then runs the Spark path.
    """
    import pyarrow.parquet as pq

    cols_avail = set(raw_blocks.columns)
    if not {"partition_id", "chunk_idx", "column", "meta"} <= cols_avail:
        return None
    files = _bare_parquet_files(raw_blocks)
    if files is None or len(files) > _FAST_SCHEMA_MAX_FILES:
        return None
    has_epoch = "epoch" in cols_avail
    key_cols = ["partition_id", "chunk_idx"] + (["epoch"] if has_epoch else [])
    want = key_cols + ["column", "meta"]
    frames: list[dict] = []
    total = 0
    try:
        for f in files:
            pf = pq.ParquetFile(f)
            total += pf.metadata.num_rows
            if total > _FAST_SCHEMA_MAX_ROWS:
                return None
            phys = set(pf.schema_arrow.names)
            t = pf.read(columns=[c for c in want if c in phys])
            d = {c: t.column(c).to_pylist() for c in t.schema.names}
            # hive-partitioned keys (partition_id / epoch) live in the path
            hive: dict[str, int] = {}
            for seg in f.split("/")[:-1]:
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    if k in ("partition_id", "epoch"):
                        hive[k] = int(v)
            for k in key_cols:
                if k not in d:
                    if k not in hive:
                        return None  # key neither physical nor in the path
                    d[k] = [hive[k]] * t.num_rows
            frames.append(d)
    except Exception:
        return None

    keep = requested if requested is None else set(requested)
    meta_ctype: dict[str, str | None] = {}
    per_chunk: dict[tuple, list[tuple[str, str | None]]] = {}
    collided: set[tuple] = set()
    for d in frames:
        for i, col in enumerate(d["column"]):
            if col.startswith("__"):
                continue
            if keep is not None and col not in keep:
                continue
            m = d["meta"][i]
            if m not in meta_ctype:
                try:
                    meta_ctype[m] = json.loads(m).get("ctype")
                except Exception:
                    return None
            key = tuple(d[k][i] for k in key_cols)
            per_chunk.setdefault(key, []).append((col, meta_ctype[m]))
    sigs: list[tuple[tuple[str, str | None], ...]] = []
    seen_sigs: set = set()
    for key, entries in per_chunk.items():
        if len(entries) > len({c for c, _ in entries}):
            collided.add(key)
        sig = tuple(sorted(entries, key=lambda e: (e[0], e[1] or "")))
        if sig not in seen_sigs:
            seen_sigs.add(sig)
            sigs.append(sig)
    if collided:
        raise ValueError(
            "colliding chunk keys: multiple blocks for one column share a "
            "(partition_id, chunk_idx[, epoch]) group — two encode jobs "
            "appended into one blocks dir without distinct partition dirs; "
            "decode refuses to fuse them"
        )
    if len(sigs) > 1 and not merge:
        rendered = sorted(str([(c, ct) for c, ct in s]) for s in sigs)
        raise ValueError(
            f"heterogeneous chunk schemas in warehouse ({len(sigs)} distinct "
            "column/ctype sets) — decode refuses to guess; re-encode to one "
            "schema (jobs/compact.py --merge-schemas unifies additive "
            "evolution) or decode subsets. Signatures: " + "; ".join(rendered)
        )
    ctypes: dict[str, str] = {}
    for s in sigs:
        for col, ct0 in s:
            ct = ct0 or _CORE_CTYPES.get(col, "str")
            prev = ctypes.setdefault(col, ct)
            if prev != ct:
                raise ValueError(
                    f"column '{col}' appears with two ctypes "
                    f"({prev} vs {ct}) across chunks — a type CHANGE is "
                    "never merged; re-encode the offending batch"
                )
    if not ctypes:  # zero matching blocks: typed empty result
        for c in requested or TRANSCRIPT_COLUMNS:
            ctypes[c] = _CORE_CTYPES.get(c, "str")
    return ctypes


def decode_blocks(blocks: DataFrame, columns: list[str] | None = None,
                  out_schema=None, merge_schemas: bool = False) -> DataFrame:
    """blocks -> transcripts (row order unspecified; sort to compare).

    ``columns`` prunes the decode to the requested columns: only those
    columns' block rows are shuffled and decoded — the columnar read path
    (analogue of ReadSchema pruning at a parquet scan, but over our own
    encoded blocks).

    ``out_schema`` skips the metadata-derivation aggregate when the caller
    already holds the warehouse schema (e.g. from the manifests'
    ``schema_sig`` via ``datasource.infer_ctypes``, or across repeated
    decodes of one warehouse) — the derivation is one extra Spark job per
    call, pure overhead when the schema is already known. Callers passing
    it take over the heterogeneity guarantee ``schema_from_blocks``
    enforces (manifest signatures carry the same check).

    ``merge_schemas`` opts into additive schema evolution: heterogeneous
    chunk signatures decode against their UNION schema, with typed
    zero-defaults for chunks written before a column existed (see
    ``ctypes_from_blocks``). The strict default stays the loud failure —
    evolution is a deliberate maintenance action (jobs/compact.py
    --merge-schemas), not something a read should silently paper over.
    """
    import pyspark.sql.functions as F

    raw = blocks
    blocks = blocks.filter(~F.col("column").startswith("__"))  # markers
    if columns is not None:
        blocks = blocks.filter(F.col("column").isin(list(columns)))
    if merge_schemas:
        ctypes = _ctypes_fast(raw, columns, merge=True)
        if ctypes is None:
            ctypes = ctypes_from_blocks(blocks, requested=columns, merge=True)
        return blocks.groupBy(*group_keys(blocks)).applyInArrow(
            _decode_group_filling(ctypes), schema_from_ctypes(ctypes)
        )
    if out_schema is None:
        ctypes = _ctypes_fast(raw, columns, merge=False)
        out_schema = (
            schema_from_ctypes(ctypes) if ctypes is not None
            else schema_from_blocks(blocks, requested=columns)
        )
    return blocks.groupBy(*group_keys(blocks)).applyInArrow(
        _decode_group, out_schema
    )
