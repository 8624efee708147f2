"""Predicate-driven scan over the encoded warehouse: zone-map chunk pruning
plus column-pruned decode.

Each block row carries its chunk's min/max (conv_id as strings; turn_idx and
ts as int64 — ts in unix micros) — the engine's analogue of Parquet
row-group statistics, made queryable because blocks are themselves a table.
A scan with predicates first selects the qualifying (partition_id,
chunk_idx) pairs from the tiny stats projection, semi-joins the blocks table
down to those chunks and the requested columns, decodes, and applies the
exact residual filter. Chunks that can't match never leave the scan —
at 100 TB that is the difference between touching terabytes and megabytes.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .blocks import TRANSCRIPT_COLUMNS
from .decode import decode_blocks, group_keys


def _overlap_str(lo: str | None, hi: str | None):
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col("stat_max_str") >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col("stat_min_str") <= F.lit(hi))
    return cond


def _overlap_num(lo: int | None, hi: int | None):
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col("stat_max_num") >= F.lit(int(lo)))
    if hi is not None:
        cond = cond & (F.col("stat_min_num") <= F.lit(int(hi)))
    return cond


def _to_micros(v) -> int:
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    return int(v)


def _range_spec(col: str, lo, hi):
    """Overlap condition for an arbitrary column, dispatched on the Python
    type of the bounds: str -> string stats; float -> the order-preserving
    f64 key transform (zonemap.py, matching what encode recorded); bool ->
    0/1 ints; datetime -> unix micros; int -> raw int64 stats."""
    from . import zonemap

    probe = lo if lo is not None else hi
    if isinstance(probe, str):
        return _overlap_str(lo, hi)
    if isinstance(probe, bool):
        return _overlap_num(
            None if lo is None else int(lo), None if hi is None else int(hi)
        )
    if isinstance(probe, float):
        return _overlap_num(
            None if lo is None else zonemap.f64_key(lo),
            None if hi is None else zonemap.f64_key(hi),
        )
    if isinstance(probe, _dt.datetime):
        return _overlap_num(
            None if lo is None else _to_micros(lo),
            None if hi is None else _to_micros(hi),
        )
    return _overlap_num(lo, hi)


def qualifying_chunks(
    blocks: DataFrame,
    conv_id_range: tuple[str | None, str | None] | None = None,
    turn_idx_range: tuple[int | None, int | None] | None = None,
    ts_range: tuple | None = None,
    col_ranges: dict[str, tuple] | None = None,
) -> DataFrame:
    """Chunk keys whose zone maps overlap every given predicate range.

    ``col_ranges`` prunes on ANY column with recorded stats — including
    dynamic extras (f64 via the total-order key, bool as 0/1, int/ts as
    int64, short strings lexically)."""
    ck = group_keys(blocks)  # includes epoch for streaming warehouses
    qual = blocks.select(*ck).distinct()
    specs = []
    if conv_id_range is not None:
        specs.append(("conv_id", _overlap_str(*conv_id_range)))
    if turn_idx_range is not None:
        specs.append(("turn_idx", _overlap_num(*turn_idx_range)))
    if ts_range is not None:
        lo, hi = ts_range
        specs.append(
            ("ts", _overlap_num(
                None if lo is None else _to_micros(lo),
                None if hi is None else _to_micros(hi),
            ))
        )
    for col, (lo, hi) in (col_ranges or {}).items():
        specs.append((col, _range_spec(col, lo, hi)))
    for col, cond in specs:
        keys = blocks.filter(F.col("column") == col).filter(cond).select(*ck)
        qual = qual.join(keys, ck, "left_semi")
    return qual


def fetch_conversation(spark: SparkSession, warehouse: str, conv_id: str):
    """Point lookup: one conversation, decoding the minimum possible.

    Zone maps select the candidate chunks; the cheap key columns decode
    fully to locate the row span; ``text`` decodes via random access
    (only the FSST/raw byte range covering those rows). Returns a pandas
    DataFrame ordered by turn_idx — the interactive read path.
    """
    import json

    import pandas as pd

    from . import arrow_ops, codecs

    from .decode import _CORE_CTYPES, _column_order, schema_from_blocks

    blocks = spark.read.parquet(f"{warehouse}/blocks").filter(
        ~F.col("column").startswith("__")
    )
    qual = qualifying_chunks(blocks, conv_id_range=(conv_id, conv_id))
    ck = group_keys(blocks)
    cand = blocks.join(F.broadcast(qual), ck, "left_semi").collect()
    by_chunk: dict[tuple, dict[str, dict]] = {}
    for r in cand:
        by_chunk.setdefault(tuple(r[k] for k in ck), {})[r.column] = r
    frames = []
    col_order: list[str] = []
    for key, cols in by_chunk.items():
        n = int(cols["conv_id"].n_rows)
        col_order = _column_order(cols)

        def _decode_str(col, lo=0, hi=None):
            r = cols[col]
            m = json.loads(r.meta)
            if hi is None:
                return arrow_ops.decode_string_column(
                    r.codec, bytes(r.payload or b""), bytes(r.aux or b""), m, n
                )
            return arrow_ops.decode_string_rows(
                r.codec, bytes(r.payload or b""), bytes(r.aux or b""), m, n, lo, hi
            )

        cids = _decode_str("conv_id").to_pylist()
        import bisect

        lo = bisect.bisect_left(cids, conv_id)   # chunk is sorted by conv_id
        hi = bisect.bisect_right(cids, conv_id)
        if hi <= lo:
            continue
        out = {"conv_id": cids[lo:hi]}
        for col in col_order:  # dynamic schema: extras included
            if col == "conv_id":
                continue
            r = cols[col]
            meta = json.loads(r.meta)
            ctype = meta.get("ctype") or _CORE_CTYPES.get(col, "str")
            if ctype == "str":
                out[col] = _decode_str(col, lo, hi).to_pylist()
                continue
            vals = codecs.decode(
                r.codec, bytes(r.payload or b""), bytes(r.aux or b""), meta, n
            )[lo:hi]
            if ctype == "ts":
                out[col] = pd.to_datetime(vals.astype("int64"), unit="us")
            elif ctype == "i32":
                out[col] = vals.astype("int32")
            elif ctype == "bool":
                out[col] = vals.astype(bool)
            else:  # i64 / f64 keep their numpy dtype
                out[col] = vals
        frames.append(pd.DataFrame(out))
    if not frames:
        # empty-result schema from the warehouse's own metadata, so a
        # zero-match lookup has the SAME columns (extras included) as a hit
        # — never a hardcoded core list or whichever chunk iterated last
        col_order = [f.name for f in schema_from_blocks(blocks).fields]
        return pd.DataFrame(columns=col_order)
    return (
        pd.concat(frames, ignore_index=True)
        .sort_values("turn_idx")
        .reset_index(drop=True)[col_order]
    )


def register_transcript_view(spark: SparkSession, warehouse: str,
                             name: str = "transcripts") -> None:
    """Expose the encoded warehouse as a SQL view: ``SELECT ... FROM name``.

    Backed by the ``transcripts`` Python DataSource (datasource.py): one
    scan task per blocks file decodes its co-located chunk groups in place,
    so the view costs NO shuffle — unlike the groupBy+applyInArrow decode,
    which must exchange every encoded payload. Combine with
    :func:`vcf2df_spark.datasource.scan_warehouse` for zone-map-pruned
    predicate access. This is the switch-over surface for users of the
    reference: their SQL keeps working, storage is ours.
    """
    from .datasource import read_warehouse

    read_warehouse(spark, warehouse).createOrReplaceTempView(name)


def scan_transcripts(
    spark: SparkSession,
    warehouse: str,
    columns: list[str] | None = None,
    conv_id_range: tuple[str | None, str | None] | None = None,
    turn_idx_range: tuple[int | None, int | None] | None = None,
    ts_range: tuple | None = None,
    col_ranges: dict[str, tuple] | None = None,
) -> DataFrame:
    """Decode only the chunks/columns a predicate can touch, then filter
    exactly. Residual filters need their predicate columns decoded too.
    ``col_ranges``: {column: (lo, hi)} range predicates on any stats-bearing
    column, dynamic extras included (f64/bool/int/ts/short strings)."""
    blocks = spark.read.parquet(f"{warehouse}/blocks")
    qual = qualifying_chunks(
        blocks, conv_id_range, turn_idx_range, ts_range, col_ranges
    )
    pruned = blocks.join(F.broadcast(qual), group_keys(blocks), "left_semi")

    if columns is None:
        decoded = decode_blocks(pruned)  # all columns, extras included
    else:
        need = set(columns)
        if conv_id_range is not None:
            need.add("conv_id")
        if turn_idx_range is not None:
            need.add("turn_idx")
        if ts_range is not None:
            need.add("ts")
        need.update(col_ranges or {})
        decoded = decode_blocks(pruned, columns=sorted(need))

    if conv_id_range is not None:
        lo, hi = conv_id_range
        if lo is not None:
            decoded = decoded.filter(F.col("conv_id") >= lo)
        if hi is not None:
            decoded = decoded.filter(F.col("conv_id") <= hi)
    if turn_idx_range is not None:
        lo, hi = turn_idx_range
        if lo is not None:
            decoded = decoded.filter(F.col("turn_idx") >= lo)
        if hi is not None:
            decoded = decoded.filter(F.col("turn_idx") <= hi)
    if ts_range is not None:
        lo, hi = ts_range
        if lo is not None:
            decoded = decoded.filter(F.unix_micros("ts") >= _to_micros(lo))
        if hi is not None:
            decoded = decoded.filter(F.unix_micros("ts") <= _to_micros(hi))
    for col, (lo, hi) in (col_ranges or {}).items():
        if lo is not None:
            decoded = decoded.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            decoded = decoded.filter(F.col(col) <= F.lit(hi))
    if columns is not None:
        from .decode import _column_order

        decoded = decoded.select(
            *[c for c in _column_order(set(columns)) if c in decoded.columns]
        )
    return decoded
