"""Arrow-native column encode/decode — the engine's hot data plane.

Strings never materialize as Python objects here: the utf8 payload and
lengths come straight from the Arrow buffers, dictionary encoding is
``pyarrow.compute.dictionary_encode`` (C++), and decode rebuilds
StringArrays via ``from_buffers``. Combined with ``applyInArrow`` this
keeps the per-byte cost compute-bound (codec kernels) instead of
bandwidth-bound (object churn) — the property that lets encode scale
with cores on a real cluster.

Block payload/aux/meta formats are identical to the numpy codec layer
(``codecs/``), so blocks are interchangeable between both paths and the
kernel unit tests cover this layer's formats too.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import planner
from .codecs import bitpack, fsst, strnum, strutil, zstdhi
from .planner import _disk_proxy

# ---------------------------------------------------------------- strings


def string_buf_lengths(arr: pa.Array) -> tuple[bytes, np.ndarray]:
    """StringArray -> (concatenated utf8 bytes, int64 lengths); zero-copy reads."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    n = len(arr)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    # single copy: slice of the shared data buffer
    buf = bytes(memoryview(buffers[2])[int(offsets[0]) : int(offsets[-1])])
    return buf, np.diff(offsets).astype(np.int64)


def strings_from_buf(buf: bytes, lengths: np.ndarray) -> pa.Array:
    """(utf8 bytes, lengths) -> StringArray without per-row Python."""
    n = len(lengths)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    if offsets[-1] <= np.iinfo(np.int32).max:
        return pa.StringArray.from_buffers(
            n,
            pa.py_buffer(offsets.astype(np.int32).tobytes()),
            pa.py_buffer(buf),
        )
    return pa.Array.from_buffers(
        pa.large_utf8(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf)],
    )


def _pack_lengths(lengths: np.ndarray) -> tuple[bytes, dict]:
    if len(lengths) == 0:
        return b"", {"lwidth": 0, "lmin": 0}
    lmin = int(lengths.min())
    lwidth = bitpack._bit_width(int(lengths.max()) - lmin)
    return (
        bitpack.pack_u64((lengths - lmin).astype(np.uint64), lwidth),
        {"lwidth": lwidth, "lmin": lmin},
    )


def _unpack_lengths(aux: bytes, meta: dict, n: int) -> np.ndarray:
    return bitpack.unpack_u64(aux, meta["lwidth"], n).astype(np.int64) + meta["lmin"]


_ZSTDHI_TRIAL_BYTES = 1 << 18

_Z12 = pa.Codec("zstd", compression_level=12)
_ZDEC = pa.Codec("zstd")


def _maybe_z12(codec: str, payload: bytes, aux: bytes, meta: dict):
    """Measured choice between the raw payload and its zstd-12 wrap.

    Meta key ``z`` records the unwrapped length (the decompress size hint);
    its presence tells decode to unwrap first. The sink's page zstd leaves
    an already-compressed payload untouched, so the proxy comparison is
    exactly the on-disk outcome."""
    size = _disk_proxy(payload, aux)
    z = bytes(_Z12.compress(payload))
    zsize = _disk_proxy(z, aux)
    if zsize < size:
        return (codec, z, aux, {**meta, "z": len(payload)}), zsize
    return (codec, payload, aux, meta), size


def _unz12(payload: bytes, meta: dict) -> bytes:
    if "z" in meta:
        return _ZDEC.decompress(payload, meta["z"]).to_pybytes()
    return payload


def _zstdhi_sample_wins(buf: bytes) -> bool:
    """Level-12 trial on a bounded prefix vs the sink's default zstd.

    The full-buffer level-12 encode is the single most expensive candidate
    (~0.5 s per 64k-row text chunk); on corpora where it loses (most) that
    cost bought nothing. Compression ratios on a 256KB prefix track the
    full buffer closely, so the trial keeps the win and drops the cost.
    """
    sample = buf[:_ZSTDHI_TRIAL_BYTES]
    hi = len(zstdhi._CODEC.compress(sample))
    return hi < _disk_proxy(sample, b"")


def encode_string_column(
    arr: pa.Array, hints: dict | None = None,
) -> tuple[str, bytes, bytes, dict, int]:
    """Measured candidate selection over Arrow buffers (see planner).

    ``hints`` is a mutable per-column dict carrying the FSST / zstdhi
    sample-trial verdicts across the chunks of one encode group (the text
    statistics barely move within a group, and the trials dominate
    per-chunk cost otherwise). A verdict is recorded ONLY when its trial
    actually ran — a chunk that never reached a candidate's gate must not
    disable that candidate for later chunks. The raw floor keeps a stale
    verdict safe.
    """
    if hints is None:
        hints = {}
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    buf, lengths = string_buf_lengths(arr)
    lpack, lmeta = _pack_lengths(lengths)
    raw = ("raw", buf, lpack, {"kind": "str", **lmeta})
    raw_bytes = len(buf) + len(lpack)
    if n == 0:
        return (*raw, raw_bytes)
    best, best_size = raw, _disk_proxy(buf, lpack)

    # structured-id candidate: uniform length + constant prefix + digit
    # suffix (cheap uniform-length pre-check gates the matrix analysis)
    if len(lengths) and lengths[0] == lengths.max() == lengths.min():
        shape = strnum.analyze(buf, lengths)
        if shape is not None:
            payload, aux, meta = strnum.encode_from_buf(buf, lengths, shape)
            size = _disk_proxy(payload, aux)
            if size < best_size:
                best, best_size = ("strnum", payload, aux, meta), size

    denc = pc.dictionary_encode(arr)
    table = denc.dictionary
    ndv = len(table)
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    if 0 < ndv <= 4096 and ndv <= max(n / 4, 1):
        # canonical (sorted) dictionary order. pyarrow assigns codes by
        # FIRST OCCURRENCE, which differs chunk to chunk — the sink's page
        # zstd then compresses adjacent chunks' packed-code payloads with
        # ONE entropy table over a MIXTURE of distributions (measured +6%
        # on role vs per-blob compression). Sorting aligns every chunk's
        # code assignment, so cross-chunk payload bytes share a single
        # distribution; this closes the role-column gap vs parquet's
        # RLE_DICT. (Gated to the dict/rle branch — a high-ndv chunk that
        # can't take these codecs must not pay the O(n) remap.)
        order = pc.sort_indices(table).to_numpy(zero_copy_only=False)
        rank = np.empty(ndv, dtype=np.int64)
        rank[order] = np.arange(ndv, dtype=np.int64)
        codes = rank[codes]
        table = table.take(pa.array(order))
        tbuf, tlens = string_buf_lengths(table)
        aux_table = strutil.pack_str_list(
            [bytes(memoryview(tbuf)[s:e]) for s, e in _spans(tlens)]
        )
        width = bitpack._bit_width(ndv - 1)
        # dict candidate (+ measured zstd-12 wrap of the packed codes: the
        # 1MB zstdhi gate protects RAW TEXT whose blobs share vocabulary
        # across chunks; packed code streams are self-similar, so the
        # per-chunk level-12 pass wins ~3% on e.g. alternating role codes —
        # this is what closes the role gap vs parquet RLE_DICT)
        payload = bitpack.pack_u64(codes.astype(np.uint64), width)
        cand, size = _maybe_z12(
            "dict", payload, aux_table, {"width": width, "ndv": ndv}
        )
        if size < best_size:
            best, best_size = cand, size
        # rle candidate over the same codes
        starts = np.concatenate(([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1))
        run_vals = codes[starts].astype(np.uint64)
        run_lens = np.diff(np.concatenate((starts, [n]))).astype(np.uint64)
        lwidth = bitpack._bit_width(int(run_lens.max()))
        vpack = bitpack.pack_u64(run_vals, width)
        lpack2 = bitpack.pack_u64(run_lens, lwidth)
        payload = vpack + lpack2
        meta = {"n_runs": int(len(starts)), "vwidth": width, "lwidth": lwidth,
                "vbytes": len(vpack)}
        cand, size = _maybe_z12("rle", payload, aux_table, meta)
        if size < best_size:
            best, best_size = cand, size
    else:
        # high-level zstd candidate: wins when extra encode CPU buys bytes.
        # Gated to large buffers: below ~1MB the sink's page-level zstd
        # compresses ACROSS adjacent raw payload blobs (shared vocabulary),
        # which a pre-compressed blob forfeits — measured as a net disk
        # loss for small chunks despite the per-blob proxy predicting a win.
        if len(buf) >= (1 << 20):
            if "zstdhi" not in hints:
                hints["zstdhi"] = _zstdhi_sample_wins(buf)
            if hints["zstdhi"]:
                payload, zaux, zmeta = zstdhi.encode_from_buf(buf, lengths)
                size = _disk_proxy(payload, zaux)
                if size < best_size:
                    best, best_size = ("zstdhi", payload, zaux, zmeta), size
        if "fsst" not in hints:
            hints["fsst"] = planner.fsst_sample_wins_buf(buf, lengths)
        if hints["fsst"]:
            symbols = fsst.train(buf)
            segs = [
                fsst.encode_buffer(buf[i : i + fsst.SEGMENT_BYTES], symbols)
                for i in range(0, len(buf), fsst.SEGMENT_BYTES)
            ] or [b""]
            payload = b"".join(segs)
            tablebuf = strutil.pack_str_list(symbols)
            aux = tablebuf + lpack
            meta = {"table_bytes": len(tablebuf), **lmeta,
                    "seg_code_lens": [len(s) for s in segs]}
            size = _disk_proxy(payload, aux)
            if size < best_size:
                best, best_size = ("fsst", payload, aux, meta), size
    return (*best, raw_bytes)


def _spans(lengths: np.ndarray):
    offs = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    return zip(offs[:-1], offs[1:])


def decode_string_column(codec: str, payload: bytes, aux: bytes, meta: dict,
                         n: int) -> pa.Array:
    if codec == "raw":
        return strings_from_buf(payload, _unpack_lengths(aux, meta, n))
    if codec == "dict":
        items = strutil.unpack_str_list(aux)
        payload = _unz12(payload, meta)
        codes = bitpack.unpack_u64(payload, meta["width"], n).astype(np.int32)
        table = pa.array([b.decode("utf-8") for b in items], type=pa.string())
        return pc.take(table, pa.array(codes))
    if codec == "rle":
        items = strutil.unpack_str_list(aux)
        payload = _unz12(payload, meta)
        k, vb = meta["n_runs"], meta["vbytes"]
        run_vals = bitpack.unpack_u64(payload[:vb], meta["vwidth"], k).astype(np.int64)
        run_lens = bitpack.unpack_u64(payload[vb:], meta["lwidth"], k).astype(np.int64)
        codes = np.repeat(run_vals, run_lens).astype(np.int32)
        table = pa.array([b.decode("utf-8") for b in items], type=pa.string())
        return pc.take(table, pa.array(codes))
    if codec == "fsst":
        tb = meta["table_bytes"]
        symbols = strutil.unpack_str_list(aux[:tb])
        lengths = _unpack_lengths(aux[tb:], meta, n)
        parts, pos = [], 0
        for cl in meta["seg_code_lens"]:
            parts.append(fsst.decode_buffer(payload[pos : pos + cl], symbols))
            pos += cl
        return strings_from_buf(b"".join(parts), lengths)
    if codec == "strnum":
        buf2, lengths = strnum.decode_to_buf(payload, aux, meta, n)
        return strings_from_buf(buf2, lengths)
    if codec == "zstdhi":
        buf2, lengths = zstdhi.decode_to_buf(payload, aux, meta, n)
        return strings_from_buf(buf2, lengths)
    raise ValueError(f"unknown string codec {codec}")


def decode_string_rows(codec: str, payload: bytes, aux: bytes, meta: dict,
                       n: int, row_lo: int, row_hi: int) -> pa.Array:
    """Random access: decode only rows [row_lo, row_hi) of a string block.

    raw: direct payload slice. fsst / zstdhi: decode only the covering
    segments (their decode_byte_range). Other codecs decode fully (their
    blocks are small) and slice.
    """
    row_lo, row_hi = max(0, row_lo), min(n, row_hi)
    if row_hi <= row_lo:
        return pa.array([], type=pa.string())
    if codec in ("raw", "fsst", "zstdhi"):
        if codec == "fsst":
            tb = meta["table_bytes"]
            symbols = strutil.unpack_str_list(aux[:tb])
            lengths = _unpack_lengths(aux[tb:], meta, n)
        else:
            lengths = _unpack_lengths(aux, meta, n)
            body = payload
            base = 0
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offs[1:])
        lo_b, hi_b = int(offs[row_lo]), int(offs[row_hi])
        if codec == "fsst":
            body, base = fsst.decode_byte_range(
                payload, symbols, meta["seg_code_lens"], lo_b, hi_b
            )
        elif codec == "zstdhi":
            body, base = zstdhi.decode_byte_range(payload, meta, lo_b, hi_b)
        return strings_from_buf(
            body[lo_b - base : hi_b - base], lengths[row_lo:row_hi]
        )
    full = decode_string_column(codec, payload, aux, meta, n)
    return full.slice(row_lo, row_hi - row_lo)


# ------------------------------------------------------------------- ints


def encode_int_column(values: np.ndarray) -> tuple[str, bytes, bytes, dict, int]:
    return planner.encode_best(values)
