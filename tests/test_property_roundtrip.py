"""Property-based encode/decode round-trip at the Arrow level (no Spark):
random dynamic schemas — any mix of string/int32/int64/double/bool/ts
columns with adversarial values — must survive encode_chunk_arrow ->
decode_chunk_arrow bit-identically. This is the kernel-level twin of the
driver's dynamic_roundtrip oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from vcf2df_spark.decode import decode_chunk_arrow
from vcf2df_spark.encode import encode_chunk_arrow

_TEXT = st.text(max_size=40)  # includes empty strings, surrogate-free unicode

_COLUMN_KINDS = {
    "str": (pa.string(), _TEXT),
    "i32": (pa.int32(), st.integers(-(2**31), 2**31 - 1)),
    "i64": (pa.int64(), st.integers(-(2**63), 2**63 - 1)),
    "f64": (pa.float64(), st.floats(allow_nan=True, allow_infinity=True,
                                    width=64)),
    "bool": (pa.bool_(), st.booleans()),
    "ts": (pa.timestamp("us"),
           st.integers(-(2**50), 2**50)),  # microseconds around epoch
}


@st.composite
def _tables(draw):
    n = draw(st.integers(0, 40))
    n_extra = draw(st.integers(0, 3))
    kinds = draw(st.lists(st.sampled_from(sorted(_COLUMN_KINDS)),
                          min_size=n_extra, max_size=n_extra))
    fields, arrays = [], []
    # core key columns the encode contract requires
    conv = draw(st.lists(st.sampled_from(["a", "b", "cc"]), min_size=n,
                         max_size=n))
    fields.append(pa.field("conv_id", pa.string()))
    arrays.append(pa.array(conv, type=pa.string()))
    fields.append(pa.field("turn_idx", pa.int32()))
    arrays.append(pa.array(np.arange(n, dtype=np.int32), type=pa.int32()))
    for i, kind in enumerate(kinds):
        typ, strat = _COLUMN_KINDS[kind]
        vals = draw(st.lists(strat, min_size=n, max_size=n))
        if kind == "ts":
            arr = pa.array(np.array(vals, dtype=np.int64)).cast(typ) if n \
                else pa.array([], type=typ)
        else:
            arr = pa.array(vals, type=typ)
        fields.append(pa.field(f"x{i}_{kind}", typ))
        arrays.append(arr)
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


@settings(max_examples=60, deadline=None)
@given(_tables())
def test_random_dynamic_table_roundtrips(table):
    rows = encode_chunk_arrow(table, partition_id=0, chunk_idx=0)
    assert len(rows) == table.num_columns
    decoded = decode_chunk_arrow(rows)
    assert decoded.num_rows == table.num_rows
    for name in table.schema.names:
        want = table.column(name).combine_chunks()
        got = decoded.column(name).combine_chunks()
        if pa.types.is_floating(want.type):
            wb = want.to_numpy(zero_copy_only=False).view(np.int64)
            gb = got.to_numpy(zero_copy_only=False).view(np.int64)
            assert np.array_equal(wb, gb), name  # bit-level, NaNs included
        elif pa.types.is_timestamp(want.type):
            assert want.cast(pa.int64()) == got.cast(pa.int64()), name
        else:
            assert want == got.cast(want.type), name
