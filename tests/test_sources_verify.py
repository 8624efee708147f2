"""Source readers (parquet / jsonl.gz / csv) + fast multiset verifier."""

from __future__ import annotations

import gzip
import json

import pandas as pd

from vcf2df_spark import fixtures, sources, verify
from vcf2df_spark.encode import encode_transcripts
from vcf2df_spark.decode import decode_blocks


def _write_jsonl_gz(pdf: pd.DataFrame, path: str):
    with gzip.open(path, "wt", encoding="utf-8") as f:
        for r in pdf.itertuples(index=False):
            f.write(json.dumps({
                "conv_id": r.conv_id,
                "turn_idx": int(r.turn_idx),
                "role": r.role,
                "text": r.text,
                "tool": r.tool,
                "ts": pd.Timestamp(r.ts).isoformat(),
            }, ensure_ascii=False) + "\n")


def test_jsonl_gz_source_roundtrip(spark, tmp_path):
    """gzip JSONL in (the reference's gzip-text analogue) -> encode ->
    decode -> bit-identical vs the parquet load of the same rows."""
    src = fixtures.transcripts_small(n_convs=100)
    jpath = str(tmp_path / "t.jsonl.gz")
    ppath = str(tmp_path / "t.parquet")
    _write_jsonl_gz(src, jpath)
    fixtures.write_parquet(src, ppath)

    from_json = sources.read_transcripts(spark, jpath, "jsonl")
    from_parq = sources.read_transcripts(spark, ppath, "parquet")
    res = verify.multiset_equal(from_json, from_parq)
    assert res["equal"], res

    blocks = encode_transcripts(from_json, num_partitions=4)
    decoded = decode_blocks(blocks)
    res = verify.multiset_equal(decoded, from_parq)
    assert res["equal"], res


def test_csv_source(spark, tmp_path):
    src = fixtures.transcripts_tiny()
    cpath = str(tmp_path / "t.csv")
    out = src.copy()
    out["ts"] = out["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    out.to_csv(cpath, index=False)
    df = sources.read_transcripts(spark, cpath, "csv")
    assert df.count() == 4
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ]


def test_multiset_detects_single_bit_difference(spark):
    src = fixtures.transcripts_tiny()
    a = spark.createDataFrame(src)
    mod = src.copy()
    mod.loc[0, "text"] = mod.loc[0, "text"] + "!"
    b = spark.createDataFrame(mod)
    assert not verify.multiset_equal(a, b)["equal"]
    assert verify.multiset_equal(a, spark.createDataFrame(src.sample(frac=1.0, random_state=3)))["equal"]
