"""Input invariant validation (SURVEY.md §1.5 B3): duplicate
(conv_id, turn_idx) keys fail loudly or are quarantined — never silently
encoded (the reference only logs a warning, parseVariant.go:16-18)."""

from __future__ import annotations

import pandas as pd
import pytest

import jobs.encode as encode_job
from vcf2df_spark import fixtures


def _run(argv):
    try:
        encode_job.main(argv)
        return 0
    except SystemExit as e:
        return int(e.code or 0)


@pytest.fixture()
def dup_input(tmp_path):
    src = fixtures.transcripts_tiny()
    dup = pd.concat([src, src.iloc[[1, 3]]], ignore_index=True)  # 2 dup keys
    p = tmp_path / "dup.parquet"
    fixtures.write_parquet(dup, str(p))
    return str(p), len(src)


def test_duplicates_fail_by_default(spark, dup_input, tmp_path):
    path, _ = dup_input
    rc = _run(["--input", path, "--out", str(tmp_path / "w1"),
               "--partitions", "2", "--master", "local[2]"])
    assert rc == 5


def test_duplicates_quarantine(spark, dup_input, tmp_path):
    path, n_unique = dup_input
    wh = str(tmp_path / "w2")
    rc = _run(["--input", path, "--out", wh, "--partitions", "2",
               "--master", "local[2]", "--on-duplicates", "quarantine"])
    assert rc == 0
    q = spark.read.parquet(f"{wh}/quarantine")
    assert q.count() == 2
    from vcf2df_spark.decode import decode_blocks

    decoded = decode_blocks(spark.read.parquet(f"{wh}/blocks"))
    assert decoded.count() == n_unique
    assert decoded.select("conv_id", "turn_idx").distinct().count() == n_unique


def test_null_strings_normalize_to_empty(spark):
    """Reference P7 parity: null strings become typed defaults (\"\")."""
    import pandas as pd

    from vcf2df_spark.decode import decode_blocks
    from vcf2df_spark.encode import encode_transcripts

    src = fixtures.transcripts_tiny()
    src.loc[0, "tool"] = None
    src.loc[1, "text"] = None
    df = spark.createDataFrame(src)
    decoded = decode_blocks(encode_transcripts(df, num_partitions=2)).toPandas()
    d = decoded.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert d.loc[0, "tool"] == ""
    assert d.loc[1, "text"] == ""
    assert d.notna().all().all()


def test_reserved_extra_column_names_rejected(spark):
    # '_pkey' and '__*' extras must fail at encode time, not lose data at
    # decode (decode filters '__*' marker rows; with_partition_key
    # overwrites '_pkey')
    import pytest

    from vcf2df_spark import fixtures
    from vcf2df_spark.encode import normalize_input

    src = fixtures.transcripts_tiny()
    for bad in ("_pkey", "__meta"):
        pdf = src.copy()
        pdf[bad] = 1
        with pytest.raises(ValueError, match="engine-reserved"):
            normalize_input(spark.createDataFrame(pdf))
