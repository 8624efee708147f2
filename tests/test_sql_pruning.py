"""Column-pruned SQL surface (VERDICT r3 #2): Spark cannot push Catalyst
column pruning into Python data sources, so ``jobs/query.py`` derives the
referenced columns from the SQL text and registers a NARROW view — a
role-only query must never decode (or even load from parquet) the text
payloads, which are ~80% of warehouse bytes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vcf2df_spark import datasource, fixtures, manifest
from vcf2df_spark.encode import encode_transcripts, normalize_input
from vcf2df_spark.scan import referenced_columns, register_transcript_view

AVAILABLE = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "score"]


@pytest.mark.parametrize(
    "sql,want",
    [
        ("SELECT role, count(*) AS n FROM t GROUP BY role", ["role"]),
        ("SELECT role, avg(length(text)) FROM t GROUP BY role",
         ["role", "text"]),
        ("SELECT * FROM t", None),
        ("SELECT t.* FROM t", None),
        ("SELECT count(*) FROM t", ["turn_idx"]),  # cheapest column carries n
        ("SELECT conv_id FROM t WHERE score > 0.5 ORDER BY ts",
         ["conv_id", "ts", "score"]),
        # multiplication smells like '*': conservative full schema
        ("SELECT score*2 FROM t", None),
        # a column named only inside a literal over-includes — never wrong
        ("SELECT role FROM t WHERE role = 'text'", ["role", "text"]),
    ],
)
def test_referenced_columns(sql, want):
    got = referenced_columns(sql, AVAILABLE)
    if want is None:
        assert got is None
    else:
        assert sorted(got) == sorted(want)


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sqlwh"))
    src = normalize_input(
        spark.createDataFrame(fixtures.transcripts_small(n_convs=80))
    )
    blocks = encode_transcripts(src, num_partitions=2, chunk_rows=256)
    blocks.write.partitionBy("partition_id").parquet(f"{root}/blocks")
    manifest.build_manifests(blocks, "sqljob", "mem", num_partitions=2).write.parquet(
        f"{root}/manifests"
    )
    return root


def test_narrow_view_loads_no_text_payload(spark, wh, monkeypatch):
    """A role-only read must filter text block rows OUT at the parquet
    reader (the `column` row filter), not merely drop them post-decode."""
    import pyarrow.parquet as pq

    seen_filters: list[str] = []
    orig = pq.read_table

    def spy(path, columns=None, filters=None, **kw):
        seen_filters.append(str(filters))
        return orig(path, columns=columns, filters=filters, **kw)

    monkeypatch.setattr(pq, "read_table", spy)
    ds = datasource.TranscriptDataSource({"path": wh, "columns": "role"})
    reader = ds.reader(ds.schema())
    rows = 0
    for part in reader.partitions():
        for batch in reader.read(part):
            rows += batch.num_rows
            assert batch.schema.names == ["role"]
    assert rows > 0
    assert seen_filters, "parquet reads must go through the row filter"
    for f in seen_filters:
        assert "role" in f and '"text"' not in f and "'text'" not in f


def test_narrow_sql_view_matches_full(spark, wh):
    """query.py's derived narrow view computes the same result as the full
    view for a role-only aggregate."""
    sql_t = "SELECT role, count(*) AS n FROM {v} GROUP BY role ORDER BY role"
    available = list(datasource.infer_ctypes(f"{wh}/blocks"))
    cols = referenced_columns(sql_t.format(v="narrow_v"), available)
    assert cols == ["role"]
    register_transcript_view(spark, wh, "narrow_v", columns=cols)
    register_transcript_view(spark, wh, "full_v")
    got = spark.sql(sql_t.format(v="narrow_v")).collect()
    want = spark.sql(sql_t.format(v="full_v")).collect()
    assert got == want and len(got) > 0


def test_query_job_auto_derives(spark, wh, capsys):
    """The CLI surface end-to-end: no --columns flag, narrow SQL, correct
    result (the view the job registers is the derived-narrow one)."""
    import json

    import jobs.query as query_job

    query_job.main([
        "--warehouse", wh,
        "--sql", "SELECT role, count(*) AS n FROM t GROUP BY role ORDER BY role",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    summary = lines[-1]
    assert summary["status"] == "ok" and summary["rows"] > 0
    roles = {r["role"]: r["n"] for r in lines[:-1]}
    full = datasource.read_warehouse(spark, wh).groupBy("role").count().collect()
    assert roles == {r["role"]: r["count"] for r in full}


# --- baked WHERE-conjunct extraction (routed SQL point lookups, r4) ---------


@pytest.mark.parametrize(
    "sql,want",
    [
        ("SELECT text FROM t WHERE conv_id = 'c-1'", ["conv_id = 'c-1'"]),
        ("SELECT * FROM t WHERE conv_id = 'c-1' AND turn_idx < 5",
         ["conv_id = 'c-1'", "turn_idx < 5"]),
        ("SELECT * FROM t WHERE conv_id IN ('a', 'b') GROUP BY role",
         ["conv_id IN ('a', 'b')"]),
        # partial extraction: complex conjuncts skipped, simple ones kept
        ("SELECT * FROM t WHERE conv_id = 'c' AND length(text) > 5",
         ["conv_id = 'c'"]),
        # OR / NOT / BETWEEN / subqueries / joins: bake nothing
        ("SELECT * FROM t WHERE conv_id = 'c' OR role = 'user'", []),
        ("SELECT * FROM t WHERE NOT conv_id = 'c'", []),
        ("SELECT * FROM t WHERE turn_idx BETWEEN 1 AND 3", []),
        ("SELECT * FROM t a JOIN t b ON a.conv_id = b.conv_id "
         "WHERE a.turn_idx = 1", []),
        # an AND inside a string literal must never produce a fake conjunct
        ("SELECT * FROM t WHERE text = 'x AND conv_id = 3'", []),
        ("SELECT * FROM t WHERE text = 'a AND conv_id = 3 AND b'", []),
        # unknown column: not bakeable
        ("SELECT * FROM t WHERE nope = 1", []),
        ("SELECT * FROM t", []),
    ],
)
def test_pushable_predicates(sql, want):
    from vcf2df_spark.scan import pushable_predicates

    got = pushable_predicates(sql, "t", AVAILABLE)
    assert got == want, (sql, got)


def test_query_job_routes_point_lookup(spark, wh, capsys):
    """A SQL conv_id point query goes through the baked pruned relation
    (transcripts_pruned) and returns exactly that conversation."""
    import json

    import jobs.query as query_job

    cid = (
        datasource.read_warehouse(spark, wh).select("conv_id").first()[0]
    )
    query_job.main([
        "--warehouse", wh,
        "--sql",
        f"SELECT conv_id, turn_idx FROM t WHERE conv_id = '{cid}' "
        "ORDER BY turn_idx",
        "--limit", "1000",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    rows, summary = lines[:-1], lines[-1]
    want = (
        datasource.read_warehouse(spark, wh)
        .filter(F.col("conv_id") == cid).count()
    )
    assert summary["rows"] == want > 0
    assert all(r["conv_id"] == cid for r in rows)

    # and the backing relation is the pruned format (baked predicate)
    from vcf2df_spark.scan import pushable_predicates

    available = list(datasource.infer_ctypes(f"{wh}/blocks"))
    assert pushable_predicates(
        f"SELECT conv_id FROM t WHERE conv_id = '{cid}'", "t", available
    ) == [f"conv_id = '{cid}'"]
    plan = spark.table("t")._sc._jvm.PythonSQLUtils.explainString(
        spark.table("t")._jdf.queryExecution(), "formatted"
    )
    assert "transcripts_pruned" in plan


def test_pushable_predicates_bails_on_comments():
    """A commented-out fragment must never be baked as a live conjunct."""
    from vcf2df_spark.scan import pushable_predicates

    assert pushable_predicates(
        "SELECT * FROM t WHERE conv_id = 'c' -- AND turn_idx = 3",
        "t", AVAILABLE) == []
    assert pushable_predicates(
        "SELECT * FROM t /* WHERE */ WHERE conv_id = 'c'",
        "t", AVAILABLE) == []


def test_pushable_predicates_scoping_bailouts():
    """Review findings (r4): a WHERE that may belong to another scope —
    set operations, derived tables renaming columns, scalar subqueries —
    must bake nothing; NATURAL JOIN must keep the full schema."""
    from vcf2df_spark.scan import pushable_predicates

    # the WHERE belongs to u, not t: baking would drop t-branch rows
    assert pushable_predicates(
        "SELECT conv_id FROM t UNION ALL SELECT conv_id FROM u "
        "WHERE turn_idx = 0", "t", AVAILABLE) == []
    # derived table renames turn_idx: outer WHERE is NOT a base predicate
    assert pushable_predicates(
        "SELECT * FROM (SELECT turn_idx+1 AS turn_idx FROM t) x "
        "WHERE turn_idx = 5", "t", AVAILABLE) == []
    # scalar subquery: two SELECTs -> bail
    assert pushable_predicates(
        "SELECT (SELECT max(turn_idx) FROM t) WHERE conv_id = 'c'",
        "t", AVAILABLE) == []
    # the plain single-select case still bakes
    assert pushable_predicates(
        "SELECT text FROM t WHERE conv_id = 'c'", "t", AVAILABLE
    ) == ["conv_id = 'c'"]


def test_referenced_columns_natural_join_keeps_all():
    """NATURAL JOIN uses shared columns without naming them — the one SQL
    construct that breaks name-based projection inference."""
    assert referenced_columns(
        "SELECT count(1) AS n FROM t NATURAL JOIN other", AVAILABLE
    ) is None


def test_explicit_columns_contract_not_widened(spark, wh, capsys):
    """--columns is a schema contract: a bakeable predicate on a column
    outside the list must NOT widen the view. The bake is skipped, so the
    query fails ANALYSIS loudly (conv_id not in the 2-column view) instead
    of silently returning a 3-column SELECT *."""
    from pyspark.errors import AnalysisException

    import jobs.query as query_job

    cid = datasource.read_warehouse(spark, wh).select("conv_id").first()[0]
    with pytest.raises(AnalysisException):
        query_job.main([
            "--warehouse", wh, "--columns", "role,text",
            "--sql", f"SELECT * FROM t WHERE conv_id = '{cid}'",
        ])
    # and with the predicate column included, it works and stays 3 columns
    import json

    query_job.main([
        "--warehouse", wh, "--columns", "role,text,conv_id",
        "--sql", f"SELECT * FROM t WHERE conv_id = '{cid}' LIMIT 5",
    ])
    lines = [json.loads(l)
             for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["status"] == "ok"
    assert set(lines[0].keys()) == {"role", "text", "conv_id"}


def test_query_job_truncated_result_single_pass(spark, wh, capsys, monkeypatch):
    """A truncated result must NOT pay a second decode pass for the exact
    total: the job fetches limit+1 rows in one action and reports '>=N'.
    DataFrame.count is poisoned to prove no second action runs."""
    import json

    from pyspark.sql import DataFrame

    import jobs.query as query_job

    def _boom(self):
        raise AssertionError("second pass: DataFrame.count called")

    monkeypatch.setattr(DataFrame, "count", _boom)
    query_job.main([
        "--warehouse", wh,
        "--sql", "SELECT conv_id, turn_idx FROM t ORDER BY conv_id, turn_idx",
        "--limit", "7",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    rows, summary = lines[:-1], lines[-1]
    assert len(rows) == 7
    assert summary["truncated"] is True and summary["rows"] == 7  # numeric (ADVICE r5)
    assert summary["shown"] == 7


def test_query_job_export_writes_distributed(spark, wh, tmp_path, capsys):
    """--out exports the FULL result via a distributed write: row count
    comes from observe() in the same pass (no second decode, no driver
    collect), and the exported parquet re-reads identical to the view."""
    import json

    import jobs.query as query_job

    out = str(tmp_path / "slice.parquet")
    query_job.main([
        "--warehouse", wh, "--out", out,
        "--sql", "SELECT conv_id, turn_idx, role FROM t WHERE turn_idx < 3",
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["status"] == "ok" and rec["out"] == out

    want = (
        datasource.read_warehouse(spark, wh)
        .filter(F.col("turn_idx") < 3)
        .select("conv_id", "turn_idx", "role")
    )
    n_want = want.count()
    assert rec["rows"] == n_want
    got = spark.read.parquet(out)
    assert got.count() == n_want
    assert (
        got.orderBy("conv_id", "turn_idx").collect()
        == want.orderBy("conv_id", "turn_idx").collect()
    )

    # csv export flows through the RFC-4180 writer options
    out_csv = str(tmp_path / "slice_csv")
    query_job.main([
        "--warehouse", wh, "--out", out_csv, "--out-format", "csv",
        "--sql", "SELECT role, count(*) AS n FROM t GROUP BY role",
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"] == 4
    back = (spark.read.option("header", "true").option("escape", '"')
            .csv(out_csv))
    assert back.count() == 4
