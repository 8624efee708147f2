"""The warehouse as a Structured Streaming SOURCE: readStream tails
committed epochs through the same in-place chunk decode as the batch
reader, advancing offsets only over manifests-committed epochs."""

from __future__ import annotations

from pyspark.sql import functions as F

from vcf2df_spark import datasource, fixtures, manifest
from vcf2df_spark.encode import encode_transcripts, normalize_input


def _write_epoch(spark, wh: str, epoch: int, n_convs: int = 25) -> int:
    pdf = fixtures.transcripts_small(n_convs=n_convs, seed=100 + epoch)
    pdf["conv_id"] = f"e{epoch}-" + pdf["conv_id"]
    src = normalize_input(spark.createDataFrame(pdf))
    blocks = encode_transcripts(src, num_partitions=2, chunk_rows=64).cache()
    blocks.write.parquet(f"{wh}/blocks/epoch={epoch}")
    manifest.build_manifests(blocks, f"s-{epoch}", "stream").write.parquet(
        f"{wh}/manifests/epoch={epoch}"
    )
    n = int(blocks.filter(F.col("column") == "conv_id")
            .agg(F.sum("n_rows")).collect()[0][0])
    blocks.unpersist()
    return n


def _run_stream(spark, wh: str, ckpt: str, sink: str):
    datasource.register(spark)
    q = (
        spark.readStream.format("transcripts").load(wh)
        .groupBy(F.substring("conv_id", 1, 2).alias("ep"))
        .agg(F.count("*").alias("n"))
        .writeStream.outputMode("complete")
        .format("memory").queryName(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r.ep: r.n for r in spark.sql(f"SELECT * FROM {sink}").collect()}


def test_stream_source_tails_committed_epochs(spark, tmp_path):
    wh = str(tmp_path / "swh")
    ckpt = str(tmp_path / "ckpt")
    n0 = _write_epoch(spark, wh, 0)
    n1 = _write_epoch(spark, wh, 1)

    got = _run_stream(spark, wh, ckpt, "stream_sink_a")
    assert got == {"e0": n0, "e1": n1}

    # an UNCOMMITTED epoch (blocks present, no manifests marker) must be
    # invisible; a committed one appears on the next trigger
    pdf = fixtures.transcripts_small(n_convs=10, seed=102)
    pdf["conv_id"] = "e2-" + pdf["conv_id"]
    blocks = encode_transcripts(
        normalize_input(spark.createDataFrame(pdf)), num_partitions=2,
        chunk_rows=64,
    ).cache()
    blocks.write.parquet(f"{wh}/blocks/epoch=2")
    got = _run_stream(spark, wh, ckpt, "stream_sink_b")
    assert "e2" not in got  # nothing new committed -> no new rows

    n2 = int(blocks.filter(F.col("column") == "conv_id")
             .agg(F.sum("n_rows")).collect()[0][0])
    manifest.build_manifests(blocks, "s-2", "stream").write.parquet(
        f"{wh}/manifests/epoch=2"
    )
    blocks.unpersist()
    got = _run_stream(spark, wh, ckpt, "stream_sink_c")
    assert got == {"e0": n0, "e1": n1, "e2": n2}


def test_stream_source_over_batch_warehouse(spark, tmp_path):
    """A non-epoch warehouse reads once as a single epoch."""
    wh = str(tmp_path / "bwh")
    src = normalize_input(
        spark.createDataFrame(fixtures.transcripts_small(n_convs=20))
    )
    encode_transcripts(src, num_partitions=2, chunk_rows=64).write.partitionBy(
        "partition_id"
    ).parquet(f"{wh}/blocks")
    datasource.register(spark)
    q = (
        spark.readStream.format("transcripts").load(wh)
        .writeStream.outputMode("append")
        .format("memory").queryName("stream_sink_batch")
        .option("checkpointLocation", str(tmp_path / "ckpt_b"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) FROM stream_sink_batch").collect()[0][0]
    assert n == src.count()
