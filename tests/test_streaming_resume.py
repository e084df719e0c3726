"""Checkpoint-resume semantics of the streaming exit path: a restarted
query with the same checkpoint must process ONLY newly-arrived input
and the parquet sink must hold every row exactly once — the
end-to-end exactly-once contract production pipelines rely on."""

from pyspark.sql import functions as F

from scio_sparql_spark.streaming.bounded import (
    run_bounded_to_parquet,
    stream_parquet,
)


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    first, second = docs.filter("doc_id < 250"), docs.filter("doc_id >= 250")
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    first.coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = stream_parquet(spark, src, docs.schema)
        out = stream.select("doc_id", F.md5("text").alias("digest"))
        run_bounded_to_parquet(out, sink, ckpt)

    run()
    n1 = spark.read.parquet(sink).count()
    assert n1 == first.count()

    # restart after new data arrives: only the delta is processed
    second.coalesce(1).write.mode("append").parquet(src)
    run()
    got = spark.read.parquet(sink)
    assert got.count() == docs.count()  # no reprocessing, no loss
    assert got.select("doc_id").distinct().count() == docs.count()

    # idempotent restart with NO new data: a no-op
    run()
    assert spark.read.parquet(sink).count() == docs.count()
