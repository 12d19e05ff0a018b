"""Streaming gram-ledger twin of keep-one substring dedup: the
complete-mode aggregate must merge counts AND witnesses across
micro-batch boundaries — driven file-by-file (maxFilesPerTrigger=1)
with the canonical witness arriving in a LATER batch than other
occurrences, then compared to the batch removal table."""

import os
import shutil
import uuid

from pyspark.sql import functions as F

from ngff_zarr_spark.functions.spans import duplicated_span_removal


def _write_part(spark, rows, path):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_ledger_merges_across_micro_batches(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(docs_dir, exist_ok=True)
    # batch order is file mtime order; doc 50 (first file) repeats the
    # phrase that doc 1 (later file) canonically owns — the witness
    # must MOVE to (1, 0) when the later batch folds in, and the count
    # must keep accumulating
    part1 = [(50, "alpha beta gamma delta end one"),
             (60, "alpha beta gamma delta end two")]
    part2 = [(70, "noise words here alpha beta gamma delta")]
    part3 = [(1, "alpha beta gamma delta fresh tail"),
             (90, "unrelated unique content entirely")]
    for i, rows in enumerate([part1, part2, part3]):
        sub = os.path.join(docs_dir, f"part{i}")
        _write_part(spark, rows, sub)
        # flatten: move the parquet file up so the stream source sees
        # one file per part, in order
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(sub, f), os.path.join(docs_dir, f"p{i}.parquet"))
        shutil.rmtree(sub)
        os.utime(os.path.join(docs_dir, f"p{i}.parquet"), (1000 + i, 1000 + i))

    batch_schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    from ngff_zarr_spark.functions.spans import _positioned_grams

    ledger = (
        _positioned_grams(stream, 4)
        .groupBy("gh")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("wit"),
        )
        .select(
            "gh", "n_occ",
            F.col("wit.doc_id").alias("rep_doc"),
            F.col("wit.pos").cast("long").alias("rep_pos"),
        )
    )
    table = f"sub_ledger_{uuid.uuid4().hex[:8]}"
    q = (
        ledger.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["gh"]: (r["n_occ"], r["rep_doc"], r["rep_pos"])
        for r in spark.sql(f"select * from {table} where n_occ >= 2").collect()
    }

    all_docs = spark.createDataFrame(
        part1 + part2 + part3, "doc_id long, text string"
    )
    want = {
        r["gh"]: (r["n_occ"], r["rep_doc"], r["rep_pos"])
        for r in duplicated_span_removal(all_docs, 4)
        .select("gh", "n_occ", "rep_doc", "rep_pos")
        .distinct()
        .collect()
    }
    assert got == want
    # the moved-witness property specifically: some repeated gram's
    # witness is doc 1 (last batch) while earlier batches held copies
    assert any(rep == 1 for _n, rep, _p in got.values())
