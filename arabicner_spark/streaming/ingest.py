"""Structured-Streaming ingest variant.

The north rule is batch Iceberg-in / Iceberg-out (streaming is a
non-goal, SURVEY.md section 2.B), but the NER stage composes with
``readStream`` unchanged — mapInPandas is streaming-safe — so a
micro-batch deployment is one writeStream away.  This module provides
that surface plus a watermarked per-minute mention-rate monitor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arabicner_spark import schemas
from arabicner_spark.operators import ner


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of transcript parquet drops."""
    return (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def streaming_mentions(stream: DataFrame, gazetteer) -> DataFrame:
    """The SAME extract_mentions stage over a streaming frame, minus the
    repartition (stateless map — no shuffle allowed before a stateless
    sink; partitioning is the source's concern in streaming)."""
    from arabicner_spark.functions import tagcore

    # reuse the batch stage but skip the explicit repartition: build the
    # mapInPandas directly over the pruned stream
    import pandas as pd  # noqa: F401

    pruned = stream.select("conv_id", "turn_idx", "text", "ts")
    spark = stream.sparkSession
    types = tagcore.gazetteer_types(gazetteer)
    bc = spark.sparkContext.broadcast((gazetteer, types, tagcore.DEFAULT_MAX_SEQ_LEN))

    def score(batches):
        import pandas as pd

        from arabicner_spark.functions.normalize import normalize_py

        gaz, typs, msl = bc.value
        for pdf in batches:
            out = {
                "conv_id": [], "turn_idx": [], "level": [], "type": [],
                "start_tok": [], "end_tok": [], "text": [], "ts": [],
            }
            for i in range(len(pdf)):
                toks = (pdf["text"].iloc[i] or "").split()
                norm = [normalize_py(t) for t in toks]
                for lvl, typ, s, e, surface in tagcore.mentions_for_turn(
                    toks, norm, gaz, typs, msl
                ):
                    out["conv_id"].append(pdf["conv_id"].iloc[i])
                    out["turn_idx"].append(int(pdf["turn_idx"].iloc[i]))
                    out["level"].append(lvl)
                    out["type"].append(typ)
                    out["start_tok"].append(s)
                    out["end_tok"].append(e)
                    out["text"].append(surface)
                    out["ts"].append(pdf["ts"].iloc[i])
            yield pd.DataFrame(out).astype(
                {"turn_idx": "int32", "level": "int32",
                 "start_tok": "int32", "end_tok": "int32"}
            )

    schema = (
        "conv_id string, turn_idx int, level int, type string, "
        "start_tok int, end_tok int, text string, ts timestamp"
    )
    return pruned.mapInPandas(score, schema=schema)


def mention_rate(mentions_stream: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked windowed mention counts per type (late data: 2 min)."""
    return (
        mentions_stream.withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", window).alias("w"), "type")
        .agg(F.count("*").alias("n_mentions"))
        .select(F.col("w.start").alias("window_start"), "type", "n_mentions")
    )
