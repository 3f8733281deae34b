"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed through iterator-style
``mapInPandas`` (the same Arrow-batch execution shape as the NER
stage).

The container has no image/audio codecs, so the actual decode is
STUBBED: ``decode_stub=True`` (default) derives deterministic fake
features from the payload bytes; ``decode_stub=False`` raises
NotImplementedError at the decode call site — the Spark-side plumbing
(schema, batch iteration, partitioning, UDF signature) is real and
tested either way, and a real decoder drops into ``_decode_one``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id string, modality string, n_bytes bigint, payload_md5 string, "
    "feat_mean double, feat_std double, width int, height int"
)


def _decode_one(payload: bytes, modality: str, stub: bool):
    """Decode an asset into a feature array + (width, height).

    Real implementation would dispatch to PIL/librosa/ffmpeg by
    modality; the deterministic stub derives features from the bytes so
    tests are stable without codecs.
    """
    if not stub:
        raise NotImplementedError(
            "real decoders (PIL/librosa/ffmpeg) are not available in this "
            "container; run with decode_stub=True or install codecs"
        )
    digest = hashlib.md5(payload or b"").digest()
    arr = np.frombuffer((payload or b"\x00") * (1 + 64 // max(len(payload or b"\x00"), 1)), dtype=np.uint8)[:64]
    w = 16 + digest[0] % 64
    h = 16 + digest[1] % 64
    return arr.astype(np.float64), w, h


def extract_features(assets: DataFrame, decode_stub: bool = True) -> DataFrame:
    """assets (schemas.ASSETS-like) -> per-asset feature rows.

    Column-pruned before the Arrow boundary; batches stream through the
    iterator (no per-row Python UDF, no collect).
    """
    pruned = assets.select("asset_id", "modality", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "asset_id", "modality", "n_bytes", "payload_md5",
                "feat_mean", "feat_std", "width", "height",
            )}
            for aid, mod, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                feats, w, h = _decode_one(payload, mod, decode_stub)
                rows["asset_id"].append(aid)
                rows["modality"].append(mod)
                rows["n_bytes"].append(len(payload))
                rows["payload_md5"].append(hashlib.md5(payload).hexdigest())
                rows["feat_mean"].append(float(feats.mean()))
                rows["feat_std"].append(float(feats.std()))
                rows["width"].append(w)
                rows["height"].append(h)
            yield pd.DataFrame(rows).astype({"width": "int32", "height": "int32"})

    return pruned.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id string, modality string, src_width int, src_height int, "
    "dst_width int, dst_height int, resized_md5 string"
)


def resize_assets(
    assets: DataFrame, max_side: int = 32, decode_stub: bool = True
) -> DataFrame:
    """Aspect-preserving resize plumbing over ``mapInPandas``.

    Source dims come from the (stubbed) decode; the scale factor,
    target dims, and the resized payload are computed per asset inside
    the Arrow batch loop.  The stub 'resample' is a deterministic
    byte-stride downsample of the payload so tests pin real bytes
    without codecs; a real implementation swaps ``_decode_one`` + the
    resample line for PIL/ffmpeg calls and keeps everything else.
    """
    pruned = assets.select("asset_id", "modality", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "asset_id", "modality", "src_width", "src_height",
                "dst_width", "dst_height", "resized_md5",
            )}
            for aid, mod, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                _feats, w, h = _decode_one(payload, mod, decode_stub)
                scale = min(1.0, max_side / max(w, h))
                dw, dh = max(1, int(w * scale)), max(1, int(h * scale))
                stride = max(1, len(payload) // max(dw * dh, 1)) if payload else 1
                resized = payload[::stride]
                rows["asset_id"].append(aid)
                rows["modality"].append(mod)
                rows["src_width"].append(w)
                rows["src_height"].append(h)
                rows["dst_width"].append(dw)
                rows["dst_height"].append(dh)
                rows["resized_md5"].append(hashlib.md5(resized).hexdigest())
            yield pd.DataFrame(rows).astype(
                {c: "int32" for c in ("src_width", "src_height", "dst_width", "dst_height")}
            )

    return pruned.mapInPandas(batches, schema=RESIZE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to extract,
    computed declaratively from metadata (no decode needed) — the
    decode of each frame is the stubbed part."""
    return (
        assets.where(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta_duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ms"),
        )
    )
