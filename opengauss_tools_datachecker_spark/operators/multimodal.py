"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` operators. The image/audio codec
libraries are NOT in this container, so the decode kernel is STUBBED
(deterministic fake derived from the payload digest, or
NotImplementedError in strict mode) — the Spark-side contract (schema,
batch iteration, partitioning, UDF signatures) is real and tested.

Scale notes: payloads dominate bytes — never shuffle them. Every
operator here is map-only (mapInPandas preserves partitioning, no
shuffle); metadata-only projections drop the payload column FIRST so
Parquet column pruning keeps payload I/O out of metadata queries.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "meta struct<format:string, width:int, height:int, duration_ms:int>"
)



def assets_from_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap documents as opaque binary assets (test harness for the
    multimodal path — payload = utf-8 bytes, metadata synthesized).

    Metadata derives from sha256(id) hex substrings (not xxhash64), so
    kind/width/height/duration are reproducible on ANY engine — the
    frame-sampling and decode queries get full DuckDB oracles."""
    h = F.sha2(F.col(id_col).cast("string"), 256)

    def hex_int(start: int, width: int) -> F.Column:
        return F.conv(F.substring(h, start, width), 16, 10).cast("int")

    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (hex_int(1, 2) % 3) + 1,
        ).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("raw").alias("format"),
            (hex_int(3, 4) % 1920).alias("width"),
            (hex_int(7, 4) % 1080).alias("height"),
            (hex_int(11, 6) % 60000).alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, n: int = 16, strict: bool = False) -> np.ndarray:
    """STUB decode kernel: deterministic pseudo-pixels from the payload
    digest. Replace with PIL/libav decode where codecs exist; strict=True
    surfaces the NotImplementedError instead of faking."""
    if strict:
        raise NotImplementedError("image/audio codecs not available in this environment")
    digest = hashlib.sha256(payload or b"").digest()
    raw = (digest * ((n * 4) // len(digest) + 1))[: n * 4]
    return np.frombuffer(raw, dtype=np.uint8).astype(np.float32).reshape(-1)[:n] / 255.0


def decode_features(assets: DataFrame, feature_dim: int = 16, strict: bool = False) -> DataFrame:
    """Decode + feature-extract: (asset_id, kind, features array<float>).

    Arrow-batched mapInPandas: each batch decodes vectorized-per-row in
    Python (the genuine slow path — codec work), features return as an
    Arrow list column. Payload column is consumed here and NOT emitted —
    downstream stays metadata-sized.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p, feature_dim, strict).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "kind": pdf["kind"], "features": feats}
            )

    id_type = assets.schema["asset_id"].dataType.simpleString()
    return assets.mapInPandas(
        extract, schema=f"asset_id {id_type}, kind string, features array<float>"
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video assets: one row per sampled frame
    timestamp (metadata-only — the decode of each frame is the stubbed
    kernel above). Demonstrates payload-free explode: width of the
    output is rows, not bytes."""
    video = assets.filter(F.col("kind") == "video").select(
        "asset_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    return video.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )


def frame_features(
    assets: DataFrame, every_ms: int = 1000, feature_dim: int = 4, strict: bool = False
) -> DataFrame:
    """Per-frame decode for video assets: sample timestamps
    (:func:`sample_frames`), join each frame back to its payload, and
    extract a per-frame feature vector in an Arrow-batched kernel —
    (asset_id, frame_ms, features array<float>).

    The frame 'decode' is the stubbed kernel keyed by
    (payload, frame_ms), deterministic and engine-reproducible. Scale
    shape: the metadata-only frame table is built WITHOUT payloads
    (rows, not bytes), and payload bytes enter exactly one join whose
    output feeds the map-only kernel — payloads are never shuffled
    more than once and never leave the kernel.
    """
    frames = sample_frames(assets, every_ms)
    joined = frames.join(assets.select("asset_id", "payload"), "asset_id")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(
                    (bytes(p) if p is not None else b"") + b"@" + str(int(ms)).encode(),
                    feature_dim,
                    strict,
                ).tolist()
                for p, ms in zip(pdf["payload"], pdf["frame_ms"])
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "frame_ms": pdf["frame_ms"], "features": feats}
            )

    id_type = assets.schema["asset_id"].dataType.simpleString()
    return joined.mapInPandas(
        extract, schema=f"asset_id {id_type}, frame_ms long, features array<float>"
    )


def resize_meta(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving target dims) — pure metadata
    math in Catalyst; the pixel work would live in decode_features."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(float(max_side)) / F.greatest(w.cast("double"), h.cast("double"), F.lit(1.0))
    )
    return assets.select(
        "asset_id",
        "kind",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
    )


def audio_window_energy(
    assets: DataFrame, n_samples: int = 64, window: int = 8, strict: bool = False
) -> DataFrame:
    """Windowed signal features for audio assets: one row per
    (asset_id, window_idx) with the window's energy (sum of squared
    sample values) and peak amplitude.

    The decode is the same stubbed kernel family as
    :func:`decode_features` — a deterministic waveform of ``n_samples``
    uint8 samples derived from sha256(payload) (replace with libav PCM
    decode where codecs exist; strict=True raises instead). Features
    are INTEGER-exact (no float math), so the DuckDB oracle reproduces
    them bit-for-bit from the same digest.

    Scale shape: map-only mapInPandas — payloads are consumed in the
    kernel and never emitted or shuffled; output is fixed-width rows
    (n_windows per asset).
    """
    if n_samples % window:
        raise ValueError("n_samples must be a multiple of window")

    audio = assets.filter(F.col("kind") == "audio").select("asset_id", "payload")
    n_win = n_samples // window

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, energy, peak = [], [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if strict:
                    raise NotImplementedError(
                        "audio codecs not available in this environment"
                    )
                digest = hashlib.sha256(bytes(p) if p is not None else b"").digest()
                raw = (digest * (n_samples // len(digest) + 1))[:n_samples]
                x = np.frombuffer(raw, dtype=np.uint8).astype(np.int64).reshape(
                    n_win, window
                )
                ids.extend([aid] * n_win)
                widx.extend(range(n_win))
                energy.extend((x * x).sum(axis=1).tolist())
                peak.extend(x.max(axis=1).tolist())
            yield pd.DataFrame(
                {"asset_id": ids, "window_idx": widx, "energy": energy, "peak": peak}
            )

    id_type = assets.schema["asset_id"].dataType.simpleString()
    return audio.mapInPandas(
        extract, schema=f"asset_id {id_type}, window_idx int, energy long, peak int"
    )
