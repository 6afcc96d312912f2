"""Multimodal (image/audio/video) column plumbing (LLM-pipeline).

Media assets are opaque `binary` payload columns + a typed metadata
struct — the lakehouse pattern for 100 TB multimodal corpora: the
bytes travel inside parquet (or as object-store paths for very large
assets), metadata is columnar and prunable, and every decode /
feature-extract / resize step is an Arrow-batched Pandas UDF so the
Python work is vectorized per batch, never per row.

`decode_media` decodes WAV PCM (stdlib `wave`) and binary PPM/PGM
(handwritten header parse) for real — no codec libraries needed — and
those real bytes flow through the same featurize/resize path as the
synthetic assets (tests/test_multimodal.py). Compressed formats
(JPEG/MP3/MP4) are stubbed behind NotImplementedError because the
container has no codec libraries; a real deployment adds
PIL/soundfile/ffmpeg branches in `decode_media` and nothing else
changes.

Payloads here are derived from `documents.text` bytes (the driver
corpus has no binary table); the operators never look at them as text.

Scale notes: payload columns make parquet row groups large — feature
extraction repartitions by doc_id so batches stay bounded; metadata
queries (media_catalog, frame_sample) never touch the payload bytes
after the initial projection, so column pruning keeps their scans
cheap.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables

N_SAMPLE_FRAMES = 4
BYTES_PER_FRAME = 100  # fake container: one "frame" per 100 payload bytes


def media_assets(docs: DataFrame) -> DataFrame:
    """documents → media-asset table: opaque binary payload + typed
    metadata struct (the schema a real multimodal corpus carries)."""
    payload = F.encode(F.col("text"), "UTF-8")
    n_frames = (F.octet_length(payload) / BYTES_PER_FRAME).cast("int") + 1
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("fingerprint"),
            F.when(F.col("lang") == "en", "video/fake")
             .otherwise("image/fake").alias("mime"),
            n_frames.alias("n_frames"),
        ).alias("meta"),
    )


@register(
    "media_catalog",
    survey="multimodal",
    oracle="""
    SELECT doc_id AS asset_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS fingerprint,
           CASE WHEN lang = 'en' THEN 'video/fake'
                ELSE 'image/fake' END AS mime,
           CAST(FLOOR(octet_length(encode(text)) / 100) AS INT) + 1 AS n_frames
    FROM documents
    """,
)
def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata catalog over the media assets — byte size, content
    fingerprint, sniffed mime, frame count. Reads ONLY the metadata
    struct (payload pruned from the scan after projection)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return media_assets(t["documents"]).select(
        "asset_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.fingerprint").alias("fingerprint"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_frames").alias("n_frames"),
    )


@register(
    "frame_sample",
    survey="multimodal",
    oracle=f"""
    WITH assets AS (
        SELECT doc_id AS asset_id,
               CAST(FLOOR(octet_length(encode(text)) / {BYTES_PER_FRAME}) AS INT)
                 + 1 AS n_frames
        FROM documents
    )
    SELECT asset_id, n_frames,
           CAST(FLOOR(i * (n_frames - 1) / ({N_SAMPLE_FRAMES} - 1)) AS INT)
             AS frame_idx,
           CAST(FLOOR(i * (n_frames - 1) / ({N_SAMPLE_FRAMES} - 1)) AS INT)
             * {BYTES_PER_FRAME} AS byte_offset
    FROM assets,
         (SELECT unnest(generate_series(0, {N_SAMPLE_FRAMES} - 1)) AS i)
    WHERE n_frames >= {N_SAMPLE_FRAMES}
    UNION ALL
    SELECT asset_id, n_frames,
           unnest(generate_series(0, n_frames - 1)) AS frame_idx,
           unnest(generate_series(0, n_frames - 1)) * {BYTES_PER_FRAME}
             AS byte_offset
    FROM assets WHERE n_frames < {N_SAMPLE_FRAMES}
    """,
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evenly-spaced frame sampling plan (video keyframe extraction
    shape): k frame indices per asset via `sequence` + `explode` —
    integer arithmetic only, no payload bytes touched, so the planner
    prunes the binary column entirely. Assets with fewer frames than k
    emit every frame."""
    t = load_tables(spark, sf_dir, ("documents",))
    assets = media_assets(t["documents"]).select(
        "asset_id", F.col("meta.n_frames").alias("n_frames"))
    k = N_SAMPLE_FRAMES
    sampled = (assets
               .filter(F.col("n_frames") >= k)
               .select("asset_id", "n_frames",
                       F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
                        .alias("i"))
               .select("asset_id", "n_frames",
                       (F.col("i") * (F.col("n_frames") - 1) / (k - 1))
                       .cast("int").alias("frame_idx")))
    short = (assets
             .filter(F.col("n_frames") < k)
             .select("asset_id", "n_frames",
                     F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1))
                      .alias("frame_idx")))
    return (sampled.unionByName(short)
            .withColumn("byte_offset",
                        (F.col("frame_idx") * BYTES_PER_FRAME)
                        .cast("bigint")))


# ---------------------------------------------------------------------------
# decode + featurize (Arrow-batched; decode stubbed)
# ---------------------------------------------------------------------------

N_FEATURES = 8

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for image/audio decode: the payload bytes
    themselves as a uint8 array (a real decoder returns pixels/samples
    the same way)."""
    return np.frombuffer(payload, dtype=np.uint8)


def _featurize(arr: np.ndarray) -> list[float]:
    """8-dim feature vector over decoded samples: mean, std, min, max,
    plus a 4-bin histogram density. Matches the independent python
    reimplementation in tests/test_multimodal.py."""
    if arr.size == 0:
        return [0.0] * N_FEATURES
    hist = np.bincount(arr >> 6, minlength=4) / arr.size
    return [float(arr.mean()), float(arr.std()), float(arr.min()),
            float(arr.max()), *(float(h) for h in hist)]


def _decode_wav(payload: bytes) -> np.ndarray:
    """Real WAV PCM decode (stdlib `wave`, no codec libs): mono uint8
    sample stream. 16-bit PCM is rescaled to 8-bit and multi-channel
    audio is mixed down so every decoder feeds the same uint8
    featurize/resample path."""
    import io
    import wave
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        arr = np.frombuffer(raw, dtype=np.uint8)
    elif sw == 2:
        arr = (((np.frombuffer(raw, dtype="<i2").astype(np.int32) + 32768)
                >> 8).astype(np.uint8))
    else:
        raise NotImplementedError(f"{8 * sw}-bit PCM not supported")
    if nch > 1:
        arr = (arr[:arr.size // nch * nch]
               .reshape(-1, nch).mean(axis=1).astype(np.uint8))
    return arr


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Real binary netpbm decode (P6=PPM pixels, P5=PGM grayscale),
    handwritten header parse: returns the flat uint8 raster."""
    magic = payload[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":          # comment to end of line
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                      # single whitespace before raster
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm samples not supported")
    n = width * height * (3 if magic == b"P6" else 1)
    raster = payload[pos:pos + n]
    if len(raster) != n:
        raise ValueError(f"truncated netpbm raster: {len(raster)} < {n}")
    return np.frombuffer(raster, dtype=np.uint8)


def decode_media(payload: bytes, mime: str = "", fake: bool = False) -> np.ndarray:
    """Decode one media payload to a flat uint8 sample array.

    Real pure-python decoders cover WAV PCM (sniffed RIFF/WAVE) and
    binary PPM/PGM (P6/P5); the synthetic `*/fake` assets derived from
    the driver corpus use the deterministic byte-identity decoder.
    Formats needing external codec libraries (JPEG/PNG/MP3/MP4) are
    stubbed in this environment — a production build adds
    PIL/soundfile/ffmpeg branches here and nothing downstream changes."""
    if fake or mime.endswith("/fake"):
        return _fake_decode(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:2] in (b"P6", b"P5"):
        return _decode_ppm(payload)
    raise NotImplementedError(
        "no codec for this payload: supported real formats are WAV PCM "
        "and PPM/PGM; compressed formats require codec libraries "
        "(PIL/ffmpeg) not present in this environment")


def featurize_assets(assets: DataFrame, batch_rows: int = 256) -> DataFrame:
    """`mapInPandas` feature extraction: Arrow streams batches of
    (asset_id, payload) into Python; numpy featurizes each decoded
    payload; only the small feature vectors come back. At 100 TB this
    is the canonical shape — bytes stay in the executor, one Python
    worker per core, batch size bounds Arrow memory."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_featurize(decode_media(p, m))
                     for p, m in zip(pdf["payload"], pdf["mime"])]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "n_bytes": pdf["n_bytes"].astype("int32"),
                "features": feats,
            })

    return (assets
            .select("asset_id", "payload",
                    F.col("meta.n_bytes").alias("n_bytes"),
                    F.col("meta.mime").alias("mime"))
            .mapInPandas(extract, schema=FEATURE_SCHEMA))


@register("media_features", survey="multimodal")
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode(+stub)→featurize over every media asset; rows-only driver
    check (the fake decoder is not expressible in SQL), pinned by the
    python oracle in tests/test_multimodal.py."""
    t = load_tables(spark, sf_dir, ("documents",))
    feats = featurize_assets(media_assets(t["documents"]))
    return feats.select(
        "asset_id", "n_bytes",
        *[F.round(F.col("features")[i], 5).alias(f"f{i}")
          for i in range(N_FEATURES)],
    ).orderBy("asset_id")


# ---------------------------------------------------------------------------
# resize (Arrow-batched; decode stubbed, resampling real)
# ---------------------------------------------------------------------------

TARGET_SAMPLES = 64

RESIZE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("n_bytes_in", T.IntegerType()),
    T.StructField("n_bytes_out", T.IntegerType()),
    T.StructField("resized", T.BinaryType()),
])


def _fake_resize(arr: np.ndarray, target: int = TARGET_SAMPLES) -> np.ndarray:
    """Nearest-neighbor resample of the decoded 1-D sample array to a
    fixed length — the 1-D analog of image resize (a real build swaps
    in PIL's `Image.resize`/ffmpeg scale and nothing else changes)."""
    if arr.size == 0:
        return np.zeros(target, dtype=np.uint8)
    idx = (np.arange(target, dtype=np.int64) * arr.size) // target
    return arr[idx]


def resize_assets(assets: DataFrame,
                  target: int = TARGET_SAMPLES) -> DataFrame:
    """`mapInPandas` resize: payload bytes → decode (stub) → fixed-size
    resample → new binary payload. Bytes never leave the executor; the
    output rows are uniformly `target` bytes, which is what makes the
    downstream training-batch layout predictable at 100 TB."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_fake_resize(decode_media(p, m), target).tobytes()
                   for p, m in zip(pdf["payload"], pdf["mime"])]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "n_bytes_in": pdf["n_bytes"].astype("int32"),
                "n_bytes_out": np.int32(target),
                "resized": out,
            })

    return (assets
            .select("asset_id", "payload",
                    F.col("meta.n_bytes").alias("n_bytes"),
                    F.col("meta.mime").alias("mime"))
            .mapInPandas(run, schema=RESIZE_SCHEMA))


@register("media_resize", survey="multimodal")
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize every media asset to TARGET_SAMPLES samples; returns
    sizes + content checksum (not the bytes — the driver compare
    wants stable strings). Rows-only driver check; the python oracle
    in tests/test_multimodal.py pins the resampling."""
    t = load_tables(spark, sf_dir, ("documents",))
    resized = resize_assets(media_assets(t["documents"]))
    return (resized
            .select("asset_id", "n_bytes_in", "n_bytes_out",
                    F.md5("resized").alias("checksum"))
            .orderBy("asset_id"))
