"""Multimodal plumbing tests: python oracle for the fake-decode
featurizer, metadata consistency, frame-sampling invariants, and the
stubbed real-decode contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from covid_weather_etl_spark.operators import multimodal as MM
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def test_media_features_match_python(spark, docs_pdf):
    got = MM.media_features(spark, SF_DIR).toPandas().set_index("asset_id")
    for row in docs_pdf.head(30).itertuples():
        arr = np.frombuffer(row.text.encode("utf-8"), dtype=np.uint8)
        hist = np.bincount(arr >> 6, minlength=4) / arr.size
        expected = [arr.mean(), arr.std(), float(arr.min()),
                    float(arr.max()), *hist]
        g = got.loc[row.doc_id]
        assert g["n_bytes"] == len(row.text.encode("utf-8"))
        np.testing.assert_allclose(
            [g[f"f{i}"] for i in range(MM.N_FEATURES)],
            np.round(np.asarray(expected, dtype=np.float32), 5),
            atol=1e-5)


def test_media_catalog_fingerprint(spark, docs_pdf):
    got = MM.media_catalog(spark, SF_DIR).toPandas().set_index("asset_id")
    for row in docs_pdf.head(10).itertuples():
        assert (got.loc[row.doc_id, "fingerprint"]
                == hashlib.md5(row.text.encode("utf-8")).hexdigest())


def test_frame_sample_invariants(spark):
    pdf = MM.frame_sample(spark, SF_DIR).toPandas()
    k = MM.N_SAMPLE_FRAMES
    sizes = pdf.groupby("asset_id").size()
    meta = pdf.groupby("asset_id")["n_frames"].first()
    assert (sizes == np.minimum(meta, k)).all()
    assert (pdf.frame_idx >= 0).all()
    assert (pdf.frame_idx < pdf.n_frames).all()
    assert (pdf.byte_offset == pdf.frame_idx * MM.BYTES_PER_FRAME).all()
    # sampled endpoints: first and last frame always present when full-k
    full = pdf[pdf.n_frames >= k]
    lasts = full.groupby("asset_id").agg(mx=("frame_idx", "max"),
                                         nf=("n_frames", "first"),
                                         mn=("frame_idx", "min"))
    assert (lasts.mx == lasts.nf - 1).all()
    assert (lasts.mn == 0).all()


def test_unsupported_format_decode_is_stubbed():
    """Compressed formats stay stubbed (no codec libs in container)."""
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_media(b"\xff\xd8\xff\xe0jpegish", "image/jpeg")


def _wav_bytes(samples: np.ndarray, sampwidth: int = 2,
               nch: int = 1, rate: int = 8000) -> bytes:
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 1:
            w.writeframes(samples.astype(np.uint8).tobytes())
        else:
            w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _ppm_bytes(pixels: np.ndarray, width: int, height: int,
               magic: bytes = b"P6") -> bytes:
    return (magic + b"\n# comment\n" +
            f"{width} {height}\n255\n".encode() +
            pixels.astype(np.uint8).tobytes())


def test_wav_decode_real_bytes():
    """Real 16-bit PCM WAV decodes to the expected rescaled uint8
    samples; stereo mixes down."""
    sine = (np.sin(np.linspace(0, 8 * np.pi, 400)) * 30000).astype("<i2")
    arr = MM.decode_media(_wav_bytes(sine), "audio/wav")
    expect = (((sine.astype(np.int32) + 32768) >> 8).astype(np.uint8))
    assert (arr == expect).all()
    # 8-bit mono roundtrips exactly
    raw = np.arange(256, dtype=np.uint8)
    assert (MM.decode_media(_wav_bytes(raw, sampwidth=1), "") == raw).all()


def test_ppm_decode_real_bytes():
    """P6 raster (with header comment) and P5 grayscale decode to the
    exact flat raster."""
    px = np.arange(2 * 3 * 3, dtype=np.uint8)
    assert (MM.decode_media(_ppm_bytes(px, 3, 2), "image/ppm") == px).all()
    gray = np.arange(12, dtype=np.uint8)
    assert (MM.decode_media(_ppm_bytes(gray, 4, 3, b"P5"), "") == gray).all()


def test_real_formats_flow_through_featurize_and_resize(spark):
    """Real WAV + PPM bytes ride the SAME mapInPandas featurize/resize
    plumbing as the synthetic assets — decode dispatches per row on the
    sniffed container format."""
    sine = (np.sin(np.linspace(0, 4 * np.pi, 300)) * 25000).astype("<i2")
    wav = _wav_bytes(sine)
    px = (np.arange(5 * 4 * 3) % 256).astype(np.uint8)
    ppm = _ppm_bytes(px, 5, 4)
    assets = spark.createDataFrame(
        [(1, wav, len(wav), "audio/wav"),
         (2, ppm, len(ppm), "image/ppm")],
        "asset_id long, payload binary, n_bytes int, mime string",
    ).select("asset_id", "payload",
             F.struct("n_bytes", "mime").alias("meta"))

    feats = {r["asset_id"]: r for r in MM.featurize_assets(assets).collect()}
    wav_dec = MM.decode_media(wav, "audio/wav")
    ppm_dec = MM.decode_media(ppm, "image/ppm")
    assert feats[1]["features"][0] == pytest.approx(wav_dec.mean(), rel=1e-6)
    assert feats[2]["features"][0] == pytest.approx(ppm_dec.mean(), rel=1e-6)
    assert feats[2]["features"][3] == float(ppm_dec.max())

    resized = {r["asset_id"]: r for r in MM.resize_assets(assets).collect()}
    for aid, dec in ((1, wav_dec), (2, ppm_dec)):
        idx = (np.arange(MM.TARGET_SAMPLES, dtype=np.int64)
               * dec.size) // MM.TARGET_SAMPLES
        assert resized[aid]["resized"] == dec[idx].tobytes()


def test_media_resize_matches_python(spark, docs_pdf):
    got = MM.media_resize(spark, SF_DIR).toPandas().set_index("asset_id")
    assert (got["n_bytes_out"] == MM.TARGET_SAMPLES).all()
    for row in docs_pdf.head(20).itertuples():
        arr = np.frombuffer(row.text.encode("utf-8"), dtype=np.uint8)
        idx = (np.arange(MM.TARGET_SAMPLES, dtype=np.int64)
               * arr.size) // MM.TARGET_SAMPLES
        expected = arr[idx].tobytes()
        assert (got.loc[row.doc_id, "checksum"]
                == hashlib.md5(expected).hexdigest())
        assert got.loc[row.doc_id, "n_bytes_in"] == arr.size


def test_fake_resize_preserves_endpoints():
    arr = np.arange(256, dtype=np.uint8)
    out = MM._fake_resize(arr, 64)
    assert out.size == 64
    assert out[0] == arr[0]
    # nearest-neighbor grid: last sample index is (63*256)//64 = 252
    assert out[-1] == arr[(63 * 256) // 64]
    # monotone non-decreasing source indices → order preserved
    assert (np.diff(out.astype(int)) >= 0).all()
