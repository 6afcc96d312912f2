"""Multimodal plumbing tests: python oracle for the fake-decode
featurizer, metadata consistency, frame-sampling invariants, and the
stubbed real-decode contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

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


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_media(b"\x00\x01", "image/fake", fake=False)


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
