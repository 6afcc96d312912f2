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
    """Formats beyond the pure-python decoders stay stubbed (no codec
    libs in container): MP3/MP4 payloads hit the documented boundary."""
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_media(b"ID3\x04mp3ish-payload", "audio/mpeg")


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


def _png_bytes(raster: np.ndarray, width: int, height: int,
               color: int, filters: list[int]) -> bytes:
    """Independent PNG writer: applies the FORWARD scanline filters
    (the decoder must invert them) and wraps zlib-compressed scanlines
    in proper chunks with CRCs."""
    import struct
    import zlib
    ch = {0: 1, 2: 3, 6: 4}[color]
    stride = width * ch
    img = raster.reshape(height, stride)
    prev = np.zeros(stride, dtype=np.int32)
    lines = []
    for y in range(height):
        cur = img[y].astype(np.int32)
        f = filters[y % len(filters)]
        enc = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
            enc[i] = (cur[i] - pred) % 256
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(t: bytes, d: bytes) -> bytes:
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))


def test_png_decode_inverts_every_filter_type():
    """Baseline PNG decode: an independent writer encodes a known
    raster cycling through all five scanline filters; the decoder must
    invert each one exactly, for grayscale, RGB and RGBA."""
    rng = np.random.RandomState(7)
    for color, ch in ((0, 1), (2, 3), (6, 4)):
        w, h = 9, 10
        raster = rng.randint(0, 256, size=h * w * ch).astype(np.uint8)
        png = _png_bytes(raster, w, h, color, filters=[0, 1, 2, 3, 4])
        got = MM.decode_media(png, "image/png")
        assert (got == raster).all(), f"color type {color}"


def test_png_decode_guards():
    """Non-baseline PNGs fail loudly, truncated data is detected, and
    JPEG stays stubbed (entropy/DCT codecs are genuinely absent)."""
    import struct
    import zlib
    raster = np.zeros(4, dtype=np.uint8)
    png16 = bytearray(_png_bytes(raster, 2, 2, 0, [0]))
    # corrupt depth byte (offset: 8 magic + 4 len + 4 type + 8 w/h)
    png16[8 + 8 + 8] = 16
    with pytest.raises(NotImplementedError, match="baseline"):
        MM.decode_media(bytes(png16), "")
    good = _png_bytes(raster, 2, 2, 0, [0])
    # rebuild with truncated IDAT payload
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d)))
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_media(bad, "")
    assert MM.decode_media(good, "").tolist() == [0, 0, 0, 0]


def test_phash_dedup_finds_planted_ppm_near_dups(spark):
    """Two real PPM images differing by slight pixel noise must pair
    (hamming small); a structurally different image must not. Runs the
    full banded pipeline on a hand-built asset frame."""
    rng = np.random.RandomState(7)
    base = (rng.rand(16 * 16 * 3) * 255).astype(np.uint8)
    noisy = np.clip(base.astype(int)
                    + rng.randint(-2, 3, size=base.size), 0, 255) \
        .astype(np.uint8)
    other = ((np.arange(16 * 16 * 3) * 37) % 256).astype(np.uint8)
    rows = [(1, _ppm_bytes(base, 16, 16)),
            (2, _ppm_bytes(noisy, 16, 16)),
            (3, _ppm_bytes(other, 16, 16))]
    assets = spark.createDataFrame(
        [(i, p, len(p), "image/ppm") for i, p in rows],
        "asset_id long, payload binary, n_bytes int, mime string",
    ).select("asset_id", "payload",
             F.struct("n_bytes", "mime").alias("meta"))
    hashes = {r.asset_id: r.phash
              for r in MM.phash_assets(assets).collect()}
    ham = lambda a, b: bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
    assert ham(1, 2) <= MM.PHASH_HAM_MAX       # near-dup pair is close
    assert ham(1, 3) > MM.PHASH_HAM_MAX        # distinct image is far
    # python aHash oracle agrees with the pipeline's hash
    want = MM.ahash64(MM.decode_media(_ppm_bytes(base, 16, 16), ""))
    assert hashes[1] == want


def test_phash_banding_is_complete_within_radius(spark):
    """Pigeonhole guarantee: every pair within PHASH_HAM_MAX shares at
    least one 16-bit band — verified on the registry query's own
    output at sf0.001 against a brute-force numpy hash comparison."""
    from covid_weather_etl_spark.queries.registry import all_queries
    got = (all_queries()["media_phash_dedup"].fn(spark, SF_DIR)
           .toPandas())
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    hashes = {}
    for r in docs.itertuples():
        payload = r.text.encode()
        hashes[r.doc_id] = MM.ahash64(MM.decode_media(payload, "x/fake"))
    want = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
            if d <= MM.PHASH_HAM_MAX:
                want.add((a, b))
    got_pairs = {(r.asset_id_1, r.asset_id_2) for r in got.itertuples()}
    assert got_pairs == want
    assert (got.hamming <= MM.PHASH_HAM_MAX).all()


# ---------------------------------------------------------------- JPEG

#: published zigzag scan order (ISO/IEC 10918-1 Figure 5) — pins the
#: generated _JPEG_ZZ table against the spec, independent of the code.
_SPEC_ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
            28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
            37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
            54, 47, 55, 62, 63]


class _JpegWriter:
    """Minimal baseline JPEG encoder for fixtures: DC-category Huffman
    table = twelve 4-bit codes (symbol s -> code s), AC table = EOB
    '0', 0x01 '10', 0x02 '110' (canonical). Writes real DQT/SOF0/DHT/
    SOS segments and a byte-stuffed entropy stream, so the decoder
    under test parses the actual format, not a mock."""

    def __init__(self):
        self.buf = bytearray()
        self.acc, self.nacc = 0, 0

    def bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc, self.nacc = 0, 0

    def flush(self) -> None:
        while self.nacc:
            self.bits(1, 1)

    def block(self, dc_diff: int, acs: list[int]) -> None:
        """One 8x8 block: DC diff + ACs at zigzag 1..len(acs) (values
        in ±{1,2,3}, 0 not allowed), then EOB."""
        t = dc_diff.bit_length() if dc_diff > 0 else abs(dc_diff).bit_length()
        self.bits(t, 4)                       # DC symbol t -> 4-bit code t
        if t:
            v = dc_diff if dc_diff >= 0 else dc_diff + (1 << t) - 1
            self.bits(v, t)
        for a in acs:
            s = abs(a).bit_length()
            assert s in (1, 2)
            self.bits({1: 0b10, 2: 0b110}[s], {1: 2, 2: 3}[s])
            v = a if a >= 0 else a + (1 << s) - 1
            self.bits(v, s)
        self.bits(0, 1)                       # EOB


def _jpeg_bytes(width, height, comps, mcu_blocks, qtab):
    """Assemble a baseline JPEG: `comps` = [(cid, h, v)], `mcu_blocks`
    = per-MCU list of (dc_diff, acs) block specs in scan order, `qtab`
    = 64 quant values in NATURAL order."""
    import struct
    out = bytearray(b"\xff\xd8")
    zz = bytes(qtab[_SPEC_ZZ[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + zz
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, h, v in comps:
        sof += bytes([cid, (h << 4) | v, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dc_bits = bytes([0, 0, 0, 12] + [0] * 12)
    out += (b"\xff\xc4" + struct.pack(">H", 19 + 12) + b"\x00"
            + dc_bits + bytes(range(12)))
    ac_bits = bytes([1, 1, 1] + [0] * 13)
    out += (b"\xff\xc4" + struct.pack(">H", 19 + 3) + b"\x10"
            + ac_bits + bytes([0x00, 0x01, 0x02]))
    sos = bytes([len(comps)])
    for cid, _h, _v in comps:
        sos += bytes([cid, 0x00])             # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    w = _JpegWriter()
    for mcu in mcu_blocks:
        for dc_diff, acs in mcu:
            w.block(dc_diff, acs)
    w.flush()
    out += w.buf + b"\xff\xd9"
    return bytes(out)


def _idct_ref(coeff_natural: np.ndarray) -> np.ndarray:
    """Independent textbook IDCT (explicit cosine double sum)."""
    out = np.zeros((8, 8))
    c = lambda u: (1 / np.sqrt(2)) if u == 0 else 1.0
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (c(u) * c(v) * coeff_natural[u, v]
                          * np.cos((2 * x + 1) * v * np.pi / 16)
                          * np.cos((2 * y + 1) * u * np.pi / 16))
            out[y, x] = s / 4.0
    return out


def test_jpeg_zigzag_matches_spec():
    assert list(MM._JPEG_ZZ) == _SPEC_ZZ


def test_jpeg_gray_dc_and_ac_blocks_decode_exactly():
    """16x8 grayscale, two blocks: flat DC-only block, then a block
    with DC prediction and two AC coefficients — checked against the
    textbook IDCT, not the decoder's own basis."""
    q = np.arange(1, 65, dtype=np.int64)      # distinct quant entries
    blocks = [[(5, []), (-3, [2, -1])]]       # one MCU row? no: 2 MCUs
    payload = _jpeg_bytes(16, 8, [(1, 1, 1)],
                          [[(5, [])], [(-3, [2, -1])]], list(q))
    got = MM.decode_media(payload).reshape(8, 16)
    c0 = np.zeros((8, 8)); c0[0, 0] = 5 * q[0]
    exp0 = np.clip(np.round(_idct_ref(c0) + 128), 0, 255)
    c1 = np.zeros((8, 8))
    c1[0, 0] = (5 - 3) * q[0]                 # DC prediction chain
    nat1, nat2 = _SPEC_ZZ[1], _SPEC_ZZ[2]
    c1[nat1 // 8, nat1 % 8] = 2 * q[nat1]
    c1[nat2 // 8, nat2 % 8] = -1 * q[nat2]
    exp1 = np.clip(np.round(_idct_ref(c1) + 128), 0, 255)
    assert np.array_equal(got[:, :8], exp0)
    assert np.array_equal(got[:, 8:], exp1)
    assert got.dtype == np.uint8
    assert blocks  # silence lint


def test_jpeg_420_color_decodes_with_upsampling():
    """16x16 4:2:0 color: one MCU = 4 Y blocks + Cb + Cr. Flat blocks
    -> every pixel checked against the JFIF YCbCr->RGB formula with
    2x2 chroma upsampling."""
    q = [8] * 64
    y_dcs = [16, -8, 4, -4]                   # raw DC diffs, scan order
    mcu = [(y_dcs[0], []), (y_dcs[1], []), (y_dcs[2], []), (y_dcs[3], []),
           (6, []), (-6, [])]
    payload = _jpeg_bytes(16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)],
                          [mcu], q)
    got = MM.decode_media(payload).reshape(16, 16, 3)
    flat = lambda dc: dc * 8 / 8.0 + 128.0    # DC-only: c*Q0/8 + 128
    y_abs = np.cumsum(y_dcs)                  # DC prediction per comp
    yplane = np.zeros((16, 16))
    yplane[:8, :8], yplane[:8, 8:] = flat(y_abs[0]), flat(y_abs[1])
    yplane[8:, :8], yplane[8:, 8:] = flat(y_abs[2]), flat(y_abs[3])
    cb, cr = flat(6), flat(-6)                # separate DC predictors
    exp = np.zeros((16, 16, 3))
    exp[:, :, 0] = yplane + 1.402 * (cr - 128)
    exp[:, :, 1] = yplane - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    exp[:, :, 2] = yplane + 1.772 * (cb - 128)
    exp = np.clip(np.round(exp), 0, 255)
    assert np.array_equal(got, exp.astype(np.uint8))


def test_jpeg_progressive_is_rejected():
    import struct
    seg = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    payload = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 2 + len(seg)) + seg)
    with pytest.raises(NotImplementedError, match="baseline"):
        MM.decode_media(payload)


def test_jpeg_flows_through_featurize(spark):
    q = list(np.arange(1, 65))
    payload = _jpeg_bytes(8, 8, [(1, 1, 1)], [[(5, [])]], q)
    assets = spark.createDataFrame(
        [(1, payload, len(payload), "image/jpeg")],
        "asset_id long, payload binary, n_bytes int, mime string",
    ).select("asset_id", "payload",
             F.struct("n_bytes", "mime").alias("meta"))
    feats = MM.featurize_assets(assets).collect()
    arr = MM.decode_media(payload)
    assert feats[0]["features"] == pytest.approx(MM._featurize(arr), rel=1e-6)
