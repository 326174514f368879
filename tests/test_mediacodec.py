"""The real media codec path (pipeline/mediacodec.py + the
synth_media/decode_media ops): stdlib PNG and WAV, every scanline
filter, spec-conformance against hand-built byte fixtures (a roundtrip
alone could hide mirrored encode/decode bugs), and the Spark op twin
against the DuckDB arithmetic oracle."""

import struct
import zlib

import numpy as np
import pytest

from spatialgraft.pipeline.mediacodec import (png_decode, png_encode,
                                              wav_decode, wav_encode)


# ------------------------------------------------------- codec units

def test_png_roundtrip_all_shapes_and_filters():
    rng = np.random.RandomState(11)
    for _ in range(40):
        h, w = rng.randint(1, 24), rng.randint(1, 24)
        nch = int(rng.choice([1, 3, 4]))
        shape = (h, w) if nch == 1 else (h, w, nch)
        pix = rng.randint(0, 256, shape).astype(np.uint8)
        filts = rng.randint(0, 5, h)
        assert np.array_equal(png_decode(png_encode(pix, filts)), pix)


def test_png_decode_handbuilt_fixture():
    """Decode a PNG built byte-by-byte here (no shared encoder code):
    2x2 greyscale, row 0 filter None, row 1 filter Up — recon values
    computed by hand per RFC 2083."""
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))
    # pixels: row0 = [10, 20]; row1 = recon = [15, 250]
    # filter Up encodes row1 as (15-10)%256=5, (250-20)%256=230
    raw = bytes([0, 10, 20]) + bytes([2, 5, 230])
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    assert np.array_equal(png_decode(png),
                          np.array([[10, 20], [15, 250]], np.uint8))


def test_png_encode_emits_declared_filters():
    """The encoder really uses the requested filter ids (first scanline
    byte after inflate), so synth_media's (k+r)%5 schedule genuinely
    ships every filter type through the decoder."""
    pix = np.arange(25, dtype=np.uint8).reshape(5, 5)
    data = png_encode(pix, [0, 1, 2, 3, 4])
    # IDAT starts after sig(8) + IHDR chunk(12+13); parse generically
    pos, idat = 8, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        if data[pos + 4:pos + 8] == b"IDAT":
            idat += data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    rows = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(5, 6)
    assert list(rows[:, 0]) == [0, 1, 2, 3, 4]
    assert np.array_equal(png_decode(data), pix)


def test_png_rejects_corruption():
    pix = np.zeros((3, 3), np.uint8)
    data = bytearray(png_encode(pix))
    with pytest.raises(ValueError):
        png_decode(b"JUNK" + bytes(data))
    data[30] ^= 0xFF  # flip a byte inside IHDR/IDAT territory
    with pytest.raises(ValueError):
        png_decode(bytes(data))


def test_wav_roundtrip_and_header():
    smp = (np.arange(-100, 100, dtype=np.int16) * 163).astype(np.int16)
    data = wav_encode(smp, 12000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    sr, nch, out = wav_decode(data)
    assert (sr, nch) == (12000, 1)
    assert np.array_equal(out, smp)


# ------------------------------------------------- Spark op vs oracle

def test_media_decode_real_matches_oracle(spark, sf_smoke):
    sf_dir = sf_smoke
    import duckdb

    from spatialgraft import datagen
    from spatialgraft.oracles import pipeline_oracles
    from spatialgraft.pipeline import multimodal

    got = (multimodal.decode_media(
        multimodal.synth_media(datagen.points_raw(spark, sf_dir)))
        .toPandas().sort_values("doc_key").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf_dir}/lineitem.parquet'")
    want = (con.execute(pipeline_oracles()["media_decode_real"])
            .fetchdf().sort_values("doc_key").reset_index(drop=True))
    assert len(got) == len(want) and len(got) > 0
    for c in ("doc_key", "kind", "width", "height", "sample_rate",
              "n_samples"):
        assert (got[c].values == want[c].values).all(), c
    # bit-exact doubles: decoded-from-bytes mean == arithmetic oracle
    assert (got["mean_val"].values == want["mean_val"].values).all()
    # both modalities actually present
    assert set(got["kind"]) == {"image", "audio"}


def test_png_decode_size_guard():
    """The pure-Python Average/Paeth defilter is scope-limited: images
    beyond PY_DEFILTER_MAX_BYTES raise instead of decoding at Python
    speed (VERDICT r6 item 5 — the C-codec swap-in point is named)."""
    import pytest

    big = np.zeros((300, 300), np.uint8)  # 90k > 64k guard
    data = png_encode(big)
    with pytest.raises(ValueError, match="pure-Python defilter scope"):
        png_decode(data)
