"""Content tests for the multimodal kernels. The IMAGE family is real
(functions/imagecodec.py): these tests pin codec round-trips at the
byte/pixel level, then check the Spark kernels against local numpy on
the SAME deterministic images — beyond the driver's oracle/rows
checks (schema, one->many expansion, binary round-trip)."""

import math

import numpy as np
import pytest

from adcirctime2cogs_spark.functions import imagecodec as ic
from adcirctime2cogs_spark.operators import multimodal as mm
from adcirctime2cogs_spark.tables import load_table


def test_bmp_roundtrip_and_header_bytes():
    img = mm._synth_image(4)  # even -> the BMP path
    data = ic.encode_bmp(img)
    assert data[:2] == b"BM"
    import struct

    (offset,) = struct.unpack_from("<I", data, 10)
    assert offset == 54  # 14-byte file header + 40-byte info header
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    assert (size, planes, bpp, comp) == (40, 1, 24, 0)
    assert (w, h) == (img.shape[1], img.shape[0])
    back = ic.decode_bmp(data)
    assert np.array_equal(back, img)  # BGR flip + bottom-up + padding undone


def test_bmp_row_padding():
    """Widths whose 3w isn't a multiple of 4 exercise the pad bytes."""
    for w in (1, 2, 3, 5, 17):
        img = np.arange(w * 6 * 3, dtype="uint8").reshape(6, w, 3)
        assert np.array_equal(ic.decode_bmp(ic.encode_bmp(img)), img)


def test_ppm_roundtrip():
    img = mm._synth_image(7)  # odd -> the PPM path
    data = ic.encode_ppm(img)
    assert data.startswith(b"P6\n")
    assert np.array_equal(ic.decode_ppm(data), img)
    gray = img[:, :, 0]
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(gray)), gray)


def test_decode_image_dispatch():
    img = mm._synth_image(10)
    assert ic.decode_image(ic.encode_bmp(img))[1] == "bmp"
    assert ic.decode_image(ic.encode_ppm(img))[1] == "ppm"
    with pytest.raises(ValueError):
        ic.decode_image(b"GIF89a....")


def test_resize_nearest_golden():
    """2x downsample of a checkerboard picks the pixel-center samples."""
    img = np.zeros((4, 4), dtype="uint8")
    img[::2, ::2] = 255
    out = ic.resize_nearest(img, 2, 2)
    # centers land at source rows/cols 1 and 3 -> all zeros
    assert out.tolist() == [[0, 0], [0, 0]]
    up = ic.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    # upsample is exact replication of the nearest source pixel
    assert up[0, 0] == img[0, 0] and up[7, 7] == img[3, 3]


def test_image_decode_matches_synth_dims(spark, sf_dir):
    out = {r.doc_id: r for r in mm.mm_image_decode(spark, sf_dir).collect()}
    docs = [r.doc_id for r in
            load_table(spark, sf_dir, "documents").select("doc_id").collect()]
    assert set(out) == set(docs)
    for d in docs:
        r = out[d]
        assert (r.width, r.height) == (16 + d % 48, 16 + (d * 7) % 48)
        assert r.channels == 3
        assert r.format == ("bmp" if d % 2 == 0 else "ppm")


def test_resize_kernel_matches_local_resample(spark, sf_dir):
    out = {r.doc_id: r for r in mm.mm_resize(spark, sf_dir).collect()}
    for d in list(out)[:50]:
        img = mm._synth_image(d)
        h, w = img.shape[:2]
        scale = min(mm.RESIZE_BOX / w, mm.RESIZE_BOX / h, 1.0)
        ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
        r = out[d]
        assert (r.out_w, r.out_h) == (ow, oh)
        assert r.out_w <= mm.RESIZE_BOX and r.out_h <= mm.RESIZE_BOX


def test_frame_sample_reconstructs_bytes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    payloads = {r.doc_id: r.text.encode("utf-8") for r in docs}
    rows = mm.mm_frame_sample(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, {})[r.frame_idx] = bytes(r.frame)
    chunk, stride = 64, 2
    for doc_id, payload in payloads.items():
        want = [payload[i:i + chunk] for i in range(0, len(payload), chunk)][::stride]
        frames = got.get(doc_id, {})
        assert len(frames) == len(want)
        for i, w in enumerate(want):
            assert frames[i] == w


def test_feature_extract_matches_numpy(spark, sf_dir):
    out = {r.doc_id: r.features
           for r in mm.mm_feature_extract(spark, sf_dir).collect()}
    for d in list(out)[:50]:
        px = mm._synth_image(d).astype("float64")
        lum = px.mean(axis=2)
        want = [px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean(),
                px[:, :, 0].std(), px[:, :, 1].std(), px[:, :, 2].std(),
                lum.min(), lum.max()]
        feats = out[d]
        assert len(feats) == 8
        # float32 storage tolerance
        assert all(math.isclose(f, w, rel_tol=1e-6, abs_tol=1e-4)
                   for f, w in zip(feats, want))


def test_wav_roundtrip_and_header():
    from adcirctime2cogs_spark.functions import audiocodec as ac

    s = mm._synth_samples(11)
    data = ac.encode_wav(s, 8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert data[12:16] == b"fmt " and data[36:40] == b"data"
    back, rate = ac.decode_wav(data)
    assert rate == 8000
    assert np.array_equal(back, s)


def test_wav_chunk_walker_skips_extras_and_downmixes():
    import struct

    from adcirctime2cogs_spark.functions import audiocodec as ac

    s = mm._synth_samples(3)
    data = ac.encode_wav(s, 16000)
    # splice an unknown LIST chunk between fmt and data: a real-world
    # WAV often carries one; the parser must skip it
    fmt_end = 36
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOxx"
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, rate = ac.decode_wav(spliced)
    assert rate == 16000 and np.array_equal(back, s)
    # stereo payload downmixes to mono
    stereo = np.stack([s, np.zeros_like(s)], axis=1).ravel()
    data2 = ac.encode_wav(stereo, 8000)
    patched = data2.replace(
        struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16),
        struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16),
    )
    back2, _ = ac.decode_wav(patched)
    assert len(back2) == len(s)
    # mean of (s, 0) is s/2.0; the int16 cast truncates toward zero
    expected = (s.astype("float64") / 2.0).astype("int16")
    assert np.array_equal(back2, expected)


def test_frame_energies_match_numpy():
    from adcirctime2cogs_spark.functions import audiocodec as ac

    s = mm._synth_samples(42)
    es = ac.frame_energies(s, mm.AUDIO_WINDOW, mm.AUDIO_HOP)
    n_expected = (len(s) - mm.AUDIO_WINDOW) // mm.AUDIO_HOP + 1
    assert len(es) == n_expected
    for i, e in enumerate(es):
        w = s[i * mm.AUDIO_HOP: i * mm.AUDIO_HOP + mm.AUDIO_WINDOW].astype("int64")
        assert int(e) == int((w * w).sum())


def test_audio_decode_kernel_matches_synth(spark, sf_dir):
    out = {r.doc_id: r for r in mm.mm_audio_decode(spark, sf_dir).collect()}
    for d, r in list(out.items())[:50]:
        assert r.sample_rate == mm.AUDIO_RATE
        assert r.n_samples == 256 + (d * 13) % 1024
        assert r.duration_ms == r.n_samples * 1000 // mm.AUDIO_RATE
