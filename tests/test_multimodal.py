"""Content tests for the multimodal mapInPandas kernels: the decoders
are deterministic fakes, so every output value is recomputable locally
from the utf-8 payload — this pins the kernels beyond the driver's
rows-only check (schema, one->many expansion, binary round-trip)."""

import math

import pytest

from adcirctime2cogs_spark.operators import multimodal as mm
from adcirctime2cogs_spark.tables import load_table


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    return {r.doc_id: r.text.encode("utf-8") for r in docs}


def test_image_decode_matches_local(spark, sf_dir, payloads):
    out = {r.doc_id: (r.width, r.height, r.channels)
           for r in mm.mm_image_decode(spark, sf_dir).collect()}
    assert set(out) == set(payloads)
    for doc_id, payload in payloads.items():
        assert out[doc_id] == mm._fake_decode(payload)


def test_frame_sample_reconstructs_bytes(spark, sf_dir, payloads):
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


def test_resize_fits_box_and_matches_formula(spark, sf_dir, payloads):
    out = {r.doc_id: r for r in mm.mm_resize(spark, sf_dir).collect()}
    for doc_id, payload in payloads.items():
        w, h, _ = mm._fake_decode(payload)
        scale = min(224 / w, 224 / h, 1.0)
        ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
        r = out[doc_id]
        assert (r.out_w, r.out_h) == (ow, oh)
        assert r.out_w <= 224 and r.out_h <= 224
        stride = max(1, (w * h) // max(1, ow * oh))
        assert bytes(r.resized) == payload[::stride]


def test_feature_extract_is_bounded_and_exact(spark, sf_dir, payloads):
    out = {r.doc_id: r.features for r in mm.mm_feature_extract(spark, sf_dir).collect()}
    for doc_id, payload in payloads.items():
        want = [float(sum(b for b in payload[i::8]) % 1000) / 1000.0 for i in range(8)]
        feats = out[doc_id]
        assert len(feats) == 8
        assert all(0.0 <= f < 1.0 for f in feats)
        # float32 storage: compare within 1 ulp-ish tolerance
        assert all(math.isclose(f, w, abs_tol=1e-6) for f, w in zip(feats, want))
