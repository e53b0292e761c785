"""Real PPM codec: the decode path must recover exactly what the
generative formula wrote — dimensions, channel sums, and the sampled
aHash — and the parser must reject malformed payloads loudly."""
from __future__ import annotations

import numpy as np
import pytest

from spark_streaming_apps_spark.operators.multimodal import (
    _parse_ppm, _ppm_payload, real_decode)


def test_parser_roundtrips_generated_images():
    for doc_id in (0, 5, 31, 100, 12345):
        w, h, px = _parse_ppm(_ppm_payload(doc_id))
        assert (w, h) == (16 + doc_id % 16, 16 + doc_id % 8)
        assert px.shape == (h, w, 3) and px.dtype == np.uint8
        y, x = np.mgrid[0:h, 0:w]
        assert (px[..., 0] == (x * 7 + y * 13 + doc_id) % 256).all()
        assert (px[..., 2] == (x * 11 + y * 2 + 3 * doc_id) % 256).all()


def test_parser_rejects_malformed():
    with pytest.raises(ValueError, match="not a P6"):
        _parse_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)
    with pytest.raises(ValueError, match="maxval"):
        _parse_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 12)


def test_parser_handles_multi_whitespace_header():
    # spec allows any whitespace runs between header tokens
    buf = b"P6\n  3\t2\n255\n" + bytes(range(18))
    w, h, px = _parse_ppm(buf)
    assert (w, h) == (3, 2)
    assert px.flatten().tolist() == list(range(18))


def test_spark_decode_matches_local_parse(spark, tables):
    got = {r.doc_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b, r.ahash)
           for r in real_decode(tables["documents"]).collect()}
    for doc_id in (0, 7, 123):
        w, h, px = _parse_ppm(_ppm_payload(doc_id))
        sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        grays = [int(px[i * h // 8, j * w // 8].sum()) // 3
                 for i in range(8) for j in range(8)]
        total = sum(grays)
        hsh = 0
        for k, gr in enumerate(grays):
            if gr * 64 > total:
                hsh |= 1 << k
        if hsh >= 1 << 63:
            hsh -= 1 << 64
        assert got[doc_id] == (w, h, int(sums[0]), int(sums[1]),
                               int(sums[2]), hsh)


def test_parser_raises_on_truncated_header():
    with pytest.raises(ValueError, match="truncated"):
        _parse_ppm(b"P6\n16 16")        # EOF before maxval: must not hang


def test_ppm_parser_handles_spec_comments():
    """netpbm spec: '#'-to-newline comments may appear anywhere
    whitespace can in the header — including ones containing digits,
    which must never be parsed into width/height/maxval."""
    import pytest

    from spark_streaming_apps_spark.operators.multimodal import _parse_ppm

    body = bytes([i % 256 for i in range(2 * 2 * 3)])
    for buf in (
            b"P6\n# created 1999 width 999\n2 2\n# 123\n255\n" + body,
            b"P6 # c1\n#2nd 456\n2 # w done\n2 255\n" + body,
            b"P6\n2 2 255# trailing comment\n" + body):
        w, h, arr = _parse_ppm(buf)
        assert (w, h) == (2, 2) and arr.shape == (2, 2, 3)
    with pytest.raises(ValueError, match="non-numeric"):
        _parse_ppm(b"P6\n2 x\n255\n" + body)
