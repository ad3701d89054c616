"""Duplicate-structural-segment quarantines + declared-rate parsing
(ADVICE r13): the AVI walk must treat a second idx1 chunk as corruption
(not last-wins), the JPEG metadata walk must quarantine conflicting
APP0 / Exif APP1 duplicates, and decode_y4m must surface the header's
F rate token so consumers clock timestamps from the container. All
pure-Python decoder checks — no SparkSession needed."""

from __future__ import annotations


def _dup_chunk(b: bytes, fourcc: bytes) -> bytes:
    """Duplicate a top-level RIFF chunk (header + payload + pad) at the
    stream tail and re-patch the RIFF size — a byte-identical duplicate,
    so a last-wins decoder accepts it unchanged."""
    p = b.find(fourcc)
    assert p > 0
    size = int.from_bytes(b[p + 4 : p + 8], "little")
    chunk = b[p : p + 8 + size + (size & 1)]
    out = bytearray(b + chunk)
    out[4:8] = (len(out) - 8).to_bytes(4, "little")
    return bytes(out)


def test_avi_duplicate_idx1_quarantines():
    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_avi_mjpeg,
        make_avi_mjpeg_bytes,
    )

    b = make_avi_mjpeg_bytes(2)  # even -> idx1 present, not the SOF2 arm
    assert decode_avi_mjpeg(b) is not None
    assert decode_avi_mjpeg(_dup_chunk(b, b"idx1")) is None


def _dup_jpeg_segment(b: bytes, start: int) -> bytes:
    """Duplicate the marker segment starting at ``start`` in place —
    byte-identical, so last-wins metadata values would not change."""
    assert b[start] == 0xFF
    seglen = int.from_bytes(b[start + 2 : start + 4], "big")
    seg = b[start : start + 2 + seglen]
    return b[: start + len(seg)] + seg + b[start + len(seg) :]


def test_jpeg_duplicate_app0_and_exif_quarantine():
    from go_dfs_mapreduce_spark.operators.multimodal import (
        jpeg_metadata,
        make_jpeg_meta_bytes,
    )

    b = make_jpeg_meta_bytes(2)
    assert jpeg_metadata(b) is not None
    app0 = b.find(b"JFIF\x00") - 4
    assert b[app0 : app0 + 2] == b"\xff\xe0"
    assert jpeg_metadata(_dup_jpeg_segment(b, app0)) is None
    exif = b.find(b"Exif\x00\x00") - 4
    assert b[exif : exif + 2] == b"\xff\xe1"
    assert jpeg_metadata(_dup_jpeg_segment(b, exif)) is None


def test_y4m_declared_rate_parsed_and_validated():
    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_y4m,
        make_y4m_bytes,
    )

    # the fixture declares F25:1
    dec = decode_y4m(make_y4m_bytes(5))
    assert dec is not None and dec[3] == (25, 1)
    # a different declared rate is surfaced, not assumed away
    dec = decode_y4m(b"YUV4MPEG2 W2 H2 C444 F30:1\nFRAME\n" + bytes(12))
    assert dec is not None and dec[3] == (30, 1)
    # absent F token defaults to the spec's 25:1
    dec = decode_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + bytes(12))
    assert dec is not None and dec[3] == (25, 1)
    # present-but-malformed or degenerate rates quarantine
    for tok in (b"Fx:1", b"F25", b"F0:1", b"F25:0", b"F25:"):
        bad = b"YUV4MPEG2 W2 H2 C444 " + tok + b"\nFRAME\n" + bytes(12)
        assert decode_y4m(bad) is None, tok


def test_y4m_duplicate_consumed_tokens_quarantine():
    """Two declarations of a token the decoder CONSUMES (W/H/C/F) can
    disagree — quarantine, matching the duplicate-APP0/Exif/idx1 rule.
    Tokens the decoder ignores (Ip, A, X...) stay pass-through."""
    from go_dfs_mapreduce_spark.operators.multimodal import decode_y4m

    ok = b"YUV4MPEG2 W2 H2 C444 F30:1 Ip A1:1 Xy\nFRAME\n" + bytes(12)
    assert decode_y4m(ok) is not None
    for dup in (b"W2", b"H2", b"C444", b"F30:1"):
        bad = (
            b"YUV4MPEG2 W2 H2 C444 F30:1 " + dup + b"\nFRAME\n" + bytes(12)
        )
        assert decode_y4m(bad) is None, dup
    # ignored tokens may legally repeat
    ok2 = b"YUV4MPEG2 W2 H2 C444 Ip Ip A1:1 A1:1\nFRAME\n" + bytes(12)
    assert decode_y4m(ok2) is not None


def test_jpeg_duplicate_com_and_sof_quarantine():
    from go_dfs_mapreduce_spark.operators.multimodal import (
        jpeg_metadata,
        make_jpeg_meta_bytes,
    )

    b = make_jpeg_meta_bytes(4)
    assert jpeg_metadata(b) is not None
    com = b.find(b"\xff\xfe")
    assert com > 0
    assert jpeg_metadata(_dup_jpeg_segment(b, com)) is None
    sof = b.find(b"\xff\xc0")
    assert sof > 0
    assert jpeg_metadata(_dup_jpeg_segment(b, sof)) is None
