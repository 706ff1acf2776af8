"""Pure-stdlib PNG codec (llm/png.py): roundtrip across every scanline
filter and supported color type, Pillow-parity luma, decode-scope errors,
and the REAL (fake=False) multimodal path end to end over genuine PNG
byte streams through the Arrow-batched extract_features / resize
plumbing."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from ominimo_dynamic_data_pipeline_spark.llm import multimodal as M
from ominimo_dynamic_data_pipeline_spark.llm import png as P


def _gradient(width: int, height: int, channels: int) -> bytes:
    rng = random.Random(7 * width + height + channels)
    return bytes(
        rng.randrange(256) for _ in range(width * height * channels)
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("color_type", [0, 2, 4, 6])
def test_roundtrip_every_filter_and_color_type(filter_type, color_type):
    w, h = 9, 7  # odd sizes: exercise non-aligned strides
    ch = P._CHANNELS[color_type]
    samples = _gradient(w, h, ch)
    payload = P.encode_png(w, h, samples, color_type, filter_type)
    assert P.is_png(payload)
    gw, gh, gch, got = P.decode_png(payload)
    assert (gw, gh, gch) == (w, h, ch)
    assert bytes(got) == samples


def test_grayscale_luma_matches_pillow_fixed_point():
    # one RGB pixel per value class; expected = Pillow's 16.16 fixed
    # point ITU-R 601-2 with round-half-up
    pixels = [(128, 64, 32), (255, 255, 255), (0, 0, 0), (1, 2, 3)]
    flat = bytes(v for px in pixels for v in px)
    payload = P.encode_png(4, 1, flat, color_type=2)
    w, h, gray = P.png_to_grayscale(payload)
    assert (w, h) == (4, 1)
    for i, (r, g, b) in enumerate(pixels):
        expect = (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16
        assert gray[i] == expect
    # alpha is ignored: RGBA with varying alpha gives identical luma
    flat_a = bytes(
        v for px in pixels for v in (*px, 17)
    )
    _, _, gray_a = P.png_to_grayscale(P.encode_png(4, 1, flat_a, 6))
    assert bytes(gray_a) == bytes(gray)
    # gray+alpha passes the gray sample through
    ga = bytes([10, 200, 250, 1])
    _, _, gray_ga = P.png_to_grayscale(P.encode_png(2, 1, ga, 4))
    assert list(gray_ga) == [10, 250]


def test_decode_scope_errors_are_loud():
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"not a png at all")
    # 16-bit depth rejected
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = P.PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        P.decode_png(bad)
    # palette color type rejected by name
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    bad = P.PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="color type"):
        P.decode_png(bad)
    # Adam7 rejected by name
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    bad = P.PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        P.decode_png(bad)
    # truncated pixel data
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bad = (
        P.PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00abc"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        P.decode_png(bad)
    # invalid filter byte
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    bad = (
        P.PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x07a"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter type"):
        P.decode_png(bad)
    # missing IEND (truncated stream)
    with pytest.raises(ValueError, match="IEND"):
        P.decode_png(P.PNG_SIGNATURE + _chunk(b"IHDR", ihdr))


def test_chunk_crc_mismatch_is_loud():
    # flip one pixel byte but keep the stored CRC: a silent wrong-pixel
    # decode before the CRC check landed
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    idat = _chunk(b"IDAT", zlib.compress(b"\x00a"))
    corrupted = idat[:8] + bytes([idat[8] ^ 0xFF]) + idat[9:]
    bad = P.PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + corrupted + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="CRC mismatch"):
        P.decode_png(bad)


def test_zlib_bomb_ihdr_dims_guarded():
    # hostile payload: tiny IDAT, IHDR claiming a 65536 x 65536 RGBA
    # frame (16 GiB decoded) — must error on the size ceiling, not
    # attempt the allocation
    ihdr = struct.pack(">IIBBBBB", 65536, 65536, 8, 6, 0, 0, 0)
    bad = (
        P.PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="MAX_DECODED_BYTES"):
        P.decode_png(bad)


def test_idat_overflow_beyond_expected_is_loud():
    # stream inflates to MORE than (stride+1)*height: bounded inflate
    # must flag the overflow instead of materializing it
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    bad = (
        P.PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00a" + b"\x00" * 4096))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="overflows expected"):
        P.decode_png(bad)


def test_idat_truncated_at_exact_output_is_loud():
    # hostile corner the round-10 bounded inflate missed (ADVICE): a zlib
    # stream cut off EXACTLY at `expected` output bytes leaves eof=False
    # with empty unconsumed_tail and an empty flush probe — decode must
    # still reject it (the unbounded zlib.decompress did, via Error -5 +
    # adler32).
    w, h = 64, 16
    samples = bytes((x * 3 + y) & 0xFF for y in range(h) for x in range(w))
    good = P.encode_png(w, h, samples, color_type=0)
    # rebuild with the IDAT body cut at the shortest prefix that still
    # inflates to exactly (stride+1)*h bytes
    expected = (w + 1) * h
    body = _idat_of(good)
    cut_body = None
    for cut in range(len(body), 0, -1):
        dec = zlib.decompressobj()
        try:
            raw = dec.decompress(body[:cut], expected)
        except zlib.error:
            continue
        if len(raw) == expected and not dec.eof:
            cut_body = body[:cut]
            break
    assert cut_body is not None, "could not build the truncation fixture"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    bad = (
        P.PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", cut_body)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated PNG zlib stream"):
        P.decode_png(bad)


def _idat_of(payload: bytes) -> bytes:
    out, pos = bytearray(), len(P.PNG_SIGNATURE)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            out.extend(payload[pos + 8 : pos + 8 + length])
        pos += 12 + length
    return bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def test_multi_idat_chunks_concatenate():
    # IDAT may be split arbitrarily; decoders must concatenate
    w, h = 5, 3
    samples = _gradient(w, h, 1)
    full = P.encode_png(w, h, samples, 0, 0)
    # re-split the single IDAT into two chunks
    sig, rest = full[:8], full[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (length,) = struct.unpack(">I", rest[pos : pos + 4])
        ctype = rest[pos + 4 : pos + 8]
        body = rest[pos + 8 : pos + 8 + length]
        chunks.append((ctype, body))
        pos += 12 + length
    rebuilt = sig
    for ctype, body in chunks:
        if ctype == b"IDAT":
            mid = len(body) // 2
            rebuilt += _chunk(b"IDAT", body[:mid])
            rebuilt += _chunk(b"IDAT", body[mid:])
        else:
            rebuilt += _chunk(ctype, body)
    gw, gh, gch, got = P.decode_png(rebuilt)
    assert (gw, gh, gch) == (w, h, 1)
    assert bytes(got) == samples


def test_decode_image_real_path_over_stdlib_png():
    # REAL decode, no Pillow, no fake: a vertical gradient's band
    # features must equal the per-band means of the true pixels
    w, h = 2, 10
    samples = bytes(r * 25 for r in range(h) for _ in range(w))
    payload = P.encode_png(w, h, samples, 0, 2)  # Up-filter on purpose
    gw, gh, feats = M.decode_image(payload, fake=False)
    assert (gw, gh) == (w, h)
    assert len(feats) == M.FEATURE_DIM
    rows_of = [
        round((b + 1) * h / M.FEATURE_DIM) - round(b * h / M.FEATURE_DIM)
        for b in range(M.FEATURE_DIM)
    ]
    assert sum(rows_of) == h
    weighted = sum(f * r for f, r in zip(feats, rows_of)) / h
    global_mean = sum(r * 25 for r in range(h)) / (h * 255.0)
    assert abs(weighted - global_mean) < 1e-4


def test_resize_real_path_over_stdlib_png():
    # 4x4 quadrant image -> 2x2 nearest-neighbor picks quadrant centers
    q = [10, 20, 30, 40]
    samples = bytes(
        q[(y // 2) * 2 + (x // 2)] for y in range(4) for x in range(4)
    )
    payload = P.encode_png(4, 4, samples, 0, 1)  # Sub-filter on purpose
    out = M.resize_image_bytes(payload, 2, 2, fake=False)
    assert list(out) == q
    # upscale keeps values from the source grid only
    up = M.resize_image_bytes(payload, 8, 8, fake=False)
    assert set(up) <= set(q)
    assert len(up) == 64


def test_extract_features_end_to_end_real_png(spark):
    # genuine PNG byte streams through the Arrow-batched mapInPandas
    # plumbing with fake=False — the distributed result equals the
    # local stdlib decode (golden parity for the REAL path)
    rows = []
    payloads = {}
    for doc_id in range(6):
        w, h = 3 + doc_id, 4 + (doc_id % 3)
        ct = [0, 2, 6][doc_id % 3]
        samples = _gradient(w, h, P._CHANNELS[ct])
        payloads[doc_id] = P.encode_png(w, h, samples, ct, doc_id % 5)
        rows.append((doc_id, payloads[doc_id]))
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {
        r["doc_id"]: r
        for r in M.extract_features(df, fake=False).collect()
    }
    assert set(got) == set(payloads)
    for doc_id, payload in payloads.items():
        w, h, feats = M.decode_image(payload, fake=False)
        row = got[doc_id]
        assert (row["width"], row["height"]) == (w, h)
        assert [round(float(x), 6) for x in row["features"]] == feats
        assert row["n_bytes"] == len(payload)


def test_band_sum_reconstruction_exact_for_every_possible_sum():
    # q203 reconstructs integer band sums from the rounded float32
    # features as ROUND(f * 2040); prove the roundtrip
    # sum -> round(sum/2040, 6) -> float32 -> *2040 -> round is the
    # identity for EVERY possible 8-byte band sum 0..2040
    import numpy as np

    for s in range(0, 255 * 8 + 1):
        f6 = round(s / (255.0 * 8), 6)  # decode_image's rounding
        f32 = float(np.float32(f6))  # array<float> storage
        # Python round() is half-even but the query rounds with Spark's
        # F.round (BigDecimal HALF_UP); pin that BOTH modes agree by
        # showing f32*2040 never gets near a .5 boundary — every
        # rounding mode is the identity when the error is < 0.4.
        assert abs(f32 * 255 * 8 - s) < 0.4
        assert round(f32 * 255 * 8) == s
