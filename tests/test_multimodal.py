"""X5 multimodal plumbing tests: schema fidelity, byte determinism,
metadata pruning, and the decode seam.
"""

from __future__ import annotations

import hashlib

import pytest

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.operators.multimodal import (
    PillowDecoder,
    build_media_table,
    decode_features,
    x5_meta_pruning,
)
from acero_delta_lake_streaming_spark.schemas import MEDIA_SCHEMA


def test_media_table_matches_declared_schema(spark, sf_dir):
    """Names and types must match MEDIA_SCHEMA exactly (nullability flags
    legitimately differ: the fixture scan can't prove non-nullness)."""
    media = build_media_table(load_table(spark, sf_dir, "documents"))

    def shape(schema):
        return [(f.name, f.dataType.simpleString()) for f in schema.fields]

    assert shape(media.schema) == shape(MEDIA_SCHEMA)
    meta_t = dict(shape(media.schema))["meta"]
    assert meta_t == dict(shape(MEDIA_SCHEMA))["meta"]


def test_content_bytes_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = build_media_table(docs)
    texts = docs.select("doc_id", "text")
    rows = (
        media.join(texts, media.media_id == texts.doc_id)
        .select("media_id", "content", "text")
        .collect()
    )
    assert rows
    for r in rows:
        expected = bytes.fromhex(
            hashlib.md5(r.text.encode()).hexdigest()
            + hashlib.md5(("x" + r.text).encode()).hexdigest()
        )
        assert bytes(r.content) == expected
        assert len(r.content) == 32


def test_meta_query_prunes_content(spark, sf_dir):
    """The metadata-only aggregate must not carry the payload derivation:
    no unhex/md5 in the optimized plan → at scale, bytes are never read."""
    plan = x5_meta_pruning(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    assert "unhex" not in plan and "md5" not in plan


def test_decode_features_shape_and_determinism(spark, sf_dir):
    media = build_media_table(load_table(spark, sf_dir, "documents").limit(30))
    a = {r.media_id: (r.n_bytes, r.checksum, r.feat) for r in decode_features(media).collect()}
    b = {r.media_id: (r.n_bytes, r.checksum, r.feat) for r in decode_features(media).collect()}
    assert a == b and len(a) == 30
    for n_bytes, checksum, feat in a.values():
        assert n_bytes == 32
        assert 0 <= checksum < 65536
        assert len(feat) == 4 and feat[3] == 32.0


def test_real_decoder_seam_is_explicit():
    with pytest.raises(NotImplementedError):
        PillowDecoder()


def test_container_wrap_decode_roundtrip(spark, sf_dir):
    """Round-10 real-decode seam: wrap_media_containers emits genuine
    RIFF/WAVE + BMP containers whose stdlib parse (_decode_payload)
    recovers EXACTLY the deterministic payload — audio chunk-walks,
    images reorder bottom-up rows, video passes through raw."""
    from acero_delta_lake_streaming_spark.operators.multimodal import (
        _decode_payload,
        wrap_media_containers,
    )

    media = build_media_table(
        load_table(spark, sf_dir, "documents").limit(30)
    )
    raw = {r.media_id: bytes(r.content) for r in media.collect()}
    rows = wrap_media_containers(media).select(
        "media_id", "content", "meta.format"
    ).collect()
    seen = set()
    for r in rows:
        data = bytes(r.content)
        if r.format == "wav":
            assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
            assert len(data) == 76
        elif r.format == "bmp":
            assert data[:2] == b"BM" and len(data) == 86
        else:
            assert data == raw[r.media_id]
        assert _decode_payload(data, r.format) == raw[r.media_id]
        seen.add(r.format)
    assert seen == {"wav", "bmp", "mp4"}


def test_malformed_containers_raise():
    """The decode path QUARANTINES malformed input (raises), never
    returns silent garbage: truncated RIFF, wrong codec, compressed
    BMP, bad magic."""
    from acero_delta_lake_streaming_spark.operators.multimodal import (
        _decode_payload,
    )

    with pytest.raises(ValueError):
        _decode_payload(b"RIFFxxxxWAVE", "wav")  # size mismatch
    with pytest.raises(ValueError):
        _decode_payload(b"nota wave....", "wav")
    with pytest.raises(ValueError):
        _decode_payload(b"XX" + b"\x00" * 84, "bmp")
    # compressed BMP (BI_RLE8 = 1 in the compression slot) refuses
    hdr = bytearray(b"BM" + b"\x00" * 84)
    hdr[30] = 1
    with pytest.raises(ValueError):
        _decode_payload(bytes(hdr), "bmp")


def test_dhash_stub_wraps_at_fingerprint_width():
    """Round-10 advisor item: the dHash neighbor wraps at the 32-byte
    fingerprint width, never the payload length — a payload longer
    than 32 bytes must fingerprint identically to its 32-byte prefix
    (the seam is documented as decoder-swappable, so arbitrary sizes
    must match the oracle's fixed-width arithmetic)."""
    import pandas as pd

    from acero_delta_lake_streaming_spark.operators.multimodal import (
        DHashStub,
    )

    base = bytes(range(7, 7 + 32))
    longer = base + bytes([255] * 16)
    fp32, fp48 = DHashStub().fingerprint_batch(pd.Series([base, longer]))
    assert fp32 == fp48
    # the 56-bit layout: stride-1 bits 0..31, stride-2 bits 32..55
    expect = 0
    for i in range(32):
        if base[i] > base[(i + 1) % 32]:
            expect |= 1 << i
    for i in range(24):
        if base[i] > base[(i + 2) % 32]:
            expect |= 1 << (32 + i)
    assert fp32 == expect


def test_png_roundtrip_all_filters():
    """decode(encode(payload)) == payload bit-exactly; the 4x8 layout
    walks filter types 0..4 (row % 5), so every defilter branch runs;
    the container is genuinely compressed (zlib IDAT, CRC'd chunks)."""
    import hashlib
    import struct
    import zlib

    from acero_delta_lake_streaming_spark.operators.multimodal import (
        _PNG_SIG,
        _png_decode,
        _png_encode,
    )

    for seed in range(40):
        payload = hashlib.md5(str(seed).encode()).digest() * 2  # 32 B
        png = _png_encode(payload)
        assert png[:8] == _PNG_SIG
        assert _png_decode(png) == payload
        # IHDR says 4x8 grayscale-8
        w, h, depth, color = struct.unpack(">IIBB", png[16:26])
        assert (w, h, depth, color) == (4, 8, 8, 0)
        # the IDAT body really is a zlib stream of the filtered rows
        (ilen,) = struct.unpack(">I", png[33:37])
        idat = png[41:41 + ilen]
        raw = zlib.decompress(idat)
        assert len(raw) == 8 * 5
        assert [raw[r * 5] for r in range(8)] == [0, 1, 2, 3, 4, 0, 1, 2]


def test_png_malformed_raises():
    """CRC corruption, truncation, bad signature, and non-grayscale
    IHDR all raise — the quarantine path, never silent garbage."""
    import pytest as _pytest

    from acero_delta_lake_streaming_spark.operators.multimodal import (
        _decode_payload,
        _png_encode,
    )

    png = bytearray(_png_encode(bytes(range(32))))
    with _pytest.raises(ValueError, match="not a PNG"):
        _decode_payload(b"\x89PNX" + bytes(png[4:]), "png")
    flipped = bytearray(png)
    flipped[45] ^= 0xFF  # inside IDAT body -> CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        _decode_payload(bytes(flipped), "png")
    with _pytest.raises(ValueError):
        _decode_payload(bytes(png[: len(png) // 2]), "png")
    rgb = bytearray(png)
    rgb[25] = 2  # color type 2 (truecolor)
    with _pytest.raises(ValueError):
        _decode_payload(bytes(rgb), "png")  # CRC catches the edit


def test_jpeg_roundtrip_dc_exact():
    """decode(encode(payload)) == payload bit-exactly for the LOSSY
    codec: constant 8x8 blocks under qDC=8 make the DC path exact by
    arithmetic (8·(v−128) divides exactly), and AC float dust
    quantizes to zero. The file is a genuine baseline JFIF — markers,
    Annex K huffman tables, stuffed entropy stream."""
    import hashlib

    from acero_delta_lake_streaming_spark.operators.multimodal import (
        _JPEG_BW,
        _decode_payload,
        _jpeg_decode,
        _jpeg_encode,
    )

    for seed in range(40):
        payload = hashlib.md5(str(seed).encode()).digest() * 2  # 32 B
        jpg = _jpeg_encode(payload)
        assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in jpg[:24]
        # full pixel plane: every block constant == its payload byte
        px = _jpeg_decode(jpg)
        w = 8 * _JPEG_BW
        assert len(px) == 64 * len(payload)
        for bi, v in enumerate(payload):
            by, bx = divmod(bi, _JPEG_BW)
            block = [
                px[(by * 8 + y) * w + bx * 8 + x]
                for y in range(8)
                for x in range(8)
            ]
            assert block == [v] * 64
        # the payload-extraction contract the pipeline uses
        assert _decode_payload(jpg, "jpeg") == payload
    for edge in (bytes([0] * 32), bytes([255] * 32), bytes(range(32)),
                 bytes([0, 255] * 16)):
        assert _decode_payload(_jpeg_encode(edge), "jpeg") == edge


def test_jpeg_ac_path_against_reference():
    """The general decode path — nonzero ACs, run/size coding, ZRL,
    EOB, negative extend — pinned against an independent IDCT: build
    the entropy stream COEFFICIENT-FIRST (same framing the encoder
    writes), decode with the shipped parser, and compare every pixel
    to a from-scratch Python reconstruction of the same spectra."""
    import math

    from acero_delta_lake_streaming_spark.operators.multimodal import (
        _BitWriter,
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JPEG_ZZ,
        _jpeg_bits_of,
        _jpeg_canonical,
        _jpeg_cat,
        _jpeg_decode,
        _jpeg_encode,
        _jpeg_quant_table,
        _jpeg_seg,
    )
    import struct

    # three 8x8 blocks of hand-chosen QUANTIZED zigzag coefficients:
    # b0 exercises low-frequency ACs + negative extend; b1 a >16 zero
    # run (ZRL) ending at the last coefficient (no EOB branch); b2
    # DC-only (EOB immediately)
    blocks = [
        {0: -5, 1: 7, 2: -3, 5: 2, 9: -1},
        {0: 12, 20: 4, 63: -2},
        {0: 3},
    ]
    q = _jpeg_quant_table()
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for blk in blocks:
        diff = blk.get(0, 0) - prev_dc
        prev_dc = blk.get(0, 0)
        s = _jpeg_cat(diff)
        c, ln = dc_codes[s]
        bw.put(c, ln)
        if s:
            bw.put(_jpeg_bits_of(diff, s), s)
        i, run = 1, 0
        while i < 64:
            v = blk.get(i, 0)
            if v == 0:
                run += 1
                i += 1
                continue
            while run > 15:
                zc, zl = ac_codes[0xF0]
                bw.put(zc, zl)
                run -= 16
            s = _jpeg_cat(v)
            c, ln = ac_codes[(run << 4) | s]
            bw.put(c, ln)
            bw.put(_jpeg_bits_of(v, s), s)
            run = 0
            i += 1
        if run:
            ec, el = ac_codes[0x00]
            bw.put(ec, el)
    # 3 blocks in one row: 24x8 image
    sof = struct.pack(">BHHB", 8, 8, 24, 1) + bytes([1, 0x11, 0])
    jpg = (
        b"\xff\xd8"
        + _jpeg_seg(0xFFDB, bytes([0]) + bytes(q))
        + _jpeg_seg(0xFFC0, sof)
        + _jpeg_seg(0xFFC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
                    + bytes(_JPEG_DC_VALS))
        + _jpeg_seg(0xFFC4, bytes([0x10]) + bytes(_JPEG_AC_BITS)
                    + bytes(_JPEG_AC_VALS))
        + _jpeg_seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bw.flush()
        + b"\xff\xd9"
    )
    got = _jpeg_decode(jpg)
    assert len(got) == 24 * 8
    # independent reference: dequant, de-zigzag, direct IDCT
    for bi, blk in enumerate(blocks):
        coeffs = [0] * 64
        for zz_i, v in blk.items():
            coeffs[_JPEG_ZZ[zz_i]] = v * q[zz_i]
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    for vv in range(8):
                        cv = 1 / math.sqrt(2) if vv == 0 else 1.0
                        f = coeffs[vv * 8 + u]
                        if f:
                            s += (cu * cv * f
                                  * math.cos((2 * x + 1) * u
                                             * math.pi / 16)
                                  * math.cos((2 * y + 1) * vv
                                             * math.pi / 16))
                want = max(0, min(255, math.floor(s / 4 + 128.5)))
                assert abs(got[y * 24 + bi * 8 + x] - want) <= 1, (
                    bi, x, y, got[y * 24 + bi * 8 + x], want
                )
    # nonzero ACs really decoded: blocks 0 and 1 are NOT constant
    b0 = [got[y * 24 + x] for y in range(8) for x in range(8)]
    assert len(set(b0)) > 1


def test_jpeg_malformed_raises():
    """Bad SOI, truncation, progressive SOF, and in-stream markers all
    raise — the quarantine path."""
    import pytest as _pytest

    from acero_delta_lake_streaming_spark.operators.multimodal import (
        _decode_payload,
        _jpeg_encode,
    )

    jpg = _jpeg_encode(bytes(range(32)))
    with _pytest.raises(ValueError, match="SOI"):
        _decode_payload(b"\x00\x00" + jpg[2:], "jpeg")
    with _pytest.raises(ValueError):
        _decode_payload(jpg[:40], "jpeg")
    prog = bytearray(jpg)
    sof_at = bytes(prog).find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2  # SOF2 marker on a BASELINE scan script:
    # the single Ss=0..Se=63 scan is an invalid progressive band
    with _pytest.raises(ValueError, match="progressive scan band"):
        _decode_payload(bytes(prog), "jpeg")
    lossless = bytearray(jpg)
    lossless[sof_at + 1] = 0xC3  # lossless stays refused by name
    with _pytest.raises(ValueError, match="only baseline"):
        _decode_payload(bytes(lossless), "jpeg")


def test_jpeg_progressive_roundtrip_dc_exact():
    """decode(encode_progressive(payload)) == payload bit-exactly, and
    pixel-identical to the baseline file of the same payload: the six
    SOF2 scans (spectral selection + successive approximation) carry
    x5h's exact coefficients."""
    import hashlib

    from acero_delta_lake_streaming_spark.operators.multimodal import (
        _decode_payload,
        _jpeg_decode,
        _jpeg_encode,
        _jpeg_encode_progressive,
    )

    for seed in range(40):
        payload = hashlib.md5(str(seed).encode()).digest() * 2  # 32 B
        prog = _jpeg_encode_progressive(payload)
        assert prog[:2] == b"\xff\xd8" and prog[-2:] == b"\xff\xd9"
        assert b"\xff\xc2" in prog  # SOF2
        assert prog.count(b"\xff\xda") >= 6  # six scans
        assert _jpeg_decode(prog) == _jpeg_decode(_jpeg_encode(payload))
        assert _decode_payload(prog, "jpeg") == payload
    for edge in (bytes([0] * 32), bytes([255] * 32), bytes(range(32)),
                 bytes([0, 255] * 16)):
        assert _decode_payload(
            _jpeg_encode_progressive(edge), "jpeg"
        ) == edge


def test_jpeg_progressive_general_path_against_reference():
    """The general progressive decode — nonzero ACs across both bands,
    refinement magnitudes (history correction bits), newly-nonzero
    coefficients appearing only at Al=0, EOBRUN, ZRL spans, and the
    history-coefficient-after-the-16th-zero corner — pinned against a
    direct IDCT of the same quantized coefficients."""
    import random

    import numpy as np

    from acero_delta_lake_streaming_spark.operators.multimodal import (
        _JPEG_ZZ,
        _jpeg_decode,
        _jpeg_pixels_from_spectra,
        _jpeg_progressive_bytes,
        _jpeg_quant_table,
    )

    q = _jpeg_quant_table()

    def reference(zzq, n):
        spectra = np.zeros((n, 64))
        for bi in range(n):
            for k in range(64):
                spectra[bi, _JPEG_ZZ[k]] = zzq[bi, k] * q[k]
        return _jpeg_pixels_from_spectra(spectra, 8 * n, 8, n)

    rng = random.Random(7)
    for trial in range(60):
        n = rng.randint(1, 6)
        zzq = np.zeros((n, 64), dtype=np.int64)
        for bi in range(n):
            zzq[bi, 0] = rng.randint(-60, 60)
            for _ in range(rng.randint(0, 20)):
                k = rng.randint(1, 63)
                zzq[bi, k] = rng.choice(
                    [-1, 1, -2, 2, -3, 3, -7, 9, -31, 33]
                )
        jpg = _jpeg_progressive_bytes(zzq, 8 * n, 8)
        assert _jpeg_decode(jpg) == reference(zzq, n), trial

    # corner: a long zero-history run whose ZRL span must interleave a
    # history coefficient's correction bit, plus a late newly-nonzero
    zzq = np.zeros((1, 64), dtype=np.int64)
    zzq[0, 1] = 5
    zzq[0, 20] = 3
    zzq[0, 40] = 1
    jpg = _jpeg_progressive_bytes(zzq, 8, 8)
    assert _jpeg_decode(jpg) == reference(zzq, 1)
    # truncated scan raises (quarantine)
    with __import__("pytest").raises(ValueError):
        _jpeg_decode(jpg[: len(jpg) // 2])
