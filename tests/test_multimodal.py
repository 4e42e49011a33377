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
