"""m02's PNG codec, verified against the generator: the decode path
must recover exactly the dimensions and channel statistics the pixel
generator specifies — independently recomputed here without touching
the codec — and the full pipeline's Spark output must agree per doc.
Also pins spec coverage the generator never exercises (Up/Sub/Average/
Paeth filters, greyscale) and corruption detection (CRC)."""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np
import pytest

from tinysql_spark.operators.multimodal import (
    decode_png,
    png_pixels,
    synth_png_bytes,
)


def test_codec_round_trip_matches_generator():
    """decode(synth(text)) must equal the generator's independent
    spec: w = 8 + len%9, h = 8 + crc32%9, means of the md5 stream."""
    for text in ["", "a", "hello world", "x" * 1000, "ünïcode ✓ テスト"]:
        b = text.encode("utf-8")
        exp_w = 8 + len(b) % 9
        exp_h = 8 + binascii.crc32(b) % 9
        w, h, channels, means = decode_png(synth_png_bytes(text))
        assert (w, h, channels) == (exp_w, exp_h, 3), text
        px = png_pixels(text)
        exp_means = px.reshape(-1, 3).mean(axis=0)
        assert np.allclose(means, exp_means), text


def test_codec_pixel_identity():
    """Bit-exact: re-encode via an independent zlib inflate of the
    synthesized file and compare raw scanlines to the generator."""
    text = "pixel identity check"
    data = synth_png_bytes(text)
    # manual IDAT extraction (not via decode_png)
    pos, idat = 8, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + length]
        pos += 12 + length
    px = png_pixels(text)
    h, w, _ = px.shape
    raw = zlib.decompress(idat)
    got = np.concatenate(
        [
            np.frombuffer(raw, np.uint8, count=w * 3, offset=r * (w * 3 + 1) + 1)
            for r in range(h)
        ]
    )
    assert (got == px.reshape(-1)).all()


def _encode_with_filters(px: np.ndarray, ftypes: list[int], channels: int) -> bytes:
    """Independent encoder applying arbitrary per-row filter types —
    exercises the decoder's unfilter paths the generator never emits."""
    h, w = px.shape[0], px.shape[1]
    stride = w * channels
    flat = px.reshape(h, stride).astype(np.int32)
    raw = b""
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        line = flat[r]
        ft = ftypes[r % len(ftypes)]
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = line[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
            if ft == 0:
                enc[x] = line[x]
            elif ft == 1:
                enc[x] = line[x] - a
            elif ft == 2:
                enc[x] = line[x] - b
            elif ft == 3:
                enc[x] = line[x] - (a + b) // 2
            else:
                p = a + b - c
                pr = a if abs(p - a) <= min(abs(p - b), abs(p - c)) else (
                    b if abs(p - b) <= abs(p - c) else c
                )
                enc[x] = line[x] - pr
        raw += bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes()
        prev = line
    from tinysql_spark.operators.multimodal import _PNG_SIG, _png_chunk

    ctype = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_decoder_all_filter_types_and_color_types():
    rng = np.random.default_rng(3)
    for channels in (1, 3, 4):
        px = rng.integers(0, 256, size=(7, 5, channels), dtype=np.uint8)
        data = _encode_with_filters(px, [0, 1, 2, 3, 4], channels)
        w, h, ch, means = decode_png(data)
        assert (w, h, ch) == (5, 7, channels)
        assert np.allclose(means, px.reshape(-1, channels).mean(axis=0))


def test_decoder_rejects_corruption():
    data = bytearray(synth_png_bytes("corrupt me"))
    data[40] ^= 0xFF  # flip a byte inside a chunk payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF not a png")


def test_m02_pipeline_matches_generator(spark, sf_dir):
    """The Spark pipeline end-to-end: every doc's decoded dims/means
    must equal the generator's spec computed driver-side from the
    same text."""
    import pandas as pd

    from tinysql_spark.operators.multimodal import m02_multimodal_decode

    got = m02_multimodal_decode(spark, sf_dir).toPandas().set_index("doc_id")
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    sample = texts.sample(n=min(50, len(texts)), random_state=1)
    for r in sample.itertuples():
        px = png_pixels(r.text if isinstance(r.text, str) else "")
        h, w, _ = px.shape
        row = got.loc[r.doc_id]
        assert (row["width"], row["height"]) == (w, h), r.doc_id
        exp = px.reshape(-1, 3).mean(axis=0)
        assert abs(row["mean_r"] - round(float(exp[0]), 4)) < 1e-9
        assert abs(row["mean_g"] - round(float(exp[1]), 4)) < 1e-9
        assert abs(row["mean_b"] - round(float(exp[2]), 4)) < 1e-9


def test_m05_thumbnail_pixel_exact(spark, sf_dir):
    """m05 is rows-only in the driver, so its evidence is an
    independent recompute: generator pixels -> 2x2 box mean -> md5
    must equal the operator's thumb_px_md5 for every doc."""
    import hashlib

    from tinysql_spark.operators.multimodal import (
        box_downsample,
        m05_thumbnail,
        png_pixels,
    )

    got = {r["doc_id"]: r for r in m05_thumbnail(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").collect()
    assert len(got) == len(docs) and docs
    for r in docs:
        px = png_pixels(r["text"] or "")
        th = box_downsample(px)
        g = got[r["doc_id"]]
        assert (g["height"], g["width"]) == px.shape[:2]
        assert (g["thumb_h"], g["thumb_w"]) == th.shape[:2]
        assert g["thumb_px_md5"] == hashlib.md5(th.tobytes()).hexdigest()


def test_decode_images_null_payload_row(spark):
    """Review r04 finding 5: a NULL payload row must yield a
    null-stats row, not crash the Arrow stage."""
    from tinysql_spark.operators.multimodal import decode_images, synth_png_bytes

    df = spark.createDataFrame(
        [(1, synth_png_bytes("hello world")), (2, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in decode_images(df).collect()}
    assert got[1]["width"] is not None
    assert got[2]["width"] is None and got[2]["n_bytes"] == 0


def test_m06_container_meta_roundtrip(spark, sf_dir):
    """m06 is rows-only, so its evidence is the metadata round trip:
    every doc's tEXt lang/source must equal the table's columns, the
    chunk directory must be IHDR,tEXt,tEXt,IDAT,IEND with valid
    CRCs, and a corrupted byte must flip crc_ok."""
    from tinysql_spark.operators.multimodal import (
        m06_container_meta,
        png_chunk_inventory,
        synth_png_bytes,
    )

    got = {r["doc_id"]: r for r in m06_container_meta(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source"
    ).collect()
    assert len(got) == len(docs) and docs
    for r in docs:
        g = got[r["doc_id"]]
        assert g["meta_lang"] == str(r["lang"]) and g["meta_source"] == str(r["source"])
        assert g["chunk_tags"] == "IHDR,tEXt,tEXt,IDAT,IEND"
        assert g["crc_ok"] and g["idat_bytes"] > 0

    # corruption detection: flip one IDAT byte -> crc_ok False
    good = synth_png_bytes("hello", meta={"lang": "en"})
    bad = bytearray(good)
    bad[-20] ^= 0xFF
    chunks, _ = png_chunk_inventory(bytes(bad))
    assert not all(c[2] for c in chunks)


def test_m06_inventory_survives_truncation():
    """Triage must not crash on corrupt containers: a truncated
    payload and a bogus chunk length both yield a final
    crc_ok=False entry instead of a struct.error (the quarantine
    path m06 exists for)."""
    from tinysql_spark.operators.multimodal import (
        png_chunk_inventory,
        synth_png_bytes,
    )

    good = synth_png_bytes("hello", meta={"lang": "en"})
    # cut mid-IDAT: the partial chunk must report crc_ok=False
    chunks, _ = png_chunk_inventory(good[: len(good) - 30])
    assert chunks and chunks[-1][2] is False
    # cut inside a chunk header (fewer than 8 bytes left)
    chunks, _ = png_chunk_inventory(good[:10])
    assert chunks == [("", 2, False)]
    # bogus length field pointing past the end of the payload
    bad = bytearray(good)
    bad[8:12] = (2**31 - 1).to_bytes(4, "big")  # IHDR length -> huge
    chunks, _ = png_chunk_inventory(bytes(bad))
    assert chunks[0][0] == "IHDR" and chunks[0][2] is False


def test_m07_ahash_exact_vs_driver_recompute(spark, sf_dir):
    """m07 is rows-only; its evidence is EXACTNESS against an
    independent driver-side recomputation: hash every doc's generated
    pixels with ahash64 directly, enumerate ALL pairs with hamming
    <= 3, and assert the operator's pigeonhole-blocked join returns
    exactly that set with exactly those distances — the blocked join
    must lose nothing (the chunk guarantee) and invent nothing."""
    import itertools

    from tinysql_spark.operators.multimodal import (
        ahash64,
        m07_image_ahash_neardup,
        png_pixels,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    hashes = {
        did: ahash64(png_pixels(t if isinstance(t, str) else ""))
        for did, t in texts.items()
    }
    want = {}
    for a, b in itertools.combinations(sorted(hashes), 2):
        ham = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
        if ham <= 3:
            want[(a, b)] = ham
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in m07_image_ahash_neardup(spark, sf_dir).collect()
    }
    assert want, "no near-dup hashes at this sf — fixture assumption broken"
    assert got == want


def test_m08_scrub_preserves_pixels_and_strips_metadata(spark, sf_dir):
    """m08's promise, verified at the byte and pixel level: scrubbed
    payloads decode to IDENTICAL pixel arrays, carry no metadata
    chunks, and the operator's digest matches a pure-Python twin
    recompute (dual-path, the codec discipline)."""
    import hashlib

    import numpy as np

    from tinysql_spark.operators.multimodal import (
        decode_png_pixels,
        m08_metadata_scrub,
        png_chunk_inventory,
        png_strip_metadata,
        synth_png_bytes,
    )

    got = {r["doc_id"]: r.asDict() for r in m08_metadata_scrub(spark, sf_dir).collect()}
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(24)
        .collect()
    )
    for r in rows:
        raw = synth_png_bytes(r["text"] or "", meta={"lang": str(r["lang"]), "source": str(r["source"])})
        scrubbed, removed, n_trailing = png_strip_metadata(raw)
        # twin recompute matches the operator output exactly
        g = got[r["doc_id"]]
        assert g["n_removed"] == removed and removed >= 1
        # well-formed synthetic payloads carry no unvetted tail
        assert g["n_trailing"] == n_trailing == 0
        assert g["bytes_before"] == len(raw) and g["bytes_after"] == len(scrubbed)
        assert g["scrubbed_md5"] == hashlib.md5(scrubbed).hexdigest()
        # no metadata chunks survive; pixels identical
        chunks, meta = png_chunk_inventory(scrubbed)
        assert meta == {} and all(c[0] not in ("tEXt", "zTXt", "iTXt", "tIME") for c in chunks)
        assert all(ok for _t, _l, ok in chunks), "scrub broke a CRC"
        assert np.array_equal(decode_png_pixels(raw), decode_png_pixels(scrubbed))


def test_m08_scrub_preserves_post_iend_tail():
    """Bytes smuggled AFTER IEND (a classic stego/appended-payload
    spot, exactly what m06 quarantines) must survive the scrub
    verbatim — same evidence-preservation rule as truncated tails
    (VERDICT r9 item 4)."""
    from tinysql_spark.operators.multimodal import (
        png_strip_metadata,
        synth_png_bytes,
    )

    raw = synth_png_bytes("tail test", meta={"k": "v"})
    tail = b"SMUGGLED-ZIP-PAYLOAD\x00\x01\x02"
    scrubbed, removed, n_trailing = png_strip_metadata(raw + tail)
    assert removed >= 1
    assert scrubbed.endswith(tail)
    # the preserved tail is SURFACED, not just kept (ADVICE r10):
    # a quarantine gate reads the count instead of diffing sizes
    assert n_trailing == len(tail)
    # and the scrub of the tail-free payload is the prefix: the tail
    # passthrough changed nothing else
    base, _, base_trailing = png_strip_metadata(raw)
    assert scrubbed == base + tail and base_trailing == 0
    # truncated tails are likewise counted as unvetted bytes
    cut = raw[: len(raw) - 5]
    _, _, trunc_trailing = png_strip_metadata(cut)
    assert trunc_trailing > 0


def test_m09_wav_roundtrip_and_twin(spark, sf_dir):
    """The WAV container round-trips byte-exactly (synth -> parse
    recovers the sample stream), the operator matches a pure-Python
    twin recompute, and the injected leading silence is detected."""
    import numpy as np

    from tinysql_spark.operators.multimodal import (
        _M09_FRAME,
        _M09_SILENT_EVERY,
        _WAV_SR,
        m09_audio_frame_energy,
        synth_wav_bytes,
        wav_parse,
    )

    # codec round-trip on a handful of payloads
    import pandas as pd

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    got = {r["doc_id"]: r.asDict() for r in m09_audio_frame_energy(spark, sf_dir).collect()}
    assert len(got) == len(pdf)
    n_silent_docs = 0
    for _, row in pdf.iterrows():
        doc_id, text = int(row["doc_id"]), row["text"]
        raw = synth_wav_bytes(doc_id, text)
        sr, s = wav_parse(raw)
        assert sr == _WAV_SR
        # twin recompute
        nf = len(s) // _M09_FRAME
        fr = s[: nf * _M09_FRAME].astype(np.int64).reshape(nf, _M09_FRAME)
        sumsq = (fr * fr).sum(axis=1)
        g = got[doc_id]
        assert g["n_samples"] == len(s) and g["n_frames"] == nf
        assert g["n_silent"] == int((sumsq == 0).sum())
        assert g["peak_abs"] == int(np.abs(s.astype(np.int64)).max())
        assert g["total_sumsq"] == int(sumsq.sum())
        if doc_id % _M09_SILENT_EVERY == 0:
            # short docs may have fewer than 3 frames total
            assert g["n_silent"] >= min(3, nf), (
                f"doc {doc_id}: injected silence not detected"
            )
            n_silent_docs += 1
    assert n_silent_docs > 0
    # unknown-chunk + odd-padding tolerance: splice a 3-byte chunk in
    import struct

    raw = synth_wav_bytes(1, "odd chunk")
    spliced = raw[:12] + b"LIST" + struct.pack("<I", 3) + b"abc\x00" + raw[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    sr2, s2 = wav_parse(spliced)
    _, s1 = wav_parse(raw)
    assert sr2 == _WAV_SR and np.array_equal(s1, s2)
