"""Multimodal plumbing: the Arrow/mapInPandas boundary is real (schemas,
batch shapes, row expansion). As of r6 the BMP path is a REAL codec
(pure-numpy encode/decode, round-trip-exact below); formats needing external
imaging libraries still raise loudly."""

from __future__ import annotations

import pytest

from kinesis_demo_spark.operators import multimodal as M
from kinesis_demo_spark.queries.multimodal import media_table

SF = "/root/testdata/sf0.001"


def test_real_decode_is_stubbed_loudly():
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"\x89PNG\r\n")


def test_decode_features_schema_and_values(spark):
    media = media_table(spark, SF)
    out = M.decode_features(media)
    assert out.schema == M.FEATURES_SCHEMA
    row = out.filter("doc_id = 0").collect()[0]
    payload = media.filter("doc_id = 0").collect()[0].payload
    assert row.n_bytes == len(payload)
    assert row.first_byte == payload[0] and row.last_byte == payload[-1]
    assert row.byte_sum == sum(payload)
    assert row.checksum == sum(payload) % 997


def test_frame_sample_expands_rows(spark):
    media = media_table(spark, SF).limit(20).cache()
    frames = M.frame_sample(media).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for m in media.collect():
        n_bytes = len(m.payload)
        expected_frames = (n_bytes % 4) + 1
        got = sorted(by_doc[m.doc_id], key=lambda r: r.frame_idx)
        assert len(got) == expected_frames
        stride = n_bytes // expected_frames
        for idx, fr in enumerate(got):
            assert fr.frame_idx == idx and fr.frame_offset == idx * stride
            assert fr.sample_byte == m.payload[idx * stride]


def test_payload_is_opaque_binary(spark):
    media = media_table(spark, SF)
    assert dict(media.dtypes)["payload"] == "binary"


def test_bmp_codec_roundtrip_exact():
    """The pure-numpy BMP encoder/decoder pair is exact for every padding
    case (w*3 % 4 in {0,1,2,3} -> widths 4,5,6,7) including 1-pixel rows."""
    import numpy as np

    from kinesis_demo_spark.operators.multimodal import decode_image_real, encode_bmp

    rng = np.random.default_rng(7)
    for w in (1, 4, 5, 6, 7, 32):
        for h in (1, 2, 9):
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            buf = encode_bmp(img)
            assert buf[:2] == b"BM"
            assert int.from_bytes(buf[2:6], "little") == len(buf)
            out = decode_image_real(buf)
            assert out.shape == (h, w, 3)
            assert np.array_equal(out, img)


def test_bmp_decoder_rejects_what_it_cannot_parse():
    import numpy as np
    import pytest

    from kinesis_demo_spark.operators.multimodal import decode_image_real, encode_bmp

    with pytest.raises(NotImplementedError):  # not a BMP -> codec gap, loud
        decode_image_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    buf = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    with pytest.raises(ValueError):  # truncated pixel data
        decode_image_real(bytes(buf[:-5]))
    buf[28] = 8  # claim 8bpp
    with pytest.raises(NotImplementedError):
        decode_image_real(bytes(buf))
    buf2 = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    buf2[10] = 14  # corrupt data_offset pointing inside the header
    with pytest.raises(ValueError):
        decode_image_real(bytes(buf2))


def test_multimodal_decode_real_matches_closed_form(spark):
    """End-to-end real-codec path at smoke scale: every per-doc channel sum
    equals the pixel ramp's direct numpy evaluation (independent of the SQL
    oracle, which the parity harness checks separately)."""
    import numpy as np

    from kinesis_demo_spark.queries.multimodal import multimodal_decode_real

    rows = {r.doc_id: r for r in multimodal_decode_real(spark, SF).collect()}
    assert len(rows) > 0
    for doc_id in list(rows)[:25]:
        r = rows[doc_id]
        w, h, seed = (doc_id % 7 + 1) * 4, (doc_id % 5 + 1) * 2, (doc_id * 131) % 256
        vals = (seed + 7 * np.arange(w * h * 3, dtype=np.int64)) % 256
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert r.r_sum == int(vals[0::3].sum())
        assert r.g_sum == int(vals[1::3].sum())
        assert r.b_sum == int(vals[2::3].sum())


def test_phash_decoded_recovers_image_cliques(spark):
    """The decoded-pixel pHash must recover its image cliques (docs in one
    PHASH_GROUP render near-identical BMPs): measured fixture separation is
    743/750 within-group pairs at hamming <= PHASH_MAX_HAMMING and ZERO
    cross-group pairs at 500 docs — pinned here so a codec or hash
    regression (stride, bottom-up order, BGR, cell geometry) shows up as a
    separation collapse, not just an oracle diff."""
    from kinesis_demo_spark.queries.multimodal import (
        PHASH_GROUP,
        phash_image_neardup_decoded,
    )

    pairs = phash_image_neardup_decoded(spark, SF).collect()
    within = [r for r in pairs if r.doc_a // PHASH_GROUP == r.doc_b // PHASH_GROUP]
    cross = [r for r in pairs if r.doc_a // PHASH_GROUP != r.doc_b // PHASH_GROUP]
    n_docs = spark.read.parquet(SF + "/documents.parquet").count()
    n_groups_pairs = (n_docs // PHASH_GROUP) * (PHASH_GROUP * (PHASH_GROUP - 1) // 2)
    assert not cross
    assert len(within) / n_groups_pairs >= 0.95
    assert all(r.hamming <= M and r.doc_a < r.doc_b for r in pairs for M in [5])


def test_phash_decoded_hash_is_from_decoded_pixels(spark):
    """Differential against a direct numpy evaluation of the closed-form
    image (no BMP encode/decode in the reference path): identical hashes
    prove the Spark path's encode->decode roundtrip is pixel-faithful."""
    import numpy as np

    from kinesis_demo_spark.operators.multimodal import (
        PHASH_CELLS,
        PHASH_GRID_COLS,
        PHASH_GRID_ROWS,
        PHASH_SCHEMA,
        phash_decoded_batches,
    )
    from kinesis_demo_spark.queries.multimodal import (
        _BMP_SCHEMA,
        _FLIP_BYTES,
        _THUMB_BYTES,
        _neardup_bmp_batches,
        PHASH_GROUP,
        THUMB_H,
        THUMB_W,
    )
    from kinesis_demo_spark.io import spread

    docs = spread(spark.read.parquet(SF + "/documents.parquet")).select("doc_id")
    got = {
        r.doc_id: r.phash
        for r in docs.mapInPandas(_neardup_bmp_batches, _BMP_SCHEMA)
        .mapInPandas(phash_decoded_batches, PHASH_SCHEMA)
        .collect()
    }
    assert len(got) > 0
    j = np.arange(_THUMB_BYTES, dtype=np.int64)
    rc = (np.arange(THUMB_H) * PHASH_GRID_ROWS) // THUMB_H
    cc = (np.arange(THUMB_W) * PHASH_GRID_COLS) // THUMB_W
    cells = (rc[:, None] * PHASH_GRID_COLS + cc[None, :]).ravel()
    for doc_id in list(got)[:50]:
        g, v = doc_id // PHASH_GROUP, doc_id % PHASH_GROUP
        f = (g % 97) + 3
        b = (j * f + (j // 96) * ((g % 29) * 16) + g * 53) % 256
        b = np.where((j >= v * 48) & (j < v * 48 + _FLIP_BYTES), (b + 128) % 256, b)
        gray = b.reshape(THUMB_H, THUMB_W, 3).sum(axis=2) // 3
        sums = np.bincount(cells, weights=gray.ravel(), minlength=PHASH_CELLS).astype(np.int64)
        cnts = np.bincount(cells, minlength=PHASH_CELLS).astype(np.int64)
        bits = sums * (THUMB_H * THUMB_W) > int(gray.sum()) * cnts
        expect = int((np.where(bits, 1, 0).astype(np.int64) << np.arange(PHASH_CELLS, dtype=np.int64)).sum())
        assert got[doc_id] == expect


def test_bmv_container_roundtrip_and_corruption(spark):
    """The real frame-extraction path's container parser: roundtrip
    fidelity plus loud failures on corrupt magic / truncated index /
    overrunning frame sizes (decoding garbage offsets silently is the
    failure mode a real demuxer guards against)."""
    import pytest

    from kinesis_demo_spark.operators.multimodal import decode_bmv, encode_bmv

    frames = [b"frame-one", b"", b"frame-three-longer"]
    assert decode_bmv(encode_bmv(frames)) == frames
    with pytest.raises(ValueError, match="not a BMV"):
        decode_bmv(b"XXXX" + encode_bmv(frames)[4:])
    with pytest.raises(ValueError, match="truncated BMV frame index"):
        decode_bmv(encode_bmv(frames)[:10])
    blob = bytearray(encode_bmv(frames))
    blob[8:12] = (10**6).to_bytes(4, "little")  # first frame claims 1MB
    with pytest.raises(ValueError, match="overruns"):
        decode_bmv(bytes(blob))


def test_frame_sample_real_matches_direct_numpy(spark):
    """Differential for the real frame path against direct numpy evaluation
    of the per-frame ramp (no container, no BMP encode/decode): identical
    stats prove the container index, stride, and per-frame codec are
    faithful."""
    import numpy as np

    from kinesis_demo_spark.queries.multimodal import (
        FRAME_STRIDE,
        multimodal_frame_sample_real,
    )

    rows = multimodal_frame_sample_real(spark, SF).collect()
    assert rows
    seen_multi = 0
    for r in rows[:80]:
        d, f = r.doc_id, r.frame_idx
        assert f % FRAME_STRIDE == 0
        w, h = ((d % 7) + 1) * 4, ((d % 5) + 1) * 2
        seed = (d * 131 + f * 17) % 256
        vals = (seed + 7 * np.arange(w * h * 3, dtype=np.int64)) % 256
        assert (r.width, r.height) == (w, h)
        assert (r.r_sum, r.g_sum, r.b_sum) == (
            int(vals[0::3].sum()), int(vals[1::3].sum()), int(vals[2::3].sum()))
        seen_multi += f > 0
    assert seen_multi > 0, "no multi-frame doc sampled — stride test vacuous"


def test_wav_codec_roundtrip_exact():
    """The pure-numpy WAV encoder/decoder pair is exact for mono/stereo/4ch,
    odd/even frame counts (odd mono data chunks exercise RIFF pad bytes),
    and 1-frame clips; sample rate round-trips too."""
    import numpy as np

    from kinesis_demo_spark.operators.audio import decode_audio_real, encode_wav

    rng = np.random.default_rng(11)
    for nch in (1, 2, 4):
        for nframes in (1, 3, 64, 101):
            for rate in (8000, 44100):
                s = rng.integers(-(2**15), 2**15, size=(nframes, nch), dtype=np.int16)
                buf = encode_wav(s, rate)
                assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
                assert int.from_bytes(buf[4:8], "little") == len(buf) - 8
                out, out_rate = decode_audio_real(buf)
                assert out_rate == rate
                assert out.shape == (nframes, nch)
                assert np.array_equal(out, s)


def test_wav_decoder_walks_chunks_and_rejects_garbage():
    """RIFF chunk walk: unknown chunks (odd-sized, so the pad-byte rule is
    exercised) before fmt/data are skipped; non-WAV magic, non-PCM formats,
    truncated chunks, and missing data all raise loudly."""
    import numpy as np
    import pytest

    from kinesis_demo_spark.operators.audio import decode_audio_real, encode_wav

    s = np.arange(-6, 6, dtype=np.int16).reshape(6, 2)
    buf = encode_wav(s, 16000)
    # splice an odd-length junk chunk between WAVE magic and fmt
    junk = b"LIST" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
    spliced = buf[:12] + junk + buf[12:]
    spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    out, rate = decode_audio_real(spliced)
    assert rate == 16000 and np.array_equal(out, s)

    with pytest.raises(NotImplementedError):  # not RIFF/WAVE -> codec gap, loud
        decode_audio_real(b"ID3\x04" + b"\x00" * 64)
    adpcm = bytearray(buf)
    adpcm[20] = 2  # fmt.audio_format = 2 (ADPCM)
    with pytest.raises(NotImplementedError):
        decode_audio_real(bytes(adpcm))
    with pytest.raises(ValueError):  # data chunk overruns the file
        decode_audio_real(buf[:-5])
    no_data = buf[:36]  # header + fmt only, data chunk sliced off entirely
    no_data = no_data[:4] + (len(no_data) - 8).to_bytes(4, "little") + no_data[8:]
    with pytest.raises(ValueError):
        decode_audio_real(no_data)


def test_audio_decode_real_matches_direct_numpy(spark):
    """End-to-end real audio path at smoke scale: decode features from the
    Spark pipeline equal a direct numpy recomputation from the fixture's
    closed form — deinterleave, zero-crossing, and energy all line up."""
    import numpy as np

    from kinesis_demo_spark.queries.multimodal import multimodal_audio_decode_real

    rows = {
        r["doc_id"]: r.asDict()
        for r in multimodal_audio_decode_real(spark, SF).collect()
    }
    assert rows
    for doc_id in list(rows)[:25]:
        d = int(doc_id)
        nch, nframes, seed = (d % 2) + 1, ((d % 9) + 1) * 50, (d * 17) % 4096
        raw = ((seed + 11 * np.arange(nframes * nch, dtype=np.int64)) % 4096) - 2048
        frames = raw.reshape(nframes, nch)
        got = rows[doc_id]
        assert got["n_channels"] == nch
        assert got["n_frames"] == nframes
        assert got["ch0_sum"] == int(frames[:, 0].sum())
        assert got["chl_sum"] == int(frames[:, -1].sum())
        assert got["energy"] == int((raw * raw).sum())
        ch0 = frames[:, 0]
        assert got["zero_crossings"] == int(((ch0[:-1] < 0) != (ch0[1:] < 0)).sum())


def test_audio_window_energy_windows_partition_the_clip(spark):
    """Window rows per doc tile the clip exactly: counts sum to n_frames,
    every full window has AUDIO_WINDOW_FRAMES frames, and window energies
    sum to the clip's channel-0 energy."""
    import numpy as np

    from kinesis_demo_spark.queries.multimodal import (
        AUDIO_WINDOW_FRAMES,
        audio_window_energy_real,
    )

    out = audio_window_energy_real(spark, SF).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, rows in list(by_doc.items())[:25]:
        d = int(doc_id)
        nch, nframes, seed = (d % 2) + 1, ((d % 9) + 1) * 50, (d * 17) % 4096
        rows.sort(key=lambda r: r["window_idx"])
        assert [r["window_idx"] for r in rows] == list(range(len(rows)))
        assert sum(r["n_frames_in_window"] for r in rows) == nframes
        for r in rows[:-1]:
            assert r["n_frames_in_window"] == AUDIO_WINDOW_FRAMES
        k = np.arange(nframes, dtype=np.int64) * nch
        ch0 = ((seed + 11 * k) % 4096) - 2048
        assert sum(r["w_energy"] for r in rows) == int((ch0 * ch0).sum())


def test_png_codec_roundtrip_exact():
    import numpy as np

    from kinesis_demo_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (2, 3), (7, 13), (16, 32)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()
        # every filter type individually, not just the default cycle
        for f in range(5):
            assert (decode_png(encode_png(img, [f] * h)) == img).all(), f


def test_png_decoder_handles_split_idat():
    # spec allows the pixel stream split across ANY number of IDAT chunks;
    # a decoder that inflates per-chunk instead of concatenating breaks here
    import struct
    import zlib

    import numpy as np

    from kinesis_demo_spark.operators.multimodal import decode_png, encode_png

    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    buf = encode_png(img)
    # re-chunk: pull the single IDAT body out and re-emit it 3 bytes at a time
    def chunks(b):
        pos = 8
        while pos < len(b):
            (ln,) = struct.unpack(">I", b[pos : pos + 4])
            yield b[pos + 4 : pos + 8], b[pos + 8 : pos + 8 + ln]
            pos += 12 + ln

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    parts = dict(chunks(buf))
    idat = parts[b"IDAT"]
    rebuilt = buf[:8] + chunk(b"IHDR", parts[b"IHDR"])
    for i in range(0, len(idat), 3):
        rebuilt += chunk(b"IDAT", idat[i : i + 3])
    rebuilt += chunk(b"IEND", b"")
    assert (decode_png(rebuilt) == img).all()


def test_png_decoder_rejects_hostile_chunks():
    import struct
    import zlib

    import numpy as np
    import pytest

    from kinesis_demo_spark.operators.multimodal import decode_png, encode_png

    img = np.zeros((3, 4, 3), dtype=np.uint8)
    good = encode_png(img)

    with pytest.raises(NotImplementedError):
        decode_png(b"GIF89a not a png")
    with pytest.raises(ValueError, match="truncated|overruns"):
        decode_png(good[: len(good) - 6])
    # flip one byte inside the IDAT body -> CRC mismatch
    (ihdr_len,) = struct.unpack(">I", good[8:12])
    idat_body_at = 8 + 12 + ihdr_len + 8
    corrupt = bytearray(good)
    corrupt[idat_body_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    # chunk length field pointing past the buffer
    overrun = bytearray(good)
    overrun[8:12] = struct.pack(">I", 1 << 24)
    with pytest.raises(ValueError, match="overruns"):
        decode_png(bytes(overrun))
    # unsupported color types raise the documented seam, not garbage
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    rgba_ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 6, 0, 0, 0)  # RGBA: unsupported
    rgba = good[:8] + chunk(b"IHDR", rgba_ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="color type"):
        decode_png(rgba)
    # bad row-filter byte inside a valid zlib stream
    stride = 4 * 3
    raw = bytes([7]) + bytes(stride)  # filter 7 does not exist
    bad_ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 2, 0, 0, 0)
    bad = (
        good[:8] + chunk(b"IHDR", bad_ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter"):
        decode_png(bad)
    # pixel stream length mismatch (one scanline missing)
    short_ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0)
    short = (
        good[:8] + chunk(b"IHDR", short_ihdr)
        + chunk(b"IDAT", zlib.compress(bytes([0]) + bytes(stride)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length"):
        decode_png(short)


def test_png_query_matches_closed_form(spark):
    # the full registered path at the tiny fixture, vs a direct numpy ramp
    import numpy as np

    from kinesis_demo_spark.queries.multimodal import multimodal_png_decode_real

    rows = {
        r["doc_id"]: r
        for r in multimodal_png_decode_real(spark, "/root/testdata/sf0.001").collect()
    }
    for doc_id in list(rows)[:6]:
        w = ((doc_id % 6) + 1) * 5
        h = ((doc_id % 4) + 1) * 3
        seed = (doc_id * 97) % 256
        kind = doc_id % 3
        if kind == 1:  # RGB
            vals = (seed + 11 * np.arange(w * h * 3, dtype=np.int64)) % 256
            sums = tuple(int(s) for s in vals.reshape(-1, 3).sum(axis=0))
        elif kind == 0:  # grayscale -> replicated channels
            vals = (seed + 11 * np.arange(w * h, dtype=np.int64)) % 256
            sums = (int(vals.sum()),) * 3
        else:  # palette lookup
            idx = (seed + 11 * np.arange(w * h, dtype=np.int64)) % 16
            sums = tuple(int(((7 + 31 * idx + 17 * c) % 256).sum()) for c in range(3))
        r = rows[doc_id]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert (r["r_sum"], r["g_sum"], r["b_sum"]) == sums, doc_id


def test_png_gray_and_palette_roundtrip():
    import numpy as np
    import pytest

    from kinesis_demo_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (7, 11), dtype=np.uint8)
    want = np.repeat(g[:, :, None], 3, axis=2)
    for f in range(5):
        assert (decode_png(encode_png(g, [f] * 7, color_type=0)) == want).all(), f
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (6, 10), dtype=np.uint8)
    assert (decode_png(encode_png(idx, color_type=3, palette=pal)) == pal[idx]).all()
    # palette index out of range -> loud error, not a silent wrap
    small_pal = pal[:4]
    bad = encode_png(idx, color_type=3, palette=small_pal)
    with pytest.raises(ValueError, match="palette index"):
        decode_png(bad)
    # missing PLTE -> loud error
    import struct
    import zlib

    full = encode_png(idx, color_type=3, palette=pal)
    pos, out = 8, full[:8]
    while pos < len(full):
        (ln,) = struct.unpack(">I", full[pos : pos + 4])
        tag = full[pos + 4 : pos + 8]
        if tag != b"PLTE":
            out += full[pos : pos + 12 + ln]
        pos += 12 + ln
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(out)
    # 16-bit depth stays behind the seam
    rgb = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    (ihdr_len,) = struct.unpack(">I", rgb[8:12])
    body = bytearray(rgb[16 : 16 + ihdr_len])
    body[8] = 16  # depth
    def chunk(tag, b):
        return struct.pack(">I", len(b)) + tag + b + struct.pack(
            ">I", zlib.crc32(tag + b) & 0xFFFFFFFF)
    rebuilt = rgb[:8] + chunk(b"IHDR", bytes(body)) + rgb[16 + ihdr_len + 4 :]
    with pytest.raises(NotImplementedError):
        decode_png(rebuilt)
