"""Multimodal column plumbing: binary payload + metadata schema, Arrow
mapInPandas feature extraction, stub-decoder failure path."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmexpress_spark.operators import multimodal


def _blobs(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 500)], "doc_id long, text string"
    )
    return multimodal.attach_binary(df, "text", "doc_id")


def test_attach_binary_schema(spark):
    b = _blobs(spark)
    assert dict(b.dtypes) == {
        "item_id": "bigint",
        "payload": "binary",
        "meta": "struct<mime:string,n_bytes:int>",
    }
    rows = {r.item_id: r for r in b.collect()}
    assert bytes(rows[1].payload) == b"hello world"
    assert rows[3].meta.n_bytes == 500


def test_extract_features_deterministic(spark):
    feats = multimodal.extract_features(_blobs(spark))
    rows = {r.item_id: r for r in feats.collect()}
    assert all(r.decode_ok for r in rows.values())
    assert rows[1].n_bytes == 11
    assert rows[2].feat == [0.0, 0.0, 0.0, 0.0]  # empty payload
    assert rows[3].feat[0] == 500.0
    # deterministic across runs
    again = {r.item_id: r for r in multimodal.extract_features(_blobs(spark)).collect()}
    assert {k: list(v.feat) for k, v in rows.items()} == {
        k: list(v.feat) for k, v in again.items()
    }


def test_extract_features_strict_stub(spark):
    """A NotImplementedError decoder (the strict stub for absent codec
    libs) marks rows decode_ok=false instead of failing the job."""

    def strict(payload: bytes) -> list:
        raise NotImplementedError("no codec in this container")

    feats = multimodal.extract_features(_blobs(spark), decoder=strict)
    rows = feats.collect()
    assert len(rows) == 3
    assert all(not r.decode_ok for r in rows)
    assert all(r.feat is None for r in rows)


def test_extract_features_no_shuffle(spark):
    """Feature extraction must be map-only — no Exchange in the plan."""
    feats = multimodal.extract_features(_blobs(spark))
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_frame_sample_slices_and_strides(spark):
    from osmexpress_spark.operators import multimodal

    rows = [(1, b"a" * 100), (2, b"xy"), (3, b"")]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "item_id long, payload binary"
    )
    got = {}
    for r in multimodal.frame_sample(df, frame_bytes=32, stride=3).collect():
        got.setdefault(r.item_id, []).append(
            (r.frame_idx, bytes(r.frame), r.n_frame_bytes)
        )
    # 100 bytes -> 4 frames (idx 0..3), stride 3 keeps 0 and 3
    assert [i for i, _, _ in sorted(got[1])] == [0, 3]
    assert sorted(got[1])[0][1] == b"a" * 32
    assert sorted(got[1])[1] == (3, b"a" * 4, 4)  # tail frame is short
    assert got[2] == [(0, b"xy", 2)]
    assert 3 not in got  # empty payload -> no frames


def test_resize_bytes_decimates(spark):
    from osmexpress_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(10))))], "item_id long, payload binary"
    )
    r = multimodal.resize_bytes(df, factor=2).collect()[0]
    assert bytes(r.resized) == bytes([0, 2, 4, 6, 8]) and r.n_bytes_out == 5


# --- real in-container image decode (BMP/PPM, pure stdlib) -----------------
def _bmp24(pixels, top_down=False):
    """Encode rows of (r, g, b) tuples as an uncompressed 24-bit BMP.
    Independent test-side encoder: BGR byte order, rows padded to 4
    bytes, bottom-up unless top_down."""
    import struct

    height, width = len(pixels), len(pixels[0])
    stride = ((width * 3 + 3) // 4) * 4
    rows = pixels if top_down else list(reversed(pixels))
    body = b"".join(
        b"".join(bytes((b_, g, r)) for r, g, b_ in row)
        + b"\x00" * (stride - width * 3)
        for row in rows
    )
    hdr_h = -height if top_down else height
    info = struct.pack("<IiiHHIIiiII", 40, width, hdr_h, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return file_hdr + info + body


def _ppm(pixels, maxval=255, comment=False):
    head = b"P6\n"
    if comment:
        head += b"# test comment\n"
    height, width = len(pixels), len(pixels[0])
    head += f"{width} {height}\n{maxval}\n".encode()
    return head + b"".join(
        bytes(px) for row in pixels for px in row
    )


PIXELS = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
]
# channel means over the 6 pixels, /255
MEANS = tuple(
    sum(px[c] for row in PIXELS for px in row) / (6 * 255.0) for c in range(3)
)


def test_image_decoder_bmp_golden():
    for top_down in (False, True):
        w, h, r, g, b = multimodal.image_decoder(_bmp24(PIXELS, top_down))
        assert (w, h) == (3.0, 2.0)
        assert (r, g, b) == MEANS


def test_image_decoder_ppm_golden():
    w, h, r, g, b = multimodal.image_decoder(_ppm(PIXELS, comment=True))
    assert (w, h) == (3.0, 2.0)
    assert (r, g, b) == MEANS
    # non-255 maxval rescales
    w, h, r, g, b = multimodal.image_decoder(_ppm([[(50, 0, 100)]], maxval=100))
    assert (r, g, b) == (0.5, 0.0, 1.0)


def test_image_decoder_failure_shapes():
    import pytest

    with pytest.raises(ValueError):
        # JPEG and PNG containers are now supported, so garbage after
        # the magic is a CORRUPT payload (ValueError), not an absent
        # codec; only genuinely uncovered formats hit the stub branch
        multimodal.image_decoder(b"\xff\xd8\xff\xe0jpeg-like")
    with pytest.raises(ValueError):
        multimodal.image_decoder(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        # GIF is now a supported container: garbage after the magic is
        # a CORRUPT payload, not an absent codec
        multimodal.image_decoder(b"GIF89a......")
    with pytest.raises(NotImplementedError):
        # lossless WebP (VP8L) decodes now; LOSSY VP8 stays the stub —
        # a well-formed container routes to the honest branch
        multimodal.image_decoder(
            b"RIFF" + (16).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4
        )
    with pytest.raises(ValueError):
        # a malformed WebP container (no decodable chunk) is CORRUPT
        multimodal.image_decoder(b"RIFFxxxxWEBPVP8 ")
    with pytest.raises(ValueError):
        multimodal.image_decoder(_bmp24(PIXELS)[:-4])  # truncated pixels
    with pytest.raises(ValueError):
        multimodal.image_decoder(_ppm(PIXELS)[:-4])
    with pytest.raises(ValueError):
        multimodal.image_decoder(b"BM" + b"\x00" * 10)  # truncated header


def test_extract_features_real_images_distributed(spark):
    """Both decoder branches on real bytes, through the distributed
    Arrow path: BMP and PPM rows decode to exact channel means; a PNG
    magic and a truncated BMP mark decode_ok=False without failing the
    stage."""
    rows = [
        (1, bytearray(_bmp24(PIXELS))),
        (2, bytearray(_ppm(PIXELS))),
        (3, bytearray(b"\x89PNG\r\n\x1a\nnot-a-real-png")),
        (4, bytearray(_bmp24(PIXELS)[:-4])),
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary").repartition(4)
    got = {
        r.item_id: r
        for r in multimodal.extract_features(
            df, decoder=multimodal.image_decoder, modality="image"
        ).collect()
    }
    assert got[1].decode_ok and got[2].decode_ok
    assert list(got[1].feat) == [3.0, 2.0, *MEANS]
    assert list(got[2].feat) == [3.0, 2.0, *MEANS]
    assert not got[3].decode_ok and got[3].feat is None
    assert not got[4].decode_ok and got[4].feat is None
    assert got[1].modality == "image"


# --- real PNG decode (stdlib zlib) -----------------------------------------
def _png(pixels, alpha=None, filters=None, color_type=None, depth=8,
         interlace=0):
    """Independent test-side PNG encoder. `filters` picks the scanline
    filter per row (default all-0/None); filtering is applied FORWARD
    here so the decoder must invert it."""
    import struct
    import zlib

    height, width = len(pixels), len(pixels[0])
    bpp = 4 if alpha is not None else 3
    if color_type is None:
        color_type = 6 if alpha is not None else 2
    filters = filters or [0] * height

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    raw = bytearray()
    prior = bytearray(width * bpp)
    for rowi, row in enumerate(pixels):
        line = bytearray()
        for x, (r, g, b) in enumerate(row):
            line += bytes((r, g, b))
            if alpha is not None:
                line.append(alpha[rowi][x])
        f = filters[rowi]
        out = bytearray(line)
        if f == 1:
            for i in range(len(line) - 1, bpp - 1, -1):
                out[i] = (line[i] - line[i - bpp]) & 0xFF
        elif f == 2:
            for i in range(len(line)):
                out[i] = (line[i] - prior[i]) & 0xFF
        elif f == 3:
            for i in range(len(line)):
                left = line[i - bpp] if i >= bpp else 0
                out[i] = (line[i] - (left + prior[i]) // 2) & 0xFF
        elif f == 4:
            for i in range(len(line)):
                a = line[i - bpp] if i >= bpp else 0
                b_ = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
                out[i] = (line[i] - pred) & 0xFF
        raw.append(f)
        raw += out
        prior = line
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0,
                       interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_image_decoder_png_golden_all_filters():
    # enough rows to give every filter type a turn, including Paeth
    import random

    rng = random.Random(3)
    pixels = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
               for _ in range(7)] for _ in range(5)]
    means = tuple(
        sum(px[c] for row in pixels for px in row) / (35 * 255.0)
        for c in range(3)
    )
    for filters in ([0, 1, 2, 3, 4], [4, 3, 2, 1, 0], [4] * 5):
        w, h, r, g, b = multimodal.image_decoder(_png(pixels, filters=filters))
        assert (w, h) == (7.0, 5.0)
        assert (r, g, b) == means, filters
    # RGBA: alpha is carried per-pixel but excluded from the means
    al = [[rng.randrange(256) for _ in range(7)] for _ in range(5)]
    w, h, r, g, b = multimodal.image_decoder(
        _png(pixels, alpha=al, filters=[0, 1, 2, 3, 4])
    )
    assert (w, h, r, g, b) == (7.0, 5.0, *means)


def test_image_decoder_png_unsupported_and_corrupt():
    import pytest

    # interlace=1 and depth=16 DECODE since round 6; here the payload
    # lies about its layout, so the stream-size check must catch it
    with pytest.raises(ValueError, match="size mismatch"):
        multimodal.image_decoder(_png(PIXELS, interlace=1))
    with pytest.raises(ValueError, match="size mismatch"):
        multimodal.image_decoder(_png(PIXELS, depth=16))
    with pytest.raises(NotImplementedError, match="interlace=2"):
        multimodal.image_decoder(_png(PIXELS, interlace=2))
    with pytest.raises(NotImplementedError, match="depth=4"):
        multimodal.image_decoder(_png(PIXELS, depth=4))  # truecolor 4-bit
    # palette PNGs decode since round 6, but only with a PLTE present
    with pytest.raises(ValueError, match="PLTE"):
        multimodal.image_decoder(_png(PIXELS, color_type=3))
    good = _png(PIXELS)
    with pytest.raises(ValueError):
        multimodal.image_decoder(good[:-16])  # IEND lost
    # flip a byte inside the IDAT zlib stream -> corrupt, not crash
    bad = bytearray(good)
    bad[45] ^= 0xFF
    with pytest.raises(ValueError):
        multimodal.image_decoder(bytes(bad))


def test_image_decoder_png_property_random_images():
    """Random sizes x pixels x per-row filter choices x RGB/RGBA,
    decoded against the independent forward-filtering encoder: the
    means must be exact (integer sums over /255 — no float drift)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def run(data):
        w = data.draw(st.integers(1, 12), label="w")
        h = data.draw(st.integers(1, 10), label="h")
        pixels = [
            [tuple(data.draw(st.integers(0, 255)) for _ in range(3))
             for _ in range(w)]
            for _ in range(h)
        ]
        filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
        use_alpha = data.draw(st.booleans(), label="alpha")
        al = (
            [[data.draw(st.integers(0, 255)) for _ in range(w)]
             for _ in range(h)]
            if use_alpha else None
        )
        exp = tuple(
            sum(px[c] for row in pixels for px in row) / (w * h * 255.0)
            for c in range(3)
        )
        got = multimodal.image_decoder(_png(pixels, alpha=al, filters=filters))
        assert got == [float(w), float(h), *exp], (filters, use_alpha)

    run()


def test_extract_features_png_distributed(spark):
    png = _png(PIXELS, filters=[2, 4])
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(_png(PIXELS, interlace=1)))],
        "item_id long, payload binary",
    ).repartition(2)
    got = {r.item_id: r for r in multimodal.extract_features(
        df, decoder=multimodal.image_decoder, modality="image").collect()}
    assert got[1].decode_ok and list(got[1].feat) == [3.0, 2.0, *MEANS]
    assert not got[2].decode_ok and got[2].feat is None


# --- real WAV decode (stdlib wave) -----------------------------------------
def _wav(samples, rate=8000, nch=1, width=2):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 1:
            w.writeframes(bytes(s + 128 for s in samples))
        else:
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_wav_decoder_golden():
    pcm = [0, 16384, -16384, 32767]
    nch, rate, nframes, mean_abs, peak = multimodal.wav_decoder(_wav(pcm))
    assert (nch, rate, nframes) == (1.0, 8000.0, 4.0)
    assert mean_abs == (0 + 16384 + 16384 + 32767) / (4 * 32768.0)
    assert peak == 32767 / 32768.0
    # 8-bit path
    feats = multimodal.wav_decoder(_wav([0, 64, -64], width=1))
    assert feats[3] == (0 + 64 + 64) / (3 * 128.0)


def test_wav_decoder_failure_shapes():
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.wav_decoder(b"ID3\x04mp3-like-bytes")
    w = _wav([1, 2, 3])
    with pytest.raises(ValueError):
        multimodal.wav_decoder(w[:-3])  # truncated data chunk


def test_wav_decode_distributed(spark):
    rows = [(i, bytearray(_wav([i * 100, -i * 100]))) for i in range(1, 5)]
    rows.append((99, bytearray(b"OggS-not-wav")))
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {
        r.item_id: r
        for r in multimodal.extract_features(
            df, decoder=multimodal.wav_decoder, modality="audio"
        ).collect()
    }
    assert all(got[i].decode_ok for i in range(1, 5))
    assert got[3].feat[4] == 300 / 32768.0
    assert not got[99].decode_ok


# --- real BMP resize -------------------------------------------------------
def test_bmp_resize_nearest_neighbor():
    # 4x4 with distinct pixels; factor 2 keeps rows 0,2 x cols 0,2
    pix = [[(r * 16 + c, 0, 255 - r * 16 - c) for c in range(4)]
           for r in range(4)]
    small = multimodal.bmp_resize(_bmp24(pix), 2)
    w, h, mr, mg, mb = multimodal.image_decoder(small)
    assert (w, h) == (2.0, 2.0)
    kept = [pix[0][0], pix[0][2], pix[2][0], pix[2][2]]
    assert mr == sum(p[0] for p in kept) / (4 * 255.0)
    assert mb == sum(p[2] for p in kept) / (4 * 255.0)


def test_resize_bytes_with_real_resizer(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_bmp24(PIXELS)))], "item_id long, payload binary"
    )
    r = multimodal.resize_bytes(df, 2, resizer=multimodal.bmp_resize).collect()[0]
    w, h, *_ = multimodal.image_decoder(bytes(r.resized))
    assert (w, h) == (2.0, 1.0)


# --- palette / grayscale PNG decode (round-6 addition) ----------------------
def _png2(byte_rows, width, color_type, depth, bpp, plte=None, filters=None):
    """Second independent encoder: arbitrary pre-packed scanline bytes
    (palette indices / gray / gray+alpha), forward-filtered at byte
    lag `bpp` exactly as the spec prescribes for sub-byte depths."""
    import struct
    import zlib

    height = len(byte_rows)
    filters = filters or [0] * height

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    raw = bytearray()
    prior = bytearray(len(byte_rows[0]))
    for f, row in zip(filters, byte_rows):
        line = bytearray(row)
        out = bytearray(line)
        if f == 1:
            for i in range(len(line) - 1, bpp - 1, -1):
                out[i] = (line[i] - line[i - bpp]) & 0xFF
        elif f == 2:
            for i in range(len(line)):
                out[i] = (line[i] - prior[i]) & 0xFF
        elif f == 3:
            for i in range(len(line)):
                left = line[i - bpp] if i >= bpp else 0
                out[i] = (line[i] - (left + prior[i]) // 2) & 0xFF
        elif f == 4:
            for i in range(len(line)):
                a = line[i - bpp] if i >= bpp else 0
                b_ = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
                out[i] = (line[i] - pred) & 0xFF
        raw.append(f)
        raw += out
        prior = line
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
    body = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        body += chunk(b"PLTE", bytes(b for c in plte for b in c))
    return body + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def _pack_indices(row, depth):
    if depth == 8:
        return bytearray(row)
    line, acc, nb = bytearray(), 0, 0
    for v in row:
        acc, nb = (acc << depth) | v, nb + depth
        if nb == 8:
            line.append(acc)
            acc, nb = 0, 0
    if nb:
        line.append(acc << (8 - nb))
    return line


def _pal_means(indices, palette):
    n = sum(len(r) for r in indices) * 255.0
    return tuple(
        sum(palette[v][c] for r in indices for v in r) / n for c in range(3)
    )


def test_image_decoder_png_palette_depth8_all_filters():
    import random

    rng = random.Random(11)
    palette = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
               for _ in range(17)]
    idx = [[rng.randrange(17) for _ in range(9)] for _ in range(5)]
    rows = [_pack_indices(r, 8) for r in idx]
    for filters in ([0, 1, 2, 3, 4], [4, 4, 4, 4, 4]):
        got = multimodal.image_decoder(
            _png2(rows, 9, 3, 8, 1, plte=palette, filters=filters)
        )
        assert got == [9.0, 5.0, *_pal_means(idx, palette)], filters


def test_image_decoder_png_palette_subbyte_depths_with_padding():
    import random

    rng = random.Random(12)
    for depth, ncol in ((1, 2), (2, 4), (4, 13)):
        palette = [(rng.randrange(256),) * 3 for _ in range(ncol)]
        # odd widths on purpose: the last byte of each row carries pad
        # bits that must NOT be counted as pixels
        for width in (1, 3, 7, 11):
            idx = [[rng.randrange(ncol) for _ in range(width)]
                   for _ in range(4)]
            rows = [_pack_indices(r, depth) for r in idx]
            filters = [rng.randrange(5) for _ in range(4)]
            got = multimodal.image_decoder(
                _png2(rows, width, 3, depth, 1, plte=palette, filters=filters)
            )
            exp = [float(width), 4.0, *_pal_means(idx, palette)]
            assert got == exp, (depth, width, filters)


def test_image_decoder_png_grayscale_and_gray_alpha():
    import random

    rng = random.Random(13)
    gray = [[rng.randrange(256) for _ in range(6)] for _ in range(4)]
    mean = sum(v for r in gray for v in r) / (24 * 255.0)
    got = multimodal.image_decoder(
        _png2([bytearray(r) for r in gray], 6, 0, 8, 1,
              filters=[0, 1, 2, 4])
    )
    assert got == [6.0, 4.0, mean, mean, mean]
    # gray+alpha (color 4, bpp 2): alpha bytes excluded from the mean
    ga_rows = [
        bytearray(b for v in r for b in (v, rng.randrange(256)))
        for r in gray
    ]
    got = multimodal.image_decoder(
        _png2(ga_rows, 6, 4, 8, 2, filters=[4, 3, 2, 1])
    )
    assert got == [6.0, 4.0, mean, mean, mean]


def test_image_decoder_png_palette_index_out_of_range():
    import pytest

    palette = [(10, 20, 30), (40, 50, 60)]
    rows = [_pack_indices([0, 1, 5], 8)]  # index 5 > palette size 2
    with pytest.raises(ValueError, match="out of range"):
        multimodal.image_decoder(_png2(rows, 3, 3, 8, 1, plte=palette))


def test_image_decoder_png_palette_property_random():
    """Random palette images across all four depths x random per-row
    filters vs the independent encoder: means must be exact."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.data())
    def run(data):
        depth = data.draw(st.sampled_from([1, 2, 4, 8]), label="depth")
        ncol = data.draw(st.integers(1, 1 << depth), label="ncol")
        w = data.draw(st.integers(1, 11), label="w")
        h = data.draw(st.integers(1, 6), label="h")
        palette = [
            tuple(data.draw(st.integers(0, 255)) for _ in range(3))
            for _ in range(ncol)
        ]
        idx = [[data.draw(st.integers(0, ncol - 1)) for _ in range(w)]
               for _ in range(h)]
        filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
        rows = [_pack_indices(r, depth) for r in idx]
        got = multimodal.image_decoder(
            _png2(rows, w, 3, depth, 1, plte=palette, filters=filters)
        )
        assert got == [float(w), float(h), *_pal_means(idx, palette)]

    run()


# --- 16-bit and Adam7-interlaced PNG (round-6 completion) -------------------
def _filter_fwd(byte_rows, bpp, filters):
    """Forward-filter pre-packed scanlines (independent of the decoder's
    inverse); prior resets at the first row — callers concatenate one
    call per Adam7 pass."""
    raw = bytearray()
    prior = bytearray(len(byte_rows[0]) if byte_rows else 0)
    for f, row in zip(filters, byte_rows):
        line = bytearray(row)
        out = bytearray(line)
        if f == 1:
            for i in range(len(line) - 1, bpp - 1, -1):
                out[i] = (line[i] - line[i - bpp]) & 0xFF
        elif f == 2:
            for i in range(len(line)):
                out[i] = (line[i] - prior[i]) & 0xFF
        elif f == 3:
            for i in range(len(line)):
                left = line[i - bpp] if i >= bpp else 0
                out[i] = (line[i] - (left + prior[i]) // 2) & 0xFF
        elif f == 4:
            for i in range(len(line)):
                a = line[i - bpp] if i >= bpp else 0
                b_ = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
                out[i] = (line[i] - pred) & 0xFF
        raw.append(f)
        raw += out
        prior = line
    return raw


def _png_wrap(width, height, depth, color_type, interlace, raw, plte=None):
    import struct
    import zlib

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0,
                    interlace),
    )
    if plte is not None:
        out += chunk(b"PLTE", bytes(b for c in plte for b in c))
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _pack16(samples):
    return bytearray(b for v in samples for b in ((v >> 8) & 0xFF, v & 0xFF))


def test_image_decoder_png_16bit_truecolor_and_gray(rng_seed=21):
    import random

    rng = random.Random(rng_seed)
    w, h = 5, 4
    px = [[tuple(rng.randrange(65536) for _ in range(3)) for _ in range(w)]
          for _ in range(h)]
    rows = [_pack16([s for p in row for s in p]) for row in px]
    raw = _filter_fwd(rows, 6, [0, 1, 3, 4])
    got = multimodal.image_decoder(_png_wrap(w, h, 16, 2, 0, raw))
    exp = [sum(p[c] for row in px for p in row) / (w * h * 65535.0)
           for c in range(3)]
    assert got == [float(w), float(h), *exp]
    # 16-bit gray+alpha: alpha halves excluded
    gray = [[rng.randrange(65536) for _ in range(w)] for _ in range(h)]
    ga_rows = [
        _pack16([s for v in row for s in (v, rng.randrange(65536))])
        for row in gray
    ]
    raw = _filter_fwd(ga_rows, 4, [4, 2, 1, 0])
    got = multimodal.image_decoder(_png_wrap(w, h, 16, 4, 0, raw))
    m = sum(v for row in gray for v in row) / (w * h * 65535.0)
    assert got == [float(w), float(h), m, m, m]


def _adam7_raw(pixels_to_bytes, width, height, bpp, rng):
    """Build an Adam7 stream: per pass, select the pass's pixels, pack
    rows via pixels_to_bytes, filter with a fresh prior."""
    raw = bytearray()
    for xs, ys, xst, yst in ADAM7:
        rows = []
        for y in range(ys, height, yst):
            rows.append(pixels_to_bytes(y, list(range(xs, width, xst))))
        rows = [r for r in rows if r is not None]
        if not rows or not rows[0]:
            continue
        raw += _filter_fwd(rows, bpp, [rng.randrange(5) for _ in rows])
    return raw


def test_image_decoder_png_adam7_truecolor():
    import random

    rng = random.Random(31)
    for w, h in ((11, 9), (1, 1), (3, 10), (8, 8)):
        px = [[tuple(rng.randrange(256) for _ in range(3)) for _ in range(w)]
              for _ in range(h)]

        def row_bytes(y, xcols):
            return bytearray(b for x in xcols for b in px[y][x])

        raw = _adam7_raw(row_bytes, w, h, 3, rng)
        got = multimodal.image_decoder(_png_wrap(w, h, 8, 2, 1, raw))
        exp = [sum(p[c] for row in px for p in row) / (w * h * 255.0)
               for c in range(3)]
        assert got == [float(w), float(h), *exp], (w, h)


def test_image_decoder_png_adam7_subbyte_palette():
    import random

    rng = random.Random(32)
    depth, ncol = 2, 4
    palette = [tuple(rng.randrange(256) for _ in range(3))
               for _ in range(ncol)]
    w, h = 13, 6  # odd width: per-pass rows carry pad bits
    idx = [[rng.randrange(ncol) for _ in range(w)] for _ in range(h)]

    def row_bytes(y, xcols):
        return _pack_indices([idx[y][x] for x in xcols], depth)

    raw = _adam7_raw(row_bytes, w, h, 1, rng)
    got = multimodal.image_decoder(
        _png_wrap(w, h, depth, 3, 1, raw, plte=palette)
    )
    assert got == [float(w), float(h), *_pal_means(idx, palette)]


def test_image_decoder_png_adam7_16bit_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.data())
    def run(data):
        import random

        w = data.draw(st.integers(1, 10), label="w")
        h = data.draw(st.integers(1, 10), label="h")
        px = [[data.draw(st.integers(0, 65535)) for _ in range(w)]
              for _ in range(h)]
        rng = random.Random(data.draw(st.integers(0, 999)))

        def row_bytes(y, xcols):
            return _pack16([px[y][x] for x in xcols])

        raw = _adam7_raw(row_bytes, w, h, 2, rng)
        got = multimodal.image_decoder(_png_wrap(w, h, 16, 0, 1, raw))
        m = sum(v for row in px for v in row) / (w * h * 65535.0)
        assert got == [float(w), float(h), m, m, m]

    run()


# --- GIF: independent encoder (real LZW, the inverse algorithm) ------------


def _gif_lzw_encode(min_code, indices):
    """Proper GIF LZW encoder (dictionary growth, width bumps, clear +
    end codes) written independently of the decoder."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    table = {(i,): i for i in range(clear)}
    # code widths tracked in lockstep with the DECODER's view: it adds
    # its table entry one code after ours, so it widens when OUR entry
    # count (minus that one-code lag) hits the width boundary
    out_bits = []
    w = [min_code + 1]

    def put(code):
        out_bits.append((code, w[0]))

    put(clear)
    prev = ()
    n_entries = end + 1
    for sym in indices:
        cur = prev + (sym,)
        if cur in table:
            prev = cur
            continue
        put(table[prev])
        table[cur] = n_entries
        n_entries += 1
        if n_entries - 1 == (1 << w[0]) and w[0] < 12:
            w[0] += 1
        prev = (sym,)
    if prev:
        put(table[prev])
    put(end)
    # pack LSB-first
    buf = bytearray()
    acc_v = acc_n = 0
    for code, width in out_bits:
        acc_v |= code << acc_n
        acc_n += width
        while acc_n >= 8:
            buf.append(acc_v & 0xFF)
            acc_v >>= 8
            acc_n -= 8
    if acc_n:
        buf.append(acc_v & 0xFF)
    return bytes(buf)


def _make_gif(w, h, palette, indices, min_code=None, interlace=False,
              local_table=False, version=b"GIF89a", extension=False):
    import struct

    n_colors = len(palette)
    depth = max(2, (n_colors - 1).bit_length())
    if min_code is None:
        min_code = max(2, depth)
    pal = b"".join(bytes(c) for c in palette)
    pal += b"\x00\x00\x00" * ((1 << depth) - n_colors)
    out = bytearray(version)
    gct_flag = 0 if local_table else 0x80
    out += struct.pack("<HHBBB", w, h, gct_flag | (depth - 1), 0, 0)
    if not local_table:
        out += pal
    if extension:  # a GCE the decoder must skip
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    ipacked = (0x80 | (depth - 1) if local_table else 0) | (
        0x40 if interlace else 0
    )
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_table:
        out += pal
    out.append(min_code)
    data = _gif_lzw_encode(min_code, indices)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def _gif_want(w, h, palette, indices):
    tot = [0, 0, 0]
    for i in indices:
        for c in range(3):
            tot[c] += palette[i][c]
    n = w * h * 255.0
    return [float(w), float(h), tot[0] / n, tot[1] / n, tot[2] / n]


def test_image_decoder_gif_golden():
    from osmexpress_spark.operators.multimodal import image_decoder

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    idx = [0, 1, 2, 3, 3, 2, 1, 0, 0, 1, 2, 3]
    gif = _make_gif(4, 3, palette, idx, extension=True)
    got = image_decoder(gif)
    want = _gif_want(4, 3, palette, idx)
    assert got[:2] == want[:2]
    assert all(abs(a - b) < 1e-12 for a, b in zip(got[2:], want[2:]))


def test_image_decoder_gif_variants():
    from osmexpress_spark.operators.multimodal import image_decoder

    palette = [(i, 255 - i, (i * 7) % 256) for i in range(16)]
    idx = [(i * 11) % 16 for i in range(64)]
    want = _gif_want(8, 8, palette, idx)
    for kwargs in (
        {"interlace": True},             # row permutation: means unchanged
        {"local_table": True},           # LCT instead of GCT
        {"version": b"GIF87a"},          # legacy header
    ):
        got = image_decoder(_make_gif(8, 8, palette, idx, **kwargs))
        assert all(abs(a - b) < 1e-12 for a, b in zip(got, want)), kwargs


def test_image_decoder_gif_lzw_growth_property():
    """Random images large enough to force dictionary growth and width
    bumps through several sizes; encoder is the independent inverse."""
    import random

    from osmexpress_spark.operators.multimodal import image_decoder

    for seed in range(6):
        rng = random.Random(seed)
        n_colors = rng.choice([4, 8, 16, 64])
        palette = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(n_colors)
        ]
        w, h = rng.randrange(3, 40), rng.randrange(3, 40)
        idx = [rng.randrange(n_colors) for _ in range(w * h)]
        got = image_decoder(_make_gif(w, h, palette, idx))
        want = _gif_want(w, h, palette, idx)
        assert all(abs(a - b) < 1e-12 for a, b in zip(got, want)), seed


def test_image_decoder_gif_failure_shapes():
    import pytest

    from osmexpress_spark.operators.multimodal import image_decoder

    palette = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (0, 0, 0)]
    idx = [0, 1, 2, 3]
    good = _make_gif(2, 2, palette, idx)
    with pytest.raises(ValueError, match="truncated|no image"):
        image_decoder(good[:20])
    with pytest.raises(ValueError, match="trailer|no image"):
        image_decoder(good[:13] + good[13:13 + 12] + b"\x3b")
    # pixel data short of width*height: claim a taller image
    import struct

    tall = bytearray(good)
    struct.pack_into("<H", tall, 8, 50)  # screen height
    # image descriptor height field sits after 0x2c marker
    m = good.index(b"\x2c")
    struct.pack_into("<H", tall, m + 7, 50)
    with pytest.raises(ValueError, match="short of"):
        image_decoder(bytes(tall))
    # lossy WebP stays honestly stubbed (VP8L decodes now)
    with pytest.raises(NotImplementedError):
        image_decoder(
            b"RIFF" + (16).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4
        )


def test_extract_features_gif_distributed(spark):
    import random

    rng = random.Random(42)
    rows, wants = [], {}
    for i in range(12):
        n = rng.choice([4, 16])
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(n)
        ]
        w, h = rng.randrange(2, 20), rng.randrange(2, 20)
        idx = [rng.randrange(n) for _ in range(w * h)]
        rows.append(
            (i, bytes(_make_gif(w, h, pal, idx, interlace=bool(i % 2))),
             ("image/gif", w * h))
        )
        wants[i] = _gif_want(w, h, pal, idx)
    df = spark.createDataFrame(
        rows, "item_id long, payload binary, meta struct<mime:string,n_bytes:int>"
    )
    feats = multimodal.extract_features(
        df, decoder=multimodal.image_decoder
    ).collect()
    assert all(r.decode_ok for r in feats) and len(feats) == 12
    for r in feats:
        assert all(
            abs(a - b) < 1e-9 for a, b in zip(r.feat, wants[r.item_id])
        )


# --- TIFF: independent encoder ----------------------------------------------


def _make_tiff(w, h, photo, samples, endian="<", rows_per_strip=None,
               colormap=None, compression=1):
    """Independent baseline-TIFF writer: header, strips, then one IFD
    with values > 4 bytes placed after it."""
    import struct

    spp = len(samples[0][0]) if photo == 2 else 1
    if photo in (0, 1, 3):
        flat = bytes(px for row in samples for px in row)
    else:
        flat = bytes(c for row in samples for px in row for c in px)
    rps = rows_per_strip or h
    row_bytes = w * spp
    strips = [
        flat[r * row_bytes : min(r + rps, h) * row_bytes]
        for r in range(0, h, rps)
    ]
    magic = b"II*\x00" if endian == "<" else b"MM\x00*"
    # layout: 8-byte header | strip data | IFD | overflow values
    data_off = 8
    offsets, counts = [], []
    body = b""
    for s in strips:
        offsets.append(data_off + len(body))
        counts.append(len(s))
        body += s
    ifd_off = data_off + len(body)

    entries = []
    overflow = b""

    def entry(tag, typ, values):
        nonlocal overflow
        fmt = {3: "H", 4: "I"}[typ]
        sz = {3: 2, 4: 4}[typ] * len(values)
        if sz <= 4:
            raw = struct.pack(endian + fmt * len(values), *values)
            raw += b"\x00" * (4 - sz)
            entries.append((tag, typ, len(values), raw))
        else:
            entries.append((tag, typ, len(values), None, values, fmt))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [compression])
    entry(262, 3, [photo])
    entry(273, 4, offsets)
    entry(277, 3, [spp])
    entry(278, 4, [rps])
    entry(279, 4, counts)
    if colormap is not None:
        entry(320, 3, colormap)

    entries.sort(key=lambda t: t[0])
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    over_off = ifd_off + ifd_size
    ifd = struct.pack(endian + "H", n)
    for ent in entries:
        if ent[3] is not None:
            tag, typ, cnt, raw = ent
            ifd += struct.pack(endian + "HHI", tag, typ, cnt) + raw
        else:
            tag, typ, cnt, _, values, fmt = ent
            ifd += struct.pack(endian + "HHII", tag, typ, cnt,
                               over_off + len(overflow))
            overflow += struct.pack(endian + fmt * cnt, *values)
    ifd += struct.pack(endian + "I", 0)
    return (magic + struct.pack(endian + "I", ifd_off) + body + ifd
            + overflow)


def test_image_decoder_tiff_rgb_both_endians_multistrip():
    rgb = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)],
           [(1, 2, 3), (4, 5, 6)]]
    want_r = sum(px[0] for row in rgb for px in row) / (6 * 255.0)
    for endian in ("<", ">"):
        for rps in (None, 1, 2):
            got = multimodal.image_decoder(
                _make_tiff(2, 3, 2, rgb, endian=endian, rows_per_strip=rps)
            )
            assert got[:2] == [2.0, 3.0]
            assert abs(got[2] - want_r) < 1e-12, (endian, rps)


def test_image_decoder_tiff_gray_palette_rgba():
    gray = [[0, 100], [200, 255]]
    got = multimodal.image_decoder(_make_tiff(2, 2, 1, gray))
    m = (0 + 100 + 200 + 255) / (4 * 255.0)
    assert got[2:] == [m, m, m]
    # MinIsWhite inverts
    got0 = multimodal.image_decoder(_make_tiff(2, 2, 0, gray))
    m0 = sum(255 - v for r in gray for v in r) / (4 * 255.0)
    assert got0[2:] == [m0, m0, m0]
    # palette: 16-bit colormap, scaled /65535
    cmap = ([0] * 256, [0] * 256, [0] * 256)
    cmap[0][5], cmap[1][5], cmap[2][5] = 65535, 32768, 0
    cmap[0][9], cmap[1][9], cmap[2][9] = 256, 512, 1024
    pal = [[5, 9], [5, 5]]
    got3 = multimodal.image_decoder(
        _make_tiff(2, 2, 3, pal, colormap=cmap[0] + cmap[1] + cmap[2])
    )
    wr = (3 * 65535 + 256) / (4 * 65535.0)
    assert abs(got3[2] - wr) < 1e-12
    # RGBA: alpha ignored
    rgba = [[(10, 20, 30, 0), (40, 50, 60, 255)]]
    got4 = multimodal.image_decoder(_make_tiff(2, 1, 2, rgba))
    assert abs(got4[2] - (10 + 40) / (2 * 255.0)) < 1e-12


def test_image_decoder_tiff_failure_and_stub_shapes():
    import pytest

    rgb = [[(1, 2, 3)]]
    good = _make_tiff(1, 1, 2, rgb)
    # old-style JPEG (6) stays a stub; new-style (7) is implemented and
    # covered in test_tiff_extended.py
    with pytest.raises(NotImplementedError, match="compression"):
        multimodal.image_decoder(_make_tiff(1, 1, 2, rgb, compression=6))
    with pytest.raises(ValueError):
        multimodal.image_decoder(good[:14])  # truncated IFD
    with pytest.raises(ValueError):
        multimodal.image_decoder(b"II*\x00")  # no IFD offset
    # pixel data short: claim a taller image via a forged IFD
    tall = _make_tiff(1, 5, 2, rgb)
    # (encoder writes only 1 row of strip data when samples has 1 row)
    with pytest.raises(ValueError, match="short of|out of range"):
        multimodal.image_decoder(tall)


def test_image_decoder_tiff_packbits():
    """PackBits strips: encode with an independent packer (greedy runs
    of >= 3 as repeats, else literals) and require exact means."""

    def packbits_encode(data):
        out = bytearray()
        i = 0
        while i < len(data):
            run = 1
            while (i + run < len(data) and run < 128
                   and data[i + run] == data[i]):
                run += 1
            if run >= 3:
                out += bytes([257 - run, data[i]])
                i += run
                continue
            lit_start = i
            i += run
            while i < len(data) and (i - lit_start) < 128:
                nxt = 1
                while (i + nxt < len(data) and nxt < 3
                       and data[i + nxt] == data[i]):
                    nxt += 1
                if nxt >= 3:
                    break
                i += 1
            lits = data[lit_start:i]
            out += bytes([len(lits) - 1]) + lits
        return bytes(out)

    import struct

    rgb = [[(200, 200, 200), (200, 200, 200)],
           [(200, 200, 200), (1, 2, 3)],
           [(9, 9, 9), (9, 9, 9)]]
    plain = _make_tiff(2, 3, 2, rgb, rows_per_strip=2)
    # rebuild with PackBits: reuse the writer, then substitute strips
    # by hand — simplest is to re-encode via the writer's own layout:
    # strips of 2 rows -> encode each strip independently
    flat = bytes(c for row in rgb for px in row for c in px)
    strips = [flat[:12], flat[12:]]
    enc = [packbits_encode(s) for s in strips]
    magic = b"II*\x00"
    body = b"".join(enc)
    offsets = [8, 8 + len(enc[0])]
    counts = [len(e) for e in enc]
    ifd_off = 8 + len(body)
    entries = [
        (256, 4, [2]), (257, 4, [3]), (258, 3, [8, 8, 8]),
        (259, 3, [32773]), (262, 3, [2]), (273, 4, offsets),
        (277, 3, [3]), (278, 4, [2]), (279, 4, counts),
    ]
    overflow = b""
    ifd = struct.pack("<H", len(entries))
    over_off = ifd_off + 2 + 12 * len(entries) + 4
    for tag, typ, values in entries:
        fmt = {3: "H", 4: "I"}[typ]
        sz = {3: 2, 4: 4}[typ] * len(values)
        if sz <= 4:
            raw = struct.pack("<" + fmt * len(values), *values)
            ifd += struct.pack("<HHI", tag, typ, len(values)) + raw + b"\x00" * (4 - sz)
        else:
            ifd += struct.pack("<HHII", tag, typ, len(values), over_off + len(overflow))
            overflow += struct.pack("<" + fmt * len(values), *values)
    ifd += struct.pack("<I", 0)
    packed = magic + struct.pack("<I", ifd_off) + body + ifd + overflow

    want = multimodal.image_decoder(plain)
    got = multimodal.image_decoder(packed)
    assert got == want
    # truncated repeat run
    import pytest

    with pytest.raises(ValueError):
        from osmexpress_spark.operators.multimodal import _packbits

        _packbits(bytes([255]))


def _tiff_lzw_encode(data):
    """Independent TIFF-LZW encoder: MSB-first packing, Clear/EOI,
    EARLY width change (bump one code before the table fills)."""
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits = [(CLEAR, width)]
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        out_bits.append((table[prev], width))
        table[cur] = next_code
        next_code += 1
        # the encoder runs one table entry AHEAD of the decoder, so its
        # bump lands at 2^w exactly when the decoder's early-change
        # bump lands at 2^w - 1 — both after the same code position
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == 4094:  # 12-bit table nearly full: spec CLEAR
            out_bits.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([byte])
    if prev:
        out_bits.append((table[prev], width))
    out_bits.append((EOI, width))
    buf = bytearray()
    acc = nbits = 0
    for code, w in out_bits:
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            buf.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        buf.append((acc << (8 - nbits)) & 0xFF)
    return bytes(buf)


def _retiff_compressed(w, h, rgb, comp_code, strip_encoder, rps=2,
                       predictor=1):
    """Rebuild a chunky RGB TIFF with per-strip compressed data."""
    import struct

    spp = 3
    flat = bytearray(c for row in rgb for px in row for c in px)
    if predictor == 2:
        row_bytes = w * spp
        for r0 in range(0, len(flat), row_bytes):
            for p in range(r0 + row_bytes - 1, r0 + spp - 1, -1):
                flat[p] = (flat[p] - flat[p - spp]) & 0xFF
    row_bytes = w * spp
    strips = [bytes(flat[r * row_bytes:min(r + rps, h) * row_bytes])
              for r in range(0, h, rps)]
    enc = [strip_encoder(s) for s in strips]
    body = b"".join(enc)
    offsets, counts, off = [], [], 8
    for e in enc:
        offsets.append(off)
        counts.append(len(e))
        off += len(e)
    ifd_off = 8 + len(body)
    entries = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]),
        (259, 3, [comp_code]), (262, 3, [2]), (273, 4, offsets),
        (277, 3, [3]), (278, 4, [rps]), (279, 4, counts),
        (317, 3, [predictor]),
    ]
    overflow = b""
    ifd = struct.pack("<H", len(entries))
    over_off = ifd_off + 2 + 12 * len(entries) + 4
    for tag, typ, values in entries:
        fmt = {3: "H", 4: "I"}[typ]
        sz = {3: 2, 4: 4}[typ] * len(values)
        if sz <= 4:
            raw = struct.pack("<" + fmt * len(values), *values)
            ifd += struct.pack("<HHI", tag, typ, len(values)) + raw + b"\x00" * (4 - sz)
        else:
            ifd += struct.pack("<HHII", tag, typ, len(values),
                               over_off + len(overflow))
            overflow += struct.pack("<" + fmt * len(values), *values)
    ifd += struct.pack("<I", 0)
    return b"II*\x00" + struct.pack("<I", ifd_off) + body + ifd + overflow


def test_image_decoder_tiff_lzw_and_predictor():
    import random

    rng = random.Random(13)
    for trial in range(4):
        w, h = rng.randrange(2, 30), rng.randrange(2, 30)
        rgb = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
                for _ in range(w)] for _ in range(h)]
        want = multimodal.image_decoder(_make_tiff(w, h, 2, rgb))
        for predictor in (1, 2):
            got = multimodal.image_decoder(_retiff_compressed(
                w, h, rgb, 5, _tiff_lzw_encode,
                rps=rng.choice([1, 3, h]), predictor=predictor,
            ))
            assert got == want, (trial, predictor)


def test_image_decoder_tiff_lzw_wide_forces_width_growth():
    """An image long enough to push the LZW table past 511 and 1023
    entries exercises both early-change boundaries."""
    import random

    rng = random.Random(29)
    w, h = 64, 48  # 9216 bytes -> the table crosses 511/1023/2047 AND
    # the 4094 full-table CLEAR, so every width and the mid-stream
    # reset are all exercised
    rgb = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(w)] for _ in range(h)]
    want = multimodal.image_decoder(_make_tiff(w, h, 2, rgb))
    got = multimodal.image_decoder(
        _retiff_compressed(w, h, rgb, 5, _tiff_lzw_encode, rps=h)
    )
    assert got == want
    # truncated stream (no EOI) raises
    import pytest

    full = _tiff_lzw_encode(bytes(range(100)))
    from osmexpress_spark.operators.multimodal import _tiff_lzw

    with pytest.raises(ValueError, match="truncated"):
        _tiff_lzw(full[:10])


def test_image_decoder_tiff_deflate():
    import random
    import zlib

    import pytest

    rng = random.Random(31)
    w, h = rng.randrange(2, 30), rng.randrange(2, 30)
    rgb = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(w)] for _ in range(h)]
    want = multimodal.image_decoder(_make_tiff(w, h, 2, rgb))
    for code in (8, 32946):
        for predictor in (1, 2):
            got = multimodal.image_decoder(_retiff_compressed(
                w, h, rgb, code, zlib.compress, rps=3,
                predictor=predictor,
            ))
            assert got == want, (code, predictor)
    # corrupt stream raises ValueError, not a zlib traceback
    bad = _retiff_compressed(w, h, rgb, 8, lambda s: b"\x00" * 8, rps=h)
    with pytest.raises(ValueError, match="deflate"):
        multimodal.image_decoder(bad)


def test_image_decoder_tiff_strip_tag_length_mismatch():
    """ADVICE r06: zip(StripOffsets, StripByteCounts) silently
    truncated mismatched tag lengths; the decoder must instead raise a
    specific mismatch error. Forge the mismatch by shrinking the
    StripByteCounts entry's count in an otherwise valid 3-strip IFD."""
    import struct

    import pytest

    rgb = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)],
           [(1, 2, 3), (4, 5, 6)]]
    payload = bytearray(_make_tiff(2, 3, 2, rgb, rows_per_strip=1))
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n_entries,) = struct.unpack_from("<H", payload, ifd_off)
    patched = False
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", payload, off)
        if tag == 279:
            assert cnt == 3
            struct.pack_into("<I", payload, off + 4, cnt - 1)
            patched = True
    assert patched
    with pytest.raises(ValueError, match="length mismatch"):
        multimodal.image_decoder(bytes(payload))


def test_wav_segments_golden():
    """Frame-energy VAD vs a hand model: 8 kHz mono, 20 ms frames =
    160 samples. Layout: 160 silence, 320 loud, 160 silence, 160 loud
    -> frames [quiet, loud, loud, quiet, loud]: 5 frames, 3 active,
    2 segments, longest 2, leading silence 1."""
    loud, quiet = 20000, 100
    pcm = ([quiet] * 160 + [loud] * 320 + [quiet] * 160 + [loud] * 160)
    got = multimodal.wav_segments(_wav(pcm), frame_ms=20)
    assert got == [5.0, 3.0, 2.0, 2.0, 1.0]
    # all-silence clip: zero segments, leading silence = n_frames
    silent = multimodal.wav_segments(_wav([quiet] * 480), frame_ms=20)
    assert silent == [3.0, 0.0, 0.0, 0.0, 3.0]
    # threshold boundary is exact: mean exactly AT threshold is quiet
    # (strict >), one sample above flips the frame active
    thr = 50 * 32768 // 1000  # 1638.4 -> 1638 floor
    at = multimodal.wav_segments(_wav([1638] * 160), frame_ms=20)
    assert at[1] == 0.0  # 1000*1638*160 == 50*32768*160? 1638000<1638400
    above = multimodal.wav_segments(_wav([1639] * 160), frame_ms=20)
    assert above[1] == 0.0 or above[1] == 1.0  # computed below exactly
    # exact cross-multiplication check
    assert (1000 * 1639 * 160 > 50 * 32768 * 160) == (above[1] == 1.0)
    _ = thr


def test_wav_segments_failure_shapes_and_distributed(spark):
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.wav_segments(b"OggS-compressed")
    with pytest.raises(ValueError):
        multimodal.wav_segments(_wav([1] * 500)[:-7])
    with pytest.raises(TypeError):  # config bug must fail loudly
        multimodal.wav_segments(_wav([1] * 10), frame_ms=0)
    # the extract_features seam: good + stub + corrupt rows in one frame
    rows = [
        (1, _wav([20000] * 480)),
        (2, b"ID3mp3bytes"),
        (3, _wav([1] * 500)[:-7]),
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    out = {
        r["item_id"]: r
        for r in multimodal.extract_features(
            df, decoder=multimodal.wav_segments, modality="audio"
        ).collect()
    }
    assert out[1]["decode_ok"] and out[1]["feat"][1] == 3.0
    assert not out[2]["decode_ok"] and not out[3]["decode_ok"]


# --- compressed-WAV codecs: G.711 mu/A-law + IMA ADPCM ----------------------
def _wavc(tag, nch, rate, balign, bps, data, fact=None):
    return multimodal._wav_container(tag, nch, rate, balign, bps, data, fact)


def test_g711_tables_match_audioop():
    """All 512 expand-table entries vs the stdlib reference (audioop
    carries the classic G.711 tables; removed in 3.13, hence the
    importorskip)."""
    import struct

    import pytest

    audioop = pytest.importorskip("audioop")
    for code in range(256):
        (ref,) = struct.unpack("<h", audioop.ulaw2lin(bytes([code]), 2))
        assert multimodal._g711_ulaw(code) == ref
        (ref,) = struct.unpack("<h", audioop.alaw2lin(bytes([code]), 2))
        assert multimodal._g711_alaw(code) == ref


def test_ima_recurrence_matches_audioop():
    """The nibble recurrence (step table, index table, both clamps)
    state-threaded against audioop.adpcm2lin over a long random
    stream — audioop packs the high nibble first, a container-layout
    difference only."""
    import random
    import struct

    import pytest

    audioop = pytest.importorskip("audioop")
    rnd = random.Random(20260815)
    data = bytes(rnd.randrange(256) for _ in range(4096))
    out, _ = audioop.adpcm2lin(data, 2, None)
    ref = struct.unpack(f"<{len(out) // 2}h", out)
    pred, idx, mine = 0, 0, []
    for byte in data:
        for nib in (byte >> 4, byte & 0x0F):
            pred, idx = multimodal._ima_nibble(nib, pred, idx)
            mine.append(pred)
    assert tuple(mine) == ref


def test_wav_decoder_g711_golden():
    # mu-law codes 0x00 / 0x7f / 0x80 expand to -32124 / 0 / +32124
    feats = multimodal.wav_decoder(
        _wavc(7, 1, 8000, 1, 8, bytes([0x00, 0x7F, 0x80]))
    )
    assert feats[:3] == [1.0, 8000.0, 3.0]
    assert feats[3] == (32124 * 2) / (3 * 32768)
    assert feats[4] == 32124 / 32768
    # A-law stereo: codes 0x55/0xd5/0x2a/0xaa -> -8, 8, -32256, 32256
    feats = multimodal.wav_decoder(
        _wavc(6, 2, 16000, 2, 8, bytes([0x55, 0xD5, 0x2A, 0xAA]))
    )
    assert feats[:3] == [2.0, 16000.0, 2.0]
    assert feats[3] == (8 + 8 + 32256 + 32256) / (4 * 32768)
    assert feats[4] == 32256 / 32768


def test_wav_decoder_ima_golden_and_fact_trim():
    import struct

    hdr = struct.pack("<hBB", 1000, 20, 0)
    body = bytes([0x21, 0x43, 0x65, 0x87])  # nibbles 1..8, low first
    pred, idx, vals = 1000, 20, [1000]
    for nib in range(1, 9):
        pred, idx = multimodal._ima_nibble(nib, pred, idx)
        vals.append(pred)
    feats = multimodal.wav_decoder(
        _wavc(0x11, 1, 8000, 8, 4, hdr + body, fact=9)
    )
    assert feats[:3] == [1.0, 8000.0, 9.0]
    assert feats[3] == sum(map(abs, vals)) / (9 * 32768)
    assert feats[4] == max(map(abs, vals)) / 32768
    # a fact chunk short of the block trims trailing frames EXACTLY
    # (stats over the kept frames only, not the whole block)
    feats = multimodal.wav_decoder(
        _wavc(0x11, 1, 8000, 8, 4, hdr + body, fact=5)
    )
    v5 = vals[:5]
    assert feats[2] == 5.0
    assert feats[3] == sum(map(abs, v5)) / (5 * 32768)
    assert feats[4] == max(map(abs, v5)) / 32768


def test_wav_decoder_ima_stereo_interleave():
    """Stereo blocks interleave 4-byte words per channel; building a
    stereo stream from two independent mono streams must yield the
    combined mono statistics (catches any word-order mistake)."""
    import random
    import struct

    import pytest

    rnd = random.Random(7)
    mono = [bytes(rnd.randrange(256) for _ in range(8)) for _ in range(2)]
    hdrs = [struct.pack("<hBB", 500 * (c + 1), 10 * (c + 1), 0)
            for c in range(2)]
    mono_feats = [
        multimodal.wav_decoder(
            _wavc(0x11, 1, 8000, 12, 4, hdrs[c] + mono[c], fact=17)
        )
        for c in range(2)
    ]
    inter = b"".join(
        mono[c][g * 4 : g * 4 + 4] for g in range(2) for c in range(2)
    )
    st = multimodal.wav_decoder(
        _wavc(0x11, 2, 8000, 24, 4, hdrs[0] + hdrs[1] + inter, fact=17)
    )
    assert st[:3] == [2.0, 8000.0, 17.0]
    assert st[3] == pytest.approx(
        (mono_feats[0][3] + mono_feats[1][3]) / 2, rel=1e-12
    )
    assert st[4] == max(mono_feats[0][4], mono_feats[1][4])


def test_wav_decoder_codec_failure_shapes():
    import struct

    import pytest

    # GSM tag: a REAL codec the engine does not carry -> honest stub
    with pytest.raises(NotImplementedError, match="0x31"):
        multimodal.wav_decoder(_wavc(0x31, 1, 8000, 65, 0, b"\x00" * 65))
    # ADPCM step index > 88: structural damage -> ValueError
    bad = struct.pack("<hBB", 0, 200, 0) + b"\x00" * 4
    with pytest.raises(ValueError, match="step index"):
        multimodal.wav_decoder(_wavc(0x11, 1, 8000, 8, 4, bad))
    # declared chunk length past the payload end -> ValueError
    p = _wavc(7, 1, 8000, 1, 8, bytes([0x00, 0x7F]))
    with pytest.raises(ValueError):
        multimodal.wav_decoder(p[:-1])
    # zero channels -> ValueError
    with pytest.raises(ValueError, match="channels"):
        multimodal.wav_decoder(_wavc(7, 0, 8000, 1, 8, b"\x00"))


def test_g711_and_ima_through_extract_features(spark):
    df = spark.range(1, 40).withColumnRenamed("id", "doc_id")
    for synth, stub_frac in (
        (multimodal.synth_wav_g711, 13),
        (multimodal.synth_wav_ima, 17),
    ):
        feats = multimodal.extract_features(
            synth(df, "doc_id"),
            decoder=multimodal.audio_decoder,
            modality="audio",
        ).collect()
        ok = {r.item_id for r in feats if r.decode_ok}
        bad = {r.item_id for r in feats if not r.decode_ok}
        assert bad == {i for i in range(1, 40) if i % stub_frac == 0}
        assert all(
            r.feat is not None and 0.0 <= r.feat[3] <= 1.0
            for r in feats
            if r.item_id in ok
        )


def test_wav_segments_over_compressed_codecs():
    """VAD shares the codec front half: a G.711 mu-law clip segments
    directly (loud stretch = code 0x80 -> +32124, silence = 0xFF ->
    0), and the unsupported-tag stub surfaces as NotImplementedError
    rather than damage."""
    import pytest

    # 8 kHz, 20 ms frames -> 160 samples per frame; 2 loud frames
    # between silence
    codes = bytes([0xFF] * 160 + [0x80] * 320 + [0xFF] * 160)
    p = _wavc(7, 1, 8000, 1, 8, codes, fact=len(codes))
    n_frames, active, segs, longest, lead = multimodal.wav_segments(p)
    assert (n_frames, active, segs, longest, lead) == (4.0, 2.0, 1.0, 2.0, 1.0)
    with pytest.raises(NotImplementedError, match="0x31"):
        multimodal.wav_segments(_wavc(0x31, 1, 8000, 65, 0, b"\x00" * 65))


def test_synth_jpeg_lossless_decodes_exactly(spark):
    """The in-engine SOF3 writer round-trips through the full JPEG
    decoder with EXACT md5-recomputable means (lossless), and the
    stub rows surface as the honest arithmetic-JPEG branch."""
    import hashlib

    df = spark.range(1, 25).withColumnRenamed("id", "doc_id")
    blobs = multimodal.synth_jpeg_lossless(df, "doc_id")
    feats = multimodal.extract_features(
        blobs, decoder=multimodal.image_decoder, modality="image"
    ).collect()
    for r in feats:
        if r.item_id % 11 == 0:
            assert not r.decode_ok
            continue
        px = b"".join(
            hashlib.md5(f"{r.item_id}_j_{y}".encode()).digest()
            for y in range(16)
        )
        assert r.decode_ok and r.feat[:2] == [16.0, 16.0]
        assert r.feat[2] == (sum(px) / 256) / 255  # bit-exact


def test_wav_g711_fact_trims_filler():
    """A spec-conforming G.711 WAV whose data chunk carries filler past
    fact's sample count: the filler must not reach the stats (a 0x00
    filler byte would expand to mu-law -32124)."""
    p = _wavc(7, 1, 8000, 1, 8, bytes([0x7F, 0x7F, 0x00, 0x00]), fact=2)
    nch, rate, n, mean, peak = multimodal.wav_decoder(p)
    assert (n, mean, peak) == (2.0, 0.0, 0.0)


def test_jpeg_sos_header_truncation_is_valueerror():
    """A declared SOS length shorter than its own header must raise
    ValueError (not struct.error escaping the per-row contract)."""
    import pytest

    bad = bytes.fromhex("ffd8ffc3000b080010001001011100ffda000301")
    with pytest.raises(ValueError, match="SOS header"):
        multimodal._decode_jpeg(bad)
