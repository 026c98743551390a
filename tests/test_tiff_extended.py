"""Extended-TIFF decode coverage: planar configuration 2, tiled
layout, and sub-8-bit grayscale/palette — each validated against a
direct mean over the same pixels, plus the honest-stub and
structural-error shapes."""

from __future__ import annotations

import struct

import pytest

from osmexpress_spark.operators import multimodal


def _tiff(w, h, entries, segs, endian="<"):
    """Generic TIFF writer: 8-byte header | segment data | IFD |
    overflow values. ``entries`` are (tag, typ, values) WITHOUT the
    offset/count tags; ``segs`` is (offsets_tag, counts_tag, payloads)
    so strips (273/279) and tiles (324/325) share the writer."""
    off_tag, cnt_tag, payloads = segs
    data_off = 8
    body = b""
    offsets, counts = [], []
    for s in payloads:
        offsets.append(data_off + len(body))
        counts.append(len(s))
        body += s
    all_entries = list(entries) + [
        (off_tag, 4, offsets), (cnt_tag, 4, counts)
    ]
    ifd_off = data_off + len(body)
    all_entries.sort(key=lambda t: t[0])
    n = len(all_entries)
    over_off = ifd_off + 2 + 12 * n + 4
    ifd = struct.pack(endian + "H", n)
    overflow = b""
    for tag, typ, values in all_entries:
        fmt = {3: "H", 4: "I", 7: "B"}[typ]
        sz = {3: 2, 4: 4, 7: 1}[typ] * len(values)
        if sz <= 4:
            raw = struct.pack(endian + fmt * len(values), *values)
            raw += b"\x00" * (4 - sz)
            ifd += struct.pack(endian + "HHI", tag, typ, len(values)) + raw
        else:
            ifd += struct.pack(
                endian + "HHII", tag, typ, len(values),
                over_off + len(overflow),
            )
            overflow += struct.pack(endian + fmt * len(values), *values)
    ifd += struct.pack(endian + "I", 0)
    magic = b"II*\x00" if endian == "<" else b"MM\x00*"
    return magic + struct.pack(endian + "I", ifd_off) + body + ifd + overflow


def _rgb_pixels(w, h):
    return [
        [((r * 41 + c * 13) % 256, (r * 7 + c * 29) % 256,
          (r * 17 + c * 3) % 256) for c in range(w)]
        for r in range(h)
    ]


def _means_rgb(pix):
    n = len(pix) * len(pix[0])
    return [
        sum(px[ch] for row in pix for px in row) / (n * 255.0)
        for ch in range(3)
    ]


BASE_RGB = [
    (256, 4, "W"), (257, 4, "H"), (258, 3, [8, 8, 8]), (259, 3, [1]),
    (262, 3, [2]), (277, 3, [3]),
]


def _entries(template, w, h, over=None):
    over = dict(over or {})
    out = []
    for tag, typ, v in template:
        if v == "W":
            v = [w]
        elif v == "H":
            v = [h]
        if tag in over:
            typ, v = over.pop(tag)
        out.append((tag, typ, v))
    for tag, (typ, v) in over.items():
        out.append((tag, typ, v))
    return out


def test_planar_rgb_strips_match_chunky():
    w, h = 3, 4
    pix = _rgb_pixels(w, h)
    planes = [
        bytes(px[ch] for row in pix for px in row) for ch in range(3)
    ]
    # two strips of 2 rows per plane: plane-0 strips first, per spec
    segs = []
    for pl in planes:
        segs += [pl[: 2 * w], pl[2 * w :]]
    ent = _entries(BASE_RGB, w, h, {284: (3, [2]), 278: (4, [2])})
    got = multimodal.image_decoder(_tiff(w, h, ent, (273, 279, segs)))
    assert got[:2] == [float(w), float(h)]
    assert got[2:] == pytest.approx(_means_rgb(pix), abs=1e-12)


def test_planar_predictor2_undiffs_per_plane():
    w, h = 4, 2
    pix = _rgb_pixels(w, h)
    planes = []
    for ch in range(3):
        plane = bytearray()
        for row in pix:
            vals = [px[ch] for px in row]
            diffed = [vals[0]] + [
                (vals[i] - vals[i - 1]) & 0xFF for i in range(1, w)
            ]
            plane += bytes(diffed)
        planes.append(bytes(plane))
    ent = _entries(BASE_RGB, w, h, {284: (3, [2]), 317: (3, [2])})
    got = multimodal.image_decoder(_tiff(w, h, ent, (273, 279, planes)))
    assert got[2:] == pytest.approx(_means_rgb(pix), abs=1e-12)


def test_planar_strip_count_not_multiple_raises():
    ent = _entries(BASE_RGB, 2, 1, {284: (3, [2])})
    with pytest.raises(ValueError, match="not a .*multiple"):
        multimodal.image_decoder(
            _tiff(2, 1, ent, (273, 279, [b"\x00" * 2, b"\x00" * 2]))
        )


def _tile_bytes(pix, ti, tj, tw, th, spp=3, plane=None):
    h, w = len(pix), len(pix[0])
    out = bytearray()
    for r in range(tj * th, tj * th + th):
        for c in range(ti * tw, ti * tw + tw):
            px = pix[r][c] if r < h and c < w else (0,) * max(spp, 1)
            if plane is None:
                out += bytes(px[:spp]) if spp > 1 else bytes([px[0]])
            else:
                out += bytes([px[plane]])
    return bytes(out)


def test_tiled_rgb_chunky_edge_padding_excluded():
    w, h, tw, th = 5, 3, 2, 2
    pix = _rgb_pixels(w, h)
    tiles = [
        _tile_bytes(pix, ti, tj, tw, th)
        for tj in range(2)
        for ti in range(3)
    ]
    ent = _entries(BASE_RGB, w, h, {322: (4, [tw]), 323: (4, [th])})
    got = multimodal.image_decoder(_tiff(w, h, ent, (324, 325, tiles)))
    assert got[:2] == [5.0, 3.0]
    assert got[2:] == pytest.approx(_means_rgb(pix), abs=1e-12)


def test_tiled_gray_min_is_white_inverts():
    w, h, tw, th = 3, 3, 2, 2
    gray = [[(r * 50 + c * 20) % 256 for c in range(w)] for r in range(h)]
    pix = [[(v,) for v in row] for row in gray]
    tiles = [
        _tile_bytes(pix, ti, tj, tw, th, spp=1)
        for tj in range(2)
        for ti in range(2)
    ]
    ent = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [0]), (277, 3, [1]), (322, 4, [tw]), (323, 4, [th]),
    ]
    got = multimodal.image_decoder(_tiff(w, h, ent, (324, 325, tiles)))
    m = sum(255 - v for row in gray for v in row) / (9 * 255.0)
    assert got[2:] == pytest.approx([m, m, m], abs=1e-12)


def test_tiled_planar_rgb():
    w, h, tw, th = 3, 2, 2, 2
    pix = _rgb_pixels(w, h)
    tiles = [
        _tile_bytes(pix, ti, tj, tw, th, plane=pl)
        for pl in range(3)
        for tj in range(1)
        for ti in range(2)
    ]
    ent = _entries(
        BASE_RGB, w, h, {284: (3, [2]), 322: (4, [tw]), 323: (4, [th])}
    )
    got = multimodal.image_decoder(_tiff(w, h, ent, (324, 325, tiles)))
    assert got[2:] == pytest.approx(_means_rgb(pix), abs=1e-12)


def test_tiled_tile_count_short_raises():
    ent = _entries(BASE_RGB, 5, 3, {322: (4, [2]), 323: (4, [2])})
    with pytest.raises(ValueError, match="tile count"):
        multimodal.image_decoder(
            _tiff(5, 3, ent, (324, 325, [b"\x00" * 12] * 5))
        )


def _pack_bits_rows(vals_rows, depth):
    out = bytearray()
    for vals in vals_rows:
        acc = cur = 0
        row = bytearray()
        for v in vals:
            cur = (cur << depth) | v
            acc += depth
            if acc == 8:
                row.append(cur)
                acc = cur = 0
        if acc:
            row.append(cur << (8 - acc))
        out += row
    return bytes(out)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub8_gray_min_is_black(depth):
    w, h = 5, 3
    mask = (1 << depth) - 1
    vals = [[(r * 3 + c) % (mask + 1) for c in range(w)] for r in range(h)]
    data = _pack_bits_rows(vals, depth)
    ent = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [depth]), (259, 3, [1]),
        (262, 3, [1]), (277, 3, [1]),
    ]
    got = multimodal.image_decoder(_tiff(w, h, ent, (273, 279, [data])))
    m = sum(v for row in vals for v in row) / (w * h * float(mask))
    assert got[2:] == pytest.approx([m, m, m], abs=1e-12)


def test_sub8_palette_uses_small_colormap():
    w, h, depth = 3, 2, 2
    vals = [[0, 1, 2], [3, 2, 1]]
    cmap = (
        [100, 200, 300, 400]          # red
        + [11, 22, 33, 44]            # green
        + [5, 6, 7, 8]                # blue
    )
    data = _pack_bits_rows(vals, depth)
    ent = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [depth]), (259, 3, [1]),
        (262, 3, [3]), (277, 3, [1]), (320, 3, cmap),
    ]
    got = multimodal.image_decoder(_tiff(w, h, ent, (273, 279, [data])))
    n = w * h
    reds = sum(cmap[v] for row in vals for v in row) / (n * 65535.0)
    greens = sum(cmap[4 + v] for row in vals for v in row) / (n * 65535.0)
    assert got[2] == pytest.approx(reds, abs=1e-12)
    assert got[3] == pytest.approx(greens, abs=1e-12)


def test_sub8_unsupported_combinations_stay_honest_stubs():
    base = [
        (256, 4, [2]), (257, 4, [1]), (259, 3, [1]), (277, 3, [1]),
    ]
    # sub-8 tiled
    ent = base + [
        (258, 3, [4]), (262, 3, [1]), (322, 4, [2]), (323, 4, [1]),
    ]
    with pytest.raises(NotImplementedError):
        multimodal.image_decoder(_tiff(2, 1, ent, (324, 325, [b"\x00"])))
    # sub-8 RGB
    ent = [
        (256, 4, [2]), (257, 4, [1]), (258, 3, [4, 4, 4]),
        (259, 3, [1]), (262, 3, [2]), (277, 3, [3]),
    ]
    with pytest.raises(NotImplementedError):
        multimodal.image_decoder(_tiff(2, 1, ent, (273, 279, [b"\x00" * 3])))
    # sub-8 with predictor 2
    ent = base + [(258, 3, [4]), (262, 3, [1]), (317, 3, [2])]
    with pytest.raises(NotImplementedError):
        multimodal.image_decoder(_tiff(2, 1, ent, (273, 279, [b"\x00"])))


def test_photometric_and_spp_validated_before_decode():
    ent = [
        (256, 4, [1]), (257, 4, [1]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [5]), (277, 3, [1]),
    ]
    with pytest.raises(NotImplementedError, match="photometric 5"):
        multimodal.image_decoder(_tiff(1, 1, ent, (273, 279, [b"\x00"])))
    ent = [
        (256, 4, [1]), (257, 4, [1]), (258, 3, [8, 8]), (259, 3, [1]),
        (262, 3, [2]), (277, 3, [2]),
    ]
    with pytest.raises(ValueError, match="fewer than 3"):
        multimodal.image_decoder(_tiff(1, 1, ent, (273, 279, [b"\x00\x00"])))


# --- new-style JPEG-in-TIFF (compression 7) ----------------------------------


def _rgb_array(w, h):
    import numpy as np

    return np.array(
        [[((r * 31 + c * 7) % 256, (r * 3 + c * 17) % 256,
           (r * 13 + c * 5) % 256) for c in range(w)] for r in range(h)],
        dtype=np.uint8,
    )


def _split_tables(stream):
    """Partition a JFIF stream into (tables_stream, stripped_stream):
    DQT/DHT segments move into a SOI..EOI tables stream (the JPEGTables
    tag shape), everything else stays in order."""
    pos = 2
    tables = b""
    rest = b""
    while pos < len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows to EOI
            rest += stream[pos:]
            break
        ln = int.from_bytes(stream[pos + 2 : pos + 4], "big")
        seg = stream[pos : pos + 2 + ln]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
        pos += 2 + ln
    return (b"\xff\xd8" + tables + b"\xff\xd9", b"\xff\xd8" + rest)


def test_jpeg_tiff_strips_match_direct_decode():
    from jpeg_ref import encode_jpeg

    w, h = 8, 6
    img = _rgb_array(w, h)
    strips = [encode_jpeg(img[:3]), encode_jpeg(img[3:])]
    ent = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (277, 3, [3]), (278, 4, [3]),
    ]
    got = multimodal.image_decoder(_tiff(w, h, ent, (273, 279, strips)))
    f1 = multimodal._decode_jpeg(strips[0])
    f2 = multimodal._decode_jpeg(strips[1])
    exp = [(f1[2 + ch] + f2[2 + ch]) / 2 for ch in range(3)]
    assert got[:2] == [float(w), float(h)]
    assert got[2:] == pytest.approx(exp, abs=1e-12)


def test_jpeg_tiff_tiles_and_jpegtables():
    from jpeg_ref import encode_jpeg

    w, h, tw, th = 8, 8, 4, 4
    img = _rgb_array(w, h)
    tile_streams = [
        encode_jpeg(img[tj * th : (tj + 1) * th, ti * tw : (ti + 1) * tw])
        for tj in range(2)
        for ti in range(2)
    ]
    exp = [
        sum(multimodal._decode_jpeg(t)[2 + ch] for t in tile_streams) / 4
        for ch in range(3)
    ]
    # plain tiled
    ent = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (277, 3, [3]), (322, 4, [tw]), (323, 4, [th]),
    ]
    got = multimodal.image_decoder(_tiff(w, h, ent, (324, 325, tile_streams)))
    assert got[2:] == pytest.approx(exp, abs=1e-12)
    # shared JPEGTables: strip DQT/DHT out of every tile, splice via 347
    tables, _ = _split_tables(tile_streams[0])
    stripped = [_split_tables(t)[1] for t in tile_streams]
    ent347 = ent + [(347, 7, list(tables))]
    got2 = multimodal.image_decoder(
        _tiff(w, h, ent347, (324, 325, stripped))
    )
    assert got2[2:] == pytest.approx(exp, abs=1e-12)


def test_jpeg_tiff_grayscale_strip():
    import numpy as np

    from jpeg_ref import encode_jpeg

    w, h = 8, 8
    img = np.array(
        [[(r * 11 + c * 23) % 256 for c in range(w)] for r in range(h)],
        dtype=np.uint8,
    )
    stream = encode_jpeg(img)
    ent = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8]), (259, 3, [7]),
        (262, 3, [1]), (277, 3, [1]),
    ]
    got = multimodal.image_decoder(_tiff(w, h, ent, (273, 279, [stream])))
    assert got[2:] == pytest.approx(multimodal._decode_jpeg(stream)[2:],
                                    abs=1e-12)


def test_jpeg_tiff_honest_stubs_and_errors():
    from jpeg_ref import encode_jpeg

    img = _rgb_array(6, 6)
    stream = encode_jpeg(img)
    base = [
        (256, 4, [6]), (257, 4, [6]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (277, 3, [3]),
    ]
    # padded edge tiles (6 % 4 != 0)
    ent = base + [(322, 4, [4]), (323, 4, [4])]
    with pytest.raises(NotImplementedError, match="padded edge"):
        multimodal.image_decoder(_tiff(6, 6, ent, (324, 325, [stream] * 4)))
    # planar
    ent = base + [(284, 3, [2])]
    with pytest.raises(NotImplementedError, match="planar JPEG"):
        multimodal.image_decoder(_tiff(6, 6, ent, (273, 279, [stream])))
    # strip width disagrees with tags
    ent = [
        (256, 4, [7]), (257, 4, [6]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (277, 3, [3]),
    ]
    with pytest.raises(ValueError, match="width disagrees"):
        multimodal.image_decoder(_tiff(7, 6, ent, (273, 279, [stream])))
    # strips cover fewer rows than ImageLength
    ent = [
        (256, 4, [6]), (257, 4, [9]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (277, 3, [3]),
    ]
    with pytest.raises(ValueError, match="cover 6 rows of 9"):
        multimodal.image_decoder(_tiff(6, 9, ent, (273, 279, [stream])))


def test_jpeg_tiff_progressive_segments():
    """Compression-7 segments delegate to _decode_jpeg, so progressive
    JPEG strips decode inside TIFF for free."""
    from jpeg_ref import encode_jpeg_progressive

    w, h = 8, 6
    img = _rgb_array(w, h)
    stream = encode_jpeg_progressive(img)
    ent = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (277, 3, [3]),
    ]
    got = multimodal.image_decoder(_tiff(w, h, ent, (273, 279, [stream])))
    assert got[2:] == pytest.approx(
        multimodal._decode_jpeg(stream)[2:], abs=1e-12
    )


def test_lossless_jpeg_inside_tiff_strips_bit_exact():
    """DNG's shape: compression-7 TIFF whose per-strip streams are
    LOSSLESS (SOF3) JPEG — the TIFF delegation must return the exact
    per-strip means (no DCT anywhere, so zero tolerance)."""
    import numpy as np

    from jpeg_ref import encode_jpeg_lossless

    w, h = 8, 6
    rng = np.random.default_rng(55)
    img = rng.integers(0, 256, (h, w, 3))
    strips = [
        encode_jpeg_lossless(img[:3], predictor=4),
        encode_jpeg_lossless(img[3:], predictor=4),
    ]
    ent = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (277, 3, [3]), (278, 4, [3]),
    ]
    got = multimodal.image_decoder(_tiff(w, h, ent, (273, 279, strips)))
    assert got[:2] == [float(w), float(h)]
    for ch in range(3):
        want = (img[:3, :, ch].mean() + img[3:, :, ch].mean()) / 2 / 255
        assert abs(got[2 + ch] - want) < 1e-12
