"""Progressive-JPEG decode: the progressive encoder (jpeg_ref) emits
the SAME quantized coefficients as the baseline encoder, so a correct
decoder must return identical channel means for both streams — the
strongest available ground truth without an image library.  Plus
structured images that force specific entropy paths (EOB runs, ZRL,
refinement corrections) and the error/stub shapes."""

from __future__ import annotations

import numpy as np
import pytest

from jpeg_ref import encode_jpeg, encode_jpeg_progressive
from osmexpress_spark.operators import multimodal as M


def _both(img, q=1, sub="444"):
    base = M._decode_jpeg(encode_jpeg(img, quality_q=q, subsample=sub))
    prog = M._decode_jpeg(
        encode_jpeg_progressive(img, quality_q=q, subsample=sub)
    )
    return base, prog


@pytest.mark.parametrize("shape,sub", [
    ((16, 16, 3), "444"),
    ((16, 16), "444"),
    ((24, 18, 3), "444"),
    ((20, 14, 3), "420"),
    ((37, 23, 3), "420"),
    ((8, 8, 3), "444"),
    ((13, 9), "444"),
    ((1, 1, 3), "444"),
])
@pytest.mark.parametrize("q", [1, 4, 16])
def test_progressive_matches_baseline_random(shape, sub, q):
    rng = np.random.RandomState(sum(shape) * q)
    img = rng.randint(0, 256, size=shape).astype(np.uint8)
    base, prog = _both(img, q, sub)
    assert prog == pytest.approx(base, abs=1e-12)
    assert prog[:2] == [float(shape[1]), float(shape[0])]


@pytest.mark.parametrize("kind", ["flat", "gradient", "spike", "stripes"])
def test_progressive_matches_baseline_structured(kind):
    """Structured content forces the sparse-coefficient entropy paths:
    flat -> multi-block EOB runs (eobrun > 1 across blocks), spike ->
    long zero runs (ZRL) incl. in the refinement scan, stripes ->
    single high-frequency coefficients with corrections."""
    h, w = 32, 32
    if kind == "flat":
        img = np.full((h, w, 3), 77, dtype=np.uint8)
    elif kind == "gradient":
        img = np.stack(
            [np.tile(np.arange(w) * 8 % 256, (h, 1))] * 3, axis=-1
        ).astype(np.uint8)
    elif kind == "spike":
        img = np.full((h, w, 3), 100, dtype=np.uint8)
        img[3, 5] = (255, 0, 255)
        img[19, 27] = (0, 255, 0)
    else:  # stripes: alternating columns -> one dominant AC coefficient
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, ::2] = 200
    for q in (1, 3):
        base, prog = _both(img, q)
        assert prog == pytest.approx(base, abs=1e-12), (kind, q)


def test_progressive_error_shapes():
    img = np.full((16, 16, 3), 50, dtype=np.uint8)
    stream = encode_jpeg_progressive(img)
    # truncation inside a scan
    with pytest.raises(ValueError):
        M._decode_jpeg(stream[: len(stream) // 2])
    # EOI with zero scans: SOI + SOF2 slice + EOI
    sof_end = stream.index(b"\xff\xc4")
    with pytest.raises(ValueError, match="before a scan"):
        M._decode_jpeg(stream[:sof_end] + b"\xff\xd9")


def test_progressive_scan_header_validation():
    """Tampered scan headers fail loudly: an AC scan claiming two
    components, and a DC scan with Se != 0."""
    img = np.full((8, 8), 90, dtype=np.uint8)  # gray: 1-component scans
    stream = bytearray(encode_jpeg_progressive(img))
    # find the third SOS (first AC scan) and make it a DC scan with
    # Se=5 (structurally invalid: Ss=0 requires Se=0)
    pos, hits = 0, []
    while True:
        pos = stream.find(b"\xff\xda", pos)
        if pos < 0:
            break
        hits.append(pos)
        pos += 2
    assert len(hits) == 4  # DC first, DC refine, AC first, AC refine
    ac1 = hits[2]
    # SOS payload: len(2) ns(1) [cs td/ta](2) Ss Se AhAl
    assert stream[ac1 + 5 + 2] == 1  # Ss
    broken = bytearray(stream)
    broken[ac1 + 5 + 2] = 0  # Ss=0 with Se=63 -> DC scan with Se != 0
    with pytest.raises(ValueError, match="Se != 0"):
        M._decode_jpeg(bytes(broken))
    broken2 = bytearray(stream)
    broken2[ac1 + 5] = 9  # unknown component id in AC scan
    with pytest.raises(ValueError, match="unknown component"):
        M._decode_jpeg(bytes(broken2))


def test_progressive_through_extract_features(spark):
    """The real progressive decode path through the Arrow seam."""
    img = (np.arange(16 * 16 * 3) % 251).reshape(16, 16, 3).astype(np.uint8)
    stream = encode_jpeg_progressive(img, quality_q=2)
    df = spark.createDataFrame(
        [(1, bytearray(stream)), (2, bytearray(b"\xff\xd8broken"))],
        "item_id long, payload binary",
    )
    rows = {
        r["item_id"]: r
        for r in M.extract_features(
            df, decoder=M.image_decoder, modality="image"
        ).collect()
    }
    exp = M._decode_jpeg(encode_jpeg(img, quality_q=2))
    assert rows[1]["decode_ok"]
    assert rows[1]["feat"] == pytest.approx(exp, abs=1e-12)
    assert not rows[2]["decode_ok"]


@pytest.mark.parametrize("shape,sub,ri", [
    ((16, 16, 3), "444", 1),
    ((24, 18, 3), "444", 2),
    ((20, 14, 3), "420", 3),
    ((16, 16), "444", 2),
])
def test_progressive_restart_markers(shape, sub, ri):
    """Restart intervals inside progressive scans: DC predictors and
    EOB runs reset at every RSTn in all four scan types."""
    rng = np.random.RandomState(sum(shape) + ri)
    img = rng.randint(0, 256, size=shape).astype(np.uint8)
    for q in (1, 4):
        base = M._decode_jpeg(encode_jpeg(img, quality_q=q, subsample=sub))
        prog = M._decode_jpeg(
            encode_jpeg_progressive(
                img, quality_q=q, subsample=sub, restart_interval=ri
            )
        )
        assert prog == pytest.approx(base, abs=1e-12)
