"""Property tests for the Vorbis decode machinery (operators/
vorbis.py), each stage against an INDEPENDENT model — the mp3l3
discipline: codeword assignment vs a brute-force lowest-free-code
search, render_line vs exact Fraction arithmetic, the window vs the
Princen-Bradley identity, the inverse MDCT vs its direct (2pi/n)
definition."""

from __future__ import annotations

import math
from fractions import Fraction

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osmexpress_spark.operators import vorbis as V
from osmexpress_spark.operators.multimodal import (
    _VorbisBitReader,
    _VorbisBitWriter,
)


# --------------------------------------------------------- codewords


def _brute_force_assign(lengths: dict[int, int]) -> dict:
    """Independent model: for each entry in order, scan codewords of
    its length in ascending numeric order and take the first that
    neither prefixes nor is prefixed by an already-assigned word."""
    def conflicts(c1, l1, c2, l2):
        m = min(l1, l2)
        return (c1 >> (l1 - m)) == (c2 >> (l2 - m))

    out = {}
    for entry in sorted(lengths):
        ln = lengths[entry]
        for cand in range(1 << ln):
            if not any(conflicts(cand, ln, c, l)
                       for c, l in out.values()):
                out[entry] = (cand, ln)
                break
        else:
            raise ValueError("overspecified codebook")
    return out


def _complete_length_sets():
    """Small complete prefix trees as entry->length dicts."""
    return st.sampled_from([
        {0: 1, 1: 1},
        {0: 1, 1: 2, 2: 2},
        {0: 2, 1: 2, 2: 2, 3: 2},
        {0: 1, 1: 2, 2: 3, 3: 3},
        {0: 3, 1: 3, 2: 2, 3: 2, 4: 2},
        {0: 2, 1: 3, 2: 3, 3: 1},          # entry order != length order
        {2: 1, 5: 2, 9: 3, 11: 3},         # sparse entry numbers
    ])


@given(_complete_length_sets())
@settings(max_examples=20, deadline=None)
def test_codeword_assignment_matches_brute_force(lengths):
    assert V.assign_codewords(lengths) == _brute_force_assign(lengths)


def test_codeword_assignment_kraft_discipline():
    # complete trees pass and cover the whole code space
    words = V.assign_codewords({0: 2, 1: 2, 2: 2, 3: 2})
    assert sorted(c for c, _ in words.values()) == [0, 1, 2, 3]
    # underspecified (kraft < 1) rejected
    with pytest.raises(ValueError, match="underspecified"):
        V.assign_codewords({0: 2, 1: 2, 2: 2})
    # overspecified (kraft > 1) rejected
    with pytest.raises(ValueError, match="overspecified"):
        V.assign_codewords({0: 1, 1: 1, 2: 1})
    # the spec's single-entry special case: 1-bit codeword 0
    assert V.assign_codewords({7: 4}) == {7: (0, 1)}
    with pytest.raises(ValueError):
        V.assign_codewords({})


def test_huffman_decode_roundtrip_lsb_stream():
    lengths = {0: 1, 1: 2, 2: 3, 3: 3}
    words = V.assign_codewords(lengths)
    dec = V.HuffDecoder(lengths)
    seq = [3, 0, 1, 2, 2, 0, 3, 1, 0, 0, 2]
    bw = _VorbisBitWriter()
    for entry in seq:
        code, ln = words[entry]
        for k in range(ln - 1, -1, -1):   # root-first bit order
            bw.write((code >> k) & 1, 1)
    br = _VorbisBitReader(bw.getvalue())
    assert [dec.decode(br) for _ in seq] == seq


def test_huffman_decode_invalid_codeword():
    dec = V.HuffDecoder({0: 2, 1: 2, 2: 2, 3: 2})
    # exhaust max_len without a hit is impossible for a complete
    # 2-bit tree, so truncation is the failure mode instead
    with pytest.raises(ValueError):
        dec.decode(_VorbisBitReader(b""))


# -------------------------------------------------------- render_line


@given(
    st.integers(0, 30), st.integers(-120, 120),
    st.integers(1, 60), st.integers(-120, 120),
)
@settings(max_examples=200, deadline=None)
def test_render_line_matches_exact_rational_model(x0, y0, dx, y1):
    x1 = x0 + dx
    v = [None] * x1
    V.render_line(x0, y0, x1, y1, v)
    dy = y1 - y0
    for x in range(x0, x1):
        exact = Fraction(dy * (x - x0), dx)
        trunc = int(exact)  # Fraction.__int__ truncates toward zero
        assert v[x] == y0 + trunc, (x, v[x], y0 + trunc)


def test_render_line_endpoint_and_monotone():
    v = [0] * 10
    V.render_line(0, 5, 10, 25, v)
    assert v[0] == 5
    assert all(v[i + 1] >= v[i] for i in range(9))
    v2 = [0] * 10
    V.render_line(0, 25, 10, 5, v2)
    assert v2[0] == 25
    assert all(v2[i + 1] <= v2[i] for i in range(9))


# ------------------------------------------------------------ floor1


def test_floor1_flat_curve_constant():
    tab = V.analytic_db_table()
    out = V.floor1_curve([0, 64], [40, 40], [True, True], 32, 1, tab)
    assert out == [tab[40]] * 32


def test_floor1_sloped_curve_matches_render_line():
    tab = V.analytic_db_table()
    out = V.floor1_curve([0, 64], [10, 74], [True, True], 64, 1, tab)
    v = [0] * 64
    V.render_line(0, 10, 64, 74, v)
    assert out == [tab[y] for y in v]


def test_floor1_unflagged_points_skipped_and_x_sorted():
    tab = V.analytic_db_table()
    # the middle point is unflagged -> pure two-point line; X list
    # deliberately unsorted to exercise the sort
    out = V.floor1_curve(
        [64, 0, 32], [50, 50, 200], [True, True, False], 32, 1, tab
    )
    assert out == [tab[50]] * 32


def test_floor1_multiplier_and_clamp():
    tab = V.analytic_db_table()
    out = V.floor1_curve([0, 64], [80, 80], [True, True], 8, 4, tab)
    assert out == [tab[255]] * 8  # 320 clamps to 255
    with pytest.raises(ValueError):
        V.floor1_curve([0, 64], [1, 1], [True, True], 8, 1, [0.0] * 10)


# ----------------------------------------------------- window / MDCT


@pytest.mark.parametrize("n", [8, 64, 256])
def test_vorbis_window_princen_bradley(n):
    w = V.vorbis_window(n)
    half = n // 2
    for i in range(half):
        assert abs(w[i] ** 2 + w[i + half] ** 2 - 1.0) < 1e-12
    # the fully-lapped window is a SYMMETRIC bump: ~0 at the edges,
    # 1 at the center crossing
    assert w[0] < 0.1 and w[n - 1] < 0.1
    assert all(abs(w[i] - w[n - 1 - i]) < 1e-12 for i in range(n))
    assert w[half - 1] > 0.99 and w[half] > 0.99


@pytest.mark.parametrize("n", [8, 16, 64])
def test_inverse_mdct_matches_direct_definition(n):
    import random

    rnd = random.Random(7)
    spec = [rnd.uniform(-1, 1) for _ in range(n // 2)]
    got = V.inverse_mdct(spec, n)
    for j in range(n):
        direct = sum(
            spec[k] * math.cos(
                2 * math.pi / n * (j + 0.5 + n / 4) * (k + 0.5)
            )
            for k in range(n // 2)
        )
        assert abs(got[j] - direct) < 1e-9
    with pytest.raises(ValueError):
        V.inverse_mdct(spec, 2 * n)


def test_mdct_tdac_perfect_reconstruction():
    """The lapped-transform identity end to end: forward MDCT of
    windowed blocks, inverse_mdct, OverlapAdd — the overlapped region
    reconstructs the input times n/4 (the convention's constant,
    verified numerically), which pins window + transform + overlap
    TOGETHER."""
    import random

    n, half = 16, 8
    rnd = random.Random(3)
    x = [rnd.uniform(-1, 1) for _ in range(half * 5)]
    w = V.vorbis_window(n)

    def fwd(block):
        return [
            sum(
                block[j] * w[j] * math.cos(
                    2 * math.pi / n * (j + 0.5 + n / 4) * (k + 0.5)
                )
                for j in range(n)
            )
            for k in range(half)
        ]

    ola = V.OverlapAdd(n)
    outs = []
    for b in range(4):
        block = x[b * half:(b + 2) * half]
        outs.extend(ola.step(V.inverse_mdct(fwd(block), n)))
    # outs[i] corresponds to x[half + i] (the first half-block is
    # transform latency), scaled by n/4
    for i, got in enumerate(outs):
        assert abs(got - x[half + i] * (n / 4)) < 1e-9


def test_overlap_add_state():
    ola = V.OverlapAdd(8)
    assert ola.step([1.0] * 8) == []      # first block: latency only
    out = ola.step([0.0] * 8)
    assert len(out) == 4
    with pytest.raises(ValueError):
        ola.step([0.0] * 4)
