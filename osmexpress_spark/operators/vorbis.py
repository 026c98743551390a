"""Vorbis I decode machinery — the synthesis-side pieces between the
setup-header parse (multimodal.vorbis_setup_census, round 11) and PCM.

Spec: the public Vorbis I specification (xiph.org).  Everything here
is CLOSED-FORM math or exact integer algorithms from the spec and is
property-pinned against independent models in the tests (the mp3l3
discipline):

* canonical Huffman codeword assignment (§3.2.1: each used entry, in
  entry order, takes the LOWEST-valued unused codeword of its length)
  with Kraft-completeness + prefix-freeness validation — codebooks
  that are over- or underspecified are rejected exactly as libvorbis
  rejects them (single-entry books excepted, per spec);
* bit-at-a-time Huffman decode over the LSB-first packet stream;
* the spec's integer Bresenham `render_line` (§9.2.6) — floor curves
  are EXACT integer math, pinned against a Fraction-based model;
* floor1 curve synthesis (§7.2.4) over a two-point (partitions=0)
  or general sorted X list, with the 256-entry
  `floor1_inverse_dB_table` as an INJECTED data parameter — the
  published table is data unverifiable in-container, the exact
  boundary the mp3 synthesis window sits on (operators/mp3l3.py);
* the Vorbis window (§4.3.1, sin(pi/2 * sin^2)) and the inverse MDCT
  — the SAME transform family as mp3's (the (2pi/n)(j+1/2+n/4)(k+1/2)
  argument reduces to mp3l3._imdct's (pi/2n)(2j+1+n/2)(2k+1)), so the
  already-pinned closed-form IMDCT is reused directly;
* equal-blocksize overlap-add state.

The remaining gap to Vorbis PCM is residue decode (§8) + the channel
coupling inverse — bitstream plumbing over these primitives — and the
published dB table drop.
"""

from __future__ import annotations

import math

from .mp3l3 import _imdct


# ------------------------------------------------------------ codewords


def assign_codewords(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Canonical Vorbis codeword assignment: `lengths` maps used
    entry -> codeword length (1..32); returns entry -> (code, len)
    where `code` is the big-endian codeword value.  Entries are
    processed in ascending entry order and each takes the lowest
    available codeword of its length (spec §3.2.1).

    Raises ValueError for an OVERspecified tree (an entry has no free
    codeword) or an UNDERspecified one (free leaves remain), except
    the spec's single-used-entry case, which gets the 1-bit codeword
    0."""
    used = sorted(lengths)
    if not used:
        raise ValueError("codebook with no used entries")
    if len(used) == 1:
        return {used[0]: (0, 1)}
    # free prefix pool as (code, bits), kept sorted by code position
    free: list[tuple[int, int]] = [(0, 0)]
    out: dict[int, tuple[int, int]] = {}
    for entry in used:
        ln = lengths[entry]
        if not 1 <= ln <= 32:
            raise ValueError(f"codeword length {ln} out of range")
        # lowest-valued codeword of length ln = leftmost free prefix
        # with bits <= ln; free is kept ordered by tree position so
        # that is the first qualifying element
        pick = None
        for idx, (c, b) in enumerate(free):
            if b <= ln:
                pick = idx
                break
        if pick is None:
            raise ValueError("overspecified codebook")
        c, b = free.pop(pick)
        code = c << (ln - b)
        # the freed remainder of the picked subtree: at each depth on
        # the path to the leaf, the sibling (path prefix, last bit
        # flipped) becomes available
        siblings = [((code >> (ln - k)) ^ 1, k)
                    for k in range(b + 1, ln + 1)]
        free.extend(siblings)
        free.sort(key=lambda cb: (cb[0] << (32 - cb[1])))
        out[entry] = (code, ln)
    if free:
        raise ValueError("underspecified codebook")
    return out


class HuffDecoder:
    """Bit-at-a-time canonical-codeword decoder over the LSB-first
    packet reader (each read(1) is the next tree branch, root
    first)."""

    def __init__(self, lengths: dict[int, int]):
        words = assign_codewords(lengths)
        self.table = {cw: entry for entry, cw in words.items()}
        self.max_len = max(ln for _, ln in words.values())

    def decode(self, br) -> int:
        acc, ln = 0, 0
        while ln <= self.max_len:
            acc = (acc << 1) | br.read(1)
            ln += 1
            entry = self.table.get((acc, ln))
            if entry is not None:
                return entry
        raise ValueError("invalid Huffman codeword in packet")


# ------------------------------------------------------------ floor1


def render_line(x0: int, y0: int, x1: int, y1: int, v: list[int]) -> None:
    """The spec's integer line renderer (§9.2.6): writes
    y0 + trunc-toward-zero(dy*(x-x0)/adx) into v[x] for
    x in [x0, x1).  Exact integer math — no floats anywhere."""
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    base = abs(dy) // adx * (1 if dy >= 0 else -1)  # trunc toward 0
    x, y, err = x0, y0, 0
    sy = base - 1 if dy < 0 else base + 1
    ady -= abs(base) * adx
    if x0 < len(v):
        v[x0] = y
    for x in range(x0 + 1, x1):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        if x < len(v):
            v[x] = y


FLOOR1_RANGES = (256, 128, 86, 64)


def floor1_curve(
    x_list: list[int],
    final_y: list[int],
    step2_flag: list[bool],
    n: int,
    multiplier: int,
    inverse_db_table: list[float],
) -> list[float]:
    """Floor curve synthesis (§7.2.4.2): render the piecewise-integer
    line through the flagged (X, Y) points in X-sorted order over n
    bins, then map through the INJECTED 256-entry inverse-dB table.
    `final_y` are the post-step2 amplitude values (0..range-1)."""
    if len(inverse_db_table) != 256:
        raise ValueError("inverse dB table must have 256 entries")
    order = sorted(range(len(x_list)), key=lambda i: x_list[i])
    pts = [
        (x_list[i], final_y[i] * multiplier)
        for i in order
        if step2_flag[i]
    ]
    ay = [0] * n
    hx = 0
    lx, ly = 0, pts[0][1]
    for px, py in pts[1:]:
        render_line(lx, ly, px, py, ay)
        lx, ly = px, py
        hx = px
    if hx < n:
        render_line(hx, ly, n, ly, ay)  # flat tail at the last Y
    return [inverse_db_table[min(max(y, 0), 255)] for y in ay]


def analytic_db_table() -> list[float]:
    """An ANALYTICALLY-DEFINED stand-in for floor1_inverse_dB_table
    (the published table is data this container cannot verify — the
    mp3 synthesis-window boundary): table[y] = y / 255.0, exact
    closed form both engines can recompute.  Swapping in the
    published table is a one-argument data drop everywhere the table
    is injected."""
    return [y / 255.0 for y in range(256)]


# ----------------------------------------------------- window / MDCT


def vorbis_window(n: int) -> list[float]:
    """The Vorbis window (§4.3.1) for a fully-lapped block of size n:
    w(i) = sin(pi/2 * sin^2(pi/n * (i + 0.5))).  Satisfies the
    Princen-Bradley condition w^2(i) + w^2(i + n/2) = 1 exactly in
    real arithmetic (pinned numerically in tests)."""
    return [
        math.sin(math.pi / 2 * math.sin(math.pi / n * (i + 0.5)) ** 2)
        for i in range(n)
    ]


def inverse_mdct(spectrum: list[float], n: int) -> list[float]:
    """The Vorbis inverse MDCT: out[j] = sum_k X[k] *
    cos(2pi/n (j + 1/2 + n/4)(k + 1/2)) — algebraically identical to
    mp3l3._imdct's (pi/2n)(2j+1+n/2)(2k+1) argument, so the pinned
    closed-form transform is reused as-is."""
    if len(spectrum) != n // 2:
        raise ValueError("spectrum must have n/2 coefficients")
    return _imdct(spectrum, n)


class OverlapAdd:
    """Equal-blocksize lapped synthesis state: window the IMDCT
    output, overlap the saved right half of the previous block with
    the left half of the current one, return the n/2 finished
    samples (§4.3.8)."""

    def __init__(self, n: int):
        self.n = n
        self.window = vorbis_window(n)
        self.prev: list[float] | None = None

    def step(self, time_block: list[float]) -> list[float]:
        if len(time_block) != self.n:
            raise ValueError("time block size mismatch")
        w = self.window
        windowed = [time_block[i] * w[i] for i in range(self.n)]
        half = self.n // 2
        if self.prev is None:
            out: list[float] = []
        else:
            out = [self.prev[i] + windowed[i] for i in range(half)]
        self.prev = windowed[half:]
        return out
