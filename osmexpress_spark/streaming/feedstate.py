"""Replication feed state: timestamp -> sequence-number bootstrap (U5).

The reference resumes replication in two steps (`utils/osmx-update:
15-48`): if the database records a committed seqnum, download
seqnum+1..latest; if it only records a timestamp (a fresh expand from
a planet file), binary-search the replication server's state files for
the sequence containing that timestamp (`utils/server.py:27-107`,
itself derived from pyosmium). This module is that bootstrap, written
for our feed layout: a state source exposing osmosis-style state files
(``sequenceNumber=``/``timestamp=`` lines), either a local directory
(the test path) or any callable the caller wires to HTTP.

Contract of `timestamp_to_seqnum`: the greatest available sequence
whose state timestamp is strictly older than the requested timestamp
(so applying seq+1.. replays everything at-or-after it, the resume
semantics osmx-update needs); the newest sequence when the whole feed
is older; the oldest available when the whole feed is newer. Missing
state files (servers garbage-collect old ones) are skipped by probing
outward, like the reference.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timezone


@dataclass(frozen=True)
class FeedState:
    sequence: int
    timestamp: datetime


def parse_state(text: str) -> FeedState:
    """Parse an osmosis state file: ``sequenceNumber=N`` and
    ``timestamp=YYYY-MM-DDTHH\\:MM\\:SSZ`` lines (colons may be
    backslash-escaped, comments start with #)."""
    seq = ts = None
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        key, _, val = line.partition("=")
        val = val.replace("\\:", ":").strip()
        if key.strip() == "sequenceNumber":
            seq = int(val)
        elif key.strip() == "timestamp":
            ts = datetime.strptime(val, "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=timezone.utc
            )
    if seq is None or ts is None:
        raise ValueError("state file missing sequenceNumber or timestamp")
    return FeedState(seq, ts)


def seq_path(seq: int) -> str:
    """Osmosis nested layout: seq 6369237 -> '006/369/237.state.txt'."""
    s = f"{seq:09d}"
    return f"{s[0:3]}/{s[3:6]}/{s[6:9]}.state.txt"


class DirStateSource:
    """State files in a local directory — nested osmosis layout with a
    flat ``<seq>.state.txt`` fallback, and ``state.txt`` as latest."""

    def __init__(self, path: str):
        self.path = path

    def _read(self, rel: str) -> FeedState | None:
        p = os.path.join(self.path, rel)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return parse_state(f.read())

    def latest(self) -> FeedState | None:
        return self._read("state.txt")

    def state(self, seq: int) -> FeedState | None:
        return self._read(seq_path(seq)) or self._read(f"{seq}.state.txt")


def diff_path(seq: int) -> str:
    """Osmosis nested layout for the diff payload itself:
    seq 6369237 -> '006/369/237.osc.gz'."""
    s = f"{seq:09d}"
    return f"{s[0:3]}/{s[3:6]}/{s[6:9]}.osc.gz"


class HttpStateSource:
    """State files + diffs served by a replication server (the
    reference's deployment: utils/osmx-update:15-48 downloads
    ``state.txt`` and per-sequence ``.osc.gz`` from a base URL like
    https://planet.osm.org/replication/minute). Implements the same
    ``latest()``/``state(seq)`` protocol as DirStateSource, plus
    ``fetch(rel)`` for diff payloads; a 404 (garbage-collected or
    not-yet-published sequence) reads as None, everything else
    raises."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def fetch(self, rel: str) -> bytes | None:
        import urllib.error
        import urllib.request

        url = f"{self.base_url}/{rel}"
        try:
            with urllib.request.urlopen(url, timeout=self.timeout) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def _read(self, rel: str) -> FeedState | None:
        raw = self.fetch(rel)
        return None if raw is None else parse_state(raw.decode())

    def latest(self) -> FeedState | None:
        return self._read("state.txt")

    def state(self, seq: int) -> FeedState | None:
        return self._read(seq_path(seq)) or self._read(f"{seq}.state.txt")


def timestamp_to_seqnum(source, timestamp: datetime) -> int | None:
    """Binary-search the feed's state files for the resume sequence (see
    module docstring for the exact contract). `source` needs
    ``latest() -> FeedState | None`` and ``state(seq) -> FeedState |
    None``; probes are O(log latest) state reads."""
    if timestamp.tzinfo is None:
        timestamp = timestamp.replace(tzinfo=timezone.utc)
    upper = source.latest()
    if upper is None:
        return None
    if timestamp > upper.timestamp or upper.sequence <= 0:
        return upper.sequence

    # establish a lower bound strictly older than the timestamp,
    # halving toward upper when old states have been garbage-collected
    lower = None
    guess = 0
    while lower is None:
        cand = source.state(guess)
        if cand is not None and cand.timestamp >= timestamp:
            # even this one is too new — everything available is newer
            if cand.sequence == 0 or cand.sequence + 1 >= upper.sequence:
                return cand.sequence
            upper, guess = cand, 0
            continue
        if cand is not None:
            lower = cand
        else:
            nxt = (guess + upper.sequence) // 2
            if nxt <= guess:
                return upper.sequence
            guess = nxt

    # invariant: lower.timestamp < timestamp <= upper.timestamp
    while lower.sequence + 1 < upper.sequence:
        mid = (lower.sequence + upper.sequence) // 2
        split = None
        for probe in range(mid, lower.sequence, -1):
            split = source.state(probe)
            if split is not None:
                break
        if split is None:
            for probe in range(mid + 1, upper.sequence):
                split = source.state(probe)
                if split is not None:
                    break
        if split is None or split.sequence in (lower.sequence, upper.sequence):
            break
        if split.timestamp < timestamp:
            lower = split
        else:
            upper = split
    return lower.sequence


def bootstrap_seqnum(store, source) -> int | None:
    """osmx-update's resume decision: the store's committed seqnum if it
    has one, else the seqnum found from the store's timestamp metadata
    (the post-expand state), else None."""
    meta = store.metadata()
    seq = meta.get("seqnum")
    if seq:
        return int(seq)
    ts = meta.get("timestamp")
    if ts is None:
        return None
    if isinstance(ts, str):
        ts = datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    return timestamp_to_seqnum(source, ts)
