"""Write-ahead log for ingest durability (reference A29,
/root/reference/internal/wal/wal.go:19-100+, recovery.go, reader.go).

The reference acks a write after the raw payload is framed + fsynced, then
flushes Parquet asynchronously — decoupling ack latency from flush latency.
This module reproduces that contract for the Spark ingest path:

frame layout (little-endian):  [u32 length][i64 ts_us][u32 crc32][payload]

- ``sync`` modes: "fsync" (every append), "batch" (every N appends or
  close), "none" (OS buffering only) — mirroring the reference's
  fsync/fdatasync/async modes.
- rotation by size; replay scans segment files in order, verifies CRC,
  stops at the first torn frame (crash tail), and yields payloads.

At cluster scale this role is usually played by a durable queue (Kafka);
the WAL keeps the single-node deployment dependency-free.
"""

from __future__ import annotations

import os
import struct
import threading
import time
import zlib
from collections.abc import Iterator

_HEADER = struct.Struct("<IqI")  # length, ts_us, crc32


class Wal:
    def __init__(
        self,
        directory: str,
        max_segment_bytes: int = 64 * 1024 * 1024,
        sync: str = "fsync",
        batch_every: int = 64,
    ):
        if sync not in ("fsync", "fdatasync", "batch", "none"):
            raise ValueError(f"sync mode {sync!r}")
        # fdatasync skips the metadata (mtime/size-only) flush — the
        # reference's wal.sync_mode=fdatasync (its issue #305 made it
        # actually call fdatasync on Linux); durability for appended
        # bytes is identical because size changes force the inode write
        self._syncfn = (os.fdatasync
                        if sync == "fdatasync" and hasattr(os, "fdatasync")
                        else os.fsync)
        self.dir = directory
        self.max_segment_bytes = max_segment_bytes
        self.sync = sync
        self.batch_every = batch_every
        self._seq = 0
        self._fh = None
        self._since_sync = 0
        # group commit: appenders write buffered (under the caller's or
        # our own lock) and then wait on ONE leader's fsync covering their
        # (segment, offset) — N concurrent acks cost ~1 fsync, with the
        # same durability-before-ack contract (the reference's Go WAL
        # batches fsyncs the same way under load)
        self._io_lock = threading.RLock()
        self._sync_cv = threading.Condition()
        self._synced: tuple[int, int] = (-1, 0)  # durable ≤ (seq, offset)
        self._sync_leader = False
        os.makedirs(directory, exist_ok=True)
        existing = self._segments()
        if existing:
            self._seq = int(os.path.basename(existing[-1]).split(".")[0]) + 1

    def _segments(self) -> list[str]:
        return sorted(
            os.path.join(self.dir, f)
            for f in os.listdir(self.dir)
            if f.endswith(".wal")
        )

    def _open(self):
        if self._fh is None:
            path = os.path.join(self.dir, f"{self._seq:012d}.wal")
            self._fh = open(path, "ab")
        return self._fh

    def append(self, payload: bytes, ts_us: int | None = None) -> None:
        """Frame + write one entry; durability per the sync mode."""
        tok = self.append_nosync(payload, ts_us)
        if self.sync in ("fsync", "fdatasync"):
            self.sync_upto(tok)

    def append_nosync(self, payload: bytes,
                      ts_us: int | None = None) -> tuple[int, int]:
        """Buffered frame+write only; returns a (segment, offset) token
        for :meth:`sync_upto`. Callers that must not block on fsync while
        holding their own locks (the ingest ack path) append here inside
        the lock and group-commit outside it."""
        ts = ts_us if ts_us is not None else int(time.time() * 1_000_000)
        with self._io_lock:
            fh = self._open()
            fh.write(_HEADER.pack(
                len(payload), ts, zlib.crc32(payload) & 0xFFFFFFFF))
            fh.write(payload)
            tok = (self._seq, fh.tell())
            self._since_sync += 1
            if (self.sync == "batch"
                    and self._since_sync >= self.batch_every):
                fh.flush()
                self._syncfn(fh.fileno())
                self._mark_synced(tok)
                self._since_sync = 0
            if fh.tell() >= self.max_segment_bytes:
                self._rotate()
        return tok

    def _mark_synced(self, tok: tuple[int, int]) -> None:
        with self._sync_cv:
            if tok > self._synced:
                self._synced = tok
            self._sync_cv.notify_all()

    def sync_upto(self, tok: tuple[int, int]) -> None:
        """Block until bytes up to ``tok`` are durable. One waiter becomes
        the leader and fsyncs the CURRENT end of the segment — covering
        every append that landed before it — while the rest wait on the
        condition; a rotation (which fsyncs before closing) makes older
        segments durable by construction."""
        while True:
            with self._sync_cv:
                if self._synced >= tok:
                    return
                if self._sync_leader:
                    self._sync_cv.wait(timeout=1.0)
                    continue
                self._sync_leader = True
            try:
                with self._io_lock:
                    if self._seq > tok[0] or self._fh is None:
                        # segment rotated/closed after this token: the
                        # rotation path fsynced it
                        self._mark_synced(tok)
                        continue
                    fh = self._fh
                    fh.flush()
                    covered = (self._seq, fh.tell())
                    # dup the fd so the fsync can run OUTSIDE the io
                    # lock (appends keep flowing during the disk wait)
                    # without racing a concurrent close/rotate
                    fd = os.dup(fh.fileno())
                    self._since_sync = 0
                try:
                    self._syncfn(fd)
                finally:
                    os.close(fd)
                self._mark_synced(covered)
            finally:
                with self._sync_cv:
                    self._sync_leader = False
                    self._sync_cv.notify_all()

    def _rotate(self) -> None:
        with self._io_lock:
            if self._fh is not None:
                self._fh.flush()
                os.fsync(self._fh.fileno())
                self._fh.close()
                self._fh = None
                self._mark_synced((self._seq, 1 << 62))
            self._seq += 1

    def close(self) -> None:
        with self._io_lock:
            if self._fh is not None:
                self._fh.flush()
                os.fsync(self._fh.fileno())
                self._fh.close()
                self._fh = None
                self._mark_synced((self._seq, 1 << 62))

    def truncate(self) -> None:
        """Drop all segments (after a successful Parquet flush the log is
        no longer needed — reference rotates/deletes flushed segments)."""
        self.close()
        for seg in self._segments():
            os.remove(seg)

    def rotate(self) -> int:
        """Seal the active segment; later appends open a new one. Returns
        the new segment sequence — the cut point for :meth:`truncate_upto`.

        This is how a flush snapshot coordinates with concurrent writers
        (reference flushWorker design): rotate at snapshot time, flush, then
        truncate only segments BEFORE the cut — entries appended after the
        snapshot keep their WAL backing."""
        self._rotate()
        return self._seq

    def truncate_upto(self, seq: int) -> None:
        """Remove segments with sequence < ``seq`` (flushed to Parquet)."""
        for seg in self._segments():
            if int(os.path.basename(seg).split(".")[0]) < seq:
                os.remove(seg)

    def replay(self) -> Iterator[tuple[int, bytes]]:
        """Yield (ts_us, payload) for every intact frame across segments.
        A torn/corrupt tail frame ends replay of that segment silently —
        crash-consistent recovery semantics (reference recovery.go)."""
        for seg in self._segments():
            with open(seg, "rb") as fh:
                data = fh.read()
            pos = 0
            while pos + _HEADER.size <= len(data):
                length, ts, crc = _HEADER.unpack_from(data, pos)
                start = pos + _HEADER.size
                end = start + length
                if end > len(data):
                    break  # torn frame at crash point
                payload = data[start:end]
                if zlib.crc32(payload) & 0xFFFFFFFF != crc:
                    break  # corrupt frame: stop this segment
                yield ts, payload
                pos = end
