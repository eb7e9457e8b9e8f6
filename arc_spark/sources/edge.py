"""Edge sync: spoke→hub batched data transport (reference A40,
/root/reference/internal/edgesync/ — 27 files for disconnected-edge
deployments; SURVEY scopes the core as "file shipping + import endpoint").

- :class:`EdgeSpool` (spoke side): writes each ingest payload to a spool
  file with a CRC and a monotonically increasing sequence number. Works
  offline; the spool is the durability boundary (the edge analogue of the
  WAL).
- :class:`EdgeSync` (spoke side): ships spooled files through a transport
  callable — any `(name, bytes) -> bool` (HTTP POST, rsync, queue
  producer). Files are deleted only on acknowledged delivery; re-runs
  re-ship unacknowledged files, so delivery is at-least-once and the hub
  dedups (sequence numbers + compaction last-writer-wins make replays
  harmless, the same idempotence story the reference relies on).
- :class:`HubReceiver` (hub side): accepts shipped payloads into an
  :class:`arc_spark.api.IngestService`, remembering the last applied
  sequence per edge node to drop replayed files cheaply.
"""

from __future__ import annotations

import os
import struct
import zlib

_HDR = struct.Struct("<IQ")  # crc32, seq


class EdgeSpool:
    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        seqs = [int(f.split(".")[0]) for f in os.listdir(directory) if f.endswith(".spool")]
        self._seq = max(seqs) + 1 if seqs else 0

    def append(self, payload: bytes, kind: str = "msgpack") -> int:
        """Durably spool one payload; returns its sequence number."""
        seq = self._seq
        path = os.path.join(self.dir, f"{seq:012d}.{kind}.spool")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(_HDR.pack(zlib.crc32(payload) & 0xFFFFFFFF, seq))
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, path)
        self._seq += 1
        return seq

    def pending(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.dir) if f.endswith(".spool")
        )


class EdgeSync:
    def __init__(self, spool: EdgeSpool, transport):
        """transport: callable(filename, payload_bytes) -> bool (acked)."""
        self.spool = spool
        self.transport = transport
        self.stats = {"shipped": 0, "failed": 0}

    def sync(self, max_files: int | None = None) -> int:
        """Ship pending spool files in sequence order; stop on first failure
        (keeps ordering); delete only after ack. Returns files shipped."""
        shipped = 0
        for name in self.spool.pending()[:max_files]:
            path = os.path.join(self.spool.dir, name)
            with open(path, "rb") as fh:
                data = fh.read()
            crc, _seq = _HDR.unpack_from(data)
            payload = data[_HDR.size:]
            if zlib.crc32(payload) & 0xFFFFFFFF != crc:
                # corrupt spool file: quarantine, keep going
                os.rename(path, path + ".corrupt")
                continue
            if not self.transport(name, data):
                self.stats["failed"] += 1
                break
            os.remove(path)
            shipped += 1
            self.stats["shipped"] += 1
        return shipped


class HubReceiver:
    def __init__(self, ingest, db: str = "default"):
        """ingest: arc_spark.api.IngestService (or any object with
        write_msgpack / write_line_protocol)."""
        self.ingest = ingest
        self.db = db
        self._last_seq: dict[str, int] = {}

    def receive(self, node_id: str, filename: str, data: bytes) -> bool:
        """Apply one shipped spool file; True = acked (incl. replays)."""
        if len(data) < _HDR.size:
            return False
        crc, seq = _HDR.unpack_from(data)
        payload = data[_HDR.size:]
        if zlib.crc32(payload) & 0xFFFFFFFF != crc:
            return False
        if seq <= self._last_seq.get(node_id, -1):
            return True  # replayed file: ack without re-applying
        kind = filename.split(".")[-2] if filename.count(".") >= 2 else "msgpack"
        if kind == "lp":
            self.ingest.write_line_protocol(self.db, payload)
        else:
            self.ingest.write_msgpack(self.db, payload)
        self._last_seq[node_id] = seq
        return True
