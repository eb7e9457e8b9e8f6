"""MQTT ingest bridge (reference A34, /root/reference/internal/mqtt/ —
topic→measurement subscriptions feeding the ingest buffer).

Transport-agnostic: the bridge exposes ``handle_message(topic, payload)``
and routes by subscription to a payload decoder (InfluxDB Line Protocol,
columnar MessagePack, or JSON rows), producing DataFrames written through
the hour-partitioned measurement writer. A real broker client (paho-mqtt
isn't in this environment) plugs in by calling ``handle_message`` from its
on-message callback — the import is gated so the bridge is fully testable
without a broker.

At scale the durable answer is broker → Kafka → Structured Streaming
(SURVEY §2.A34); this bridge covers the reference's direct-subscribe
deployment shape.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field


@dataclass
class MqttSubscription:
    """topic filter (MQTT wildcards + / #) → destination measurement."""

    topic: str
    db: str
    measurement: str
    payload_format: str = "line_protocol"  # line_protocol | msgpack | json

    def matches(self, topic: str) -> bool:
        pat = self.topic.replace("+", "*").replace("#", "*")
        return fnmatch.fnmatch(topic, pat)


@dataclass
class MqttIngestBridge:
    spark: object
    root: str
    subscriptions: list[MqttSubscription] = field(default_factory=list)
    stats: dict = field(default_factory=lambda: {"messages": 0, "records": 0, "errors": 0})

    def subscribe(self, sub: MqttSubscription) -> None:
        self.subscriptions.append(sub)

    def _decode(self, sub: MqttSubscription, payload: bytes):
        from pyspark.sql import functions as F  # noqa: F401

        if sub.payload_format == "line_protocol":
            from arc_spark.sources.line_protocol import parse_batch
            from arc_spark.sources.ingest import rows_to_columnar, columnar_to_dataframe

            rows = parse_batch(payload.decode("utf-8"))
            if not rows:
                return None
            return columnar_to_dataframe(self.spark, rows_to_columnar(rows))
        if sub.payload_format == "msgpack":
            from arc_spark.sources.ingest import (
                columnar_to_dataframe,
                decode_msgpack_payload,
            )

            batch = decode_msgpack_payload(payload)
            return columnar_to_dataframe(self.spark, batch)
        if sub.payload_format == "json":
            import json

            from arc_spark.sources.ingest import columnar_to_dataframe, rows_to_columnar

            data = json.loads(payload)
            rows = data if isinstance(data, list) else [data]
            recs = [
                {
                    "m": sub.measurement,
                    "t": int(r.pop("time")),
                    "tags": {k: v for k, v in r.items() if isinstance(v, str)},
                    "fields": {k: v for k, v in r.items() if not isinstance(v, str)},
                }
                for r in rows
            ]
            return columnar_to_dataframe(self.spark, rows_to_columnar(recs))
        raise ValueError(f"unknown payload_format {sub.payload_format!r}")

    def handle_message(self, topic: str, payload: bytes) -> int:
        """Route one broker message; returns records written."""
        from arc_spark.sources.writer import write_measurement

        self.stats["messages"] += 1
        written = 0
        for sub in self.subscriptions:
            if not sub.matches(topic):
                continue
            try:
                df = self._decode(sub, payload)
                if df is None:
                    continue
                n = df.count()
                write_measurement(df, self.root, sub.db, sub.measurement)
                written += n
            except Exception:
                self.stats["errors"] += 1
        self.stats["records"] += written
        return written

    def attach_paho(self, host: str, port: int = 1883, **kwargs):  # pragma: no cover
        """Connect a real paho-mqtt client (unavailable in this container —
        gated import; the message path is exercised via handle_message)."""
        try:
            import paho.mqtt.client as mqtt  # type: ignore
        except ImportError as exc:
            raise NotImplementedError(
                "paho-mqtt is not installed; drive handle_message() from "
                "your broker client, or use Kafka + Structured Streaming"
            ) from exc
        client = mqtt.Client(**kwargs)
        client.on_message = lambda _c, _u, msg: self.handle_message(
            msg.topic, msg.payload
        )
        client.connect(host, port)
        for sub in self.subscriptions:
            client.subscribe(sub.topic)
        return client
