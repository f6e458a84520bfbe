"""Pusher websocket source adapter: protocol handshake with an
injected fake transport, and the socket→Spark bridge end-to-end
(VERDICT r2 next-#6: st05 semantics green through the real socket
source)."""

from __future__ import annotations

import base64
import json
import time

import pytest
from pyspark.sql import functions as F

from sports_betting_data_pipeline_spark.sources.pusher import (
    PusherProtocolError,
    PusherSession,
    SocketBridge,
)

SF_DIR = "/root/testdata/sf0.001"


def _established(socket_id="81.3", double_encode=False):
    data = {"socket_id": socket_id}
    return json.dumps(
        {
            "event": "pusher:connection_established",
            "data": json.dumps(data) if double_encode else data,
        }
    )


def test_pusher_handshake_subscribes_all_channels():
    sent: list[str] = []
    auth_calls: list[str] = []

    def auth(socket_id):
        auth_calls.append(socket_id)
        return [
            {"channel_name": "broadcast_markets", "events": [{"name": "t_1"}]},
            {"channel_name": "private-user-7", "events": [{"name": "wager"}]},
        ]

    frames = [
        _established("42.007"),
        json.dumps({"event": "pusher:ping", "data": {}}),
        json.dumps(
            {"channel": "broadcast_markets", "event": "t_1", "data": "QUJD"}
        ),
    ]
    sess = PusherSession(frames, sent.append, auth)
    msgs = list(sess.messages())

    # auth got the socket_id from the handshake frame
    assert auth_calls == ["42.007"]
    assert sess.socket_id == "42.007"
    # one subscribe frame per channel, broadcast and private alike
    subs = [json.loads(s) for s in sent if json.loads(s)["event"] == "pusher:subscribe"]
    assert [s["data"]["channel"] for s in subs] == [
        "broadcast_markets",
        "private-user-7",
    ]
    assert sess.subscribed == ["broadcast_markets", "private-user-7"]
    # ping answered with pong, not yielded as data
    pongs = [s for s in sent if json.loads(s)["event"] == "pusher:pong"]
    assert len(pongs) == 1
    # the data message came through with its payload intact
    assert msgs == [
        {"channel": "broadcast_markets", "event": "t_1", "payload": "QUJD"}
    ]


def test_pusher_internal_frames_are_control_not_data():
    """Real servers send pusher_internal:subscription_succeeded after
    every subscribe; those are control frames — yielding them would
    inject undecodable envelopes into the stream."""
    frames = [
        _established("9.1"),
        json.dumps(
            {
                "event": "pusher_internal:subscription_succeeded",
                "channel": "broadcast_markets",
                "data": "{}",
            }
        ),
        json.dumps(
            {"channel": "broadcast_markets", "event": "t_1", "data": "QUJD"}
        ),
    ]
    sent: list[str] = []
    sess = PusherSession(
        frames,
        sent.append,
        lambda sid: [
            {"channel_name": "broadcast_markets", "events": [{"name": "t_1"}]}
        ],
    )
    msgs = list(sess.messages())
    assert msgs == [
        {"channel": "broadcast_markets", "event": "t_1", "payload": "QUJD"}
    ]


def test_private_channel_subscribe_carries_auth_signature():
    """Private-channel subscribes include the per-channel auth
    signature from the auth seam (Pusher's private-channel contract);
    broadcast channels never send one even if the endpoint returns it
    (ADVICE r3)."""
    sent: list[str] = []

    def auth(socket_id):
        return [
            {"channel_name": "broadcast_markets", "auth": "key:ignored"},
            {"channel_name": "private-user-7", "auth": "key:sig7"},
            {"channel_name": "private-user-8"},  # endpoint gave no sig
        ]

    sess = PusherSession([_established("9.1")], sent.append, auth)
    list(sess.messages())
    subs = {
        json.loads(s)["data"]["channel"]: json.loads(s)["data"]
        for s in sent
        if json.loads(s)["event"] == "pusher:subscribe"
    }
    assert "auth" not in subs["broadcast_markets"]
    assert subs["private-user-7"]["auth"] == "key:sig7"
    assert "auth" not in subs["private-user-8"]


def test_pusher_handshake_double_encoded_data():
    """Pusher double-encodes the handshake data as JSON text."""
    sess = PusherSession(
        [_established("9.9", double_encode=True)], lambda s: None, lambda _: []
    )
    assert list(sess.messages()) == []
    assert sess.socket_id == "9.9"


def test_pusher_rejects_bad_handshake():
    frames = [json.dumps({"event": "message", "data": {}})]
    sess = PusherSession(frames, lambda s: None, lambda _: [])
    with pytest.raises(PusherProtocolError):
        list(sess.messages())


def _envelopes(rows):
    """Encode event rows as Pusher wire envelopes: JSON with a
    base64(JSON EVENTS_RAW) payload, ts as epoch-ns int."""
    out = []
    for r in rows:
        record = {
            "event_id": r["event_id"],
            "ts": r["ts_ns"],
            "user_id": r["user_id"],
            "event_type": r["event_type"],
            "value": r["value"],
            "props": r["props"],
        }
        out.append(
            {
                "channel": f"tournament_{r['user_id'] % 10}",
                "event": r["event_type"],
                "payload": base64.b64encode(json.dumps(record).encode()).decode(),
            }
        )
    return out


def test_socket_source_end_to_end_matches_batch(spark):
    """st05 through the real socket source: fixture events encoded as
    Pusher envelopes, served over TCP by the bridge, read with
    read_events_stream(source='socket'), must aggregate exactly like
    the batch table."""
    from sports_betting_data_pipeline_spark.io import load_table
    from sports_betting_data_pipeline_spark.streaming.jobs import (
        read_events_stream,
    )

    batch = load_table(spark, SF_DIR, "events")
    rows = [
        {
            "event_id": r["event_id"],
            "ts_ns": r["ts_us"] * 1000,
            "user_id": r["user_id"],
            "event_type": r["event_type"],
            "value": r["value"],
            "props": r["props"],
        }
        for r in batch.select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        ).collect()
    ]
    want = {
        (r["user_id"], r["event_id"]): r["ts_us"]
        for r in batch.select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
        ).collect()
    }

    bridge = SocketBridge(_envelopes(rows))
    query = None
    try:
        stream = read_events_stream(
            spark, SF_DIR, source="socket", host="127.0.0.1", port=bridge.port
        )
        out = stream.select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
        )
        query = (
            out.writeStream.format("memory")
            .queryName("pusher_socket_e2e")
            .outputMode("append")
            .start()
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            query.processAllAvailable()
            if spark.table("pusher_socket_e2e").count() >= len(rows):
                break
            time.sleep(0.5)
        got = {
            (r["user_id"], r["event_id"]): r["ts_us"]
            for r in spark.table("pusher_socket_e2e").collect()
        }
    finally:
        if query is not None:
            query.stop()
        bridge.close()

    assert len(got) == len(want)
    assert got == want


def test_socket_source_requires_host_port(spark):
    from sports_betting_data_pipeline_spark.streaming.jobs import (
        read_events_stream,
    )

    with pytest.raises(ValueError, match="socket source"):
        read_events_stream(spark, SF_DIR, source="socket")
