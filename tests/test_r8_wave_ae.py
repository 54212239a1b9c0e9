"""Independent-recomputation properties for the round-8 wave-AE keys
(magic-byte MIME sniffing, deterministic UUIDv3 minting)."""

from __future__ import annotations

import hashlib
import uuid
from collections import Counter

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

_SIGS = {
    0: (b"\x89PNG\r\n\x1a\x08"[:8], "image/png"),
    1: (b"\xff\xd8\xff\xe0", "image/jpeg"),
    2: (b"RIFF\xaa\xaa\xaa\xaaWAVE", "audio/wav"),
    3: (b"", "text/plain"),
}


def _sniff(payload: bytes) -> str:
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if payload[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    return "text/plain"


def test_mime_sniff_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    n_by_mime: Counter = Counter()
    match_by_mime: Counter = Counter()
    bytes_by_mime: Counter = Counter()
    sig_bytes = {
        0: b"\x89PNG\r\n\x1a\n",
        1: b"\xff\xd8\xff\xe0",
        2: b"RIFF\xaa\xaa\xaa\xaaWAVE",
        3: b"",
    }
    declared = {0: "image/png", 1: "image/jpeg", 2: "audio/wav", 3: "text/plain"}
    for doc_id, text in rows:
        k = doc_id % 4
        payload = sig_bytes[k] + text.encode("utf-8")
        s = _sniff(payload)
        n_by_mime[s] += 1
        match_by_mime[s] += s == declared[k]
        bytes_by_mime[s] += len(payload)
    got = {
        r["mime"]: r
        for r in REGISTRY["multimodal_mime_sniff"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(n_by_mime)
    for mime, n in n_by_mime.items():
        assert got[mime]["n"] == n
        assert got[mime]["n_match_meta"] == match_by_mime[mime]
        assert got[mime]["total_bytes"] == bytes_by_mime[mime]
    # framing is loss-free: every signed payload sniffs back to its class
    for mime in ("image/png", "image/jpeg", "audio/wav"):
        assert got[mime]["n_match_meta"] == got[mime]["n"]


def test_uuid_v3_matches_python(spark, sf_dir):
    keys = [
        r[0]
        for r in duckdb.execute(
            f"SELECT o_orderkey FROM '{sf_dir}/orders.parquet'"
            " WHERE o_orderkey < 300"
        ).fetchall()
    ]
    got = {
        r["o_orderkey"]: r["uuid_v3"]
        for r in REGISTRY["fn_uuid_v3"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(keys)
    for k in keys:
        h = hashlib.md5(f"etlcnc:order:{k}".encode()).hexdigest()
        expected = (
            f"{h[0:8]}-{h[8:12]}-3{h[13:16]}-"
            f"{'89ab'[int(h[16], 16) % 4]}{h[17:20]}-{h[20:32]}"
        )
        assert got[k] == expected
        # structurally a valid RFC-4122 UUID with version 3
        u = uuid.UUID(got[k])
        assert u.version == 3
        assert u.variant == uuid.RFC_4122
    # determinism: no collisions across distinct keys
    assert len(set(got.values())) == len(keys)
