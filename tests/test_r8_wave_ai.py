"""Independent-recomputation properties for the round-8 wave-AI keys
(seasonal Mann-Kendall, WAV header decoding)."""

from __future__ import annotations

import math
import struct
from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_seasonal_mann_kendall_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT hour(ts), date_diff('day', DATE '2024-01-01',"
        f" CAST(ts AS DATE)), count(*) FROM '{sf_dir}/events.parquet'"
        " GROUP BY 1, 2"
    ).fetchall()
    by_season: dict[int, dict[int, int]] = defaultdict(dict)
    for h, d, m in rows:
        by_season[h][d] = m
    s_total = 0
    nsum = 0
    tie_sum = 0
    for h, series in by_season.items():
        days = sorted(series)
        n = len(days)
        nsum += n * (n - 1) * (2 * n + 5)
        for t in Counter(series.values()).values():
            tie_sum += t * (t - 1) * (2 * t + 5)
        for i in range(n):
            for j in range(i + 1, n):
                a, b = series[days[i]], series[days[j]]
                s_total += (a < b) - (a > b)
    var_s = (nsum - tie_sum) / 18.0
    if s_total > 0:
        z = (s_total - 1) / math.sqrt(var_s)
    elif s_total < 0:
        z = (s_total + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    row = (
        REGISTRY["stat_seasonal_mann_kendall"].build(spark, sf_dir).collect()[0]
    )
    assert row["n_seasons"] == len(by_season)
    assert row["s_total"] == s_total
    assert abs(row["var_s"] - var_s) < 2e-3
    assert abs(row["z"] - z) < 2e-3


def test_wav_header_matches_python(spark, sf_dir):
    doc_ids = [
        r[0]
        for r in duckdb.execute(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    fmt_tail = {
        0: struct.pack("<HHI", 1, 1, 8000),
        1: struct.pack("<HHI", 1, 1, 16000),
        2: struct.pack("<HHI", 1, 2, 44100),
    }
    counts: Counter = Counter()
    for did in doc_ids:
        k = did % 3
        payload = (
            b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00" + fmt_tail[k]
        )
        # parse back via struct, exactly like a real reader would
        channels, = struct.unpack("<H", payload[22:24])
        rate, = struct.unpack("<I", payload[24:28])
        counts[(rate, channels)] += 1
    got = {
        (r["sample_rate"], r["channels"]): r
        for r in REGISTRY["multimodal_wav_header"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(counts)
    for key, n in counts.items():
        assert got[key]["n"] == n
        # planted truth always round-trips
        assert got[key]["n_rate_ok"] == n
    assert set(got) == {(8000, 1), (16000, 1), (44100, 2)}
