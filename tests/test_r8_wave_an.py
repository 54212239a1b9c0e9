"""Independent-recomputation properties for the round-8 wave-AN keys
(price/volume bridge, langid confusion matrix)."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

EN_STOPWORDS_PROBE = None  # resolved lazily from the package


def test_price_volume_bridge_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT l_returnflag, CAST(l_shipdate AS DATE),"
        " CAST(l_quantity AS BIGINT),"
        " CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    d0 = min(r[1] for r in rows)
    d1 = max(r[1] for r in rows)
    half = (d1 - d0).days // 2
    cells: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for fl, d, q, rc in rows:
        p = 1 if (d - d0).days <= half else 2
        cells[(fl, p)][0] += q
        cells[(fl, p)][1] += rc
    got = {
        r["category"]: r
        for r in REGISTRY["orders_price_volume_bridge"]
        .build(spark, sf_dir)
        .collect()
    }
    cats = {fl for fl, _ in cells}
    assert set(got) == cats
    for fl in cats:
        q1, r1 = cells[(fl, 1)]
        q2, r2 = cells[(fl, 2)]
        row = got[fl]
        assert row["q1"] == q1 and row["q2"] == q2
        assert abs(row["rev1"] - r1 / 100.0) < 2e-2
        assert abs(row["rev2"] - r2 / 100.0) < 2e-2
        pe = (r2 / q2 - r1 / q1) * q2 / 100.0
        ve = (q2 - q1) * (r1 / q1) / 100.0
        assert abs(row["price_effect"] - pe) < 2e-2
        assert abs(row["volume_effect"] - ve) < 2e-2
        # the bridge identity closes exactly
        assert (
            abs(row["delta_rev"] - (row["price_effect"] + row["volume_effect"]))
            < 1e-2
        )


def test_langid_confusion_matches_python(spark, sf_dir):
    from etl_cnc_spark.llm.text import EN_STOPWORDS

    rows = duckdb.execute(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    stop = set(EN_STOPWORDS)
    tp = fp = tn = fn = 0
    for lang, text in rows:
        ws = text.split(" ")
        pred = sum(1 for w in ws if w in stop) / len(ws) >= 0.02
        is_en = lang == "en"
        tp += is_en and pred
        fp += (not is_en) and pred
        tn += (not is_en) and (not pred)
        fn += is_en and (not pred)
    row = REGISTRY["text_langid_confusion"].build(spark, sf_dir).collect()[0]
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == (tp, fp, tn, fn)
    n = tp + fp + tn + fn
    assert abs(row["accuracy"] - (tp + tn) / n) < 2e-4
    assert abs(row["precision_en"] - tp / (tp + fp)) < 2e-4
    assert abs(row["recall_en"] - tp / (tp + fn)) < 2e-4
    # the stopword heuristic must beat the majority-class baseline
    assert row["accuracy"] > max(tp + fn, fp + tn) / n - 0.5
