"""REST ingestion source tests (P1) with injected HTTP getter — offline
replays of the reference's producer pipeline (ProducerDexcom.java:91-111)."""

from __future__ import annotations

from kafka_streams_dexcom_spark.sources.rest import envelope_to_df, fetch_egvs

PAYLOAD = {
    "unit": "mg/dL",
    "rateUnit": "mg/dL/min",
    "egvs": [
        {
            "systemTime": "2020-11-02T02:00:00",
            "displayTime": "2020-11-01T18:00:00",
            "value": 75,
            "realtimeValue": 75,
            "smoothedValue": 74,
            "status": None,
            "trend": "flat",
            "trendRate": 0.1,
        },
        {"systemTime": "2020-11-02T02:05:00", "value": 80},
    ],
}


def test_fetch_egvs_with_injected_getter(spark):
    calls = []

    def fake_get(url, headers):
        calls.append((url, headers))
        return PAYLOAD

    df = fetch_egvs(
        spark,
        access_token="tok",
        start_date="2020-11-01T00:00:00",
        end_date="2020-11-03T00:00:00",
        getter=fake_get,
    )
    rows = df.orderBy("systemTime").collect()
    assert len(rows) == 2
    # bearer header + time-range params as in ProducerDexcom.java:92-97
    url, headers = calls[0]
    assert "startDate=2020-11-01T00:00:00" in url
    assert headers["authorization"] == "Bearer tok"
    assert rows[0].value == 75 and rows[0].unit == "mg/dL"
    # partial EGV object: absent fields are null, not errors
    assert rows[1].trend is None and rows[1].value == 80


def test_envelope_to_df_multiple_pages(spark):
    df = envelope_to_df(spark, [PAYLOAD, PAYLOAD])
    assert df.count() == 4
