"""REST ingestion feeder (sources/rest_feeder.py — SURVEY §2.1 S2/S4).

Network-free: a fake transport plays the Open-Meteo API, a fake clock
drives the poll cadence. Checks the reference-parity behaviors —
60-second re-poll, baseline swap only on new observation time
(weather-producer.py:126-158) — and that emitted messages parse
through the engine's weather schema with all 12 leaves non-null.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from ibd_pipeline_spark.sources.rest_feeder import (
    CURRENT_VARS,
    RestSourceConfig,
    WeatherFeeder,
)


def _obs(t: float, temp: float = 21.5) -> dict:
    values = {v: 1.0 for v in CURRENT_VARS}
    values.update(
        temperature_2m=temp,
        relative_humidity_2m=55.0,
        wind_speed_10m=12.0,
        wind_direction_10m=180.0,
        wind_gusts_10m=19.2,
        apparent_temperature=20.1,
        weather_code=3.0,
        is_day=1.0,
        cloud_cover=40.0,
        pressure_msl=1012.3,
        surface_pressure=1009.9,
        precipitation=0.4,
        rain=0.4,
        showers=0.0,
        snowfall=0.0,
    )
    return {
        "time": t,
        "latitude": 44.4274689,
        "longitude": 26.1028208,
        "timezone": "Europe/Bucharest",
        "timezone_abbreviation": "EET",
        "values": values,
    }


class FakeAPI:
    """Observation time advances every `obs_period` seconds of fake
    time — mirroring Open-Meteo updating its 'current' block."""

    def __init__(self, clock, obs_period: float = 120.0):
        self.clock = clock
        self.obs_period = obs_period
        self.calls = 0

    def __call__(self, url: str, params: dict) -> dict:
        assert "current" in params and params["current"].startswith("temperature_2m")
        self.calls += 1
        now = self.clock()
        obs_time = (now // self.obs_period) * self.obs_period
        return _obs(obs_time, temp=21.5 + (obs_time // self.obs_period))


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self) -> float:
        return self.t

    def tick(self, dt: float = 1.0) -> None:
        self.t += dt


def _run_feeder(n_ticks: int):
    clock = FakeClock()
    api = FakeAPI(clock)
    feeder = WeatherFeeder(transport=api, cfg=RestSourceConfig())
    sent: list[str] = []
    feeder.run(sent.append, n_ticks, clock, sleep=lambda s: clock.tick(s))
    return feeder, api, sent


def test_poll_cadence_and_baseline_swap():
    feeder, api, sent = _run_feeder(130)
    # polls at t=0 (initial), 60, 120 — the reference's 60 s cadence
    assert api.calls == 3
    # observation time changed only at t=120 (obs_period=120): initial
    # poll + one swap; the t=60 poll saw the same obs time and kept
    # baselines (weather-producer.py:132,154-156)
    assert feeder.baseline_swaps == 2
    assert len(sent) == 130
    temps = [
        json.loads(m)["current_conditions"]["temperature"]["value"] for m in sent
    ]
    # baselines swapped 21.5 -> 22.5 at iteration 120; oscillation ±0.6
    assert abs(temps[0] - 21.5) < 0.7 and abs(temps[-1] - 22.5) < 0.7


def test_message_reference_shape():
    _, _, sent = _run_feeder(3)
    doc = json.loads(sent[0])
    assert set(doc) == {"timestamp", "location", "current_conditions", "metadata"}
    cc = doc["current_conditions"]
    assert cc["wind"]["unit"] == "km/h" and cc["atmosphere"]["unit_pressure"] == "hPa"
    assert isinstance(cc["weather_code"], int) and isinstance(cc["is_day"], bool)
    assert doc["metadata"]["simulation_mode"] == "oscillating"
    assert doc["metadata"]["iteration"] == 0


def test_messages_parse_through_engine_schema(spark):
    from ibd_pipeline_spark.streaming.weather import parse_weather_json

    _, _, sent = _run_feeder(10)
    raw = spark.createDataFrame([(m,) for m in sent], "value string")
    flat = parse_weather_json(raw)
    rows = flat.collect()
    assert len(rows) == 10
    null_counts = flat.select(
        [F.sum(F.col(c).isNull().cast("int")).alias(c) for c in flat.columns]
    ).collect()[0]
    assert all(v == 0 for v in null_counts.asDict().values()), null_counts


def test_requests_transport_guarded():
    cfg = RestSourceConfig()
    try:
        import requests  # noqa: F401

        have = True
    except ImportError:
        have = False
    if not have:
        import pytest

        from ibd_pipeline_spark.sources.rest_feeder import requests_transport

        with pytest.raises(ImportError, match="transport"):
            requests_transport(cfg)
