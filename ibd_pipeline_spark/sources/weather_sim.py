"""Deterministic weather-message generator for parity tests.

Reproduces the reference producer's payload shape and oscillation
model (Acquisition&Messaging/weather-producer.py):
  * value = baseline + sin(iteration·0.1)·oscillation + noise,
    noise ∈ ±20 %·oscillation (weather-producer.py:109-113) —
    seeded here so tests are reproducible;
  * oscillations: temperature 0.5, humidity 2.0, wind 1.5 (:74-76);
  * humidity clamped to [0,100], wind ≥ 0 (:168-171);
  * nested JSON document exactly per :176-221 (same keys, same
    nesting, ints for weather_code/iteration like the producer).

This is a feeder, not an engine operator (SURVEY.md §2 S3) — it
builds plain JSON strings; the engine consumes them through
parse_weather_json like any Kafka value.
"""

from __future__ import annotations

import json
import math
import random
from datetime import datetime, timedelta

BASELINES = {"temperature": 15.0, "humidity": 60.0, "wind_speed": 10.0}
OSCILLATIONS = {"temperature": 0.5, "humidity": 2.0, "wind_speed": 1.5}


def simulate_value(
    baseline: float, oscillation: float, iteration: int, rng: random.Random
) -> float:
    osc = math.sin(iteration * 0.1) * oscillation
    noise = rng.uniform(-0.2, 0.2) * oscillation
    return baseline + osc + noise


def weather_message(ts: datetime, iteration: int, rng: random.Random) -> dict:
    temp = simulate_value(BASELINES["temperature"], OSCILLATIONS["temperature"], iteration, rng)
    hum = min(100.0, max(0.0, simulate_value(BASELINES["humidity"], OSCILLATIONS["humidity"], iteration, rng)))
    wind = max(0.0, simulate_value(BASELINES["wind_speed"], OSCILLATIONS["wind_speed"], iteration, rng))
    return {
        "timestamp": ts.isoformat(),
        "location": {
            "latitude": 44.4274689,
            "longitude": 26.1028208,
            "timezone": "Europe/Bucharest",
            "timezone_abbreviation": "EET",
        },
        "current_conditions": {
            "temperature": {"value": temp, "unit": "celsius", "apparent": temp - 1.2},
            "humidity": {"value": hum, "unit": "percent"},
            "wind": {
                "speed": wind,
                "direction": float((iteration * 7) % 360),
                "gusts": wind * 1.6,
                "unit": "km/h",
            },
            "precipitation": {
                "total": 0.1 * (iteration % 3),
                "rain": 0.0,
                "showers": 0.0,
                "snowfall": 0.0,
                "unit": "mm",
            },
            "atmosphere": {
                "cloud_cover": float((iteration * 11) % 100),
                "pressure_msl": 1013.0 + math.sin(iteration * 0.05) * 3,
                "surface_pressure": 1010.0,
                "unit_pressure": "hPa",
            },
            "weather_code": int(iteration % 4),
            "is_day": bool((iteration // 300) % 2 == 0),
        },
        "metadata": {
            "iteration": int(iteration),
            "last_api_update": ts.isoformat(),
            "simulation_mode": "full",
        },
    }


def generate_messages(
    n: int,
    start: datetime | None = None,
    interval_s: float = 1.0,
    seed: int = 42,
) -> list[str]:
    """n JSON messages at 1 msg/s of simulated time (the reference's
    SEND_INTERVAL_MS=1000, weather-producer.py:17)."""
    rng = random.Random(seed)
    start = start or datetime(2024, 6, 1, 12, 0, 0)
    return [
        json.dumps(weather_message(start + timedelta(seconds=i * interval_s), i, rng))
        for i in range(n)
    ]
