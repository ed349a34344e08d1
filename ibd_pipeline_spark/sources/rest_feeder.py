"""REST ingestion feeder: Open-Meteo poll → weather JSON messages
(SURVEY.md §2.1 S2/S4 — the last producer-side source row).

Mirrors the reference producer's behavior (weather-producer.py):
  * poll the "current weather" endpoint for 15 variables
    (:36-43), re-polling every ``api_check_interval`` seconds
    (:77,126-129);
  * swap oscillation baselines + static fields only when the API
    reports a new observation time (:132-153);
  * between polls, synthesize 1 msg/s with the oscillation model
    (sin + bounded noise, :109-113) and the reference's clamps and
    rounding (:163-171,176-221).

This is a *feeder*, not an engine operator (SURVEY.md §7 non-goals):
it produces JSON strings for any ``send`` callable — a Kafka
producer, a spool-directory writer feeding
``streaming.runner.file_json_source``, or a test list. Everything
I/O-ish is injectable (transport, clock, sleep, send), so the full
poll → baseline-swap → simulate → serialize path is testable with
zero network; the real HTTP transport engages only where ``requests``
exists (guarded import — not installed in this container).

No credentials in code: the reference hard-codes broker secrets
(weather-producer.py:12-15); here delivery is the caller's concern
(see streaming.sinks.KafkaSinkConfig for the engine-side writer).
"""

from __future__ import annotations

import json
import random
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime

OPEN_METEO_URL = "https://api.open-meteo.com/v1/forecast"

# The reference's 15 "current" variables, same order (weather-producer.py:38-42).
CURRENT_VARS: tuple[str, ...] = (
    "temperature_2m",
    "relative_humidity_2m",
    "precipitation",
    "weather_code",
    "wind_speed_10m",
    "wind_direction_10m",
    "wind_gusts_10m",
    "apparent_temperature",
    "is_day",
    "snowfall",
    "showers",
    "rain",
    "cloud_cover",
    "pressure_msl",
    "surface_pressure",
)

# A transport maps (url, params) -> normalized observation dict:
#   {"time": <epoch s>, "latitude": .., "longitude": ..,
#    "timezone": .., "timezone_abbreviation": ..,
#    "values": {var: float for var in CURRENT_VARS}}
Transport = Callable[[str, dict], dict]


@dataclass
class RestSourceConfig:
    """Poll parameters (weather-producer.py:36-43,77)."""

    url: str = OPEN_METEO_URL
    latitude: float = 44.4274689
    longitude: float = 26.1028208
    current_vars: tuple[str, ...] = CURRENT_VARS
    timezone: str = "auto"
    api_check_interval: float = 60.0
    send_interval_s: float = 1.0
    retries: int = 5
    backoff_factor: float = 0.2

    def params(self) -> dict:
        return {
            "latitude": self.latitude,
            "longitude": self.longitude,
            "current": ",".join(self.current_vars),
            "timezone": self.timezone,
        }


def requests_transport(cfg: RestSourceConfig) -> Transport:
    """Real HTTP transport over Open-Meteo's public JSON API, with
    the reference's retry/backoff posture (5 tries, 0.2 backoff —
    weather-producer.py:32). Guarded import: raises a clear error
    where ``requests`` isn't installed (this container), leaving
    every other path usable with an injected transport."""
    try:
        import requests  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "requests is not installed; pass an explicit transport= "
            "(any (url, params) -> observation dict callable)"
        ) from exc

    import time as _time

    def fetch(url: str, params: dict) -> dict:
        last: Exception | None = None
        for attempt in range(cfg.retries):
            try:
                resp = requests.get(url, params=params, timeout=10)
                resp.raise_for_status()
                body = resp.json()
                cur = body["current"]
                return {
                    "time": float(
                        datetime.fromisoformat(cur["time"]).timestamp()
                        if isinstance(cur["time"], str)
                        else cur["time"]
                    ),
                    "latitude": float(body["latitude"]),
                    "longitude": float(body["longitude"]),
                    "timezone": str(body.get("timezone", cfg.timezone)),
                    "timezone_abbreviation": str(
                        body.get("timezone_abbreviation", "")
                    ),
                    "values": {v: float(cur[v]) for v in cfg.current_vars},
                }
            except Exception as exc:  # noqa: BLE001 - retry any transport error
                last = exc
                _time.sleep(cfg.backoff_factor * (2**attempt))
        raise RuntimeError(f"Open-Meteo poll failed after {cfg.retries} tries") from last

    return fetch


@dataclass
class WeatherFeeder:
    """Stateful poll-and-simulate loop (weather-producer.py:124-235),
    with time and I/O injected so tests drive it deterministically."""

    transport: Transport
    cfg: RestSourceConfig = field(default_factory=RestSourceConfig)
    seed: int = 42

    def __post_init__(self) -> None:
        self._rng = random.Random(self.seed)
        self._iteration = 0
        self._last_api_time: float | None = None
        self._last_api_check: float | None = None
        self._obs: dict | None = None
        self._baselines: dict[str, float] = {}
        self.polls = 0
        self.baseline_swaps = 0

    # -- polling ---------------------------------------------------------

    def refresh(self, now: float) -> None:
        """Poll if due; swap baselines only on a new observation time
        (weather-producer.py:126-158)."""
        due = (
            self._obs is None
            or now - self._last_api_check >= self.cfg.api_check_interval
        )
        if not due:
            return
        obs = self.transport(self.cfg.url, self.cfg.params())
        self.polls += 1
        self._last_api_check = now
        if self._obs is None or obs["time"] != self._last_api_time:
            self._obs = obs
            self._last_api_time = obs["time"]
            v = obs["values"]
            self._baselines = {
                "temperature": v["temperature_2m"],
                "humidity": v["relative_humidity_2m"],
                "wind_speed": v["wind_speed_10m"],
            }
            self.baseline_swaps += 1

    # -- message assembly ------------------------------------------------

    def message(self, ts: datetime) -> dict:
        """One payload in the reference's exact nested shape
        (weather-producer.py:176-221), oscillating temperature,
        humidity and wind around the polled baselines with the
        reference's clamps and per-field rounding."""
        from ibd_pipeline_spark.sources.weather_sim import OSCILLATIONS, simulate_value

        obs, v, it = self._obs, self._obs["values"], self._iteration
        temp = simulate_value(
            self._baselines["temperature"], OSCILLATIONS["temperature"], it, self._rng
        )
        hum = min(
            100.0,
            max(
                0.0,
                simulate_value(
                    self._baselines["humidity"], OSCILLATIONS["humidity"], it, self._rng
                ),
            ),
        )
        wind = max(
            0.0,
            simulate_value(
                self._baselines["wind_speed"], OSCILLATIONS["wind_speed"], it, self._rng
            ),
        )
        return {
            "timestamp": ts.isoformat(),
            "location": {
                "latitude": obs["latitude"],
                "longitude": obs["longitude"],
                "timezone": obs["timezone"],
                "timezone_abbreviation": obs["timezone_abbreviation"],
            },
            "current_conditions": {
                "temperature": {
                    "value": round(temp, 2),
                    "unit": "celsius",
                    "apparent": round(v["apparent_temperature"], 2),
                },
                "humidity": {"value": round(hum, 2), "unit": "percent"},
                "wind": {
                    "speed": round(wind, 2),
                    "direction": round(v["wind_direction_10m"], 0),
                    "gusts": round(v["wind_gusts_10m"], 2),
                    "unit": "km/h",
                },
                "precipitation": {
                    "total": round(v["precipitation"], 2),
                    "rain": round(v["rain"], 2),
                    "showers": round(v["showers"], 2),
                    "snowfall": round(v["snowfall"], 2),
                    "unit": "mm",
                },
                "atmosphere": {
                    "cloud_cover": round(v["cloud_cover"], 0),
                    "pressure_msl": round(v["pressure_msl"], 2),
                    "surface_pressure": round(v["surface_pressure"], 2),
                    "unit_pressure": "hPa",
                },
                "weather_code": int(v["weather_code"]),
                "is_day": bool(v["is_day"] == 1),
            },
            "metadata": {
                "iteration": it,
                "last_api_update": datetime.fromtimestamp(
                    self._last_api_time
                ).isoformat(),
                "simulation_mode": "oscillating",
            },
        }

    # -- main loop -------------------------------------------------------

    def run(
        self,
        send: Callable[[str], None],
        n_ticks: int,
        clock: Callable[[], float],
        start: datetime | None = None,
        sleep: Callable[[float], None] | None = None,
    ) -> int:
        """Drive n_ticks of the poll → simulate → serialize → send
        loop (one JSON string per tick, 1 tick = send_interval_s of
        simulated time). Returns messages sent."""
        from datetime import timedelta

        start = start or datetime(2024, 6, 1, 12, 0, 0)
        for i in range(n_ticks):
            self.refresh(clock())
            send(json.dumps(self.message(start + timedelta(seconds=i * self.cfg.send_interval_s))))
            self._iteration += 1
            if sleep is not None:
                sleep(self.cfg.send_interval_s)
        return self._iteration
