"""Weather providers → hourly datastore rows.

Reference: internal/weather — Yr.no (met.no locationforecast) and
OpenWeather providers polled hourly into HourlyWeather rows for the
dashboard/analytics correlation views.
"""

from __future__ import annotations

import dataclasses
import logging
import threading
import time

log = logging.getLogger("birdnet_tpu.weather")


@dataclasses.dataclass
class WeatherObservation:
    time_unix: float
    temperature: float | None = None        # °C
    humidity: float | None = None           # %
    pressure: float | None = None           # hPa
    wind_speed: float | None = None         # m/s
    wind_deg: float | None = None
    clouds: float | None = None             # %
    description: str = ""


class YrNoProvider:
    """met.no locationforecast 2.0 (the reference's default provider)."""

    BASE = "https://api.met.no/weatherapi/locationforecast/2.0/compact"

    def __init__(self, lat: float, lon: float, session=None,
                 user_agent: str = "birdnet-tpu/0.1 bioacoustics-station"):
        from birdnet_go_tpu.utils.httpclient import shared_client

        self.lat, self.lon = lat, lon
        self.session = session or shared_client()
        self.user_agent = user_agent

    def fetch(self) -> list[WeatherObservation]:
        r = self.session.get(
            self.BASE, params={"lat": self.lat, "lon": self.lon},
            headers={"User-Agent": self.user_agent})
        r.raise_for_status()
        data = r.json()
        out = []
        for entry in data.get("properties", {}).get("timeseries", [])[:24]:
            import datetime as dt

            ts = dt.datetime.fromisoformat(
                entry["time"].replace("Z", "+00:00")).timestamp()
            inst = entry.get("data", {}).get("instant", {}).get("details", {})
            next1 = entry.get("data", {}).get("next_1_hours", {})
            out.append(WeatherObservation(
                time_unix=ts,
                temperature=inst.get("air_temperature"),
                humidity=inst.get("relative_humidity"),
                pressure=inst.get("air_pressure_at_sea_level"),
                wind_speed=inst.get("wind_speed"),
                wind_deg=inst.get("wind_from_direction"),
                clouds=inst.get("cloud_area_fraction"),
                description=next1.get("summary", {}).get("symbol_code", "")))
        return out


class OpenWeatherProvider:
    BASE = "https://api.openweathermap.org/data/2.5/weather"

    def __init__(self, lat: float, lon: float, api_key: str, session=None):
        from birdnet_go_tpu.utils.httpclient import shared_client

        self.lat, self.lon = lat, lon
        self.api_key = api_key
        self.session = session or shared_client()

    def fetch(self) -> list[WeatherObservation]:
        r = self.session.get(self.BASE, params={
            "lat": self.lat, "lon": self.lon, "appid": self.api_key,
            "units": "metric"})
        r.raise_for_status()
        d = r.json()
        return [WeatherObservation(
            time_unix=float(d.get("dt", time.time())),
            temperature=d.get("main", {}).get("temp"),
            humidity=d.get("main", {}).get("humidity"),
            pressure=d.get("main", {}).get("pressure"),
            wind_speed=d.get("wind", {}).get("speed"),
            wind_deg=d.get("wind", {}).get("deg"),
            clouds=d.get("clouds", {}).get("all"),
            description=(d.get("weather") or [{}])[0].get("description", ""))]


class WundergroundProvider:
    """Weather Underground PWS observations (provider_wunderground.go) —
    reads a personal weather station's current conditions."""

    BASE = "https://api.weather.com/v2/pws/observations/current"

    def __init__(self, station_id: str, api_key: str, session=None):
        from birdnet_go_tpu.utils.httpclient import shared_client

        self.station_id = station_id
        self.api_key = api_key
        self.session = session or shared_client()

    def fetch(self) -> list[WeatherObservation]:
        r = self.session.get(self.BASE, params={
            "stationId": self.station_id, "apiKey": self.api_key,
            "units": "m", "format": "json", "numericPrecision": "decimal"})
        r.raise_for_status()
        obs = (r.json().get("observations") or [{}])[0]
        metric = obs.get("metric", {})
        return [WeatherObservation(
            time_unix=float(obs.get("epoch", time.time())),
            temperature=metric.get("temp"),
            humidity=obs.get("humidity"),
            pressure=metric.get("pressure"),
            wind_speed=(metric.get("windSpeed") / 3.6
                        if metric.get("windSpeed") is not None else None),
            wind_deg=obs.get("winddir"),
            clouds=None,
            description=f"PWS {self.station_id}")]


class WeatherPoller:
    """Hourly polling loop writing observations into the datastore."""

    def __init__(self, provider, datastore, interval_seconds: float = 3600.0):
        self.provider = provider
        self.datastore = datastore
        self.interval = interval_seconds
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.polls = 0
        self.errors = 0

    def poll_once(self) -> int:
        obs = self.provider.fetch()
        for o in obs:
            self.datastore.save_hourly_weather(
                o.time_unix, temperature=o.temperature, humidity=o.humidity,
                pressure=o.pressure, wind_speed=o.wind_speed,
                wind_deg=o.wind_deg, clouds=o.clouds,
                description=o.description)
        self.polls += 1
        return len(obs)

    def start(self) -> None:
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, name="weather",
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                self.poll_once()
            except Exception as e:
                self.errors += 1
                log.warning("weather poll failed: %s", e)
            self._stop.wait(self.interval)
