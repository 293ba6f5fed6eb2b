"""Chinaweather city-code import job (the reference's entry point B
family: two-level JSON API walk → area registry → 4-appCode HBase fan-out).

Mirrors chinaweather Application.doCrawl (…/crawler/tianqi/chinaweather/
Application.java:52-138), composed from tested operator pieces as one
declarative plan:

  C18 template   provshi/{0}.html per province code (:36, :143-148)
  S4 JSON scan   province payload is a flat JSON object {key: cityName};
                 every key becomes a city, cityCode = province + key
                 (:66-72) — from_json(map<string,string>) + explode
  gate           null/empty payloads are skipped (:64, :76)
  C18 template   station/{0}.html per cityCode (:38, :74)
  S4 JSON scan   station payload {k: stationName} → AreaPojo(cityCode+k,
                 stationName, cityCode, cityName) (:78-86)
  fan-out        4 appCodes × every area (:100-106) — a 4-wide explode,
                 no shuffle
  sink           rowkey = appCode + '_' + code, family 'info', cols
                 {code, name, parent_code, parent_name, full_name};
                 full_name prefixes the parent name when it differs
                 (insertIntoHBase :111-136, the same rule weather2345
                 uses)

The reference keys a HashMap by area code before sinking (overwrite
dedup); synthesized fixtures guarantee code uniqueness so no
overwrite-order semantics are exercised (same caveat as weather_import).
All Column expressions — no Python in the plan, no joins at all: the
parent (cityCode, cityName) is carried through the explode instead of
re-joined, so the whole pipeline is narrow until the sink. The sequential
3-second-sleep HTTP loop of the reference becomes a pluggable fetcher over
a DataFrame of requests (the politeness budget lives in the frontier
layer, not here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROVINCE_URL_TEMPLATE = "http://bj.weather.example.com/data/city3jdata/provshi/%s.html"
STATION_URL_TEMPLATE = "http://bj.weather.example.com/data/city3jdata/station/%s.html"
APP_CODES = ["00050012", "00050014", "00050018", "00050019"]
FAMILY = "info"


def _nonempty(payload_col: str):
    p = F.col(payload_col)
    return p.isNotNull() & (p != "")


def plan_province_requests(provinces: DataFrame) -> DataFrame:
    """C18: one provshi request per province code; extra columns pass
    through (fetchers may key synthetic payloads off them)."""
    return provinces.withColumn(
        "url", F.format_string(PROVINCE_URL_TEMPLATE, F.col("province"))
    )


def parse_provinces(fetched: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Province payload {key: cityName} → (city_code, city_name) rows,
    cityCode = province + key."""
    m = F.from_json(F.col(payload_col), "map<string,string>")
    return (
        fetched.filter(_nonempty(payload_col))
        .select(F.col("province"), F.explode(m).alias("k", "city_name"))
        .select(
            F.concat(F.col("province"), F.col("k")).alias("city_code"),
            "city_name",
        )
    )


def plan_station_requests(cities: DataFrame) -> DataFrame:
    """C18: one station request per cityCode."""
    return cities.withColumn(
        "url", F.format_string(STATION_URL_TEMPLATE, F.col("city_code"))
    )


def parse_stations(fetched: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Station payload {k: stationName} → AreaPojo rows (code, name,
    parent_code, parent_name); the parent pair rides along from the city
    row — no self-join needed."""
    m = F.from_json(F.col(payload_col), "map<string,string>")
    return (
        fetched.filter(_nonempty(payload_col))
        .select("city_code", "city_name", F.explode(m).alias("k", "name"))
        .select(
            F.concat(F.col("city_code"), F.col("k")).alias("code"),
            "name",
            F.col("city_code").alias("parent_code"),
            F.col("city_name").alias("parent_name"),
        )
    )


def assemble(areas: DataFrame, app_codes: list[str] | None = None) -> DataFrame:
    """insertIntoHBase for each appCode: rowkey = appCode_code, family
    'info'; full_name = parentName ',' name unless they are equal."""
    app_codes = app_codes or APP_CODES
    full_name = F.when(
        F.col("name") != F.col("parent_name"),
        F.concat_ws(",", "parent_name", "name"),
    ).otherwise(F.col("name"))
    return (
        areas.withColumn(
            "app_code", F.explode(F.array(*[F.lit(a) for a in app_codes]))
        )
        .select(
            F.concat_ws("_", "app_code", "code").alias("rowkey"),
            F.lit(FAMILY).alias("family"),
            F.create_map(
                F.lit("code"), F.col("code"),
                F.lit("name"), F.col("name"),
                F.lit("parent_code"), F.col("parent_code"),
                F.lit("parent_name"), F.col("parent_name"),
                F.lit("full_name"), full_name,
            ).alias("cols"),
        )
    )


def run_import(
    provinces: DataFrame,
    province_fetcher,
    station_fetcher,
    app_codes: list[str] | None = None,
) -> DataFrame:
    """provinces → provshi walk → station walk → appCode fan-out → wide
    rows. Fetchers: callable DataFrame[..., url] -> same + payload."""
    cities = parse_provinces(province_fetcher(plan_province_requests(provinces)))
    areas = parse_stations(station_fetcher(plan_station_requests(cities)))
    return assemble(areas, app_codes)
