"""Chinaweather import job: hand-computed fixture pins every stage of
jobs/chinaweather_import.py (chinaweather/Application.java:52-138
semantics) — the two-level provshi→station JSON walk, cityCode/areaCode
concatenation, the null/empty-payload gates at both levels, the 4-appCode
fan-out, and the full_name collapse-when-equal rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobs import chinaweather_import as cw


def _lookup_fetcher(spark, table: dict[str, str], key_col: str):
    """Fetcher that joins payloads from a literal dict keyed on `key_col`
    (missing keys → null payload, the reference's failed-request case)."""
    lk = spark.createDataFrame(
        list(table.items()), f"{key_col} string, payload string"
    )
    return lambda reqs: reqs.join(F.broadcast(lk), key_col, "left")


def test_chinaweather_import_hand_fixture(spark):
    provinces = spark.createDataFrame(
        [("10101",), ("10102",), ("10103",), ("10104",)], "province string"
    )
    province_fetcher = _lookup_fetcher(
        spark,
        {
            "10101": '{"01":"北京","02":"朝阳"}',
            "10102": "",  # empty payload → whole province skipped
            "10103": '{"05":"上海"}',
            # 10104 missing → null payload → skipped
        },
        "province",
    )
    station_fetcher = _lookup_fetcher(
        spark,
        {
            "1010101": '{"01":"海淀","02":"北京"}',  # station 02 == parent city
            "1010102": "",  # empty station payload → city contributes nothing
            "1010305": '{"09":"浦东"}',
        },
        "city_code",
    )
    rows = cw.run_import(
        provinces, province_fetcher, station_fetcher, app_codes=["00050012"]
    ).collect()
    got = {r["rowkey"]: dict(r["cols"]) for r in rows}
    assert set(got) == {
        "00050012_101010101", "00050012_101010102", "00050012_101030509",
    }
    # distinct parent: full_name prefixed
    assert got["00050012_101010101"] == {
        "code": "101010101", "name": "海淀", "parent_code": "1010101",
        "parent_name": "北京", "full_name": "北京,海淀",
    }
    # station named exactly like its city: full_name collapses (:118-127)
    assert got["00050012_101010102"] == {
        "code": "101010102", "name": "北京", "parent_code": "1010101",
        "parent_name": "北京", "full_name": "北京",
    }
    assert got["00050012_101030509"] == {
        "code": "101030509", "name": "浦东", "parent_code": "1010305",
        "parent_name": "上海", "full_name": "上海,浦东",
    }
    assert all(r["family"] == "info" for r in rows)


def test_chinaweather_appcode_fanout(spark):
    provinces = spark.createDataFrame([("10101",)], "province string")
    pf = _lookup_fetcher(spark, {"10101": '{"01":"北京"}'}, "province")
    sf = _lookup_fetcher(spark, {"1010101": '{"01":"海淀"}'}, "city_code")
    rows = cw.run_import(provinces, pf, sf).collect()  # default 4 appCodes
    rowkeys = sorted(r["rowkey"] for r in rows)
    assert rowkeys == [
        "00050012_101010101", "00050014_101010101",
        "00050018_101010101", "00050019_101010101",
    ]


def test_chinaweather_request_urls(spark):
    provinces = spark.createDataFrame([("10101",)], "province string")
    urls = cw.plan_province_requests(provinces).collect()
    assert urls[0]["url"] == (
        "http://bj.weather.example.com/data/city3jdata/provshi/10101.html"
    )
    cities = spark.createDataFrame(
        [("1010101", "北京")], "city_code string, city_name string"
    )
    surls = cw.plan_station_requests(cities).collect()
    assert surls[0]["url"] == (
        "http://bj.weather.example.com/data/city3jdata/station/1010101.html"
    )
