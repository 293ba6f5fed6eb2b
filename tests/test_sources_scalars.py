"""S6 flat-file scan and C9 locale-datetime parse — the two §2 rows not
exercisable through the DuckDB-oracle contract (file-source setup / JVM
locale formats), covered here instead.

Reference evidence:
  S6 — Weather2345.txt JS-array parse via regex
       (…/crawler/tianqi/weather2345/Weather2345.java:94-182) and
       properties dictionaries (…/common/ConfigUtil.java:12-31).
  C9 — 'EEE MMM dd HH:mm:ss zzz yyyy' @GMT+8 → 'yyyy-MM-dd HH:mm:ss'
       (…/crawler/auto/Crawler4PCAuto.java:655-671).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_s6_flat_file_regex_scan(spark, tmp_path):
    # Weather2345-style JS array lines: `an[123]=["0","City|PY|..."];`
    lines = [
        'an[54094]=["0","北京|beijing|054094"];',
        'an[54511]=["1","海淀|haidian|054511"];',
        "junk line without a match",
        'an[58367]=["0","上海|shanghai|058367"];',
    ]
    p = tmp_path / "weather.txt"
    p.write_text("\n".join(lines), encoding="utf-8")

    df = (
        spark.read.text(str(p))
        .select(
            F.regexp_extract("value", r"an\[(\d+)\]", 1).alias("code"),
            F.regexp_extract("value", r'"\d+","([^|]+)\|', 1).alias("name"),
            F.regexp_extract("value", r"\|([a-z]+)\|", 1).alias("pinyin"),
        )
        .filter(F.col("code") != "")
    )
    rows = {r["code"]: (r["name"], r["pinyin"]) for r in df.collect()}
    assert rows == {
        "54094": ("北京", "beijing"),
        "54511": ("海淀", "haidian"),
        "58367": ("上海", "shanghai"),
    }


def test_s6_properties_dictionary_broadcast(spark, tmp_path):
    # ConfigUtil-style key=value dictionary loaded as a broadcast dim table
    p = tmp_path / "name.properties"
    p.write_text("k1=名称一\nk2=名称二\n# comment\nk3=名称三\n", encoding="utf-8")
    dic = (
        spark.read.text(str(p))
        .filter(~F.col("value").startswith("#") & F.col("value").contains("="))
        .select(
            F.substring_index("value", "=", 1).alias("key"),
            F.substring_index("value", "=", -1).alias("name"),
        )
    )
    work = spark.createDataFrame([("k1",), ("k3",), ("kX",)], "key string")
    out = {
        r["key"]: r["name"]
        for r in work.join(F.broadcast(dic), "key", "left").collect()
    }
    assert out == {"k1": "名称一", "k3": "名称三", "kX": None}


def test_c9_locale_datetime_parse(spark):
    # PCAuto's java.util.Date.toString()-style timestamps (SimpleDateFormat
    # 'EEE MMM dd HH:mm:ss zzz yyyy' @ GMT+8 in the reference).
    from dmp_crawler_spark.functions.strings import parse_locale_datetime

    df = spark.createDataFrame(
        [("Thu Aug 25 18:30:15 GMT+08:00 2016",), ("not a date",)],
        "raw string",
    )
    out = [
        r["fmt"]
        for r in df.select(
            F.date_format(
                parse_locale_datetime("raw"), "yyyy-MM-dd HH:mm:ss"
            ).alias("fmt")
        ).collect()
    ]
    # session TZ is UTC: 18:30:15+08:00 == 10:30:15Z; bad input → null
    assert out == ["2016-08-25 10:30:15", None]


def test_dist_zip_matches_working_tree():
    """ADVICE r02: the committed spark-submit --py-files zip must match the
    working tree — a stale zip deploys old behavior. Compares the byte
    content of every packaged module against the source tree."""
    import os
    import zipfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(root, "dist", "dmp_crawler_spark.zip")
    assert os.path.exists(zpath), "run scripts/package.sh"
    stale = []
    with zipfile.ZipFile(zpath) as z:
        names = [n for n in z.namelist() if n.endswith(".py")]
        for n in names:
            src = os.path.join(root, n)
            if not os.path.exists(src):
                stale.append(f"{n}: removed from tree")
                continue
            with open(src, "rb") as f:
                if f.read() != z.read(n):
                    stale.append(f"{n}: differs from tree")
    zipped = {n for n in names}
    for dirpath, _dirs, files in os.walk(os.path.join(root, "dmp_crawler_spark")):
        if "__pycache__" in dirpath:
            continue
        for f in files:
            if f.endswith(".py"):
                rel = os.path.relpath(os.path.join(dirpath, f), root)
                if rel not in zipped:
                    stale.append(f"{rel}: missing from zip")
    assert not stale, "stale dist zip — re-run scripts/package.sh:\n" + "\n".join(stale)
