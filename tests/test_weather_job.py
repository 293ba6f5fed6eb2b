"""Weather2345 import job: hand-computed fixture pins every stage of
jobs/weather_import.py (Weather2345.java:35-182 semantics) — the prov[]/
provqx[] line grammar, the pipe-gate, the token regex, the 'a'-prefix
strip, the parent self-join with the self-parented-province rule, and the
full_name prefix rule."""

from __future__ import annotations

from jobs import weather_import as wt


def test_weather_import_hand_fixture(spark):
    lines = spark.createDataFrame(
        [
            # provinces: self-parented (code == belongToCode)
            ("prov[0]='1001-A 广东-1001|1002-A 湖南-1002'",),
            # counties: one 'a'-prefixed code (stripped), rest plain; note
            # every element needs a '|' — initArea (:101) gates per element,
            # so a single-area element would be dropped (see provqx[2])
            ("provqx[1]=['a2001-B 南山-1001|2002-B 福田-1001',"
             "'2003-B 岳麓-1002|2004-B 天心-1002']",),
            # junk line: neither prov[ nor provqx[ → dropped
            ("var other = 1;",),
            # pipe-less provqx element → dropped by the contains('|') gate
            ("provqx[2]=['nopipe element']",),
        ],
        "line string",
    )
    rows = wt.run_import(lines).collect()
    got = {r["rowkey"]: dict(r["cols"]) for r in rows}
    assert set(got) == {
        "00050011_1001", "00050011_1002",
        "00050011_2001", "00050011_2002", "00050011_2003", "00050011_2004",
    }
    # self-parented province: parent_name = own name, full_name unprefixed
    assert got["00050011_1001"] == {
        "code": "1001", "name": "广东", "parent_code": "1001",
        "parent_name": "广东", "full_name": "广东",
    }
    # 'a'-prefix stripped, parent resolved via the self-join,
    # full_name prefixed because name != parent_name
    assert got["00050011_2001"] == {
        "code": "2001", "name": "南山", "parent_code": "1001",
        "parent_name": "广东", "full_name": "广东,南山",
    }
    assert got["00050011_2003"]["parent_name"] == "湖南"
    for r in rows:
        assert r["family"] == wt.FAMILY
