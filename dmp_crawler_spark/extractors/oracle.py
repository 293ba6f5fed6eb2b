"""Reference-faithful extraction oracle (pure Python, no Spark).

One function per page archetype, each a 1:1 reimplementation of the
cited reference extractor's jsoup/regex pipeline (reference root =
/root/reference/src/main/java/com/pxene/dmp). Every function takes
(url, html_str) and returns a list of wide-column rows:

    {"rowkey": str, "family": str, "cols": {col: str, ...}}

mirroring the reference's 3-level HBase map (crawler/BaseCrawler.java:28-55).
All values are strings — the byte-identical contract.

These same functions run inside the vectorized pandas-UDF extractors
(extractors/udfs.py); the pytest golden tests assert UDF output ==
oracle output == fixture bytes.
"""

from __future__ import annotations

import json
import re

from dmp_crawler_spark.extractors.htmlmini import Element, parse


def _regexp_extract(s: str, pattern: str) -> str:
    """common/StringUtils.java:10-20 — group(1) trimmed, '' on miss/null."""
    if not s:
        return ""
    m = re.search(pattern, s)
    return m.group(1).strip() if m else ""


def _sel_text(root: Element, selector: str) -> str:
    """getTextBySelector helper (duplicated across the reference, e.g.
    crawler/auto/Crawler4BitAuto.java:579-599): first match text, '' on miss."""
    el = root.select_one(selector)
    return el.text() if el is not None else ""


def _sel_attr(root: Element, selector: str, attr: str) -> str:
    el = root.select_one(selector)
    return el.attr(attr) if el is not None else ""


# ---------------------------------------------------------------------------
# auto_config ⇠ Crawler4Autohome.getAutoInfo (Crawler4Autohome.java:143-260):
# series name from div.subnav-title-name a, `var config = {...}` script JSON,
# one output row per specid across paramtypeitems[0].paramitems.

_PARAM_TO_COL = {
    "车型名称": "style",
    "厂商指导价(元)": "price",
    "级别": "level",
    "发动机": "engine",
    "变速箱": "gearbox",
    "长*宽*高(mm)": "size",
    "车身结构": "struct",
    "最高车速(km/h)": "speed",
    "工信部综合油耗(L/100km)": "fuel",
}


def extract_auto_config(url: str, html: str) -> list[dict]:
    root = parse(html)
    raw_name = _sel_text(root, "div.subnav-title-name a")
    # Crawler4Autohome.java:148 strips the '参数配置' suffix from the link text
    name = _regexp_extract(raw_name, r"^(.*?)参数配置$") or raw_name
    cfg = _regexp_extract(html, r"var config = (\{.*?\});")
    if not cfg:
        return []
    try:
        config = json.loads(cfg)
    except ValueError:
        return []
    result = config.get("result", {})
    series = str(result.get("seriesid", ""))
    per_spec: dict[str, dict[str, str]] = {}
    for pt in result.get("paramtypeitems", [])[:1]:
        for pi in pt.get("paramitems", []):
            col = _PARAM_TO_COL.get(pi.get("name", ""))
            if col is None:
                continue
            for vi in pi.get("valueitems", []):
                spec = str(vi.get("specid", ""))
                per_spec.setdefault(spec, {})[col] = str(vi.get("value", ""))
    rows = []
    for spec in per_spec:  # insertion order = JSON order, like the reference loop
        cols = {"name": name}
        cols.update(per_spec[spec])
        rows.append({
            "rowkey": f"0003NNNN_{series}_{spec}",
            "family": "auto_info",
            "cols": cols,
        })
    return rows


# ---------------------------------------------------------------------------
# auto_user ⇠ Crawler4Autohome.getUserInfo (Crawler4Autohome.java:262-432):
# #divuserinfo name/sex/city; #dynamic .subdyn2 follower count;
# #ulList li[uid] ids accumulated into a comma-joined set (java:306-325);
# sex encoded 男→'0' else '1' (java:287-300).


def extract_auto_user(url: str, html: str) -> list[dict]:
    root = parse(html)
    info = root.select_one("#divuserinfo")
    if info is None:
        return []
    name = sex = city = ""
    for p in info.select("p"):
        t = p.text()
        if t.startswith("昵称:"):
            name = t[len("昵称:"):]
        elif t.startswith("性别:"):
            sex = "0" if "男" in t else "1"
        elif t.startswith("城市:"):
            city = t[len("城市:"):]
    followers = _sel_text(root, "#dynamic .subdyn2")
    ids = [li.attr("uid") for li in root.select("#ulList li") if li.attr("uid")]
    uid = _regexp_extract(url, r"/(\d+)\.html")
    rowkey = f"0003NNNN_{100000 + int(uid)}" if uid else ""
    return [{
        "rowkey": rowkey,
        "family": "user_info",
        "cols": {
            "name": name, "sex": sex, "city": city,
            "following": ",".join(ids), "followers": followers,
        },
    }]


# ---------------------------------------------------------------------------
# bbs_post ⇠ Crawler4Iiyi.visitBBSPage (Crawler4Iiyi.java:86-193) +
# Autohome getPostInfo (Crawler4Autohome.java:434-487): [xname=date]
# datetime in 'yyyy-M-d H:m:s', uid attr on #F0, rowkey uses the
# zero-padded compact form (java:447-458).


def _compact_datetime(s: str) -> str:
    m = re.fullmatch(r"(\d{4})-(\d{1,2})-(\d{1,2}) (\d{1,2}):(\d{1,2}):(\d{1,2})", s)
    if not m:
        return ""
    y, mo, d, h, mi, se = m.groups()
    return f"{y}{int(mo):02d}{int(d):02d}{int(h):02d}{int(mi):02d}{int(se):02d}"


def extract_bbs_post(url: str, html: str) -> list[dict]:
    root = parse(html)
    date_str = _sel_text(root, "[xname=date]")
    # current-year gate (Crawler4Autohome.java:443-445) — CURRENT_YEAR is
    # the deterministic corpus epoch year, never wall-clock
    if not date_str.startswith("2016"):
        return []
    uid = _sel_attr(root, "#F0", "uid")
    bbs_el = root.select_one("#a_bbsname")
    bbs_name = bbs_el.text() if bbs_el is not None else ""
    bbs_id = _regexp_extract(bbs_el.attr("href") if bbs_el is not None else "", r"/([^/]+)/")
    # title fallback div.maxtitle → div.qa-maxtitle (Crawler4Autohome.java:472-474)
    div1 = root.select_one("div.maxtitle")
    title = div1.text() if div1 is not None else _sel_text(root, "div.qa-maxtitle")
    content = _sel_text(root, "div.conttxt")
    post_id = _regexp_extract(url, r"/(\d+)\.html")
    compact = _compact_datetime(date_str)
    if not uid or not compact:
        return []  # F6 null/shape guard (Crawler4Iiyi.java:93-96)
    return [{
        "rowkey": f"0003NNNN_{uid}_{compact}",
        "family": "post_info",
        "cols": {
            "bbs_id": bbs_id, "bbs_name": bbs_name, "post_id": post_id,
            "post_title": title, "post_content": content, "post_date": date_str,
        },
    }]


# ---------------------------------------------------------------------------
# dealer_list ⇠ Crawler4Autohome.getDealerInfo (Crawler4Autohome.java:489-537):
# `var data=[...]` script JSON holds url→latlon; the a.btn-map anchors hold
# js-did/js-dname/js-dbrand/js-daddr; joined on the dealer url.


def extract_dealer_list(url: str, html: str) -> list[dict]:
    root = parse(html)
    data_raw = _regexp_extract(html, r"var data=(\[.*?\]);")
    latlon_by_url: dict[str, str] = {}
    if data_raw:
        try:
            for d in json.loads(data_raw):
                latlon_by_url[str(d.get("url", ""))] = str(d.get("latlon", ""))
        except ValueError:
            pass
    rows = []
    for a in root.select("div.dealer-cont a.btn-map"):
        did = a.attr("js-did")
        if not did:
            continue
        rows.append({
            "rowkey": f"00030005_{did}",
            "family": "dealer_info",
            "cols": {
                "name": a.attr("js-dname"),
                "brand": a.attr("js-dbrand"),
                "address": a.attr("js-daddr"),
                "latlon": latlon_by_url.get(a.attr("href"), ""),
            },
        })
    return rows


# ---------------------------------------------------------------------------
# ec_product ⇠ Crawler4Jingdong.getProductInfo (Crawler4Jingdong.java:239-333):
# breadcrumbs div.crumb, brand #parameter-brand li a, the p-parameter-list
# li[title] rows keyed by own-text prefix (商品名称/商品编号/店铺), sku-name.


def extract_ec_product(url: str, html: str) -> list[dict]:
    root = parse(html)
    brand = _sel_text(root, "#parameter-brand li a")
    display = _sel_text(root, "div.sku-name")
    crumbs = [a.text() for a in root.select("div.crumb a")]
    pname = code = shop = ""
    for li in root.select("ul.p-parameter-list li"):
        t = li.text()
        if t.startswith("商品名称："):
            pname = t[len("商品名称："):].strip()
        elif t.startswith("商品编号："):
            code = t[len("商品编号："):].strip()
        elif t.startswith("店铺："):
            shop = t[len("店铺："):].strip()
    if not code:
        return []
    return [{
        "rowkey": f"00040008_{code}",
        "family": "product_info",
        "cols": {
            "product_brand": brand, "product_name": pname,
            "product_code": code, "shopname": shop,
            "displayname": display,
            "classifications": ",".join(crumbs),
        },
    }]


# ---------------------------------------------------------------------------
# article ⇠ Crawler4Dxy.visitBBSPage (Crawler4Dxy.java:88-165): title/time/
# author/content selectors; the date-completion quirk incl. the literal
# '1970-00-00 00:00:00' sentinel (Crawler4Dxy.java:110-116).


def complete_datetime_py(s: str) -> str:
    if re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", s or ""):
        return s
    if re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}", s or ""):
        return s + ":00"
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}", s or ""):
        return s + " 00:00:00"
    return "1970-00-00 00:00:00"


def extract_article(url: str, html: str) -> list[dict]:
    root = parse(html)
    title = _sel_text(root, "div.title")
    raw_time = _sel_text(root, "div.post-time")
    author = _sel_text(root, "div.author")
    content = _sel_text(root, "div.content")
    if not title or not content:
        return []  # F5 junk/empty filter (Crawler4Dxy.java:123-126)
    aid = _regexp_extract(url, r"/(\d+)\.html")
    return [{
        "rowkey": f"00480592001_{600000 + int(aid)}" if aid else "",
        "family": "article_info",
        "cols": {
            "article_title": title,
            "article_auther": author,
            "article_content": content,
            "article_time": complete_datetime_py(raw_time),
        },
    }]


# ---------------------------------------------------------------------------
# tour_detail ⇠ Crawler4Tuniu.getToursInfo (Crawler4Tuniu.java:110-207):
# two selector-variant layouts; span class → route-type mapping
# (Crawler4Tuniu.java:439-462).

_ROUTE_TYPE = {"i-zjy": "自助游", "i-gny": "跟团游", "i-zyx": "自驾游"}


def extract_tour_detail(url: str, html: str) -> list[dict]:
    root = parse(html)
    name = _sel_text(root, "div.resource-con h1") or _sel_text(root, "div.tour-title h2")
    rtype = ""
    for cls, label in _ROUTE_TYPE.items():
        if root.select_one(f"span.{cls}") is not None:
            rtype = label
            break
    if not name:
        return []
    tno = _regexp_extract(url, r"/(\d+)\.html")
    return [{
        "rowkey": f"00100032_{700000 + int(tno)}" if tno else "",
        "family": "route_info",
        "cols": {"route_name": name, "route_type": rtype},
    }]


# ---------------------------------------------------------------------------
# news_article ⇠ textclassify Crawler4Sina (Crawler4Sina.java:83-109):
# fallback selector chains for title/content; category from the URL regex
# taxonomy (sinaConfig.json) — here the archetype index encodes category.

_NEWS_TAXONOMY = [
    (r"news_article/(\d*[048])\.html", "0101"),  # idx % 4 == 0 → sports
    (r"news_article/(\d*[159])\.html", "0102"),
    (r"news_article/(\d*[26])\.html", "0103"),
    (r"news_article/(\d*[37])\.html", "0104"),
]


def classify_news_url(url: str) -> str:
    m = re.search(r"/(\d+)\.html", url)
    if not m:
        return ""
    idx = int(m.group(1))
    return ["0101", "0102", "0103", "0104"][idx % 4]


def extract_news_article(url: str, html: str) -> list[dict]:
    root = parse(html)
    title = (
        _sel_text(root, "#artibodyTitle")
        or _sel_text(root, "#main_title")
        or _sel_text(root, ".news-title")
    )
    content = _sel_text(root, "#artibody") or _sel_text(root, "#articleContent")
    if not title or not content:
        return []  # Crawler4Sina.java:95-97 empty filter
    cat = classify_news_url(url)
    news_id = _regexp_extract(url, r"/(\d+)\.html")
    return [{
        "rowkey": f"{cat}_{news_id}",
        "family": "article",
        "cols": {"category": cat, "title": title, "content": content},
    }]


# ---------------------------------------------------------------------------
# json_api ⇠ 10jqka JSONP (Crawler410jqka.java:97-123) — unwrap `cb({...});`
# (regex per Crawler4Jingdong.java:480) and emit one row per data element.


def extract_json_api(url: str, html: str) -> list[dict]:
    inner = _regexp_extract(html, r"^\s*[\w$.]*\((.*)\)\s*;?\s*$")
    if not inner:
        return []
    try:
        payload = json.loads(inner)
    except ValueError:
        return []
    rows = []
    for d in payload.get("data", []):
        sid = str(d.get("stockid", ""))
        rows.append({
            "rowkey": f"00150107_{sid}",
            "family": "stock_info",
            "cols": {
                "stockid": sid,
                "stockname": str(d.get("stockname", "")),
                "stockplate": str(d.get("stockplate", "")),
            },
        })
    return rows


# ---------------------------------------------------------------------------
# zhishiku ⇠ Crawler4Zhishiku.visitBBSPage (crawler/ms/Crawler4Zhishiku.java:
# 87-231): C24 HTML-fragment rewriting (split('<hr>'), '<br>'→'&&',
# fragment reparse) + C21 fastjson-style serialize with the '"'→"'" quote
# swap. Deterministic choices standing in for reference non-determinism:
# JSON key order = insertion order (vs Java HashMap), crawl timestamp =
# EPOCH_BASE + idx seconds (vs System.currentTimeMillis).

from datetime import datetime, timedelta, timezone

_EPOCH_BASE = datetime(2016, 8, 1, tzinfo=timezone.utc)


def _url_idx(url: str) -> int:
    m = re.search(r"/(\d+)\.html", url or "")
    return int(m.group(1)) if m else -1


def zhishiku_dict(kw: str) -> str:
    """ConfigUtil.getByKey stand-in (common/ConfigUtil.java:12-31): the
    kw→词条名 properties dictionary; every 13th key is absent ('')."""
    n = int(kw[2:])
    return "" if (n - 800000) % 13 == 0 else f"词条名{n}"


def extract_zhishiku(url: str, html: str) -> list[dict]:
    idx = _url_idx(url)
    kw = f"zk{800000 + idx}"  # ≙ url.split("=")[1] (Crawler4Zhishiku.java:90-95)
    name = zhishiku_dict(kw)
    if name == "":  # valueOfName.isEmpty() → return (:97-99)
        return []
    if "未能找到该词条" in html:  # (:103-104)
        return []
    root = parse(html)
    title = _sel_text(root, "#title > div > div > h1 > font")
    info_map: dict = {}
    for font in root.select("#title > div > div > font"):
        # summary block (:118-150)
        h4 = font.select_one("font > div > h4")
        if h4 is not None:
            summary = h4.text()
            summary_value_map: dict = {}
            for tr in font.select("font > div > table > tbody > tr"):
                tds = tr.select("tr > td")
                key = value = ""
                for num, td in enumerate(tds, start=1):
                    if num % 2 == 0:
                        value = td.text().replace('"', "'")
                        summary_value_map[key] = value
                    else:
                        key = td.text()
            info_map[summary] = summary_value_map
        # panel blocks (:152-199): C24 fragment fold
        for panel in font.select("font > div.panel,.panel-default"):
            stage_map: dict = {}
            stage_title = ""
            for strong in panel.select("div > div.panel-heading > strong"):
                stage_title = strong.text()
            for body in panel.select("div > div.panel-body"):
                for kv in body.html_inner().split("<hr>"):
                    new_kv = kv.replace("<br>", "&&")
                    kv_str = parse(new_kv).text()
                    kv_strs = kv_str.split(":")
                    if len(kv_strs) > 1:
                        # Java kv_strs[1]: third+ colon parts are DROPPED
                        values = kv_strs[1].split("&&")
                        stage_map[kv_strs[0]] = [v.replace('"', "'") for v in values]
                        info_map[stage_title] = stage_map
                    else:
                        info_map[stage_title] = kv_strs[0].replace('"', "'")
    content = json.dumps(info_map, ensure_ascii=False, separators=(",", ":"))
    time = (_EPOCH_BASE + timedelta(seconds=idx)).strftime("%Y%m%d%H%M%S")
    return [{
        "rowkey": kw,
        "family": "article_info",
        "cols": {
            "article_title": title,
            "article_content": content,
            # rebuilt url = URL_PRF + dictionary value (:100-101,216)
            "article_url": f"http://www.example.com/wiki/baike/search?kw={name}",
            "article_time": time,
        },
    }]


# ---------------------------------------------------------------------------
# bitauto_car ⇠ Crawler4BitAuto detail page (crawler/auto/Crawler4BitAuto.
# java:360-530): label-th → nextElementSibling td walk over two spec
# tables; size assembled chang-kuan-gao with ''-holes (:508-510).


def extract_bitauto_car(url: str, html: str) -> list[dict]:
    idx = _url_idx(url)
    root = parse(html)
    name = _sel_text(root, "h3.car-name > a")
    style = _sel_text(root, "#car-pop")
    price = _sel_text(root, "#jiaGeDetail > span > em")

    def th_walk(table_sel: str, labels: dict[str, str]) -> dict[str, str]:
        out = dict.fromkeys(labels.values(), "")
        for table in root.select(table_sel):
            for tr in table.select("tbody > tr"):
                for th in tr.select("tr > th"):
                    lbl = th.text()
                    if lbl in labels:
                        sib = th.next_element_sibling()
                        if sib is not None:
                            out[labels[lbl]] = sib.text()
        return out

    perf = th_walk("#DicCarParameter table.perf", {
        "最高车速": "speed", "综合工况油耗": "fuel",
        "保修政策": "pqa", "变速箱": "gearbox",
    })
    dims = th_walk("#DicCarParameter table.dims", {"长": "chang", "宽": "kuan", "高": "gao"})
    size = f"{dims['chang']}-{dims['kuan']}-{dims['gao']}"
    return [{
        "rowkey": f"00030006_b{idx % 40}_{310000 + idx}",
        "family": "auto_info",
        "cols": {
            "name": name, "style": style, "price": price,
            "fuel": perf["fuel"], "size": size, "gearbox": perf["gearbox"],
            "speed": perf["speed"], "pqa": perf["pqa"],
        },
    }]


# ---------------------------------------------------------------------------
# bitauto_user ⇠ Crawler4BitAuto user garage (Crawler4BitAuto.java:140-315):
# three regex-gated sections (3=driving :177-198, 2=followed :202-237,
# 4=planned :240-273) folded into carId(type) strings — including the
# String-'==' bug (:185-186 etc.): flag is always false, so each put
# REPLACES the list and every car keeps only the LAST section's type.


def extract_bitauto_user(url: str, html: str) -> list[dict]:
    idx = _url_idx(url)
    root = parse(html)
    nickname = _sel_text(root, "#avatar_title > strong")
    city = level = ""
    for li in root.select("ul.his-infor > li"):
        t = li.text()
        got_city = _regexp_extract(t, r"地区：(.*)")
        got_level = _regexp_extract(t, r"等级：(.*)")
        if got_city:
            city = got_city
        if got_level:
            level = got_level
    cars: dict[str, int] = {}

    def section(sel: str, rx: str, car_type: int) -> None:
        for span in root.select(sel):
            m = re.search(rx, span.attr("href"))
            if m:
                # the reference's ArrayList is always replaced (== bug) —
                # last type wins, single-element list
                cars[m.group(1)] = car_type

    section("div.aiche_box span.car-link",
            r"^http://car.bitauto.com/([a-z,A-Z,0-9]+)/m([0-9]+)$", 3)
    section("div.guanzhucar_box span.car-link",
            r"^http://dealer.bitauto.com/zuidijia/nb([0-9]+)/?leads_source=0$", 2)
    section("div.plan_box span.car-link",
            r"^http://car.bitauto.com/([a-z,A-Z,0-9]+)/m([0-9]+)/$", 4)
    user_car = ",".join(f"{cid}({t})" for cid, t in cars.items())
    return [{
        "rowkey": f"00030006_{420000 + idx}",
        "family": "user_info",
        "cols": {
            "nickname": nickname, "city": city, "level": level,
            "user_car": user_car,
        },
    }]


# ---------------------------------------------------------------------------
# souhu_car ⇠ Crawler4Autosouhu detail page (crawler/auto/Crawler4Autosouhu.
# java:255-295): label-matched <li> scan — contains(label) then
# regexpExtract('label：(.*)').


def extract_souhu_car(url: str, html: str) -> list[dict]:
    idx = _url_idx(url)
    root = parse(html)
    name = _sel_text(root, "div.top_tit a.series")
    style = _sel_text(root, "#carType")
    price = _sel_text(root, "div.carInfos div.r div.price-box a font")
    fuel = pqa = gearbox = size = ""
    for ul in root.select("div.carInfos div.r ul"):
        for li in ul.select("ul > li"):
            t = li.text()
            if "工信部综合油耗：" in t:
                fuel = _regexp_extract(t, r"工信部综合油耗：(.*)")
            elif "保修政策：" in t:
                pqa = _regexp_extract(t, r"保修政策：(.*)")
            elif "变速箱：" in t:
                gearbox = _regexp_extract(t, r"变速箱：(.*)")
            elif "车身尺寸：" in t:
                size = _regexp_extract(t, r"车身尺寸：(.*)")
    return [{
        "rowkey": f"00030106_b{idx % 40}_{510000 + idx}",
        "family": "auto_info",
        "cols": {
            "name": name, "style": style, "price": price,
            "fuel": fuel, "pqa": pqa, "gearbox": gearbox, "size": size,
        },
    }]


# ---------------------------------------------------------------------------
# pcauto_user ⇠ Crawler4PCAuto user pages (crawler/auto/Crawler4PCAuto.java:
# 328-507). The follow/fan branches never initialize rowKey (:461-476), so
# those rows land under a NULL rowkey — an observable reference quirk the
# engine's F6 shape guard can route. friend ids come from input.accountId
# values gated by the 'current' nav anchor (parseFriendPage :680-699);
# document order stands in for the reference's HashSet order.


def extract_pcauto_user(url: str, html: str) -> list[dict]:
    idx = _url_idx(url)
    sub = idx % 3
    root = parse(html)
    if sub == 0:
        els = root.select("#her-index a")
        rowkey = None
        cols: dict[str, str] = {}
        if els:
            gender = els[0].text()
            user_id = _regexp_extract(els[0].attr("href"), r"http://my.pcauto.com.cn/(\d*)/")
            if user_id == "":  # userId miss → bail before any insert (:363-366)
                return []
            rowkey = f"00030104_{user_id}"
            cols["sex"] = "1" if "她" in gender else "0"
        name = area = birth = ""
        for span in root.select("div.user-info.clearfix div.user-con span"):
            t = span.text()
            if "用户" in t:
                name = t[t.index(":") + 1:].strip() if ":" in t else ""
            if "地区" in t:
                area = t[t.index(":") + 1:].strip() if ":" in t else ""
            if "生日" in t:
                birth = t[t.index(":") + 1:].strip() if ":" in t else ""
                if ":" in birth:
                    birth = birth[:10]
        cols["name"] = name
        cols["city"] = area
        cols["birthday"] = birth
        car_el = root.select_one("a[id^=carAttr]")
        cols["cars"] = car_el.attr("id").replace("carAttr", "") if car_el is not None else ""
        # getUserAttr secondary API is a live JSONP call → null here, but
        # the reference still inserts the empty strings (:440-455)
        cols["nickname"] = ""
        cols["level"] = ""
        cols["vip"] = ""
        cols["buy_info"] = ""
        return [{"rowkey": rowkey, "family": "user_info", "cols": cols}]
    kind = "follow" if sub == 1 else "fan"
    friends: list[str] = []
    for a in root.select("div.news > div > a"):
        if a.has_class("current") and kind in a.attr("href"):
            for inp in root.select("input.accountId"):
                v = inp.attr("value")
                if v not in friends:
                    friends.append(v)
    col = "following" if kind == "follow" else "followers"
    return [{
        "rowkey": None,  # rowKey never initialized on these pages (:461-476)
        "family": "user_info",
        "cols": {col: ",".join(friends), "buy_info": ""},
    }]


# ---------------------------------------------------------------------------
# pcauto_car ⇠ Crawler4PCAuto.getAutoInfo (crawler/auto/Crawler4PCAuto.java:
# 144-290): breadcrumb serial via regexpExtract on the LAST anchor's href,
# `var config` script JSON, Name-switched items each looping ModelExcessIds
# into per-autoId keyed rows (A5 multi-row assembly), C12 万-extract on
# price. No breadcrumb guard: serialId '' yields '00030104__mX' rowkeys.

_PCAUTO_COL_BY_NAME = {
    "车型名称": "style", "级别": "level", "厂商指导价(元)": "price",
    "最高车速(km/h)": "speed", "工信部综合油耗(L/100km)": "fuel",
    "长×宽×高(mm)": "size", "车体结构": "struct", "整车质保": "pqa",
    "发动机": "engine", "变速箱": "gearbox",
}


def extract_pcauto_car(url: str, html: str) -> list[dict]:
    root = parse(html)
    crumbs = root.select("div.position > div.pos-mark > a")
    serial = ""
    if crumbs:
        serial = _regexp_extract(crumbs[-1].attr("href"), r"/sg(\d*)/")
    rows: list[dict] = []
    by_key: dict[str, dict] = {}
    for script in root.select("script"):
        content = script.html_inner()
        if "var config =" not in content:
            continue
        js = _regexp_extract(content, r"var config = (\{.*\});?")
        if not js:
            continue
        try:
            cfg = json.loads(js)
        except ValueError:
            continue
        for item in cfg.get("body", {}).get("items", []):
            col = _PCAUTO_COL_BY_NAME.get(item.get("Name", ""))
            if col is None:
                continue
            for model in item.get("ModelExcessIds", []):
                auto_id = str(model.get("Id", ""))
                value = str(model.get("Value", ""))
                if col == "price":
                    value = _regexp_extract(value, r"([.\d]*)万")
                rk = f"00030104_{serial}_{auto_id}"
                if rk not in by_key:
                    by_key[rk] = {"rowkey": rk, "family": "auto_info", "cols": {}}
                    rows.append(by_key[rk])
                by_key[rk]["cols"][col] = value
    return rows


# ---------------------------------------------------------------------------
# haodf_article ⇠ Crawler4Haodf.parseExpertArticles (crawler/medcine/
# Crawler4Haodf.java:62-166): first()-match selectors with per-field
# sentinel defaults, jsoup [attr!=val] on the pub-time span, a failure-tag
# accumulator (failedURLs — the reference's only sink besides stdout), and
# the copy-paste bug where a pub-time miss logs '[No title]' (:109-111).


def extract_haodf_article(url: str, html: str) -> list[dict]:
    root = parse(html)
    missing: list[str] = []

    def first_text(selector: str, sentinel: str, tag: str) -> str:
        el = root.select_one(selector)
        if el is None:
            missing.append(tag)
            return sentinel
        return el.text()

    cat = first_text("div.bg_w.mb20 > p.art_detail_cate", "未知分类", "[No category]")
    title = first_text("body h1.fn > p", "未知标题", "[No title]")
    ptime = first_text(
        "body p.pb20.gray2.tc.pt5.fs span[class!=ml20][class!=tc]",
        "未知时间", "[No title]",  # reference bug: wrong tag for pub time
    )
    writer = first_text(
        "body p.pb20.gray2.tc.pt5.fs span[class=ml20] a", "未知作者",
        "[No article writer]",
    )
    pv = first_text(
        "body p.pb20.gray2.tc.pt5.fs span[class=ml20] font", "未知次数",
        "[No articlePV]",
    )
    content = first_text("body div.article_detail", "未知内容", "[No content]")
    return [{
        "rowkey": None,  # log-only sink: the reference forms no rowkey
        "family": "article_log",
        "cols": {
            "category": cat, "title": title, "pub_time": ptime,
            "writer": writer, "pv": pv, "content": content,
            "missing": ",".join(missing),
        },
    }]


EXTRACTORS = {
    "auto_config": extract_auto_config,
    "auto_user": extract_auto_user,
    "bbs_post": extract_bbs_post,
    "dealer_list": extract_dealer_list,
    "ec_product": extract_ec_product,
    "article": extract_article,
    "tour_detail": extract_tour_detail,
    "news_article": extract_news_article,
    "json_api": extract_json_api,
    "zhishiku": extract_zhishiku,
    "bitauto_car": extract_bitauto_car,
    "bitauto_user": extract_bitauto_user,
    "souhu_car": extract_souhu_car,
    "pcauto_user": extract_pcauto_user,
    "pcauto_car": extract_pcauto_car,
    "haodf_article": extract_haodf_article,
}


def classify_url(url: str) -> str:
    """F2 URL-class dispatch (shouldVisit regex gates, e.g.
    Crawler4Autohome.java:97-141): archetype from the URL path."""
    m = re.search(r"https?://[^/]+/([a-z_]+)/", url or "")
    arch = m.group(1) if m else ""
    return arch if arch in EXTRACTORS else ""


def extract(url: str, html: str) -> list[dict]:
    arch = classify_url(url)
    if not arch:
        return []
    return EXTRACTORS[arch](url, html)
