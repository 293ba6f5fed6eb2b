"""Weather2345 area-code import job (the reference's entry point B family:
flat-file JS-array parse → parent self-join → HBase sink).

Mirrors Weather2345.doCrawl (…/crawler/tianqi/weather2345/Weather2345.java:
35-182), composed from tested operator pieces as one declarative plan:

  S6 scan      JS-array flat file: prov[..]='a|b' → "'(.*)'";
               provqx[..]=['a','b'] → "=\\['(.*)'\\]" (getSourceLineList
               :150-182), then split on "','" and flatten
  tokenize     only elements containing '|' are parsed (initArea :101);
               split on '|', per-token regex (\\w+)-[A-Z]\\s(.*)-(\\d+)
               → (code, name, belongToCode) (:106-113)
  C-strip      leading 'a' stripped from codes (:115-118)
  J5 self-join rebuildArea (:130-148): parent_name = own name when
               code == belongToCode, else the parent row's name
  sink         rowkey '00050011_'+code, family 'info', cols {code, name,
               parent_code, parent_name, full_name} where full_name
               prefixes the parent name when it differs (:64-91)

Input codes are expected unique per file (the reference keys a HashMap by
code; synthesized fixtures guarantee uniqueness so no overwrite-order
semantics are exercised). All Column expressions — no Python in the plan;
the parse is a narrow map over lines, the self-join is the only shuffle
(broadcast-sized in practice: the area registry is config-scale data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROWKEY_PREFIX = "00050011"
FAMILY = "info"

_TOKEN_RE = r"(\w+)-[A-Z]\s(.*)-(\d+)"


def parse_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """getSourceLineList + initArea: line → content → elements → tokens →
    (code, name, belong_to_code) rows."""
    line = F.col(line_col)
    content = (
        F.when(line.startswith("prov["), F.regexp_extract(line, r"'(.*)'", 1))
        .when(line.startswith("provqx["), F.regexp_extract(line, r"=\['(.*)'\]", 1))
        .otherwise(F.lit(""))
    )
    elements = (
        lines.select(F.explode(F.split(content, r"','")).alias("element"))
        # initArea's `line.contains("|")` gate: pipe-less elements dropped
        .filter(F.col("element").contains("|"))
    )
    tokens = elements.select(F.explode(F.split("element", r"\|")).alias("token"))
    code = F.regexp_extract("token", _TOKEN_RE, 1)
    return (
        tokens.select(
            code.alias("code"),
            F.regexp_extract("token", _TOKEN_RE, 2).alias("name"),
            F.regexp_extract("token", _TOKEN_RE, 3).alias("belong_to_code"),
        )
        .filter(F.col("code") != "")  # matcher.find() gate
        .withColumn(
            "code",
            F.when(F.col("code").startswith("a"),
                   F.expr("substring(code, 2)")).otherwise(F.col("code")),
        )
    )


def rebuild_parents(areas: DataFrame) -> DataFrame:
    """rebuildArea: parent_name = own name for self-parented rows, else
    the parent area's name (J5 self-join on the code hierarchy)."""
    parents = areas.select(
        F.col("code").alias("p_code"), F.col("name").alias("p_name")
    )
    joined = areas.join(
        F.broadcast(parents), areas.belong_to_code == parents.p_code, "left"
    )
    parent_name = F.when(
        F.col("code") == F.col("belong_to_code"), F.col("name")
    ).otherwise(F.col("p_name"))
    return joined.select(
        "code", "name", "belong_to_code", parent_name.alias("parent_name")
    )


def assemble(rows: DataFrame) -> DataFrame:
    """insertIntoHBase rows: full_name prefixes the parent when it differs."""
    full_name = F.when(
        F.col("name") != F.col("parent_name"),
        F.concat_ws(",", "parent_name", "name"),
    ).otherwise(F.col("name"))
    return rows.select(
        F.concat_ws("_", F.lit(ROWKEY_PREFIX), "code").alias("rowkey"),
        F.lit(FAMILY).alias("family"),
        F.create_map(
            F.lit("code"), F.col("code"),
            F.lit("name"), F.col("name"),
            F.lit("parent_code"), F.col("belong_to_code"),
            F.lit("parent_name"), F.col("parent_name"),
            F.lit("full_name"), full_name,
        ).alias("cols"),
    )


def run_import(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """file lines → parse → parent rebuild → wide rows."""
    return assemble(rebuild_parents(parse_lines(lines, line_col)))
