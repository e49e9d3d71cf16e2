"""Scalar function family queries (SURVEY §2.9): string, regex, math,
date/time, conditional, hash, array/explode — each family exercised over the
benchmark tables with a DuckDB oracle.

Reference function catalogs: BuiltInFunctionDefinitions.java +
FlinkSqlOperatorTable.java; runtime SqlFunctionUtils.java / SqlDateTimeUtils.java.
All Spark-side expressions are built-in ``pyspark.sql.functions`` (JVM codegen);
the handful of Flink-only names live in functions/scalar.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalar import split_index
from ..registry import micro, query


@query(
    "func_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                    AS up,
           lower(p_brand)                   AS lo,
           length(p_name)                   AS len,
           substr(p_name, 1, 5)             AS sub,
           concat(p_brand, ':', p_type)     AS cat,
           replace(p_name, ' ', '_')        AS rep,
           reverse(p_brand)                 AS rev,
           lpad(p_brand, 12, '*')           AS pad_l,
           rpad(p_brand, 12, '#')           AS pad_r,
           trim('  ' || p_brand || ' ')     AS trimmed,
           ltrim('xxy' || p_brand, 'xy')    AS ltrimmed,
           repeat(p_brand, 2)               AS rep2,
           left(p_name, 3)                  AS l3,
           right(p_name, 3)                 AS r3,
           ascii(p_brand)                   AS asc_first,
           instr(p_name, 'a')               AS pos_a
    FROM part ORDER BY p_partkey
    """,
)
def func_string(spark, sf_dir):
    """String library: CHAR_LENGTH/UPPER/LOWER/TRIM/SUBSTRING/CONCAT/REPLACE/
    REPEAT/REVERSE/LEFT/RIGHT/LPAD/RPAD/ASCII/POSITION (SURVEY §2.9 row 2)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").alias("len"),
        F.substring("p_name", 1, 5).alias("sub"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("cat"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("rep"),
        F.reverse("p_brand").alias("rev"),
        F.lpad("p_brand", 12, "*").alias("pad_l"),
        F.rpad("p_brand", 12, "#").alias("pad_r"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.expr("ltrim('xy', concat('xxy', p_brand))").alias("ltrimmed"),
        F.repeat("p_brand", 2).alias("rep2"),
        F.left(F.col("p_name"), F.lit(3)).alias("l3"),
        F.right(F.col("p_name"), F.lit(3)).alias("r3"),
        F.ascii("p_brand").alias("asc_first"),
        F.instr(F.col("p_name"), "a").alias("pos_a"),
    ).orderBy("p_partkey")


@query(
    "func_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)', 1)            AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g')      AS devoweled,
           regexp_matches(p_brand, '[0-9]$')                AS ends_digit,
           regexp_extract(props, '"k":\\s*([0-9]+)', 1)     AS k_str
    FROM part, (SELECT props FROM events LIMIT 1)
    ORDER BY p_partkey
    """,
)
def func_regex(spark, sf_dir):
    """REGEXP / REGEXP_EXTRACT / REGEXP_REPLACE (reference SqlLikeUtils +
    Calcite REGEXP ops). Note Spark regexp_replace is global by default —
    DuckDB needs the 'g' flag to match."""
    part = load_table(spark, sf_dir, "part")
    ev = load_table(spark, sf_dir, "events").select("props").limit(1)
    return (
        part.crossJoin(F.broadcast(ev))
        .select(
            "p_partkey",
            F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
            F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
            F.col("p_brand").rlike("[0-9]$").alias("ends_digit"),
            F.regexp_extract("props", '"k":\\s*([0-9]+)', 1).alias("k_str"),
        )
        .orderBy("p_partkey")
    )


@query(
    "func_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)                    AS a,
           CAST(floor(l_extendedprice * 1e1 + 0.5) AS BIGINT) AS r1,
           CAST(floor(l_extendedprice) AS BIGINT)    AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT)     AS ce,
           CAST(floor(sqrt(l_quantity) * 1e6 + 0.5) AS BIGINT) AS sq,
           CAST(floor(exp(l_discount) * 1e6 + 0.5) AS BIGINT) AS ex,
           CAST(floor(ln(l_extendedprice) * 1e6 + 0.5) AS BIGINT) AS lg,
           CAST(floor(log10(l_extendedprice) * 1e6 + 0.5) AS BIGINT) AS l10,
           CAST(floor(power(l_quantity, 2) * 1e6 + 0.5) AS BIGINT) AS pw,
           mod(CAST(l_quantity AS BIGINT), 7)        AS md,
           CAST(sign(l_discount - 0.05) AS DOUBLE)   AS sg,
           CAST(floor((sin(l_discount) + cos(l_discount)) * 1e6 + 0.5) AS BIGINT) AS trig,
           CAST(floor(atan2(l_quantity, 10.0) * 1e6 + 0.5) AS BIGINT) AS at2,
           CAST(floor(degrees(l_discount) * 1e6 + 0.5) AS BIGINT) AS dg,
           CAST(floor(radians(l_quantity) * 1e6 + 0.5) AS BIGINT) AS rd,
           greatest(l_quantity, 25.0)                AS gr,
           least(l_quantity, 25.0)                   AS le
    FROM lineitem WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def func_math(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("a"),
        micro(F.col("l_extendedprice"), 1).alias("r1"),
        F.floor("l_extendedprice").alias("fl"),
        F.ceil("l_extendedprice").alias("ce"),
        micro(F.sqrt("l_quantity"), 6).alias("sq"),
        micro(F.exp("l_discount"), 6).alias("ex"),
        micro(F.log("l_extendedprice"), 6).alias("lg"),
        micro(F.log10("l_extendedprice"), 6).alias("l10"),
        micro(F.pow("l_quantity", 2), 6).alias("pw"),
        (F.col("l_quantity").cast("bigint") % 7).alias("md"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
        micro(F.sin("l_discount") + F.cos("l_discount"), 6).alias("trig"),
        micro(F.atan2(F.col("l_quantity"), F.lit(10.0)), 6).alias("at2"),
        micro(F.degrees("l_discount"), 6).alias("dg"),
        micro(F.radians("l_quantity"), 6).alias("rd"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("gr"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("le"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "func_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                               AS y,
           month(o_orderdate)                              AS m,
           day(o_orderdate)                                AS d,
           quarter(o_orderdate)                            AS q,
           dayofyear(o_orderdate)                          AS doy,
           isodow(o_orderdate)                             AS dow_iso,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS plus30,
           datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT)              AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')      AS formatted
    FROM orders WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
)
def func_datetime(spark, sf_dir):
    """Date/time library (reference SqlDateTimeUtils.java, 1632 LoC → all
    built-in Spark expressions). ISO day-of-week bridges the Spark(Sun=1) /
    DuckDB(isodow Mon=1) difference."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofyear("o_orderdate").alias("doy"),
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("dow_iso"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "yyyy-MM-dd"
        ).alias("plus30"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_y2k"),
        F.unix_timestamp(F.col("o_orderdate")).alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("formatted"),
    ).orderBy("o_orderkey")


@query(
    "func_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                            AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'open')   AS status2,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent,
           if(o_totalprice > 200000, 'big', 'small')      AS size_label,
           greatest(o_custkey, o_orderkey % 1000, 7)      AS g3,
           least(o_custkey, o_orderkey, 100000)           AS l3
    FROM orders WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def func_conditional(spark, sf_dir):
    """CASE/COALESCE/NULLIF/IF/GREATEST/LEAST (SURVEY §2.9 row 1;
    reference FlinkSqlOperatorTable GREATEST/LEAST)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status2"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "is_urgent"
        ),
        F.when(F.col("o_totalprice") > 200000, "big")
        .otherwise("small")
        .alias("size_label"),
        F.greatest(F.col("o_custkey"), F.col("o_orderkey") % 1000, F.lit(7)).alias(
            "g3"
        ),
        F.least("o_custkey", "o_orderkey", F.lit(100000)).alias("l3"),
    ).orderBy("o_orderkey")


@query(
    "func_hash",
    oracle="""
    SELECT doc_id,
           md5(text)                 AS h_md5,
           sha256(text)              AS h_sha256,
           md5(concat(lang, source)) AS h_concat
    FROM documents ORDER BY doc_id
    """,
)
def func_hash(spark, sf_dir):
    """MD5/SHA2 (reference FlinkSqlOperatorTable MD5/SHA2...SHA512)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        F.md5(F.concat("lang", "source")).alias("h_concat"),
    ).orderBy("doc_id")


@query(
    "func_split_explode",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    WHERE word <> ''
    GROUP BY word ORDER BY n DESC, word
    """,
)
def func_split_explode(spark, sf_dir):
    """UNNEST / table-function join (reference SqlUnnestUtils + Correlate →
    Spark explode; SURVEY §2.2/2.3 lateral rows)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_name", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
    )


@query(
    "func_split_index",
    oracle="""
    SELECT p_partkey,
           string_split(p_type, ' ')[1] AS word0,
           string_split(p_type, ' ')[2] AS word1
    FROM part ORDER BY p_partkey
    """,
)
def func_split_index(spark, sf_dir):
    """Flink SPLIT_INDEX gap function (functions/scalar.py, reference
    SqlFunctionUtils.splitIndex)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        split_index("p_type", " ", 0).alias("word0"),
        split_index("p_type", " ", 1).alias("word1"),
    ).orderBy("p_partkey")


@query(
    "func_json",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k":\\s*([0-9]+)', 1) AS BIGINT) AS k_val
    FROM events WHERE user_id < 10 ORDER BY event_id
    """,
)
def func_json(spark, sf_dir):
    """JSON value extraction over the events props column (reference 1.13 has
    JSON predicates only; get_json_object is the Spark superset, SURVEY §2.9)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    ).orderBy("event_id")


@query(
    "func_parity_wide",
    oracle="""
    SELECT doc_id,
           upper(lang) AS up, lower(source) AS lo, length(text) AS len,
           trim(substr(text, 1, 12)) AS sub12,
           concat(lang, '-', source) AS cat,
           concat_ws('|', lang, source) AS catws,
           lpad(lang, 6, '_') AS lpadded, rpad(lang, 6, '_') AS rpadded,
           reverse(lang) AS rev, replace(lang, 'e', 'E') AS repl,
           repeat(lang, 2) AS rep2, ascii(lang) AS asc_,
           left(text, 5) AS l5, right(text, 5) AS r5,
           instr(text, 'the') AS pos_the,
           abs(n_chars - 500) AS a,
           CAST(ceil(n_chars / 7.0) AS BIGINT) AS ce,
           CAST(floor(n_chars / 7.0) AS BIGINT) AS fl,
           CAST(floor(n_chars / 7.0 * 1e2 + 0.5) AS BIGINT) AS ro,
           CAST(floor(sqrt(n_chars) * 1e6 + 0.5) AS BIGINT) AS sq,
           CAST(floor(ln(n_chars + 1) * 1e6 + 0.5) AS BIGINT) AS lnp,
           CAST(floor(log10(n_chars + 1) * 1e6 + 0.5) AS BIGINT) AS lg,
           pow(doc_id % 5, 2) AS pw, doc_id % 7 AS md,
           CAST(sign(n_chars - 300) AS DOUBLE) AS sg,
           CAST(floor(sin(doc_id % 10) * 1e6 + 0.5) AS BIGINT) AS sn,
           CAST(floor(cos(doc_id % 10) * 1e6 + 0.5) AS BIGINT) AS cs,
           CAST(floor(degrees(1.0) * 1e6 + 0.5) AS BIGINT) AS dg,
           CAST(floor(radians(90.0) * 1e6 + 0.5) AS BIGINT) AS rd,
           greatest(n_chars, doc_id) AS gr, least(n_chars, doc_id) AS le,
           coalesce(nullif(lang, 'en'), 'english') AS co,
           CASE WHEN n_chars > 300 THEN 'long' ELSE 'short' END AS cl,
           sha256(text) AS sh
    FROM documents ORDER BY doc_id
    """,
)
def func_parity_wide(spark, sf_dir):
    """One-shot parity sweep over ~35 reference scalar functions (SURVEY
    §2.9 families: string/math/conditional/hash) — every expression is a
    Spark built-in evaluated identically by DuckDB, demonstrating the
    name-for-name mapping holds on real data, not just the table in SURVEY."""
    docs = load_table(spark, sf_dir, "documents")
    c = F.col
    return docs.select(
        "doc_id",
        F.upper("lang").alias("up"),
        F.lower("source").alias("lo"),
        F.length("text").alias("len"),
        F.trim(F.substring("text", 1, 12)).alias("sub12"),
        F.concat(c("lang"), F.lit("-"), c("source")).alias("cat"),
        F.concat_ws("|", "lang", "source").alias("catws"),
        F.lpad("lang", 6, "_").alias("lpadded"),
        F.rpad("lang", 6, "_").alias("rpadded"),
        F.reverse("lang").alias("rev"),
        F.replace(c("lang"), F.lit("e"), F.lit("E")).alias("repl"),
        F.repeat("lang", 2).alias("rep2"),
        F.ascii("lang").alias("asc_"),
        F.left(c("text"), F.lit(5)).alias("l5"),
        F.right(c("text"), F.lit(5)).alias("r5"),
        F.instr("text", "the").alias("pos_the"),
        F.abs(c("n_chars") - 500).alias("a"),
        F.ceil(c("n_chars") / 7.0).alias("ce"),
        F.floor(c("n_chars") / 7.0).alias("fl"),
        micro(c("n_chars") / 7.0, 2).alias("ro"),
        micro(F.sqrt("n_chars"), 6).alias("sq"),
        micro(F.log(c("n_chars") + 1), 6).alias("lnp"),
        micro(F.log10(c("n_chars") + 1), 6).alias("lg"),
        F.pow(c("doc_id") % 5, 2).alias("pw"),
        (c("doc_id") % 7).alias("md"),
        F.signum(c("n_chars") - 300).alias("sg"),
        micro(F.sin(c("doc_id") % 10), 6).alias("sn"),
        micro(F.cos(c("doc_id") % 10), 6).alias("cs"),
        micro(F.degrees(F.lit(1.0)), 6).alias("dg"),
        micro(F.radians(F.lit(90.0)), 6).alias("rd"),
        F.greatest("n_chars", "doc_id").alias("gr"),
        F.least("n_chars", "doc_id").alias("le"),
        F.coalesce(F.nullif(c("lang"), F.lit("en")), F.lit("english")).alias("co"),
        F.when(c("n_chars") > 300, "long").otherwise("short").alias("cl"),
        F.sha2(c("text"), 256).alias("sh"),
    ).orderBy("doc_id")
