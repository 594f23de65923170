"""SURVEY §2.8 — scalar function library (string/regex/date/math/array/JSON).

One declared query per family exercising several functions in one SELECT.
Everything is a built-in Catalyst expression (no Python UDFs): these all
run inside WholeStageCodegen. The haversine primitive (the AIS-domain
geo-distance) is a reusable composition of built-ins, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core import as_date, fan_out, fan_out_scaled
from ..io import table
from ..registry import register


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km, composed from built-in expressions.

    The AIS-domain core primitive (vessel-track distances) — kept JVM-side
    so it vectorizes inside codegen rather than crossing into Python.
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2 * 6371.0) * F.asin(F.sqrt(a))


@register(
    "fn_string",
    section="2.8",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS up,
           LOWER(p_brand) AS lo,
           CAST(LENGTH(p_name) AS BIGINT) AS len,
           SUBSTRING(p_name, 1, 5) AS sub5,
           CONCAT(p_brand, '_', p_type) AS bt,
           REPLACE(p_name, ' ', '_') AS und,
           LPAD(CAST(p_size AS VARCHAR), 3, '0') AS sz3,
           TRIM(p_name) AS tr,
           SPLIT_PART(p_name, ' ', 1) AS first_word
    FROM part
    """,
)
def fn_string(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").cast("long").alias("len"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.concat(F.col("p_brand"), F.lit("_"), F.col("p_type")).alias("bt"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("und"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("sz3"),
        F.trim("p_name").alias("tr"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
    )


@register(
    "fn_regex",
    section="2.8",
    oracle=r"""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS cust_num,
           regexp_replace(c_name, '0+', '0', 'g') AS squeezed
    FROM customer
    """,
    notes="DuckDB regexp_replace needs 'g' flag to match Spark's replace-all",
)
def fn_regex(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("long").alias("cust_num"),
        F.regexp_replace("c_name", "0+", "0").alias("squeezed"),
    )


@register(
    "fn_date",
    section="2.8",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od,
           CAST(YEAR(o_orderdate) AS INT) AS y,
           CAST(MONTH(o_orderdate) AS INT) AS m,
           CAST(QUARTER(o_orderdate) AS INT) AS q,
           CAST(DAY(o_orderdate) AS INT) AS d,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
             AS days_since,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due
    FROM orders
    """,
    notes="datediff arg order: Spark datediff(end,start) == DuckDB date_diff('day',start,end)",
)
def fn_date(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        as_date(od).cast("string").alias("od"),
        F.year(od).alias("y"),
        F.month(od).alias("m"),
        F.quarter(od).alias("q"),
        F.dayofmonth(od).alias("d"),
        as_date(F.date_trunc("month", od)).cast("string").alias("month_start"),
        F.datediff(as_date(od), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_add(as_date(od), 30).cast("string").alias("due"),
    )


@register(
    "fn_math",
    section="2.8",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SQRT(l_extendedprice), 4) AS sq,
           ROUND(LN(l_extendedprice), 6) AS lnp,
           ROUND(LOG10(l_extendedprice), 6) AS lg,
           CAST(CEIL(l_quantity) AS BIGINT) AS cq,
           CAST(FLOOR(l_tax * 100) AS BIGINT) AS ft,
           ROUND(ABS(l_discount - 0.05), 4) AS dd,
           ROUND(POW(1 + l_discount, 2), 6) AS p2,
           ROUND(2 * 6371.0 * ASIN(SQRT(
             SIN(RADIANS(((l_orderkey % 180) - 90) - ((l_partkey % 180) - 90)) / 2) ^ 2
             + COS(RADIANS((l_partkey % 180) - 90)) * COS(RADIANS((l_orderkey % 180) - 90))
             * SIN(RADIANS((((l_partkey + l_suppkey) % 360) - 180)
                           - ((l_suppkey % 360) - 180)) / 2) ^ 2)), 4) AS hav_km
    FROM lineitem
    """,
    notes="haversine over synthetic lat/lon derived from keys (fixtures lack geo columns)",
)
def fn_math(spark, sf_dir):
    # fan_out: per-row trig dominates; the one-row-group fixture would
    # otherwise evaluate it all on a single core
    li = fan_out(table(spark, sf_dir, "lineitem"))
    lat1 = (F.col("l_partkey") % 180) - 90
    lon1 = (F.col("l_suppkey") % 360) - 180
    lat2 = (F.col("l_orderkey") % 180) - 90
    lon2 = ((F.col("l_partkey") + F.col("l_suppkey")) % 360) - 180
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 4).alias("sq"),
        F.round(F.log("l_extendedprice"), 6).alias("lnp"),
        F.round(F.log10("l_extendedprice"), 6).alias("lg"),
        F.ceil("l_quantity").cast("long").alias("cq"),
        F.floor(F.col("l_tax") * 100).cast("long").alias("ft"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("dd"),
        F.round(F.pow(1 + F.col("l_discount"), 2), 6).alias("p2"),
        F.round(haversine_km(lat1, lon1, lat2, lon2), 4).alias("hav_km"),
    )


@register(
    "fn_array",
    section="2.8",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS e1,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS emax,
           ROUND(SQRT(list_aggregate(
             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             'sum')), 6) AS l2,
           ROUND(list_aggregate(
             list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6) AS esum
    FROM embeddings
    """,
    notes="higher-order fns (transform/aggregate); both engines fold lists in order",
)
def fn_array(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    el_sum = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("e1"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("emax"),
        F.round(F.sqrt(sq_sum), 6).alias("l2"),
        F.round(el_sum, 6).alias("esum"),
    )


@register(
    "fn_json",
    section="2.8",
    oracle="""
    SELECT event_id, user_id,
           CAST(json_extract(props, '$.k') AS INT) AS k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) BETWEEN 10 AND 50
    """,
)
def fn_json(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # Spark 4 VARIANT path: parse_json + try_variant_get beats both
    # get_json_object (JsonPath per call) and from_json (struct coercion)
    # by ~25% at sf0.1; fan_out first because the parse, not the scan,
    # dominates this query and the fixture is a one-row-group file.
    # Re-measured round 5 (steady-state, sf0.1): 0.077 s with fan_out vs
    # 0.447 s without — the repartition pays for itself 6x here.
    # Round 12: width is now WORK-derived (bytes/256KB, ~8 tasks at
    # sf0.1) instead of defaultParallelism — identical at any core
    # count, killing the r11 driver bench's 8-vs-32-core inversion
    # (0.048 s @8 vs 0.235 s @32); measured 0.060 vs 0.050 s steady @32
    # locally (width 8 vs 32), the 10 ms buying core-count invariance.
    src = fan_out_scaled(ev.select("event_id", "user_id", "props"))
    k = F.expr("try_variant_get(parse_json(props), '$.k', 'int')")
    return (
        src.withColumn("k", k)
        .where(F.col("k").between(10, 50))
        .select("event_id", "user_id", "k")
    )


@register(
    "fn_misc",
    section="2.8",
    oracle="""
    SELECT o_orderkey,
           ROUND(GREATEST(o_totalprice, 250000.0), 2) AS hi,
           ROUND(LEAST(o_totalprice, 250000.0), 2) AS lo,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status2,
           CAST(o_orderkey & 255 AS BIGINT) AS lo_byte,
           CAST(o_orderkey | 1 AS BIGINT) AS odd_key,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_xor,
           CAST(o_orderkey % 7 AS BIGINT) AS mod7,
           CASE WHEN o_totalprice > 250000 THEN 'big' ELSE 'small' END AS size_tag
    FROM orders
    """,
    notes="greatest/least, ifnull-style coalesce, bitwise and/or/xor, modulo",
)
def fn_misc(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.round(F.greatest(F.col("o_totalprice"), F.lit(250000.0)), 2).alias("hi"),
        F.round(F.least(F.col("o_totalprice"), F.lit(250000.0)), 2).alias("lo"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status2"),
        key.bitwiseAND(F.lit(255)).alias("lo_byte"),
        key.bitwiseOR(F.lit(1)).alias("odd_key"),
        key.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        (key % 7).alias("mod7"),
        F.when(F.col("o_totalprice") > 250000, "big").otherwise("small").alias("size_tag"),
    )


@register(
    "fn_array2",
    section="2.8",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           array_to_string(toks[1:3], ',') AS first3,
           CAST(list_contains(toks, 'spark') AS INT) AS has_spark,
           CAST(list_position(toks, 'data') AS INT) AS data_pos,
           array_to_string(list_sort(toks[1:5]), ',') AS sorted5
    FROM t
    """,
    notes="array slice/contains/position/sort; DuckDB 1-based slices == Spark F.slice(start=1)",
)
def fn_array2(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 3), ",").alias("first3"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.array_position(toks, "data").cast("int").alias("data_pos"),
        F.array_join(F.array_sort(F.slice(toks, 1, 5)), ",").alias("sorted5"),
    )


@register(
    "fn_date2",
    section="2.8",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS VARCHAR)
             AS month_end,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(weekofyear(o_orderdate) AS INT) AS woy
    FROM orders
    """,
    notes="last_day / dayofyear / ISO weekofyear (parity probed: both engines ISO weeks)",
)
def fn_date2(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(as_date(od)).cast("string").alias("month_end"),
        F.dayofyear(od).alias("doy"),
        F.weekofyear(od).alias("woy"),
    )


@register(
    "fn_fuzzy",
    section="2.8",
    oracle="""
    WITH p AS (SELECT p_partkey, p_name,
                      string_split(p_name, ' ')[1] AS blk
               FROM part WHERE p_size = 1)
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM p a JOIN p b
      ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE abs(length(a.p_name) - length(b.p_name)) <= 5
      AND levenshtein(a.p_name, b.p_name) <= 5
    """,
    notes="BLOCKED fuzzy string matching, the record-linkage shape that "
    "survives scale: candidates come from a first-token equality block "
    "(an equi-join -> shuffled hash join, never a BNLJ all-pairs), a "
    "length-difference <= k necessary-condition prefilter prunes before "
    "the edit distance, and exact levenshtein re-ranks only within "
    "blocks. Blocking trades recall for linearity by design (pairs "
    "differing in their first token are not candidates) — the exact- "
    "recall alternative is PassJoin-style segment blocking (ed<=k => "
    "one of k+1 segments matches exactly), same equi-join skeleton",
)
def fn_fuzzy(spark, sf_dir):
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_size") == 1)
        .select(
            "p_partkey",
            "p_name",
            F.split(F.col("p_name"), " ")[0].alias("blk"),
        )
    )
    a = p.alias("a")
    b = p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .where(
            (
                F.abs(F.length(F.col("a.p_name")) - F.length(F.col("b.p_name")))
                <= 5
            )
            & (dist <= 5)
        )
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            dist.cast("int").alias("dist"),
        )
    )


@register(
    "fn_math2",
    section="2.8",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(EXP(l_discount), 6) AS e_disc,
           ROUND(TAN(l_tax), 6) AS tan_tax,
           ROUND(DEGREES(l_discount), 6) AS deg_disc,
           CAST(SIGN(l_quantity - 25) AS INT) AS qsign,
           ROUND(LOG(2, l_quantity), 6) AS log2_q,
           CAST(FACTORIAL(CAST(l_linenumber AS INT)) AS BIGINT) AS lfact
    FROM lineitem
    """,
    notes="exp/tan/degrees/sign/log2/factorial; Spark log(base, x) == DuckDB log(base, x)",
)
def fn_math2(spark, sf_dir):
    # fan_out like fn_math: per-row transcendental work on a single-split
    # source would run on one task (measured 1.5s -> 1.0s warm at sf0.1)
    li = fan_out(table(spark, sf_dir, "lineitem"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.exp("l_discount"), 6).alias("e_disc"),
        F.round(F.tan("l_tax"), 6).alias("tan_tax"),
        F.round(F.degrees("l_discount"), 6).alias("deg_disc"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("qsign"),
        F.round(F.log(2.0, "l_quantity"), 6).alias("log2_q"),
        F.factorial(F.col("l_linenumber").cast("int")).cast("long").alias("lfact"),
    )


@register(
    "fn_map",
    section="2.8",
    oracle="""
    SELECT event_id,
           m['type'][1] AS etype,
           CAST(cardinality(m) AS INT) AS n_keys,
           array_to_string(list_sort(map_keys(m)), ',') AS keys
    FROM (SELECT event_id,
                 MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)} AS m
          FROM events) t
    """,
    notes="map construction + element access + key introspection; DuckDB "
    "map subscript returns a 1-element list, hence m[k][1] vs Spark's "
    "scalar element_at — keys sorted before joining so both engines agree",
)
def fn_map(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("etype"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
    )


@register(
    "fn_bitwise",
    section="2.8",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low8,
           CAST(xor(CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT))
                AS BIGINT) AS x,
           CAST(o_orderkey << 2 AS BIGINT) AS shl2,
           CAST(o_orderkey >> 3 AS BIGINT) AS shr3,
           CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INT) AS pop,
           CAST(~o_orderkey AS BIGINT) AS flipped
    FROM orders
    """,
    notes="bitwise family: and/xor/shifts/popcount/not — exact integer ops, "
    "identical on both engines",
)
def fn_bitwise(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("low8"),
        k.bitwiseXOR(F.col("o_custkey")).cast("long").alias("x"),
        F.shiftleft(k, 2).cast("long").alias("shl2"),
        F.shiftright(k, 3).cast("long").alias("shr3"),
        F.bit_count(k).cast("int").alias("pop"),
        F.bitwise_not(k).cast("long").alias("flipped"),
    )


@register(
    "fn_url",
    section="2.8",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           lang AS lang_param,
           'https' AS proto
    FROM documents
    """,
    notes="parse_url over a URL synthesized from document metadata (the "
    "fixtures carry no URL column): Spark does the real HOST/PATH/QUERY/"
    "PROTOCOL extraction; the oracle reconstructs the expected parts from "
    "the same metadata, so equality proves the parser inverts the "
    "construction exactly — the domain-extraction op every curation "
    "pipeline runs for per-site filtering",
)
def fn_url(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("#s1"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
    )


@register(
    "fn_try",
    section="2.8",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice / NULLIF(l_quantity - 1, 0) * 10000) / 10000
             AS unit_alt,
           TRY_CAST(CASE WHEN l_quantity < 10 THEN 'not a number'
                         ELSE CAST(l_quantity AS VARCHAR) END AS DOUBLE) AS q_parsed,
           CASE WHEN CAST(l_linenumber AS INT) <= 3
                THEN (ARRAY['a','b','c'])[CAST(l_linenumber AS INT)] END AS el
    FROM lineitem
    """,
    notes="error-safe function family: try_divide (NULL on /0, vs the "
    "oracle's NULLIF idiom), try_cast (NULL on bad parse), "
    "try_element_at (NULL out of bounds) — ANSI-mode-safe pipelines "
    "never abort a 100 TB job on one malformed row",
)
def fn_try(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    bad_or_num = F.when(F.col("l_quantity") < 10, F.lit("not a number")).otherwise(
        F.col("l_quantity").cast("string")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 1)
                * 10000
            )
            / 10000
        ).alias("unit_alt"),
        F.try_to_number(bad_or_num, F.lit("999.99")).cast("double").alias("q_parsed"),
        F.try_element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            F.col("l_linenumber").cast("int"),
        ).alias("el"),
    )


@register(
    "fn_map_hof",
    section="2.8",
    oracle="""
    SELECT event_id, 'type' AS key, UPPER(event_type) AS val FROM events
    UNION ALL
    SELECT event_id, 'src', 'events' FROM events
    """,
    notes="higher-order map functions: transform_values (upper), "
    "map_filter (drop the user entry), map_concat (provenance tag) — "
    "exploded to (key, val) rows so the oracle can state the expected "
    "entries directly; per-row only, no shuffle",
)
def fn_map_hof(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    m2 = F.transform_values(m, lambda k, v: F.upper(v))
    m3 = F.map_filter(m2, lambda k, v: k != "user")
    mc = F.map_concat(m3, F.create_map(F.lit("src"), F.lit("events")))
    return ev.select("event_id", F.explode(mc).alias("key", "val"))


@register(
    "fn_format",
    section="2.8",
    oracle="""
    SELECT p_partkey,
           printf('%s-%05d', p_brand, p_partkey) AS sku,
           repeat('*', CAST(p_size % 8 AS INT)) AS stars,
           reverse(p_brand) AS rev,
           concat_ws('|', p_brand, p_type) AS joined
    FROM part
    """,
    notes="printf-style formatting family: format_string/printf, repeat, "
    "reverse, concat_ws — pure per-row codegen expressions",
)
def fn_format(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string("%s-%05d", F.col("p_brand"), F.col("p_partkey")).alias("sku"),
        F.repeat(F.lit("*"), (F.col("p_size") % 8).cast("int")).alias("stars"),
        F.reverse(F.col("p_brand")).alias("rev"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("joined"),
    )


@register(
    "fn_collate_ci",
    section="2.8",
    oracle="""
    SELECT lower(p_brand) AS brand_ci,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types
    FROM part GROUP BY lower(p_brand)
    """,
    notes="case-insensitive grouping via Spark 4 COLLATION (UTF8_LCASE) — "
    "the collation travels with the column through the aggregate, so "
    "equality/grouping/joins become locale-aware WITHOUT rewriting "
    "every expression in lower() (and without breaking pushdown the "
    "way lower()-wrapping every predicate does). Output normalized to "
    "lower for the oracle, which spells the same semantics the "
    "pre-collation way",
)
def fn_collate_ci(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    ci = F.collate(F.col("p_brand"), "UTF8_LCASE")
    return (
        p.groupBy(ci.alias("brand_ci"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("p_type").alias("n_types"),
        )
        .select(
            F.lower(F.col("brand_ci").cast("string")).alias("brand_ci"),
            "n",
            "n_types",
        )
    )


@register(
    "fn_xpath",
    section="2.8",
    oracle="""
    SELECT n_nationkey,
           n_name AS name_out,
           CAST(n_regionkey AS BIGINT) AS region_out
    FROM nation
    """,
    notes="XPath function surface (xpath_string / xpath_long over an "
    "XML payload column): the payload is constructed from the row, "
    "extracted back via XPath, and the oracle is simply the source "
    "columns — a full value check that the construct->parse->extract "
    "path is lossless. The B2B-feed shape where upstream hands you "
    "XML fragments in a column; at scale this is per-row JVM string "
    "work inside codegen, no Python",
)
def fn_xpath(spark, sf_dir):
    n = table(spark, sf_dir, "nation")
    xml = F.concat(
        F.lit("<nation><name>"),
        F.col("n_name"),
        F.lit("</name><region>"),
        F.col("n_regionkey").cast("string"),
        F.lit("</region></nation>"),
    )
    return n.withColumn("xml_payload", xml).select(
        "n_nationkey",
        F.expr("xpath_string(xml_payload, '/nation/name')").alias("name_out"),
        F.expr("xpath_long(xml_payload, '/nation/region')").alias("region_out"),
    )


@register(
    "fn_crypto_roundtrip",
    section="2.8",
    oracle="""
    SELECT c_custkey, c_name AS name_roundtrip,
           md5(c_name) AS name_fp
    FROM customer WHERE c_custkey <= 500
    """,
    notes="column-level encryption surface (aes_encrypt/aes_decrypt, "
    "GCM): the PII-at-rest pattern — encrypt the sensitive column, "
    "decrypt it back, and the oracle is the plaintext source, so the "
    "hash match proves the crypto path is lossless. GCM nonces make "
    "ciphertext nondeterministic, which is WHY the declared output is "
    "the decrypted roundtrip and not the ciphertext; key management "
    "is out of engine scope (a literal key here)",
)
def fn_crypto_roundtrip(spark, sf_dir):
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    # 16-byte literal AES-128 key (demo only; key management out of scope)
    enc = F.expr(
        "aes_encrypt(c_name, '0123456789abcdef', 'GCM')"
    )
    dec = F.expr(
        "CAST(aes_decrypt(ct, '0123456789abcdef', 'GCM') AS STRING)"
    )
    return (
        c.select("c_custkey", enc.alias("ct"))
        .select("c_custkey", dec.alias("name_roundtrip"))
        .select(
            "c_custkey",
            "name_roundtrip",
            F.md5(F.col("name_roundtrip")).alias("name_fp"),
        )
    )
