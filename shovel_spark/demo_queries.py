"""Driver-contract demo queries: one per implemented capability (SURVEY.md §2).

Each entry pairs a PySpark DataFrame implementation with an equivalent DuckDB
SQL oracle, run side-by-side by the driver at sf=0.01 (row count + schema +
order-insensitive value hash). Column names are aliased identically on both
sides; floats are rounded (2-4 dp) so double-vs-double accumulation noise
can't flip the value hash; timestamps are emitted as formatted strings.

Grouped by capability:
  - log-pipeline analogs over ``events``   (shovel's parse/route/enrich/count,
    reference: src/core/processor.js:120-144, src/outputs/pipeline.js:18-30)
  - relational coverage over TPC-H tables  (joins/aggregates/windows/set ops
    the north_rule adds on top of the reference)
  - training-data ops over ``documents`` / ``embeddings`` (dedup, similarity,
    text stats — the 100 TB pipeline extras)
  - ``pipeline_metrics``: the full engine (parse → enrich → route → count)
    over pages built from ``documents``, with a pure-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from shovel_spark.session import local_rows_df

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, sql: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


#: (applicationId, path) -> lazy DataFrame READER PLAN. This memoizes only
#: the relation metadata (file listing + footer schema inference, ~0.1 s per
#: spark.read.parquet) across the ~270 table reads a full query sweep makes.
#: No rows are cached or persisted — every query still computes from the
#: parquet files; keying by applicationId drops plans from stopped sessions.
_READ_PLANS: dict[tuple[str, str], DataFrame] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, f"{sf_dir}/{name}.parquet")
    df = _READ_PLANS.get(key)
    if df is None:
        df = spark.read.parquet(key[1])
        _READ_PLANS[key] = df
    return df


# ---------------------------------------------------------------------------
# Log-pipeline analogs over `events`
# ---------------------------------------------------------------------------

@_register(
    "route_status_counts",
    """
    SELECT CASE WHEN event_type = 'error' THEN 'rejected'
                WHEN value < 20 THEN 'ignored'
                ELSE 'acked' END AS status,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def route_status_counts(spark, sf_dir):
    """Shovel's ack/ignore/reject taxonomy as a when-chain (route operator)."""
    ev = _t(spark, sf_dir, "events")
    status = (
        F.when(F.col("event_type") == "error", "rejected")
        .when(F.col("value") < 20, "ignored")
        .otherwise("acked")
    )
    return ev.groupBy(status.alias("status")).agg(F.count("*").alias("n"))


@_register(
    "route_sink_counts",
    """
    WITH r AS (
      SELECT CASE WHEN event_type = 'error' THEN 'dead_letter'
                  WHEN event_type = 'purchase' THEN 'billing'
                  WHEN event_type = 'signup' THEN 'crm'
                  WHEN value >= 20 THEN 'analytics' END AS sink,
             value
      FROM events
    )
    SELECT sink, count(*) AS n, round(sum(value), 2) AS total_value
    FROM r WHERE sink IS NOT NULL GROUP BY 1
    """,
)
def route_sink_counts(spark, sf_dir):
    """First-match-wins sink dispatch (pipeline output fanout analog)."""
    ev = _t(spark, sf_dir, "events")
    sink = (
        F.when(F.col("event_type") == "error", "dead_letter")
        .when(F.col("event_type") == "purchase", "billing")
        .when(F.col("event_type") == "signup", "crm")
        .when(F.col("value") >= 20, "analytics")
    )
    return (
        ev.withColumn("sink", sink)
        .filter(F.col("sink").isNotNull())
        .groupBy("sink")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@_register(
    "parse_json_props",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 3) AS avg_k
    FROM events GROUP BY 1
    """,
)
def parse_json_props(spark, sf_dir):
    """JSON decoder analog: get_json_object over the props payload.

    The extraction is projected ONCE behind a withColumn so the groupBy's two
    aggregates share a single JSON parse per row (Catalyst does not CSE the
    two get_json_object occurrences when bound separately in agg exprs).
    """
    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.round(F.avg("k"), 3).alias("avg_k"),
    )


@_register(
    "enrich_translate",
    """
    SELECT CASE event_type WHEN 'purchase' THEN 'revenue'
                           WHEN 'signup' THEN 'growth'
                           WHEN 'click' THEN 'engagement'
                           WHEN 'view' THEN 'engagement'
                           ELSE 'other' END AS category,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def enrich_translate(spark, sf_dir):
    """util.translate analog: broadcast dict lookup with default fall-through
    (reference: src/core/utils.js:74-76)."""
    from shovel_spark.operators.enrich import translate

    ev = _t(spark, sf_dir, "events")
    mapping = local_rows_df(spark, 
        [("purchase", "revenue"), ("signup", "growth"), ("click", "engagement"), ("view", "engagement")],
        "k string, v string",
    )
    enriched = translate(ev, "event_type", mapping, "k", "v", "category", default="other")
    return enriched.groupBy("category").agg(F.count("*").alias("n"))


@_register(
    "render_index_name",
    """
    SELECT event_type || '-' || strftime(ts, '%Y-%m') AS index_name, count(*) AS n
    FROM events GROUP BY 1
    """,
)
def render_index_name(spark, sf_dir):
    """Dynamic per-message index-name template (reference:
    src/outputs/elasticsearch.js:203-210) ≙ partition-column expression."""
    ev = _t(spark, sf_dir, "events")
    name = F.concat("event_type", F.lit("-"), F.date_format("ts", "yyyy-MM"))
    return ev.groupBy(name.alias("index_name")).agg(F.count("*").alias("n"))


@_register(
    "hourly_event_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def hourly_event_counts(spark, sf_dir):
    """Tumbling-window aggregation, batch form."""
    ev = _t(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
    return ev.groupBy(hour.alias("hour"), F.col("event_type")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )


@_register(
    "asof_prior_signup",
    """
    WITH w AS (
      SELECT user_id, event_type,
             last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_signup
      FROM events
    )
    SELECT user_id,
           count(*) AS n_purchases,
           CAST(sum(CASE WHEN prior_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS with_prior_signup
    FROM w WHERE event_type = 'purchase' GROUP BY 1
    """,
)
def asof_prior_signup(spark, sf_dir):
    """As-of join (point-in-time lookup) composed from window last(ignorenulls)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prior = F.last(F.when(F.col("event_type") == "signup", F.col("ts")), ignorenulls=True).over(w)
    return (
        ev.withColumn("prior_signup", prior)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.when(F.col("prior_signup").isNotNull(), 1).otherwise(0)).alias(
                "with_prior_signup"
            ),
        )
    )


@_register(
    "sessionize_30m",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM g GROUP BY 1
    """,
)
def sessionize_30m(spark, sf_dir):
    """Session windows (30-min inactivity gap), batch form — via the
    reusable operators/windows.sessionize (lag + cumulative sum); session
    count = the key's max 1-based session id."""
    from shovel_spark.operators.windows import sessionize

    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, ["user_id"], ts_col="ts", gap_seconds=1800, order_cols=["event_id"])
    return s.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"), F.count("*").alias("n_events")
    )


@_register(
    "latest_event_per_user",
    """
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    """,
)
def latest_event_per_user(spark, sf_dir):
    """Ranking window: keep each user's most recent event (top-1 per key)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_type", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s")
        )
    )


@_register(
    "distinct_users_per_type",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1
    """,
)
def distinct_users_per_type(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


@_register(
    "except_users",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error' AND value > 150
    """,
)
def except_users(spark, sf_dir):
    """Set ops: big purchasers minus big-error users (EXCEPT)."""
    ev = _t(spark, sf_dir, "events")
    buyers = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150)).select("user_id")
    errs = ev.filter((F.col("event_type") == "error") & (F.col("value") > 150)).select("user_id")
    return buyers.subtract(errs)  # subtract == EXCEPT (set) semantics


# ---------------------------------------------------------------------------
# Relational coverage over the TPC-H-ish tables
# ---------------------------------------------------------------------------

@_register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY 1, 2
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: wide scan + hash aggregate (the classic throughput probe)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@_register(
    "region_revenue",
    """
    SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1
    """,
)
def region_revenue(spark, sf_dir):
    """Star join: fact orders vs broadcast dims (customer/nation/region)."""
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


@_register(
    "topk_parts_by_revenue",
    """
    SELECT p_partkey, p_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2 ORDER BY revenue DESC, p_partkey LIMIT 10
    """,
)
def topk_parts_by_revenue(spark, sf_dir):
    """Top-k: aggregate + global sort limit (TakeOrderedAndProject)."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(10)
    )


@_register(
    "semi_join_segments",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
    """,
)
def semi_join_segments(spark, sf_dir):
    """Left-semi join: customers having orders (allow-list shape)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@_register(
    "anti_join_nations",
    """
    SELECT n_name, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
)
def anti_join_nations(spark, sf_dir):
    """Left-anti join: customers with no urgent orders (deny-list shape,
    SURVEY.md §2.8)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@_register(
    "rollup_priority_status",
    """
    SELECT o_orderpriority, o_orderstatus, count(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def rollup_priority_status(spark, sf_dir):
    """Rollup grouping sets (subtotals + grand total)."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("n"))


@_register(
    "salted_priority_counts",
    """
    SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1
    """,
)
def salted_priority_counts(spark, sf_dir):
    """Two-phase salted aggregation (hot-key defense) — must equal the naive
    GROUP BY exactly (BASELINE.json north_star)."""
    from shovel_spark.operators.aggregate import salted_count

    o = _t(spark, sf_dir, "orders")
    return salted_count(o, "o_orderpriority", salt_buckets=16, out_col="n")


# ---------------------------------------------------------------------------
# Training-data ops over `documents` / `embeddings`
# ---------------------------------------------------------------------------

@_register(
    "docs_unique_per_lang",
    """
    SELECT lang, count(*) AS n_docs, count(DISTINCT text) AS n_unique,
           count(DISTINCT md5(text)) AS n_fingerprints
    FROM documents GROUP BY 1
    """,
)
def docs_unique_per_lang(spark, sf_dir):
    """Exact dedup: hash-groupBy on content fingerprint."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_unique"),
        F.countDistinct(F.md5("text")).alias("n_fingerprints"),
    )


@_register(
    "docs_token_stats",
    """
    WITH t AS (
      SELECT lang, len(regexp_split_to_array(trim(text), '\\s+')) AS tokens, n_chars
      FROM documents
    )
    SELECT lang, count(*) AS n_docs, round(avg(tokens), 2) AS avg_tokens,
           CAST(max(tokens) AS INT) AS max_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM t GROUP BY 1
    """,
)
def docs_token_stats(spark, sf_dir):
    """Token counting (whitespace tokenizer) + per-lang stats."""
    d = _t(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.withColumn("tokens", tokens).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("tokens"), 2).alias("avg_tokens"),
        F.max("tokens").alias("max_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


@_register(
    "docs_quality_score",
    """
    WITH t AS (
      SELECT lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS tokens,
             length(text) AS chars,
             (length(text) - length(replace(text, ' the ', ''))) / 5 AS stop_hits
      FROM documents
    )
    SELECT lang,
           round(avg(chars * 1.0 / tokens), 3) AS avg_word_len,
           round(avg(stop_hits * 1.0 / tokens), 4) AS stopword_ratio,
           count(*) AS n_docs
    FROM t GROUP BY 1
    """,
)
def docs_quality_score(spark, sf_dir):
    """Quality scoring: avg word length + stopword ratio per lang."""
    d = _t(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    chars = F.length("text")
    stop_hits = (chars - F.length(F.replace(F.col("text"), F.lit(" the "), F.lit("")))) / 5
    return (
        d.withColumn("tokens", tokens)
        .withColumn("chars", chars)
        .withColumn("stop_hits", stop_hits)
        .groupBy("lang")
        .agg(
            F.round(F.avg(F.col("chars") / F.col("tokens")), 3).alias("avg_word_len"),
            F.round(F.avg(F.col("stop_hits") / F.col("tokens")), 4).alias("stopword_ratio"),
            F.count("*").alias("n_docs"),
        )
    )


@_register(
    "docs_lang_guess",
    """
    SELECT lang,
           CASE WHEN text LIKE '% the %' OR text LIKE 'the %' THEN 'en' ELSE 'und' END AS predicted,
           count(*) AS n
    FROM documents GROUP BY 1, 2
    """,
)
def docs_lang_guess(spark, sf_dir):
    """Language-ID heuristic (stopword n-gram), confusion counts vs labels."""
    d = _t(spark, sf_dir, "documents")
    predicted = F.when(
        F.col("text").like("% the %") | F.col("text").like("the %"), "en"
    ).otherwise("und")
    return d.groupBy("lang", predicted.alias("predicted")).agg(F.count("*").alias("n"))


@_register(
    "docs_fingerprints",
    """
    SELECT doc_id, md5(text) AS fingerprint FROM documents WHERE doc_id < 32
    """,
)
def docs_fingerprints(spark, sf_dir):
    """Document fingerprinting (content hash, cross-engine-stable md5)."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 32).select("doc_id", F.md5("text").alias("fingerprint"))


def _spark_shingles(d, k: int = 3):
    """(doc_id, sh) distinct word-3-gram pairs; token array materialized
    behind a projection boundary (no CSE inside higher-order lambdas —
    an inlined split would re-tokenize per shingle, measured 15x slower)."""
    base = d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("__w"))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size("__w") - k, F.lit(0))),
            lambda i: F.array_join(F.slice("__w", i + 1, k), " "),
        )
    )
    return base.select("doc_id", F.explode(shingles).alias("sh"))


#: exact twin of _spark_shingles including sub-3-token docs: Spark's
#: slice(w, i, 3) clamps at the array end (a 2-token doc yields one short
#: shingle), so the SQL must use list_slice + array_to_string — a w[i+2]
#: concat would NULL out short shingles and an n-2-bounded range would
#: emit none at all.
_SHINGLE_SQL = """
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(w) - 2, 1) + 1),
               i -> array_to_string(list_slice(w, i, i + 2), ' ')))) AS sh
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents)
"""


@_register(
    "docs_top_similar_pairs",
    f"""
    WITH sh AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    ORDER BY c * 1.0 / (sa.n + sb.n - c) DESC, doc_a, doc_b LIMIT 10
    """,
)
def docs_top_similar_pairs(spark, sf_dir):
    """N-gram (3-shingle) Jaccard near-dup: inverted-index self-join — the
    scalable alternative to O(n²) pairwise comparison."""
    d = _t(spark, sf_dir, "documents")
    sh = _spark_shingles(d)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"), jac.alias("__j"))
        .orderBy(F.desc("__j"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(10)
        .drop("__j")
    )


@_register(
    "docs_minhash_bands",
    f"""
    WITH sh AS ({_SHINGLE_SQL})
    SELECT doc_id, band, min(md5(band || ':' || sh)) AS sig
    FROM sh, range(0, 4) t(band)
    WHERE doc_id < 24
    GROUP BY 1, 2
    """,
)
def docs_minhash_bands(spark, sf_dir):
    """MinHash signatures (4 bands, md5 family — identical across engines);
    LSH candidate pairs = docs sharing any (band, sig) bucket."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 24)
    sh = _spark_shingles(d)
    bands = spark.range(0, 4).select(F.col("id").cast("long").alias("band"))
    return (
        sh.crossJoin(F.broadcast(bands))
        .groupBy("doc_id", "band")
        .agg(F.min(F.md5(F.concat(F.col("band").cast("string"), F.lit(":"), F.col("sh")))).alias("sig"))
    )


@_register(
    "emb_cosine_topk",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           round(list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 4) AS sim
    FROM embeddings, q
    WHERE vec_id != 0
    ORDER BY list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]) DESC, vec_id
    LIMIT 10
    """,
)
def emb_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline: JVM-side zip_with/aggregate dot
    product — no Python in the loop."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    joined = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    a = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    b = F.transform(F.col("qv"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    sim = dot / (na * nb)
    return (
        joined.select("vec_id", "label", sim.alias("__sim"))
        .orderBy(F.desc("__sim"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("__sim", 4).alias("sim"))
    )


@_register(
    "emb_margin_mining",
    """
    WITH a AS (
      SELECT vec_id AS a_id, embedding::DOUBLE[] AS va FROM embeddings
      WHERE vec_id < 200 AND vec_id % 2 = 0
    ),
    b AS (
      SELECT vec_id AS b_id, embedding::DOUBLE[] AS vb FROM embeddings
      WHERE vec_id < 200 AND vec_id % 2 = 1
    ),
    p AS (
      SELECT a_id, b_id,
             round(list_cosine_similarity(va, vb), 9) AS cos
      FROM a, b
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS ra,
             row_number() OVER (PARTITION BY b_id ORDER BY cos DESC, a_id) AS rb
      FROM p
    ),
    na AS (SELECT a_id, avg(cos) AS xa FROM r WHERE ra <= 4 GROUP BY 1),
    nb AS (SELECT b_id, avg(cos) AS xb FROM r WHERE rb <= 4 GROUP BY 1),
    m AS (
      SELECT r.a_id, r.b_id, cos,
             round(cos / ((xa + xb) / 2), 4) AS margin
      FROM r JOIN na USING (a_id) JOIN nb USING (b_id)
    ),
    best AS (
      SELECT *,
             row_number() OVER (PARTITION BY a_id ORDER BY margin DESC, b_id) AS ba,
             row_number() OVER (PARTITION BY b_id ORDER BY margin DESC, a_id) AS bb
      FROM m
    )
    SELECT a_id, b_id, round(cos, 4) AS cos, margin
    FROM best WHERE ba = 1 AND bb = 1 AND margin > 1.05
    ORDER BY a_id
    """,
)
def emb_margin_mining(spark, sf_dir):
    """Margin-based bitext/pair mining (similarity.margin_mine — the
    CCMatrix/LASER criterion, Artetxe & Schwenk 2019): split the embedding
    corpus into two 'languages' (even/odd ids), score every cross pair by
    cosine normalized by the mean of both endpoints' 4-NN neighborhoods,
    keep MUTUAL-best pairs with margin > 1.05. The oracle replays the
    whole chain — pair cosines, both k-NN neighborhoods, the margin
    arithmetic, and the two-sided argmax election (quantized at 1e-9 /
    1e-4 so both engines elect identically).

    Scale shape: the demo mines one fence (full cross of 100x100); corpus
    wide, pass `candidates` from the LSH/IVF buckets and the same plan
    mines per bucket — windows stay partitioned by endpoint id."""
    from shovel_spark.operators.similarity import margin_mine

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    a = e.filter(F.col("vec_id") % 2 == 0)
    b = e.filter(F.col("vec_id") % 2 == 1)
    out = margin_mine(a, b, k=4, threshold=1.05)
    return out.select(
        "a_id", "b_id", F.round("cos", 4).alias("cos"), "margin"
    ).orderBy("a_id")


@_register(
    "emb_centroid_norms",
    """
    WITH e AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             unnest(embedding::DOUBLE[]) AS val
      FROM embeddings
    ),
    c AS (SELECT label, pos, avg(val) AS m FROM e GROUP BY 1, 2)
    SELECT label, round(sqrt(sum(m * m)), 4) AS centroid_norm, count(*) AS dims
    FROM c GROUP BY 1
    """,
)
def emb_centroid_norms(spark, sf_dir):
    """Distributed vector math: per-label centroid via posexplode + two-level
    aggregate (the shape of k-means / IVF coarse quantization at scale)."""
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos", "val")).withColumn(
        "val", F.col("val").cast("double")
    )
    c = ex.groupBy("label", "pos").agg(F.avg("val").alias("m"))
    return c.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 4).alias("centroid_norm"),
        F.count("*").alias("dims"),
    )


# ---------------------------------------------------------------------------
# The full engine over pages derived from `documents` (SQL-expressible oracle)
# ---------------------------------------------------------------------------

_PIPE_LANGS = ("en", "de", "fr", "es", "zh", "ja", "pt", "it")
_PIPE_DENY = ("src0", "src13")


def pages_from_documents(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    ts: str = "2024-01-01 00:00:00",
    fix_malformed: bool = False,
) -> DataFrame:
    """Deterministically wrap the driver's documents as pages(url, warc_ts,
    html, text, lang); doc_id % 37 == 0 rows get malformed html (no </p>).

    ``docs`` substitutes a pre-filtered documents frame; ``ts`` stamps the
    snapshot time and ``fix_malformed=True`` emits well-formed html for
    every row — together they build a deterministic RE-CRAWL snapshot
    (same urls, later warc_ts, parseable this time) for the dead-letter
    replay query."""
    d = docs if docs is not None else _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/d/"), F.col("doc_id"))
    ok_html = F.concat(
        F.lit("<html><head><title>doc</title></head><body><p>"), F.col("text"), F.lit("</p></body></html>")
    )
    bad_html = F.concat(
        F.lit("<html><head><title>doc</title></head><body><p>"), F.col("text"), F.lit("</body></html>")
    )
    broken = F.lit(False) if fix_malformed else (F.col("doc_id") % 37 == 0)
    html = F.encode(F.when(broken, bad_html).otherwise(ok_html), "UTF-8")
    return d.select(
        url.alias("url"),
        F.to_timestamp(F.lit(ts)).alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
    )


@_register(
    "pipeline_metrics",
    f"""
    WITH t AS (
      SELECT doc_id, lang, source,
             CASE WHEN doc_id % 37 = 0 OR source IN {_PIPE_DENY} THEN 1 ELSE 0 END AS rej,
             CASE WHEN lang IN {_PIPE_LANGS} THEN lang ELSE 'und' END AS lang_norm,
             CASE WHEN source = 'src1' THEN 'priority' END AS rule_sink
      FROM documents
    ),
    r AS (
      SELECT CASE WHEN rej = 1 THEN 'rejected'
                  WHEN rule_sink = 'priority' OR lang_norm = 'en'
                       OR lang_norm IN ('zh', 'ja')
                       OR lang_norm IN ('de', 'fr', 'es', 'it', 'pt') THEN 'acked'
                  ELSE 'ignored' END AS status,
             CASE WHEN rej = 1 THEN 'dead_letter'
                  WHEN rule_sink = 'priority' THEN 'priority'
                  WHEN lang_norm = 'en' THEN 'english'
                  WHEN lang_norm IN ('zh', 'ja') THEN 'cjk'
                  WHEN lang_norm IN ('de', 'fr', 'es', 'it', 'pt') THEN 'european'
                  ELSE 'none' END AS sink
      FROM t
    )
    SELECT sink, status, count(*) AS n FROM r GROUP BY 1, 2
    """,
)
def pipeline_metrics(spark, sf_dir):
    """Flagship: the full parse → enrich → route engine over pages built from
    the driver's documents table, counts per (sink, status) — the oracle
    replays the identical semantics in pure SQL."""
    from shovel_spark.operators.route import SinkRule
    from shovel_spark.pipeline import JobConfig, build_routed

    pages = pages_from_documents(spark, sf_dir)
    lang_map = local_rows_df(spark, [(l, l) for l in _PIPE_LANGS], "lang_raw string, lang_norm string")
    rules = local_rows_df(spark, 
        [(f"{s}.example.com", "deny", None) for s in _PIPE_DENY]
        + [("src1.example.com", "allow", "priority")],
        "domain string, action string, sink string",
    )
    cfg = JobConfig(
        name="docs_pipeline",
        n_buckets=16,
        sink_rules=[
            SinkRule("priority", F.col("rule_sink") == "priority"),
            SinkRule("english", F.col("lang_norm") == "en"),
            SinkRule("cjk", F.col("lang_norm").isin("zh", "ja")),
            SinkRule("european", F.col("lang_norm").isin("de", "fr", "es", "it", "pt")),
        ],
    )
    routed = build_routed(pages, lang_map, rules, cfg)
    return routed.groupBy(
        F.coalesce(F.col("sink"), F.lit("none")).alias("sink"), F.col("status")
    ).agg(F.count("*").alias("n"))


@_register(
    "pipeline_replay_recovery",
    f"""
    WITH t AS (
      SELECT doc_id, lang, source,
             (doc_id % 37 = 0) AS malformed,
             CASE WHEN lang IN {_PIPE_LANGS} THEN lang ELSE 'und' END AS lang_norm,
             CASE WHEN source = 'src1' THEN 'priority' END AS rule_sink
      FROM documents
    ),
    dead AS (  -- strict-run dead letters: parse failures + denied domains
      SELECT * FROM t WHERE malformed OR source IN ('src0', 'src13', 'src2')
    ),
    unmatched AS (  -- src13 pages are absent from the replay snapshot
      SELECT * FROM dead WHERE source = 'src13'
    ),
    retried AS (SELECT * FROM dead WHERE source != 'src13'),
    r AS (  -- relaxed-config routing of the retried docs; keep-latest
            -- picked the FIXED re-crawl snapshot for malformed urls, so
            -- only the still-denied domain rejects
      SELECT CASE WHEN source = 'src0' THEN 'rejected'
                  WHEN rule_sink = 'priority' OR lang_norm != 'und' THEN 'acked'
                  ELSE 'ignored' END AS status,
             CASE WHEN source = 'src0' THEN NULL
                  WHEN rule_sink = 'priority' THEN 'priority'
                  WHEN lang_norm = 'en' THEN 'english'
                  WHEN lang_norm IN ('zh', 'ja') THEN 'cjk'
                  WHEN lang_norm IN ('de', 'fr', 'es', 'it', 'pt') THEN 'european'
             END AS sink
      FROM retried
    )
    SELECT 'recovered:' || sink AS metric, count(*) AS n
    FROM r WHERE status = 'acked' GROUP BY 1
    UNION ALL SELECT 'dead_letter_rows',
      (SELECT count(*) FROM r WHERE status = 'rejected')
        + (SELECT count(*) FROM unmatched)
    UNION ALL SELECT 'ignored', count(*) FROM r WHERE status = 'ignored'
    UNION ALL SELECT 'recovered_total', count(*) FROM r WHERE status != 'rejected'
    UNION ALL SELECT 'retried', (SELECT count(*) FROM retried)
    UNION ALL SELECT 'still_dead', count(*) FROM r WHERE status = 'rejected'
    UNION ALL SELECT 'unmatched', (SELECT count(*) FROM unmatched)
    """,
)
def pipeline_replay_recovery(spark, sf_dir):
    """Dead-letter replay, VALUE-CHECKED end-to-end (pipeline.py
    replay_dead_letters — the batch form of shovel's nack → requeue
    redelivery, reference: src/inputs/amqp.js:101-112): a strict config
    (extra denied domain src2) dead-letters parse failures + three
    domains; the replay runs under the RELAXED config against a re-crawl
    snapshot where (a) every malformed page has a later, parseable
    snapshot — keep-latest retries only the newest version per url — and
    (b) src13's pages are missing entirely, so its dead letters stay
    UNMATCHED (never lost). The oracle replays the whole retry policy:
    per-sink recovered counts, ignored (processed, no sink), still-dead
    (src0, still denied), unmatched, and the post-replay dead-letter
    table size read back from disk."""
    import hashlib
    import os
    import shutil

    from shovel_spark.operators.route import SinkRule
    from shovel_spark.pipeline import (
        JobConfig,
        read_dead_letters,
        replay_dead_letters,
        run_resumable,
    )

    d = _t(spark, sf_dir, "documents")
    v1 = pages_from_documents(spark, sf_dir)
    lang_map = local_rows_df(spark, 
        [(l, l) for l in _PIPE_LANGS], "lang_raw string, lang_norm string"
    )
    deny_relaxed = list(_PIPE_DENY)
    deny_strict = deny_relaxed + ["src2"]

    def rules(deny):
        return local_rows_df(spark, 
            [(f"{s}.example.com", "deny", None) for s in deny]
            + [("src1.example.com", "allow", "priority")],
            "domain string, action string, sink string",
        )

    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{os.path.abspath(sf_dir)}:replay".encode()
    ).hexdigest()[:12]
    out_dir = os.path.join("/tmp/shovel_spark_replayq", tag)
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = JobConfig(
        name="replay_demo",
        out_dir=out_dir,
        n_buckets=16,
        sink_rules=[
            SinkRule("priority", F.col("rule_sink") == "priority"),
            SinkRule("english", F.col("lang_norm") == "en"),
            SinkRule("cjk", F.col("lang_norm").isin("zh", "ja")),
            SinkRule("european", F.col("lang_norm").isin("de", "fr", "es", "it", "pt")),
        ],
    )
    try:
        run_resumable(spark, v1, lang_map, rules(deny_strict), cfg)
        # replay snapshot: src13 missing; malformed pages re-crawled fixed
        docs_replay = d.filter(F.col("source") != "src13")
        snapshot = pages_from_documents(spark, sf_dir, docs=docs_replay).unionByName(
            pages_from_documents(
                spark,
                sf_dir,
                docs=docs_replay.filter(F.col("doc_id") % 37 == 0),
                ts="2024-01-02 00:00:00",
                fix_malformed=True,
            )
        )
        res = replay_dead_letters(spark, snapshot, lang_map, rules(deny_relaxed), cfg)
        dl_rows = read_dead_letters(spark, cfg.out_dir).count()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    rows = [(f"recovered:{s}", int(n)) for s, n in sorted(res["per_sink"].items())]
    rows += [
        ("dead_letter_rows", int(dl_rows)),
        ("ignored", int(res["ignored"])),
        ("recovered_total", int(res["recovered"])),
        ("retried", int(res["retried"])),
        ("still_dead", int(res["still_dead"])),
        ("unmatched", int(res["unmatched"])),
    ]
    return local_rows_df(spark, rows, "metric string, n long")


# ---------------------------------------------------------------------------
# Training-data library operators (operators/dedup.py, operators/similarity.py,
# functions/textstats.py, io/multimodal.py) surfaced as queries
# ---------------------------------------------------------------------------

@_register(
    "docs_exact_dedup_keep",
    """
    WITH unioned AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 100000, text, lang FROM documents
    ),
    keep AS (
      SELECT min(doc_id) AS doc_id
      FROM unioned GROUP BY md5(regexp_replace(trim(text), '\\s+', ' ', 'g'))
    )
    SELECT lang, count(*) AS n_kept
    FROM unioned WHERE doc_id IN (SELECT doc_id FROM keep) GROUP BY 1
    """,
)
def docs_exact_dedup_keep(spark, sf_dir):
    """exact_dedup operator: duplicate the corpus (ids shifted), dedup must
    keep exactly the original (lowest-id) rows."""
    from shovel_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    both = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 100000))
    return exact_dedup(both).groupBy("lang").agg(F.count("*").alias("n_kept"))


_LANGID_SQL_SCORES = {
    "en": "the|and|of|to|is|in|that|it",
    "fr": "le|la|les|de|et|est|que|une",
    "de": "der|die|das|und|ist|nicht|ein|zu",
    "es": "el|la|los|de|que|es|una|por",
}
_LANGID_SCORE_EXPRS = ", ".join(
    f"len(regexp_extract_all(text, '(?i)\\b({words})\\b')) * 1.0 / "
    f"greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) AS s_{lang}"
    for lang, words in _LANGID_SQL_SCORES.items()
)


@_register(
    "docs_langid_confusion",
    f"""
    WITH s AS (SELECT lang, {_LANGID_SCORE_EXPRS} FROM documents),
    p AS (
      SELECT lang,
        CASE WHEN greatest(s_en, s_fr, s_de, s_es) <= 0.02 THEN 'und'
             WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
             WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
             WHEN s_de >= s_es THEN 'de'
             ELSE 'es' END AS predicted
      FROM s
    )
    SELECT lang, predicted, count(*) AS n FROM p GROUP BY 1, 2
    """,
)
def docs_langid_confusion(spark, sf_dir):
    """textstats.lang_id (stopword-profile argmax) confusion matrix vs the
    labeled lang column; the oracle replays the identical argmax + tie rule."""
    from shovel_spark.functions.textstats import lang_id

    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", lang_id(F.col("text")).alias("predicted")).agg(
        F.count("*").alias("n")
    )


@_register(
    "docs_quality_stats",
    """
    WITH q AS (
      SELECT lang,
        round((
          (CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END) +
          (CASE WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                     / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) +
          (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / greatest(length(text), 1)) +
          (CASE WHEN length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0
                     / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.0 END)
        ) / 4.0, 6) AS q
      FROM documents
    )
    SELECT lang, round(avg(q), 4) AS avg_quality, round(min(q), 4) AS min_quality,
           count(*) AS n_docs
    FROM q GROUP BY 1
    """,
)
def docs_quality_stats(spark, sf_dir):
    """textstats.quality_score (C4/Gopher-style bands) — per-lang stats; the
    oracle reproduces the exact formula."""
    from shovel_spark.functions.textstats import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.withColumn("q", quality_score(F.col("text"))).groupBy("lang").agg(
        F.round(F.avg("q"), 4).alias("avg_quality"),
        F.round(F.min("q"), 4).alias("min_quality"),
        F.count("*").alias("n_docs"),
    )


def _drop_first_word(text: "F.Column | str"):
    """All-but-the-first whitespace token, rejoined — UNBOUNDED like the
    oracle's ``w[2:]`` (a fixed slice length would silently truncate docs
    longer than it)."""
    w = F.split(F.trim(text), r"\s+")
    return F.array_join(F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(1))), " ")


def _doc_text(df, doc_id: int) -> str:
    """One document's text, driver-side (leak-seeding helper)."""
    return df.filter(F.col("doc_id") == doc_id).first()["text"]


def _near_dup_corpus(spark, sf_dir):
    """Deterministic near-dups from driver data: each doc < 40 gets a copy
    (id+100000) with its first word dropped."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text").filter(F.col("doc_id") < 40)
    edited = d.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", _drop_first_word("text")
    )
    return d.unionByName(edited)


#: DuckDB twin of _near_dup_corpus (docs < 40 ∪ copies with the first word
#: dropped, id+100000) and its 3-shingle table.
_ND_CORPUS_SQL = r"""
      SELECT doc_id, text FROM documents WHERE doc_id < 40
      UNION ALL
      SELECT doc_id + 100000,
             array_to_string(regexp_split_to_array(trim(text), '\s+')[2:], ' ')
      FROM documents WHERE doc_id < 40
"""

#: same exact-twin shape as _SHINGLE_SQL (short docs included): Spark's
#: shingle_table emits one clamped shingle for 1-2-token docs.
_ND_SHINGLE_SQL = r"""
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(w) - 2, 1) + 1),
               i -> array_to_string(list_slice(w, i, i + 2), ' ')))) AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM corpus)
"""


def _nd_chain_ctes(max_doc_freq: int | None = None) -> str:
    """MinHash→LSH→verify chain as DuckDB CTEs over a caller-supplied
    ``corpus`` (doc_id, text) relation, ending in a ``pairs`` relation
    (id_a, id_b, jaccard >= 0.5) — shared by the near-dup pair query, the
    dup-cluster query, and both capstone corpus queries.

    ``max_doc_freq`` replays dedup.shingle_table's document-frequency cap:
    shingles present in more than that many docs are dropped BEFORE
    signatures, so the oracle verifies the skew defense, not just the
    uncapped chain."""
    if max_doc_freq is None:
        sh_cte = f"sh AS ({_ND_SHINGLE_SQL})"
    else:
        sh_cte = f"""sh0 AS ({_ND_SHINGLE_SQL}),
    sh AS (
      SELECT s.doc_id, s.shingle FROM sh0 s
      JOIN (SELECT shingle FROM sh0 GROUP BY 1
            HAVING count(*) <= {max_doc_freq}) r USING (shingle)
    )"""
    return f"""{sh_cte},
    hv AS (
      SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS h
      FROM sh, range(0, 16) t(seed) GROUP BY 1, 2
    ),
    bk AS (
      SELECT doc_id, seed // 2 AS band,
             md5(string_agg(h, ',' ORDER BY seed)) AS bucket
      FROM hv GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bk x JOIN bk y
        ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    common AS (
      SELECT id_a, id_b, count(*) AS c
      FROM cand
      JOIN sh a ON a.doc_id = cand.id_a
      JOIN sh b ON b.doc_id = cand.id_b AND a.shingle = b.shingle
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b, c * 1.0 / (sa.n + sb.n - c) AS jaccard
      FROM common
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
    )"""


_ND_CHAIN_CTES = _nd_chain_ctes()

#: chain bound to the standard near-dup test corpus.
_ND_MINHASH_CTES = f"""corpus AS ({_ND_CORPUS_SQL}),
    {_ND_CHAIN_CTES}"""


@_register(
    "docs_minhash_near_dups",
    f"""
    WITH {_ND_MINHASH_CTES}
    SELECT id_a, id_b, round(jaccard, 4) AS jaccard
    FROM pairs ORDER BY id_a, id_b
    """,
)
def docs_minhash_near_dups(spark, sf_dir):
    """minhash_dedup_pairs operator (MinHash → banded LSH → exact-Jaccard
    verify) on a corpus with planted near-dups: every planted pair (i, i+1e5)
    must surface; jaccard values are exact. The md5 hash family makes the
    ENTIRE chain — signatures, band buckets, candidates, verification —
    reproducible in DuckDB, so the oracle checks the full operator, not just
    an aggregate of it."""
    from shovel_spark.operators.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        _near_dup_corpus(spark, sf_dir), threshold=0.5, num_hashes=16, bands=8,
        family="md5",
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("id_a", "id_b")


@_register(
    "docs_incremental_neardup",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 500
      UNION ALL
      SELECT doc_id + 100000,
             array_to_string(regexp_split_to_array(trim(text), '\\s+')[2:], ' ')
      FROM documents WHERE doc_id < 10
    ),
    {_nd_chain_ctes()}
    SELECT id_a, id_b, round(jaccard, 4) AS jaccard
    FROM pairs WHERE id_b >= 300 ORDER BY id_a, id_b
    """,
)
def docs_incremental_neardup(spark, sf_dir):
    """INCREMENTAL near-dup detection (build_minhash_index →
    incremental_minhash_pairs): the corpus (docs < 300) is signed ONCE into
    a standing index (banded bucket keys + hashed shingle sets — text never
    stored); the delta batch (docs 300-499 plus planted near-dup copies of
    corpus docs) is then deduped against it with delta-sized work — no
    corpus re-shingle, no re-sign. The daily-crawl economics at 100 TB:
    O(delta + collisions) per batch instead of O(corpus). Contract: output
    equals the FULL-corpus MinHash chain restricted to pairs involving the
    delta (the oracle replays the full chain and applies that restriction;
    delta ids are all >= 300, corpus ids < 300, so id_b >= 300 is exactly
    'touches the delta')."""
    import hashlib
    import os
    import shutil

    from shovel_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") < 300)
    delta = (
        d.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 500))
        .unionByName(
            corpus.filter(F.col("doc_id") < 10)
            .withColumn("doc_id", F.col("doc_id") + 100000)
            .withColumn("text", _drop_first_word("text"))
        )
    )
    kw = dict(k=3, num_hashes=16, bands=8, family="md5")
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{os.path.abspath(sf_dir)}:inc".encode()
    ).hexdigest()[:12]
    idx_path = os.path.join("/tmp/shovel_spark_mh", tag)
    try:
        build_minhash_index(corpus, idx_path, **kw)
        pairs = incremental_minhash_pairs(
            spark, idx_path, delta, threshold=0.5, **kw
        ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard")).orderBy(
            "id_a", "id_b"
        )
        rows = pairs.collect()
        return local_rows_df(spark, rows, pairs.schema)
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)


@_register(
    "docs_bigram_lm_scores",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents
    ),
    bg_all AS (
      SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
            FROM toks WHERE len(w) >= 2)
    ),
    bg_train AS (SELECT * FROM bg_all WHERE doc_id < 400),
    uni AS (SELECT w1, count(*) AS c1 FROM bg_train GROUP BY 1),
    bi AS (SELECT w1, w2, count(*) AS c12 FROM bg_train GROUP BY 1, 2),
    v AS (SELECT count(*) AS V FROM uni)
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(ln((coalesce(c12, 0) + 0.5) / (coalesce(c1, 0) + 0.5 * V))), 4)
             AS avg_logprob
    FROM bg_all LEFT JOIN bi USING (w1, w2) LEFT JOIN uni USING (w1) CROSS JOIN v
    GROUP BY doc_id
    """,
)
def docs_bigram_lm_scores(spark, sf_dir):
    """Count-based bigram LM quality scoring (operators/lm.py) — the
    CCNet-style perplexity filter of an LLM pipeline: train add-alpha
    bigram counts on docs < 400, score EVERY doc (so held-out docs
    exercise the unseen-bigram smoothing path) by mean ln P(w2|w1).
    Training is two map-side-combinable groupBys; scoring is two equi-joins
    against vocabulary-sized count tables plus a broadcast 1-row V — fully
    deterministic, replayed verbatim by the oracle."""
    from shovel_spark.operators.lm import score_bigram_logprob, train_bigram_lm

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    uni, bi = train_bigram_lm(d.filter(F.col("doc_id") < 400))
    return score_bigram_logprob(d, uni, bi, alpha=0.5).select(
        "doc_id", "n_bigrams", F.round("avg_logprob", 4).alias("avg_logprob")
    )


@_register(
    "docs_dsir_sample",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
    ),
    feats AS (
      SELECT doc_id, 'u:' || unnest(w) AS f FROM toks
      UNION ALL
      SELECT doc_id, 'b:' || w[i] || ' ' || w[i + 1] AS f
      FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
            FROM toks WHERE len(w) >= 2)
    ),
    cells AS (
      SELECT doc_id,
             ('0x' || substr(md5('dsir:' || f), 1, 15))::BIGINT % 64 AS bucket,
             count(*) AS cnt
      FROM feats GROUP BY 1, 2
    ),
    src_d AS (SELECT bucket, sum(cnt) AS c FROM cells GROUP BY 1),
    src_t AS (SELECT sum(cnt) AS tot FROM cells),
    tgt_cells AS (
      SELECT c.bucket, c.cnt FROM cells c
      JOIN documents d USING (doc_id) WHERE d.lang = 'en'
    ),
    tgt_d AS (SELECT bucket, sum(cnt) AS c FROM tgt_cells GROUP BY 1),
    tgt_t AS (SELECT sum(cnt) AS tot FROM tgt_cells),
    b AS (SELECT unnest(range(0, 64)) AS bucket),
    lr AS (
      SELECT b.bucket,
             ln((coalesce(t.c, 0) + 1) / (tt.tot + 64))
               - ln((coalesce(s.c, 0) + 1) / (st.tot + 64)) AS lrr
      FROM b LEFT JOIN tgt_d t USING (bucket) LEFT JOIN src_d s USING (bucket)
      CROSS JOIN tgt_t tt CROSS JOIN src_t st
    ),
    w AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats,
             round(sum(cnt * lrr), 4) AS logw
      FROM cells JOIN lr USING (bucket) GROUP BY 1
    )
    SELECT doc_id, n_feats, logw FROM w ORDER BY logw DESC, doc_id LIMIT 40
    """,
)
def docs_dsir_sample(spark, sf_dir):
    """DSIR data selection (operators/dsir.py — Xie et al. 2023): score
    every document by the log importance ratio of its hashed unigram+bigram
    bag under a TARGET multinomial (the lang='en' subset, standing in for
    a trusted corpus) vs the RAW source multinomial (all docs), both
    add-one smoothed over 64 md5-hashed cells; keep the top 40 by rounded
    log-weight (id tiebreak — both engines elect on the ROUNDED value, so
    the cut is identical). The full resampling variant composes
    dsir_log_weights with sampling.weighted_sample_k(exp(logw)).

    Scale shape: distribution tables are 64 rows (broadcast); per-doc cell
    counts are map-side-combinable explodes; one broadcast join + one
    groupBy(id) — text never shuffles."""
    from shovel_spark.operators.dsir import dsir_log_weights

    d = _t(spark, sf_dir, "documents")
    src = d.select("doc_id", "text")
    tgt = d.filter(F.col("lang") == "en").select("doc_id", "text")
    w = dsir_log_weights(src, tgt, buckets=64).select(
        "doc_id", "n_feats", F.round("logw", 4).alias("logw")
    )
    return w.orderBy(F.col("logw").desc(), "doc_id").limit(40)


@_register(
    "events_heavy_hitters_cm",
    """
    WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k, user_id FROM events),
    cells AS (
      SELECT r,
             ('0x' || substr(md5('cm' || r || ':' || k), 1, 8))::BIGINT % 256 AS bucket,
             count(*) AS c
      FROM ev, range(0, 4) t(r)
      GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT user_id, k FROM ev),
    probes AS (
      SELECT user_id, r,
             ('0x' || substr(md5('cm' || r || ':' || k), 1, 8))::BIGINT % 256 AS bucket
      FROM keys, range(0, 4) t(r)
    ),
    est AS (
      SELECT user_id, min(c) AS est
      FROM probes JOIN cells USING (r, bucket)
      GROUP BY 1
    ),
    tot AS (SELECT sum(c) AS n FROM cells WHERE r = 0),
    hot AS (SELECT user_id, est FROM est, tot
            WHERE est >= greatest(1, CAST(floor(n * 0.008) AS BIGINT))),
    ex AS (
      SELECT e.user_id, count(*) AS exact
      FROM events e JOIN hot USING (user_id) GROUP BY 1
    )
    SELECT hot.user_id, est, exact FROM hot JOIN ex USING (user_id)
    ORDER BY hot.user_id
    """,
)
def events_heavy_hitters_cm(spark, sf_dir):
    """Count-min heavy hitters (operators/sketches.py): a depth-4 x
    width-256 sketch built in ONE map-side-combinable pass (bounded
    shuffle state regardless of key skew — the sketch IS the skew
    defense), estimates for every distinct key, shortlist at 0.8% of
    traffic (total derived from the sketch's row-0 cells — no separate
    count scan), exact recount of the shortlist only. md5-derived buckets
    make the whole sketch engine-neutral: the oracle replays cells,
    min-estimates, the no-false-negative election, and the exact
    recount — est >= exact for every returned row by construction."""
    from shovel_spark.operators.sketches import heavy_hitters

    ev = _t(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", min_frac=0.008, depth=4, width=256).orderBy(
        "user_id"
    )


@_register(
    "events_hll_users",
    """
    WITH hashed AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
    ),
    rho AS (
      SELECT h % 64 AS bucket,
             CASE WHEN h // 64 = 0 THEN 55
                  ELSE strpos(reverse(bin(h // 64)), '1') END AS r
      FROM hashed
    ),
    regs AS (SELECT bucket, max(r) AS reg FROM rho GROUP BY 1),
    fr AS (
      SELECT t.b AS bucket, coalesce(regs.reg, 0) AS reg
      FROM range(0, 64) t(b) LEFT JOIN regs ON regs.bucket = t.b
    ),
    agg AS (
      SELECT count(*) AS m,
             sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END) AS nonzero,
             0.709 * 4096.0 / sum(power(2.0, -reg)) AS raw
      FROM fr
    ),
    summary AS (
      SELECT CASE WHEN raw <= 160.0 AND m - nonzero > 0
                  THEN round(64.0 * ln(64.0 / (m - nonzero)), 4)
                  ELSE round(raw, 4) END AS est,
             (SELECT count(DISTINCT user_id) FROM events) AS exact
      FROM agg
    )
    SELECT f.bucket, f.reg, s.est, s.exact
    FROM fr f CROSS JOIN summary s
    ORDER BY f.bucket
    """,
)
def events_hll_users(spark, sf_dir):
    """HyperLogLog distinct-user estimate (operators/sketches.py): a
    64-register sketch whose registers are INTEGER-exact across engines —
    bucket = low 6 hash bits, rho = lowest set bit of the rest, both from
    the same md5-derived 60-bit hash, no float log anywhere in the
    registers. The oracle rebuilds every register (64 rows, bit-for-bit)
    plus the alpha-corrected estimate with linear-counting small-range
    fallback, alongside the exact distinct count — the
    bounded-state-vs-exact contrast a 10^12-row distinct would need (the
    sketch is 64 rows and merges by max; the exact groupBy is the thing
    that stops scaling)."""
    from shovel_spark.operators.sketches import hll_build, hll_cardinality

    ev = _t(spark, sf_dir, "events")
    # sketch over DISTINCT hashes == sketch over the raw stream (register
    # max is idempotent) — mirrors the oracle's DISTINCT for cheap replay
    regs = hll_build(ev.select("user_id"), "user_id", b=6)
    summary = hll_cardinality(regs, b=6, spark=spark).crossJoin(
        ev.agg(F.countDistinct("user_id").alias("exact"))
    ).select(F.round("est", 4).alias("est"), "exact")
    m = 64
    full = (
        spark.range(m).select(F.col("id").alias("bucket"))
        .join(regs, "bucket", "left")
        .select("bucket", F.coalesce(F.col("reg"), F.lit(0)).alias("reg"))
    )
    return full.crossJoin(F.broadcast(summary)).select(
        "bucket", "reg", "est", "exact"
    ).orderBy("bucket")


@_register(
    "events_hll_sharded_union",
    """
    WITH hashed AS (
      SELECT user_id % 2 AS shard,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)
    ),
    rho AS (
      SELECT shard, h % 64 AS bucket,
             CASE WHEN h // 64 = 0 THEN 55
                  ELSE strpos(reverse(bin(h // 64)), '1') END AS r
      FROM hashed
    ),
    shard_regs AS (SELECT shard, bucket, max(r) AS reg FROM rho GROUP BY 1, 2),
    merged AS (SELECT bucket, max(reg) AS reg FROM shard_regs GROUP BY 1),
    fr AS (
      SELECT t.b AS bucket, coalesce(merged.reg, 0) AS reg
      FROM range(0, 64) t(b) LEFT JOIN merged ON merged.bucket = t.b
    ),
    agg AS (
      SELECT count(*) AS m,
             sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END) AS nonzero,
             0.709 * 4096.0 / sum(power(2.0, -reg)) AS raw
      FROM fr
    ),
    summary AS (
      SELECT CASE WHEN raw <= 160.0 AND m - nonzero > 0
                  THEN round(64.0 * ln(64.0 / (m - nonzero)), 4)
                  ELSE round(raw, 4) END AS est,
             (SELECT count(DISTINCT user_id) FROM events) AS exact
      FROM agg
    )
    SELECT f.bucket, f.reg, s.est, s.exact
    FROM fr f CROSS JOIN summary s
    ORDER BY f.bucket
    """,
)
def events_hll_sharded_union(spark, sf_dir):
    """Cross-shard sketch union (sketches.hll_merge): the events stream is
    split into two shards by user parity, each shard builds its own
    64-register HLL with NO coordination, and the two register tables are
    merged by per-bucket max — HLL's defining lossless-union property.
    The oracle replays both shard register sets AND the max-merge
    bit-for-bit, then the corrected estimate; `exact` is the whole-stream
    distinct for contrast.

    Scale shape: this is WHY sketches exist at 100 TB — per-partition /
    per-day sketches built independently, then a union over shards*64
    rows instead of a rescan. The merge shuffles at most 128 rows."""
    from shovel_spark.operators.sketches import hll_build, hll_cardinality, hll_merge

    ev = _t(spark, sf_dir, "events")
    # != 0 (not == 1) so negative odd ids land in shard b, and an explicit
    # NOT NULL so both engines agree that null users are in NO shard —
    # the parity filters must be exhaustive over the rows the oracle keeps
    base = ev.select("user_id").filter(F.col("user_id").isNotNull())
    shard_a = hll_build(base.filter(F.col("user_id") % 2 == 0), "user_id", b=6)
    shard_b = hll_build(base.filter(F.col("user_id") % 2 != 0), "user_id", b=6)
    regs = hll_merge(shard_a, shard_b, b=6)
    summary = hll_cardinality(regs, b=6, spark=spark).crossJoin(
        ev.agg(F.countDistinct("user_id").alias("exact"))
    ).select(F.round("est", 4).alias("est"), "exact")
    full = (
        spark.range(64).select(F.col("id").alias("bucket"))
        .join(regs, "bucket", "left")
        .select("bucket", F.coalesce(F.col("reg"), F.lit(0)).alias("reg"))
    )
    return full.crossJoin(F.broadcast(summary)).select(
        "bucket", "reg", "est", "exact"
    ).orderBy("bucket")


@_register(
    "stream_hll_two_batches",
    """
    WITH b0 AS (SELECT DISTINCT user_id FROM events WHERE user_id < 100),
    b1 AS (SELECT DISTINCT user_id FROM events WHERE user_id >= 50),
    hashed AS (
      SELECT 0 AS batch,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM b0
      UNION ALL
      SELECT 1,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
      FROM b1
    ),
    rho AS (
      SELECT batch, h % 64 AS bucket,
             CASE WHEN h // 64 = 0 THEN 55
                  ELSE strpos(reverse(bin(h // 64)), '1') END AS r
      FROM hashed
    ),
    regs AS MATERIALIZED (
      SELECT batch, bucket, max(r) AS reg FROM rho GROUP BY 1, 2
    ),
    per_batch AS (
      SELECT batch, CAST(count(*) AS BIGINT) AS n_regs,
             CAST(sum((bucket + 1) * reg) AS BIGINT) AS reg_checksum
      FROM regs GROUP BY 1
    ),
    merged AS (SELECT bucket, max(reg) AS reg FROM regs GROUP BY 1),
    fr AS (
      SELECT t.b AS bucket, coalesce(merged.reg, 0) AS reg
      FROM range(0, 64) t(b) LEFT JOIN merged ON merged.bucket = t.b
    ),
    agg AS (
      SELECT count(*) AS m,
             sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END) AS nonzero,
             0.709 * 4096.0 / sum(power(2.0, -reg)) AS raw
      FROM fr
    ),
    summary AS (
      SELECT CASE WHEN raw <= 160.0 AND m - nonzero > 0
                  THEN round(64.0 * ln(64.0 / (m - nonzero)), 4)
                  ELSE round(raw, 4) END AS est,
             (SELECT count(DISTINCT user_id) FROM events WHERE user_id < 100
                 OR user_id >= 50) AS exact
      FROM agg
    )
    SELECT p.batch, p.n_regs, p.reg_checksum, s.est, s.exact
    FROM per_batch p CROSS JOIN summary s
    ORDER BY p.batch
    """,
)
def stream_hll_two_batches(spark, sf_dir):
    """STREAMING cardinality sketch, VALUE-CHECKED: two overlapping
    micro-batches (users < 100, users >= 50) run through the real
    foreachBatch handler (streaming/pipeline.py _process_sketch_batch),
    each landing its own __batch register partition; batch 1 is then
    REPLAYED to prove write idempotence (dynamic overwrite replaces the
    partition — the driver-checked row counts would double otherwise).
    The merged estimate dedupes the 50-user overlap by max-merge algebra.
    The oracle replays both batches' registers bit-for-bit, the
    per-batch checksums, the max-merge, and the corrected estimate;
    ``exact`` is the true distinct count for contrast."""
    import hashlib
    import os
    import shutil

    from shovel_spark.operators.sketches import hll_cardinality, hll_merge
    from shovel_spark.streaming.pipeline import _process_sketch_batch

    ev = _t(spark, sf_dir, "events").select("user_id")
    b0 = ev.filter(F.col("user_id") < 100)
    b1 = ev.filter(F.col("user_id") >= 50)
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{os.path.abspath(sf_dir)}:shll".encode()
    ).hexdigest()[:12]
    base = os.path.join("/tmp/shovel_spark_shll", tag)
    try:
        _process_sketch_batch(b0, 0, base, "user_id", b=6)
        _process_sketch_batch(b1, 1, base, "user_id", b=6)
        _process_sketch_batch(b1, 1, base, "user_id", b=6)  # replay: must replace
        regs = spark.read.parquet(os.path.join(base, "registers")).select(
            F.col("__batch").alias("batch"), "bucket", "reg"
        ).localCheckpoint()
        per_batch = regs.groupBy("batch").agg(
            F.count("*").alias("n_regs"),
            F.sum((F.col("bucket") + 1) * F.col("reg")).alias("reg_checksum"),
        )
        summary = (
            hll_cardinality(
                hll_merge(regs.select("bucket", "reg"), b=6), b=6, spark=spark
            )
            .crossJoin(
                ev.filter((F.col("user_id") < 100) | (F.col("user_id") >= 50))
                .agg(F.countDistinct("user_id").alias("exact"))
            )
            .select(F.round("est", 4).alias("est"), "exact")
        )
        out = per_batch.crossJoin(F.broadcast(summary)).select(
            "batch", "n_regs", "reg_checksum", "est", "exact"
        ).orderBy("batch")
        rows = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return local_rows_df(spark, 
        rows, "batch int, n_regs long, reg_checksum long, est double, exact long"
    )


@_register(
    "events_type_drift",
    """
    WITH a AS (
      SELECT event_type AS bucket, count(*) AS n_a
      FROM events WHERE value < 50 GROUP BY 1
    ),
    b AS (
      SELECT event_type AS bucket, count(*) AS n_b
      FROM events WHERE value >= 50 GROUP BY 1
    ),
    j AS (
      SELECT coalesce(a.bucket, b.bucket) AS bucket,
             coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
             coalesce(n_a, 0) / (SELECT sum(n_a) FROM a) AS share_a,
             coalesce(n_b, 0) / (SELECT sum(n_b) FROM b) AS share_b
      FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    ),
    terms AS (
      SELECT bucket, n_a, n_b, share_a, share_b,
             (greatest(share_a, 1e-6) - greatest(share_b, 1e-6))
               * ln(greatest(share_a, 1e-6) / greatest(share_b, 1e-6)) AS psi_term,
             0.5 * greatest(share_a, 1e-6)
               * ln(greatest(share_a, 1e-6)
                    / ((greatest(share_a, 1e-6) + greatest(share_b, 1e-6)) / 2))
             + 0.5 * greatest(share_b, 1e-6)
               * ln(greatest(share_b, 1e-6)
                    / ((greatest(share_a, 1e-6) + greatest(share_b, 1e-6)) / 2))
               AS js_term
      FROM j
    )
    SELECT bucket, n_a, n_b,
           round(share_a, 8) AS share_a, round(share_b, 8) AS share_b,
           round(psi_term, 8) AS psi_term, round(js_term, 8) AS js_term,
           round((SELECT sum(psi_term) FROM terms), 8) AS psi,
           round((SELECT sum(js_term) FROM terms), 8) AS js
    FROM terms
    ORDER BY bucket
    """,
)
def events_type_drift(spark, sf_dir):
    """Corpus drift detection (operators/drift.py): the event-type
    distribution of low-value events (baseline) vs high-value events
    (candidate), scored per bucket with PSI terms and Jensen-Shannon
    terms plus the summed alarm scores — the "did today's crawl shift?"
    monitor a long-running ingest pipeline runs between snapshots.
    The oracle replays shares (integer/integer IEEE division), the eps
    floor, both ln-based terms, and the totals; everything rounds at 8
    decimals only because ln() may differ in the last ulp across engines.

    Scale shape: one bounded groupBy per side (bucket cardinality, never
    raw keys), a bucket-sized full-outer join, broadcast totals — nothing
    data-sized survives the first aggregation."""
    from shovel_spark.operators.drift import drift_scores, drift_table

    ev = _t(spark, sf_dir, "events")
    table = drift_table(
        ev.filter(F.col("value") < 50),
        ev.filter(F.col("value") >= 50),
        "event_type",
    ).localCheckpoint()
    totals = drift_scores(table).select(
        F.round("psi", 8).alias("psi"), F.round("js", 8).alias("js")
    )
    return (
        table.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.round("share_a", 8).alias("share_a"),
            F.round("share_b", 8).alias("share_b"),
            F.round("psi_term", 8).alias("psi_term"),
            F.round("js_term", 8).alias("js_term"),
            "psi",
            "js",
        )
        .orderBy("bucket")
    )


@_register(
    "events_value_drift_qhist",
    """
    WITH bk AS (
      SELECT event_type,
             CASE WHEN iv < 32 THEN iv
                  ELSE (length(bin(iv)) - 1 - 5) * 32
                       + CAST(floor(iv / power(2.0, length(bin(iv)) - 1 - 5)) AS BIGINT)
             END AS bucket
      FROM (
        SELECT event_type,
               greatest(CAST(floor(value * 16) AS BIGINT), 0) AS iv
        FROM events
        WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
      )
    ),
    a AS (SELECT bucket, count(*) AS n_a FROM bk WHERE event_type = 'click' GROUP BY 1),
    b AS (SELECT bucket, count(*) AS n_b FROM bk WHERE event_type = 'purchase' GROUP BY 1),
    j AS (
      SELECT coalesce(a.bucket, b.bucket) AS bucket,
             coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
             coalesce(n_a, 0) / (SELECT sum(n_a) FROM a) AS share_a,
             coalesce(n_b, 0) / (SELECT sum(n_b) FROM b) AS share_b
      FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    ),
    terms AS (
      SELECT bucket, n_a, n_b,
             (greatest(share_a, 1e-6) - greatest(share_b, 1e-6))
               * ln(greatest(share_a, 1e-6) / greatest(share_b, 1e-6)) AS psi_term,
             0.5 * greatest(share_a, 1e-6)
               * ln(greatest(share_a, 1e-6)
                    / ((greatest(share_a, 1e-6) + greatest(share_b, 1e-6)) / 2))
             + 0.5 * greatest(share_b, 1e-6)
               * ln(greatest(share_b, 1e-6)
                    / ((greatest(share_a, 1e-6) + greatest(share_b, 1e-6)) / 2))
               AS js_term
      FROM j
    )
    SELECT bucket, n_a, n_b,
           round(psi_term, 8) AS psi_term, round(js_term, 8) AS js_term,
           round((SELECT sum(psi_term) FROM terms), 8) AS psi,
           round((SELECT sum(js_term) FROM terms), 8) AS js
    FROM terms
    ORDER BY bucket
    """,
)
def events_value_drift_qhist(spark, sf_dir):
    """NUMERIC drift via sketch buckets — the composition the drift
    module's "bucket BEFORE scoring" rule prescribes: click vs purchase
    event VALUES are quantized through the qhist log buckets (bounded
    cardinality whatever the value range), then PSI/JS-scored per bucket.
    The oracle replays the bucket arithmetic AND both drift scores.

    Scale shape: feeding raw values to drift_table would make the bucket
    key data-sized; the qhist bucket caps it at (52-s)*2^s regardless of
    scale, so the drift join stays kilobyte-sized at 100 TB."""
    from shovel_spark.operators.drift import drift_scores, drift_table
    from shovel_spark.operators.sketches import qhist_bucket

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", qhist_bucket(F.col("value")).alias("bucket"))
    )
    table = drift_table(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "bucket",
    ).localCheckpoint()
    totals = drift_scores(table).select(
        F.round("psi", 8).alias("psi"), F.round("js", 8).alias("js")
    )
    return (
        table.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.round("psi_term", 8).alias("psi_term"),
            F.round("js_term", 8).alias("js_term"),
            "psi",
            "js",
        )
        .orderBy("bucket")
    )


@_register(
    "events_value_qhist",
    """
    WITH iv AS (
      SELECT user_id % 2 AS shard,
             greatest(CAST(floor(value * 16) AS BIGINT), 0) AS iv
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    ),
    bk AS (
      SELECT shard,
             CASE WHEN iv < 32 THEN iv
                  ELSE (length(bin(iv)) - 1 - 5) * 32
                       + CAST(floor(iv / power(2.0, length(bin(iv)) - 1 - 5)) AS BIGINT)
             END AS bucket
      FROM iv
    ),
    shard_hist AS (SELECT shard, bucket, count(*) AS c FROM bk GROUP BY 1, 2),
    hist AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS c FROM shard_hist GROUP BY 1),
    cum AS (
      SELECT bucket,
             CAST(sum(c) OVER (ORDER BY bucket) AS BIGINT) AS cum,
             CAST(sum(c) OVER () AS BIGINT) AS total
      FROM hist
    ),
    qs AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
    hit AS (
      SELECT q, min(bucket) AS bucket, min(total) AS total
      FROM qs CROSS JOIN cum
      WHERE cum >= ceil(q * total)
      GROUP BY q
    )
    SELECT q, bucket,
           CASE WHEN bucket < 32 THEN CAST(bucket AS DOUBLE)
                ELSE (bucket - (CAST(floor(bucket / 32.0) AS BIGINT) - 1) * 32)
                     * power(2.0, CAST(floor(bucket / 32.0) AS BIGINT) - 1)
           END / 16.0 AS est,
           total
    FROM hit
    ORDER BY q
    """,
)
def events_value_qhist(spark, sf_dir):
    """Mergeable quantile histogram (sketches.qhist_*): the fourth
    mergeable summary alongside CM/HLL/Bloom. Two shards (user parity)
    each build an HDR-style log-bucket histogram of event values with NO
    coordination; the merge sums bucket counts (the histogram is linear,
    so merge == whole-build exactly); p50/p90/p99 are answered from the
    cumulative bucket counts with relative error <= 2^-5. The oracle
    replays the integer bucket arithmetic (floor(v*16) quantization,
    length(bin(iv))-1 exponent, octave sub-bucketing), the shard merge,
    the cumulative election, and the lower-bound inversion bit-for-bit.

    Scale shape: state bounded at (52-s)*2^s buckets regardless of data
    or skew (map-side combine folds hot values); shards merge over
    sketch-sized tables instead of rescanning; the only window runs over
    the <= 1.5k-row histogram, never the data."""
    from shovel_spark.operators.sketches import (
        qhist_build,
        qhist_merge,
        qhist_quantiles,
    )

    # same exhaustive-shard rule as events_hll_sharded_union: != 0 for
    # negative odd ids, explicit NOT NULL mirrored in the oracle
    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "value")
        .filter(F.col("user_id").isNotNull())
    )
    shard_a = qhist_build(ev.filter(F.col("user_id") % 2 == 0), "value")
    shard_b = qhist_build(ev.filter(F.col("user_id") % 2 != 0), "value")
    merged = qhist_merge(shard_a, shard_b).localCheckpoint()
    total = merged.agg(F.sum("c").cast("long").alias("total"))
    return (
        qhist_quantiles(merged, [0.5, 0.9, 0.99])
        .crossJoin(F.broadcast(total))
        .select("q", "bucket", "est", "total")
        .orderBy("q")
    )


@_register(
    "events_bloom_signup_filter",
    """
    WITH su AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) AS uk
      FROM events WHERE event_type = 'signup'
    ),
    setpos AS (
      SELECT ('0x' || substr(md5('bf' || i || ':' || uk), 1, 8))::BIGINT % 4096 AS pos
      FROM su, range(0, 4) t(i)
    ),
    words AS (
      SELECT pos // 32 AS word,
             bit_or(CAST(power(2, pos % 32) AS BIGINT)) AS w
      FROM setpos GROUP BY 1
    ),
    pr AS (
      SELECT event_id, user_id, event_type, i,
             ('0x' || substr(md5('bf' || i || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 4096 AS pos
      FROM events, range(0, 4) t(i)
    ),
    hit AS (
      SELECT event_id, user_id, event_type,
             sum(CASE WHEN w.w IS NOT NULL
                       AND (w.w & CAST(power(2, pos % 32) AS BIGINT)) != 0
                      THEN 1 ELSE 0 END) AS nh
      FROM pr LEFT JOIN words w ON w.word = pos // 32
      GROUP BY 1, 2, 3
    )
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
    FROM hit WHERE nh = 4
    GROUP BY 1 ORDER BY 1
    """,
)
def events_bloom_signup_filter(spark, sf_dir):
    """Broadcast Bloom semi-filter (operators/sketches.py): the scale
    answer to semi-joining a huge fact stream against a key set too big
    to broadcast as a hash table — m bits of state however many keys, no
    false negatives, map-only on the fact side. Here: a 4096-bit / 4-probe
    filter built from signed-up users, applied to the whole event stream;
    per-type counts of surviving rows (false positives, if the bits
    collide, are INCLUDED — both engines rebuild the identical bit array,
    so the oracle matches bit-for-bit either way)."""
    from shovel_spark.operators.sketches import bloom_build, bloom_filter

    ev = _t(spark, sf_dir, "events")
    signup_users = ev.filter(F.col("event_type") == "signup").select("user_id").distinct()
    bloom = bloom_build(signup_users, "user_id", m_bits=4096, k=4)
    kept = bloom_filter(ev, bloom, "user_id", m_bits=4096, k=4)
    return (
        kept.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


@_register(
    "docs_weighted_sample",
    r"""
    WITH w AS (
      SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS tokens
      FROM documents WHERE text IS NOT NULL AND trim(text) != ''
    ),
    keyed AS (
      SELECT doc_id, tokens,
             round(ln(
               ((('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 & 4503599627370495) + 1) / 4503599627370497.0
             ) / tokens, 9) AS wkey
      FROM w WHERE tokens > 0 AND doc_id IS NOT NULL
    )
    SELECT doc_id, tokens FROM keyed
    ORDER BY wkey DESC, doc_id ASC LIMIT 40
    """,
)
def docs_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES, operators/sampling.weighted_sample_k): token count as
    the weight — longer docs proportionally likelier — u drawn from the
    shared md5 hash wire format, log-domain key ln(u)/w (same ordering as
    u^(1/w), no small-weight underflow) rounded to 9 decimals with id
    tie-break so both engines elect the IDENTICAL 40 rows. Plans as
    per-partition TakeOrdered + driver merge: no corpus shuffle."""
    from shovel_spark.operators.sampling import weighted_sample_k

    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("tokens"),
        )
    )
    return weighted_sample_k(
        d, k=40, weight_col="tokens", id_col="doc_id", seed=7, family="md5"
    ).select("doc_id", "tokens")


@_register(
    "docs_dedup_suite",
    r"""
    WITH base AS MATERIALIZED (SELECT doc_id, text FROM documents WHERE doc_id < 200),
    unioned AS MATERIALIZED (
      SELECT doc_id, text FROM base
      UNION ALL SELECT doc_id + 100000, text FROM base
      UNION ALL
      SELECT doc_id + 200000,
             array_to_string(regexp_split_to_array(trim(text), '\s+')[2:], ' ')
      FROM base WHERE doc_id < 12
      UNION ALL
      SELECT doc_id + 300000,
             'paraphrase edition ' || doc_id ||
             ' entirely different synthetic wording ' || doc_id || ' variant'
      FROM base WHERE doc_id >= 150 AND doc_id < 160
    ),
    keep1 AS (
      SELECT min(doc_id) AS doc_id
      FROM unioned GROUP BY md5(regexp_replace(trim(text), '\s+', ' ', 'g'))
    ),
    s1 AS MATERIALIZED (SELECT u.doc_id, u.text FROM unioned u JOIN keep1 USING (doc_id)),
    corpus AS MATERIALIZED (SELECT doc_id, text FROM s1),
    {chain},
    nedges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    n0 AS (SELECT DISTINCT src AS id, src AS label FROM nedges),
    n1 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM n0 l LEFT JOIN nedges g ON g.src = l.id LEFT JOIN n0 ln ON ln.id = g.dst
      GROUP BY l.id, l.label
    ),
    n2 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM n1 l LEFT JOIN nedges g ON g.src = l.id LEFT JOIN n1 ln ON ln.id = g.dst
      GROUP BY l.id, l.label
    ),
    n3 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM n2 l LEFT JOIN nedges g ON g.src = l.id LEFT JOIN n2 ln ON ln.id = g.dst
      GROUP BY l.id, l.label
    ),
    drop2 AS (SELECT id FROM n3 WHERE label != id),
    s2 AS MATERIALIZED (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT id FROM drop2)),
    evec AS MATERIALIZED (
      SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < 200
      UNION ALL
      SELECT vec_id + 300000, list_transform(embedding::DOUBLE[], x -> x * 1.5)
      FROM embeddings WHERE vec_id >= 150 AND vec_id < 160
    ),
    e AS MATERIALIZED (SELECT s2.doc_id AS vec_id, evec.v FROM s2 JOIN evec USING (doc_id)),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS centroid
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)
    ),
    a1 AS (
      SELECT vec_id, arg_max(cell, list_cosine_similarity(v, centroid)) AS cell
      FROM e, c0 GROUP BY vec_id
    ),
    m1 AS (
      SELECT cell, pos, round(avg(val), 6) AS m FROM (
        SELECT a1.cell, generate_subscripts(v, 1) AS pos, unnest(v) AS val
        FROM e JOIN a1 USING (vec_id)
      ) GROUP BY 1, 2
    ),
    c1 AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM m1 GROUP BY 1),
    a2 AS (
      SELECT vec_id, arg_max(cell, list_cosine_similarity(v, centroid)) AS cell
      FROM e, c1 GROUP BY vec_id
    ),
    m2 AS (
      SELECT cell, pos, round(avg(val), 6) AS m FROM (
        SELECT a2.cell, generate_subscripts(v, 1) AS pos, unnest(v) AS val
        FROM e JOIN a2 USING (vec_id)
      ) GROUP BY 1, 2
    ),
    c2 AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM m2 GROUP BY 1),
    a3 AS (
      SELECT vec_id, arg_max(cell, list_cosine_similarity(v, centroid)) AS cell
      FROM e, c2 GROUP BY vec_id
    ),
    av AS MATERIALIZED (SELECT e.vec_id, a3.cell, e.v FROM e JOIN a3 USING (vec_id)),
    prs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE list_cosine_similarity(x.v, y.v) >= 0.999
    ),
    sedges AS (
      SELECT id_a AS src, id_b AS dst FROM prs
      UNION SELECT id_b, id_a FROM prs
    ),
    g0 AS (SELECT DISTINCT src AS id, src AS label FROM sedges),
    g1 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM g0 l LEFT JOIN sedges g ON g.src = l.id LEFT JOIN g0 ln ON ln.id = g.dst
      GROUP BY l.id, l.label
    ),
    g2 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM g1 l LEFT JOIN sedges g ON g.src = l.id LEFT JOIN g1 ln ON ln.id = g.dst
      GROUP BY l.id, l.label
    ),
    g3 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM g2 l LEFT JOIN sedges g ON g.src = l.id LEFT JOIN g2 ln ON ln.id = g.dst
      GROUP BY l.id, l.label
    ),
    lab AS (
      SELECT av.vec_id, coalesce(g3.label, av.vec_id) AS component,
             round(list_cosine_similarity(av.v, c2.centroid), 6) AS cs
      FROM av JOIN c2 USING (cell) LEFT JOIN g3 ON g3.id = av.vec_id
    ),
    mn AS (SELECT component, min(cs) AS mcs FROM lab GROUP BY 1),
    kp AS (
      SELECT lab.component, min(lab.vec_id) AS kid
      FROM lab JOIN mn ON lab.component = mn.component AND lab.cs = mn.mcs
      GROUP BY 1
    ),
    s3 AS (
      SELECT lab.vec_id AS doc_id
      FROM lab JOIN kp USING (component) WHERE lab.vec_id = kp.kid
    )
    SELECT 1 AS stage,
           (SELECT count(*) FROM unioned) AS n_in,
           (SELECT count(*) FROM s1) AS n_out,
           (SELECT CAST(sum(doc_id) AS BIGINT) FROM s1) AS id_sum
    UNION ALL
    SELECT 2, (SELECT count(*) FROM s1), (SELECT count(*) FROM s2),
           (SELECT CAST(sum(doc_id) AS BIGINT) FROM s2)
    UNION ALL
    SELECT 3, (SELECT count(*) FROM s2), (SELECT count(*) FROM s3),
           (SELECT CAST(sum(doc_id) AS BIGINT) FROM s3)
    ORDER BY stage
    """.replace("{chain}", _nd_chain_ctes(30)),
)
def docs_dedup_suite(spark, sf_dir):
    """CAPSTONE: the full dedup suite composed end-to-end — exact →
    capped MinHash near-dup → SemDeDup semantic — each stage's survivors
    feeding the next, with plantings that only the intended stage can
    catch: byte-identical copies (stage 1), first-word-dropped near-dups
    (stage 2), and rephrased docs whose EMBEDDINGS are scale-copies of
    their originals (distinct text — invisible to stages 1-2, cosine
    exactly 1 — caught by stage 3). Output: (stage, n_in, n_out, id_sum)
    — the id sums pin every stage's exact survivor SET, and the oracle
    replays all three tiers (fingerprint election, capped shingle chain +
    3 CC rounds, k-means trajectory + in-cell pairing + keep election) in
    one SQL statement."""
    from shovel_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        minhash_dedup_pairs,
    )
    from shovel_spark.operators.similarity import semantic_dedup

    base = _t(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 200
    )
    para = base.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 160)).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(
            F.lit("paraphrase edition "), F.col("doc_id").cast("string"),
            F.lit(" entirely different synthetic wording "),
            F.col("doc_id").cast("string"), F.lit(" variant"),
        ).alias("text"),
    )
    corpus = (
        base
        .unionByName(base.withColumn("doc_id", F.col("doc_id") + 100000))
        .unionByName(
            base.filter(F.col("doc_id") < 12)
            .withColumn("doc_id", F.col("doc_id") + 200000)
            .withColumn("text", _drop_first_word("text"))
        )
        .unionByName(para)
    )
    s1 = exact_dedup(corpus).localCheckpoint(eager=False)
    pairs2 = minhash_dedup_pairs(
        s1, threshold=0.5, k=3, num_hashes=16, bands=8, family="md5",
        max_doc_freq=30,
    )
    cc = connected_components(pairs2, iters=3)
    drop2 = cc.filter(F.col("component") != F.col("id")).select("id")
    s2 = s1.join(
        drop2.withColumnRenamed("id", "doc_id"), "doc_id", "left_anti"
    ).localCheckpoint(eager=False)
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    evec = emb.filter(F.col("doc_id") < 200).unionByName(
        emb.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 160)).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
        )
    )
    e3 = s2.select("doc_id").join(evec, "doc_id")
    sem = semantic_dedup(
        e3, k=4, iters=2, threshold=0.999, cc_iters=3, id_col="doc_id"
    )
    s3 = sem.filter(F.col("keep")).select("doc_id").localCheckpoint(eager=False)

    def stage(n, df_in, df_out):
        return (
            df_in.agg(F.count("*").alias("n_in"))
            .crossJoin(
                df_out.agg(
                    F.count("*").alias("n_out"),
                    F.sum("doc_id").alias("id_sum"),
                )
            )
            .select(F.lit(n).alias("stage"), "n_in", "n_out", "id_sum")
        )

    return (
        stage(1, corpus, s1)
        .unionByName(stage(2, s1, s2))
        .unionByName(stage(3, s2, s3))
        .orderBy("stage")
    )


@_register(
    "events_hll_users_by_type",
    """
    WITH hashed AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
    ),
    rho AS (
      SELECT event_type, h % 64 AS bucket,
             CASE WHEN h // 64 = 0 THEN 55
                  ELSE strpos(reverse(bin(h // 64)), '1') END AS r
      FROM hashed
    ),
    regs AS (SELECT event_type, bucket, max(r) AS reg FROM rho GROUP BY 1, 2),
    agg AS (
      SELECT event_type, count(*) AS nz, sum(power(2.0, -reg)) AS s
      FROM regs GROUP BY 1
    ),
    est AS (
      SELECT event_type, nz,
             CASE WHEN (0.709 * 4096.0 / (s + (64 - nz))) <= 160.0 AND 64 - nz > 0
                  THEN round(64.0 * ln(64.0 / (64 - nz)), 4)
                  ELSE round(0.709 * 4096.0 / (s + (64 - nz)), 4) END AS est
      FROM agg
    ),
    ex AS (SELECT event_type, count(DISTINCT user_id) AS exact FROM events GROUP BY 1)
    SELECT e.event_type, nz AS nonzero, est, exact
    FROM est e JOIN ex USING (event_type) ORDER BY 1
    """,
)
def events_hll_users_by_type(spark, sf_dir):
    """GROUPED HyperLogLog (sketches.hll_build_grouped): one register set
    per event type — the per-domain/per-sink distinct-visitor counter at
    bounded state (m longs per group, max-mergeable across workers and
    batches like the reference's aggregated counters). The absent-bucket
    correction is algebraic (each of the m - nonzero empty buckets adds
    2^0 to the harmonic sum), so no dense per-group bucket frame is
    built. Oracle replays registers and the corrected estimate per group
    next to the exact distinct count."""
    from shovel_spark.operators.sketches import (
        hll_build_grouped,
        hll_cardinality_grouped,
    )

    ev = _t(spark, sf_dir, "events")
    regs = hll_build_grouped(ev, "event_type", "user_id", b=6)
    est = hll_cardinality_grouped(regs, "event_type", b=6).select(
        "event_type", "nonzero", F.round("est", 4).alias("est")
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact"))
    return est.join(exact, "event_type").orderBy("event_type")


@_register(
    "docs_excise_contamination",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w,
             array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ') AS text
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL AND trim(text) != ''
    ),
    bw AS (SELECT list_slice(w, 2, 9) AS b FROM w WHERE doc_id BETWEEN 5 AND 9),
    bspans AS (
      SELECT DISTINCT md5(array_to_string(list_slice(b, i, i + 5), ' ')) AS h
      FROM (SELECT b, unnest(range(1, greatest(len(b) - 5, 1) + 1)) AS i FROM bw)
    ),
    occ AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(list_slice(w, i, i + 5), ' ')) AS h
      FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 5, 1) + 1)) AS i
            FROM w)
    ),
    cut AS (
      SELECT DISTINCT doc_id, unnest(range(pos, pos + 6)) AS p
      FROM occ JOIN bspans USING (h)
    ),
    tok AS (SELECT doc_id, generate_subscripts(w, 1) AS p, unnest(w) AS t FROM w),
    kept AS (
      SELECT k.doc_id, k.p, k.t FROM tok k
      LEFT JOIN cut c ON k.doc_id = c.doc_id AND k.p = c.p
      WHERE c.doc_id IS NULL
    ),
    rebuilt AS (SELECT doc_id, string_agg(t, ' ' ORDER BY p) AS nt FROM kept GROUP BY 1)
    SELECT count(*) AS n_docs,
           CAST(sum(length(w.text)) AS BIGINT) AS chars_before,
           CAST(sum(length(coalesce(r.nt, ''))) AS BIGINT) AS chars_after,
           CAST(sum(CASE WHEN coalesce(r.nt, '') != w.text THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed
    FROM w LEFT JOIN rebuilt r ON w.doc_id = r.doc_id
    """,
)
def docs_excise_contamination(spark, sf_dir):
    """SPAN-level benchmark decontamination (dedup.excise_contaminated_
    spans): eval 'questions' are 8-token substrings lifted from docs 5-9,
    so those docs (and only those) contain contaminated 6-token windows —
    which get CUT rather than killing the whole document (the surgical
    alternative to contamination_overlap's drop). The oracle replays the
    benchmark span set, the window probe, the merged cut ranges, and the
    token-level rebuild; char sums pin the rewritten text exactly, and
    the n_changed count pins that ONLY the quoting docs were touched."""
    from shovel_spark.functions.textstats import tokens as _tok
    from shovel_spark.operators.dedup import excise_contaminated_spans

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(
            F.col("text").isNotNull()
            & F.col("doc_id").isNotNull()
            & (F.trim(F.col("text")) != "")
        )
        .withColumn("text", F.trim(F.regexp_replace("text", r"\s+", " ")))
    )
    bench = d.filter((F.col("doc_id") >= 5) & (F.col("doc_id") <= 9)).select(
        "doc_id",
        F.array_join(F.slice(_tok(F.col("text")), 2, 8), " ").alias("text"),
    )
    clean = excise_contaminated_spans(
        d, bench, span_tokens=6, family="md5", out_col="clean"
    )
    return clean.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("chars_before"),
        F.sum(F.length("clean")).alias("chars_after"),
        F.sum(
            F.when(F.col("clean") != F.col("text"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_changed"),
    )


#: boilerplate blocks for the capped-incremental contract: A is hot at
#: build time (40 corpus docs > cap 30); B crosses the cap only WITH the
#: delta (20 corpus + 20 delta docs = 40 > 30).
_BOIL_A = " sponsored content visit our partner network today"
_BOIL_B = " subscribe to the newsletter for weekly updates"


@_register(
    "docs_incremental_neardup_capped",
    f"""
    WITH corpus AS (
      SELECT doc_id,
             text || CASE WHEN doc_id < 40 THEN '{_BOIL_A}'
                          WHEN doc_id < 60 THEN '{_BOIL_B}'
                          ELSE '' END AS text
      FROM documents WHERE doc_id < 300
      UNION ALL
      SELECT doc_id + 100000,
             array_to_string(regexp_split_to_array(
               trim(text || '{_BOIL_A}'), '\\s+')[2:], ' ')
      FROM documents WHERE doc_id < 10
      UNION ALL
      SELECT doc_id,
             text || CASE WHEN doc_id < 320 THEN '{_BOIL_B}' ELSE '' END
      FROM documents WHERE doc_id >= 300 AND doc_id < 500
    ),
    {{chain}}
    SELECT id_a, id_b, round(jaccard, 4) AS jaccard
    FROM pairs WHERE id_b >= 300 ORDER BY id_a, id_b
    """.replace("{chain}", _nd_chain_ctes(30)),
)
def docs_incremental_neardup_capped(spark, sf_dir):
    """Incremental near-dup WITH the hot-shingle cap threaded through the
    standing index (round-5 ADVICE): the corpus plants boilerplate A in 40
    docs (over the cap of 30 at BUILD time — dropped before signatures,
    doc frequency recorded in hot_df/) and boilerplate B in 20 docs (under
    the cap, stored); the delta plants B in 20 more docs, pushing its
    corpus+delta total to 40 — so B must be excised by the PROBE from
    exact totals (hot_df + live index rows + delta rows) even though it
    was legal at build time. The probe reads the cap from index meta/
    (max_doc_freq defaults to 'index'). Oracle: the full capped chain over
    corpus+delta restricted to delta pairs — a hash match proves both the
    build-time and newly-hot exclusions agree with a full capped re-run."""
    import hashlib
    import os
    import shutil

    from shovel_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") < 300).withColumn(
        "text",
        F.concat(
            "text",
            F.when(F.col("doc_id") < 40, F.lit(_BOIL_A))
            .when(F.col("doc_id") < 60, F.lit(_BOIL_B))
            .otherwise(F.lit("")),
        ),
    )
    delta = (
        d.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 500))
        .withColumn(
            "text",
            F.concat(
                "text",
                F.when(F.col("doc_id") < 320, F.lit(_BOIL_B)).otherwise(F.lit("")),
            ),
        )
        .unionByName(
            corpus.filter(F.col("doc_id") < 10)
            .withColumn("doc_id", F.col("doc_id") + 100000)
            .withColumn("text", _drop_first_word("text"))
        )
    )
    kw = dict(k=3, num_hashes=16, bands=8, family="md5")
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{os.path.abspath(sf_dir)}:inccap".encode()
    ).hexdigest()[:12]
    idx_path = os.path.join("/tmp/shovel_spark_mh", tag)
    try:
        build_minhash_index(corpus, idx_path, max_doc_freq=30, **kw)
        pairs = incremental_minhash_pairs(
            spark, idx_path, delta, threshold=0.5, **kw
        ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard")).orderBy(
            "id_a", "id_b"
        )
        rows = pairs.collect()
        return local_rows_df(spark, rows, pairs.schema)
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)


@_register(
    "cohort_retention_d1_d7",
    """
    WITH ev AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
      FROM events
    ),
    signups AS (
      SELECT user_id, min(d) AS d0 FROM ev WHERE event_type = 'signup' GROUP BY 1
    ),
    activity AS (SELECT DISTINCT user_id, d FROM ev),
    flags AS (
      SELECT s.user_id, s.d0,
             max(CASE WHEN a.d - s.d0 = 1 THEN 1 ELSE 0 END) AS r1,
             max(CASE WHEN a.d - s.d0 = 7 THEN 1 ELSE 0 END) AS r7
      FROM signups s JOIN activity a USING (user_id)
      GROUP BY 1, 2
    )
    SELECT strftime(DATE '1970-01-01' + to_days(CAST(d0 AS INT)), '%Y-%m-%d') AS cohort_day,
           count(*) AS n_users,
           CAST(sum(r1) AS BIGINT) AS retained_d1,
           CAST(sum(r7) AS BIGINT) AS retained_d7
    FROM flags GROUP BY 1
    """,
)
def cohort_retention_d1_d7(spark, sf_dir):
    """Cohort retention (operators/aggregate.cohort_retention): users
    bucketed by first-signup day; day-1 and day-7 retention = any activity
    exactly that many days later. Day buckets floor-truncate epoch seconds
    (fractional-second parity). The oracle replays signup election,
    distinct active days, and both retention flags."""
    from shovel_spark.operators.aggregate import cohort_retention

    ev = _t(spark, sf_dir, "events")
    out = cohort_retention(ev, days=[1, 7])
    return out.select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "n_users",
        "retained_d1",
        "retained_d7",
    )


@_register(
    "funnel_view_click_purchase",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
    )
    SELECT stage, n_users, ts_checksum FROM (
      SELECT 1 AS stage, count(*) AS n_users,
             CAST(sum(CAST(floor(epoch(t)) AS BIGINT)) AS BIGINT) AS ts_checksum FROM s1
      UNION ALL
      SELECT 2, count(*), CAST(sum(CAST(floor(epoch(t)) AS BIGINT)) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, count(*), CAST(sum(CAST(floor(epoch(t)) AS BIGINT)) AS BIGINT) FROM s3
    )
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered funnel (operators/windows.funnel_times): per user the first
    view, the first click AFTER that view, the first purchase AFTER that
    click — the log-pipeline conversion query. Stage counts plus an
    epoch-second checksum of the stage times pin the exact greedy
    trajectory, not just the counts. k-1 per-key joins, no window over the
    event stream."""
    from shovel_spark.operators.windows import funnel_times

    ev = _t(spark, sf_dir, "events")
    f = funnel_times(ev, ["view", "click", "purchase"], ["user_id"])
    sec = lambda c: F.floor(F.unix_micros(F.col(c).cast("timestamp")) / F.lit(1000000))  # noqa: E731
    out = None
    for i, c in enumerate(["t_view", "t_click", "t_purchase"], start=1):
        stage = f.filter(F.col(c).isNotNull()).agg(
            F.lit(i).alias("stage"),
            F.count("*").alias("n_users"),
            F.sum(sec(c)).alias("ts_checksum"),
        )
        out = stage if out is None else out.unionByName(stage)
    return out


@_register(
    "stream_neardup_two_batches",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000,
             array_to_string(regexp_split_to_array(trim(text), '\\s+')[2:], ' ')
      FROM documents WHERE doc_id < 5
      UNION ALL
      SELECT doc_id + 200000,
             array_to_string(regexp_split_to_array(trim(text), '\\s+')[2:], ' ')
      FROM documents WHERE doc_id = 60
    ),
    {_nd_chain_ctes()},
    drop1 AS (SELECT DISTINCT id_b FROM pairs WHERE id_b < 60),
    surv1 AS (
      SELECT doc_id FROM corpus WHERE doc_id < 60
        AND doc_id NOT IN (SELECT id_b FROM drop1)
    ),
    drop2 AS (
      SELECT DISTINCT id_b FROM pairs
      WHERE id_b >= 60
        AND (id_a >= 60 OR id_a IN (SELECT doc_id FROM surv1))
    ),
    surv2 AS (
      SELECT doc_id FROM corpus WHERE doc_id >= 60
        AND doc_id NOT IN (SELECT id_b FROM drop2)
    )
    SELECT 0 AS batch, count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum FROM surv1
    UNION ALL
    SELECT 1, count(*), CAST(sum(doc_id) AS BIGINT) FROM surv2
    """,
)
def stream_neardup_two_batches(spark, sf_dir):
    """STREAMING near-dup ingest, VALUE-CHECKED: two micro-batches run
    through the real foreachBatch handler (streaming/pipeline.py
    _process_neardup_batch — index build, first-wins cross-batch drops,
    lowest-id within-batch drops, batch-keyed idempotent writes). Batch 0 =
    docs 0-59; batch 1 = docs 60-99 plus planted cross-batch near-dups of
    docs 0-4 and a within-batch near-dup of doc 60. The oracle replays the
    policy from one full MinHash chain: batch-0 drops are pairs wholly
    inside batch 0; a batch-1 doc drops iff it pairs with a batch-1 doc or
    a SURVIVING batch-0 doc (dropped docs never joined the index — their
    late near-dups correctly survive). Batch ids come from the __batch
    partition column the idempotent writer produced."""
    import hashlib
    import os
    import shutil

    from shovel_spark.streaming.pipeline import _process_neardup_batch

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = d.filter(F.col("doc_id") < 60)
    b1 = (
        d.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 100))
        .unionByName(
            d.filter(F.col("doc_id") < 5)
            .withColumn("doc_id", F.col("doc_id") + 100000)
            .withColumn("text", _drop_first_word("text"))
        )
        .unionByName(
            d.filter(F.col("doc_id") == 60)
            .withColumn("doc_id", F.col("doc_id") + 200000)
            .withColumn("text", _drop_first_word("text"))
        )
    )
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{os.path.abspath(sf_dir)}:snd".encode()
    ).hexdigest()[:12]
    base = os.path.join("/tmp/shovel_spark_snd", tag)
    mh_kw = dict(
        text_col="text", id_col="doc_id", k=3, num_hashes=16, bands=8, family="md5"
    )
    try:
        _process_neardup_batch(
            spark, b0, 0, f"{base}/idx", f"{base}/out", 0.5, "doc_id", mh_kw
        )
        _process_neardup_batch(
            spark, b1, 1, f"{base}/idx", f"{base}/out", 0.5, "doc_id", mh_kw
        )
        out = (
            spark.read.parquet(f"{base}/out/docs")
            .groupBy(F.col("__batch").alias("batch"))
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("doc_id").alias("id_checksum"),
            )
        )
        rows = out.collect()
        return local_rows_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@_register(
    "stream_windowed_metrics",
    """
    WITH p AS (
      SELECT doc_id, lang,
             TIMESTAMP '2024-01-01 00:00:00'
               + to_days(CAST(doc_id % 5 AS INT))
               + to_hours(CAST(doc_id % 7 AS INT)) AS ts
      FROM documents
    )
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           strftime(date_trunc('day', ts) + to_days(1), '%Y-%m-%d %H:%M:%S') AS win_end,
           lang, count(*) AS n
    FROM p GROUP BY 1, 2, 3
    """,
)
def stream_windowed_metrics(spark, sf_dir):
    """STREAMING watermarked tumbling-window counts, VALUE-CHECKED
    (streaming/pipeline.py windowed_metrics_stream +
    run_windowed_metrics_once): pages with event times spread over five
    days land as ONE file (one micro-batch — nothing is ever behind the
    initial watermark, so no row drops), then two far-future sentinel
    files each drive another availableNow cycle whose advancing watermark
    FINALIZES the real windows into the append-mode parquet sink. The
    oracle recomputes every 1-day window (epoch-aligned, as F.window
    does) per lang in SQL; sentinel windows are excluded by a fixed
    horizon in both engines. This is the reference's metrics stream with
    event-time semantics shovel lacks (its `date` is arrival wall-clock;
    reference: src/core/aggregated_metrics.js:100-132)."""
    import hashlib
    import os
    import shutil

    from shovel_spark.streaming.pipeline import run_windowed_metrics_once

    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{os.path.abspath(sf_dir)}:swm".encode()
    ).hexdigest()[:12]
    base = os.path.join("/tmp/shovel_spark_swm", tag)
    inp, out, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(base, ignore_errors=True)

    d = _t(spark, sf_dir, "documents")
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_dt_interval(
        days=(F.col("doc_id") % 5).cast("int"),
        hours=(F.col("doc_id") % 7).cast("int"),
    )
    pages = d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"), F.col("doc_id")
        ).alias("url"),
        ts.alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )

    def sentinel(ts_str: str, name: str) -> None:
        spark.range(1).select(
            F.lit(f"https://sentinel.example.com/{name}").alias("url"),
            F.to_timestamp(F.lit(ts_str)).alias("warc_ts"),
            F.encode(F.lit("<p>x</p>"), "UTF-8").alias("html"),
            F.lit("x").alias("text"),
            F.lit("en").alias("lang"),
        ).coalesce(1).write.mode("append").parquet(inp)

    try:
        pages.coalesce(1).write.mode("overwrite").parquet(inp)
        run_windowed_metrics_once(spark, inp, out, ckpt)
        # each sentinel advances the watermark past ALL real event time,
        # finalizing the pending windows on the next cycle's batch
        sentinel("2034-01-01 00:00:00", "s1")
        run_windowed_metrics_once(spark, inp, out, ckpt)
        sentinel("2044-01-01 00:00:00", "s2")
        run_windowed_metrics_once(spark, inp, out, ckpt)
        res = (
            spark.read.schema(
                "window_start timestamp, window_end timestamp, lang string, n long"
            )
            .parquet(os.path.join(out, "windowed_metrics"))
            .filter(F.col("window_start") < F.lit("2030-01-01"))
            .select(
                F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
                F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("win_end"),
                "lang",
                "n",
            )
        )
        rows = res.collect()
        return local_rows_df(spark, rows, res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@_register(
    "docs_repeated_spans",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL AND trim(text) != ''
    ),
    sp AS (
      SELECT doc_id, md5(array_to_string(list_slice(w, i, i + 4), ' ')) AS h
      FROM (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS i
        FROM w
      )
    ),
    agg AS (
      SELECT h, count(*) AS c, count(DISTINCT doc_id) AS nd
      FROM sp GROUP BY 1 HAVING count(*) >= 2
    )
    SELECT nd AS n_docs, count(*) AS n_spans,
           CAST(sum(c) AS BIGINT) AS total_occurrences
    FROM agg GROUP BY 1
    """,
)
def docs_repeated_spans(spark, sf_dir):
    """Exact repeated-passage fingerprinting (dedup.repeated_spans): every
    5-token window hashed (stride 1), spans occurring 2+ times reported —
    the span-wise exact-substring dedup signal (repeated boilerplate
    passages inside otherwise-unique pages, the memorization risk doc-level
    dedup misses). Result profiled by span doc-spread. The md5 span keys
    let the oracle replay the identical fingerprinting; span text never
    shuffles in either engine."""
    from shovel_spark.operators.dedup import repeated_spans

    d = _t(spark, sf_dir, "documents")
    spans = repeated_spans(d, span_tokens=5, min_count=2, family="md5")
    return spans.groupBy("n_docs").agg(
        F.count("*").alias("n_spans"),
        F.sum("n_occurrences").alias("total_occurrences"),
    )


@_register(
    "docs_excise_spans",
    r"""
    WITH w AS (
      -- whitespace-normalized on BOTH sides (tokenize + single-space
      -- rejoin), so the char-sum comparison is insensitive to the raw
      -- testdata's spacing
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w,
             array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ') AS text
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL AND trim(text) != ''
    ),
    occ AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(list_slice(w, i, i + 4), ' ')) AS h
      FROM (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS i
        FROM w
      )
    ),
    hot AS (SELECT h FROM occ GROUP BY 1 HAVING count(*) >= 2),
    tagged AS (
      SELECT o.doc_id, o.pos,
             row_number() OVER (PARTITION BY o.h ORDER BY o.doc_id, o.pos) AS rn
      FROM occ o JOIN hot USING (h)
    ),
    rm AS (
      SELECT DISTINCT doc_id, unnest(range(pos, pos + 5)) AS p
      FROM tagged WHERE rn > 1
    ),
    prot AS (
      SELECT DISTINCT doc_id, unnest(range(pos, pos + 5)) AS p
      FROM tagged WHERE rn = 1
    ),
    cut AS (
      SELECT r.doc_id, r.p FROM rm r
      LEFT JOIN prot q ON r.doc_id = q.doc_id AND r.p = q.p
      WHERE q.doc_id IS NULL
    ),
    tok AS (
      SELECT doc_id, generate_subscripts(w, 1) AS p, unnest(w) AS t FROM w
    ),
    kept AS (
      SELECT k.doc_id, k.p, k.t FROM tok k
      LEFT JOIN cut c ON k.doc_id = c.doc_id AND k.p = c.p
      WHERE c.doc_id IS NULL
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(t, ' ' ORDER BY p) AS nt FROM kept GROUP BY 1
    )
    SELECT count(*) AS n_docs,
           CAST(sum(length(w.text)) AS BIGINT) AS chars_before,
           CAST(sum(length(coalesce(r.nt, ''))) AS BIGINT) AS chars_after,
           CAST(sum(CASE WHEN coalesce(r.nt, '') != w.text THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed
    FROM w LEFT JOIN rebuilt r ON w.doc_id = r.doc_id
    """,
)
def docs_excise_spans(spark, sf_dir):
    """Span EXCISION (dedup.excise_repeated_spans) — the removal half of
    exact substring dedup: every 5-token window occurring 2+ times keeps
    its corpus-wide first occurrence and loses every other occurrence's
    tokens (first occurrences protect their range against overlapping
    removals; whitespace-normalized rebuild). The oracle replays the whole
    policy — occurrence election by (doc, pos), removal/protection sets,
    token-level rebuild — and the char sums pin the rebuilt text exactly."""
    from shovel_spark.operators.dedup import excise_repeated_spans

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(
            F.col("text").isNotNull()
            & F.col("doc_id").isNotNull()
            & (F.trim(F.col("text")) != "")
        )
        # whitespace-normalize BEFORE excision (and the oracle rejoins its
        # tokens the same way), so the byte-identity comparison never
        # depends on the testdata happening to be single-spaced
        .withColumn("text", F.trim(F.regexp_replace("text", r"\s+", " ")))
    )
    clean = excise_repeated_spans(
        d, span_tokens=5, min_count=2, family="md5", out_col="clean"
    )
    return clean.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("chars_before"),
        F.sum(F.length("clean")).alias("chars_after"),
        F.sum(
            F.when(F.col("clean") != F.col("text"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_changed"),
    )


@_register(
    "docs_resolve_best_quality",
    f"""
    WITH corpus AS ({_ND_CORPUS_SQL}),
    {_nd_chain_ctes()},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
    l1 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l0 l LEFT JOIN edges e ON e.src = l.id LEFT JOIN l0 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    ),
    l2 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l1 l LEFT JOIN edges e ON e.src = l.id LEFT JOIN l1 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    ),
    l3 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l2 l LEFT JOIN edges e ON e.src = l.id LEFT JOIN l2 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    ),
    ranked AS (
      SELECT c.id, row_number() OVER (
        PARTITION BY c.label ORDER BY length(x.text) DESC, c.id ASC
      ) AS rn
      FROM l3 c JOIN corpus x ON x.doc_id = c.id
    ),
    kept AS (
      SELECT * FROM corpus
      WHERE doc_id NOT IN (SELECT id FROM ranked WHERE rn > 1)
    )
    SELECT count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           CAST(sum(length(text)) AS BIGINT) AS chars_kept
    FROM kept
    """,
)
def docs_resolve_best_quality(spark, sf_dir):
    """Canonical selection by QUALITY (dedup.resolve_duplicates): each
    near-dup cluster keeps its highest-quality member (here: longest text,
    lowest id on ties) instead of dup_clusters' lowest-id policy — the
    survivor policy a production pipeline actually wants (near-dup families
    keep the fullest copy). On THIS corpus the two policies agree (planted
    copies dropped their first word, so the original is both lower-id and
    longer) — the oracle pins the chain+CC+ranking mechanics; the policy
    DISAGREEMENT case is pinned by the unit test
    (test_resolve_duplicates_keeps_best_quality). Oracle replays the full
    MinHash chain, 3 label-propagation rounds, and the quality ranking."""
    from shovel_spark.operators.dedup import minhash_dedup_pairs, resolve_duplicates

    corpus = _near_dup_corpus(spark, sf_dir)
    pairs = minhash_dedup_pairs(
        corpus, threshold=0.5, num_hashes=16, bands=8, family="md5"
    )
    kept = resolve_duplicates(
        corpus.withColumn("q", F.length("text")), pairs, "q", iters=3
    )
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("id_checksum"),
        F.sum(F.length("text")).alias("chars_kept"),
    )


#: 29-word boilerplate every doc in the capped-pairs corpus shares — the
#: planted hot-shingle skew the max_doc_freq cap exists to defuse.
_BOILER = (
    "the quick brown fox jumps over the lazy dog near the riverbank while "
    "morning fog settles quietly across the valley floor and birds begin "
    "their daily chorus of songs"
)

_BOILER_TERMS = " || ' w' || (doc_id * 7 + {i})"


def _boiler_corpus_sql(n_docs: int, n_copies: int) -> str:
    """DuckDB twin of the hot-shingle corpus: every doc = shared boilerplate
    + unique content words w(7·id+1..6); copies (+100000) drop the last
    content word."""
    full = "".join(_BOILER_TERMS.format(i=i) for i in range(1, 7))
    short = "".join(_BOILER_TERMS.format(i=i) for i in range(1, 6))
    return f"""
      SELECT doc_id, '{_BOILER}'{full} AS text
      FROM documents WHERE doc_id < {n_docs}
      UNION ALL
      SELECT doc_id + 100000, '{_BOILER}'{short} AS text
      FROM documents WHERE doc_id < {n_copies}
"""


@_register(
    "docs_minhash_capped_pairs",
    f"""
    WITH corpus AS ({_boiler_corpus_sql(85, 5)}),
    {_nd_chain_ctes(10)}
    SELECT id_a, id_b, round(jaccard, 4) AS jaccard
    FROM pairs ORDER BY id_a, id_b
    """,
)
def docs_minhash_capped_pairs(spark, sf_dir):
    """minhash_dedup_pairs with the ``max_doc_freq`` skew cap ACTIVE on a
    corpus built to need it: all 90 docs share a 29-word boilerplate block
    (27 shingles at doc-freq 90 — uncapped, those dominate every MinHash
    signature and collapse the LSH buckets toward all-pairs), plus 6 unique
    content words each; 5 planted near-dup copies drop the last content
    word. With the cap at 10 the boilerplate shingles are dropped BEFORE
    signatures, so only the 5 planted pairs surface (jaccard 5/6). The
    oracle replays the capped chain end-to-end (dedup.shingle_table
    max_doc_freq → dedup.py:66-77)."""
    from shovel_spark.operators.dedup import minhash_dedup_pairs

    ids = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 85)

    def _content(n_words: int) -> F.Column:
        return F.concat_ws(
            " ",
            F.lit(_BOILER),
            *[
                F.concat(F.lit("w"), (F.col("doc_id") * 7 + i).cast("string"))
                for i in range(1, n_words + 1)
            ],
        )

    base = ids.withColumn("text", _content(6))
    copies = (
        ids.filter(F.col("doc_id") < 5)
        .withColumn("text", _content(5))
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    pairs = minhash_dedup_pairs(
        base.unionByName(copies), threshold=0.5, num_hashes=16, bands=8,
        max_doc_freq=10, family="md5",
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("id_a", "id_b")


@_register(
    "docs_simhash_near_dups",
    f"""
    WITH corpus AS ({_ND_CORPUS_SQL}),
    tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
      FROM corpus
    ),
    th AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok
    ),
    votes AS (
      SELECT doc_id, b AS bit,
             sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM th, range(0, 60) r(b) GROUP BY 1, 2
    ),
    sims AS (
      SELECT doc_id,
             sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS sh
      FROM votes GROUP BY 1
    ),
    chunks AS (
      SELECT doc_id, sh, b AS block, (sh >> (b * 15)) & 32767 AS chunk
      FROM sims, range(0, 4) r(b)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             CAST(bit_count(xor(x.sh, y.sh)) AS INT) AS hamming
      FROM chunks x JOIN chunks y
        ON x.block = y.block AND x.chunk = y.chunk AND x.doc_id < y.doc_id
    )
    SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 12
    ORDER BY id_a, id_b
    """,
)
def docs_simhash_near_dups(spark, sf_dir):
    """simhash_near_dup_pairs (60-bit SimHash, block-LSH candidates,
    hamming verify) on the planted near-dup corpus. md5-derived token hash
    (60 bits = 15 hex chars, exactly reproducible as a DuckDB BIGINT cast)
    lets the oracle recompute the simhashes, the block-trick candidates and
    the hamming filter bit-for-bit."""
    from shovel_spark.operators.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        _near_dup_corpus(spark, sf_dir), max_hamming=12, bits=60, blocks=4,
        family="md5",
    ).orderBy("id_a", "id_b")


@_register(
    "emb_lsh_near_dups",
    """
    WITH corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 50
      UNION ALL
      SELECT vec_id + 100000, list_transform(embedding::DOUBLE[], x -> x * 1.0001)
      FROM embeddings WHERE vec_id < 50
    ),
    planes AS (
      SELECT p, list(val ORDER BY j) AS plane FROM (
        SELECT p, j,
               (CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END)
                 / 2147483648.0 AS val
        FROM (
          SELECT p, j, ('0x' || substr(md5((7000 + p) || ':' || j), 1, 8))::BIGINT AS h
          FROM range(0, 6) pp(p), range(0, 64) jj(j)
        )
      ) GROUP BY p
    ),
    sigs AS (
      SELECT vec_id, any_value(v) AS v,
             sum(CASE WHEN list_dot_product(v, plane) >= 0
                      THEN (1::BIGINT << p) ELSE 0 END) AS sig
      FROM corpus, planes GROUP BY vec_id
    )
    SELECT x.vec_id AS id_a, y.vec_id AS id_b,
           round(list_cosine_similarity(x.v, y.v), 4) AS cosine
    FROM sigs x JOIN sigs y ON x.sig = y.sig AND x.vec_id < y.vec_id
    WHERE list_cosine_similarity(x.v, y.v) >= 0.999
    ORDER BY id_a, id_b
    """,
)
def emb_lsh_near_dups(spark, sf_dir):
    """embedding_near_dup_pairs (random-hyperplane LSH buckets + exact cosine
    verify) on embeddings ∪ slightly-perturbed copies. The hyperplanes are
    md5-derived (similarity._plane: signed int32 of md5('seed:j')[:4] / 2^31)
    so DuckDB regenerates them bit-for-bit and replays bucket + verify."""
    from shovel_spark.operators.dedup import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    perturbed = e.withColumn("vec_id", F.col("vec_id") + 100000).withColumn(
        "embedding", F.transform("embedding", lambda x: x * 1.0001)
    )
    pairs = embedding_near_dup_pairs(
        e.unionByName(perturbed), threshold=0.999, planes=6
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 4).alias("cosine")).orderBy(
        "id_a", "id_b"
    )


@_register(
    "emb_ivf_topk",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    ppos AS (
      SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS val FROM e
    ),
    cm AS (SELECT label AS cell, pos, avg(val) AS m FROM ppos GROUP BY 1, 2),
    cents AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM cm GROUP BY 1),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    top_cells AS (
      SELECT cell FROM cents, q
      ORDER BY list_cosine_similarity(centroid, qv) DESC LIMIT 3
    ),
    assigned AS (
      SELECT vec_id, arg_max(cell, list_cosine_similarity(v, centroid)) AS cell
      FROM e, cents WHERE vec_id != 0 GROUP BY vec_id
    )
    SELECT e.vec_id, round(list_cosine_similarity(v, qv), 4) AS sim
    FROM e JOIN assigned ON e.vec_id = assigned.vec_id, q
    WHERE assigned.cell IN (SELECT cell FROM top_cells)
    ORDER BY list_cosine_similarity(v, qv) DESC, e.vec_id LIMIT 10
    """,
)
def emb_ivf_topk(spark, sf_dir):
    """IVF approximate top-k over a MATERIALIZED index: label centroids
    (posexplode-avg), vectors written partitioned by their nearest cell
    (build_ivf_index), then the probe reads only the 3 best cell partitions
    — partition pruning at the scan, no per-query re-assignment. The oracle
    recomputes centroids / assignment / probe in DuckDB list math."""
    import os

    from shovel_spark.operators.similarity import (
        build_ivf_index,
        centroids_from_labels,
        ivf_topk_indexed,
    )

    import hashlib

    e = _t(spark, sf_dir, "embeddings")
    cents = centroids_from_labels(e)
    # path keyed by (session, full sf_dir): concurrent sessions or same-named
    # sf dirs must not race on overwrite-vs-read of a shared index
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:12]
    idx_path = os.path.join("/tmp/shovel_spark_ivf", tag)
    build_ivf_index(e.filter(F.col("vec_id") != 0), cents, idx_path)
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = ivf_topk_indexed(spark, idx_path, cents, q, k=10, nprobe=3).select(
        "vec_id", F.round("sim", 4).alias("sim")
    )
    # materialize the k rows, then remove the scratch index — per-session
    # tags would otherwise accumulate in /tmp forever
    rows = top.collect()
    import shutil

    shutil.rmtree(idx_path, ignore_errors=True)
    return local_rows_df(spark, rows, top.schema)


def _lsh_topk_indexed_query(spark, sf_dir, num_tables: int, salt: str):
    """Shared body of the two LSH-index contract queries: build a scratch
    index over embeddings (vec 0 excluded), probe with vec 0, materialize
    the k rows, and ALWAYS remove the scratch index (try/finally — a probe
    failure must not leak per-session /tmp directories)."""
    import hashlib
    import os
    import shutil

    from shovel_spark.operators.similarity import build_lsh_index, lsh_topk_indexed

    e = _t(spark, sf_dir, "embeddings")
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{os.path.abspath(sf_dir)}{salt}".encode()
    ).hexdigest()[:12]
    idx_path = os.path.join("/tmp/shovel_spark_lsh", tag)
    try:
        build_lsh_index(
            e.filter(F.col("vec_id") != 0), idx_path, planes=4, num_tables=num_tables
        )
        q = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
        top = lsh_topk_indexed(
            spark, idx_path, q, k=10, planes=4, num_tables=num_tables
        ).select("vec_id", F.round("sim", 4).alias("sim"))
        rows = top.collect()
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)
    return local_rows_df(spark, rows, top.schema)


@_register(
    "emb_lsh_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    planes AS (
      SELECT p, list(val ORDER BY j) AS plane FROM (
        SELECT p, j,
               (CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END)
                 / 2147483648.0 AS val
        FROM (
          SELECT p, j, ('0x' || substr(md5((7000 + p) || ':' || j), 1, 8))::BIGINT AS h
          FROM range(0, 4) pp(p), range(0, 64) jj(j)
        )
      ) GROUP BY p
    ),
    sigs AS (
      SELECT vec_id, any_value(v) AS v,
             sum(CASE WHEN list_dot_product(v, plane) >= 0
                      THEN (1::BIGINT << p) ELSE 0 END) AS sig
      FROM e, planes GROUP BY vec_id
    ),
    q AS (SELECT v AS qv, sig AS qsig FROM sigs WHERE vec_id = 0)
    SELECT s.vec_id, round(list_cosine_similarity(s.v, qv), 4) AS sim
    FROM sigs s, q WHERE s.sig = qsig AND s.vec_id != 0
    ORDER BY list_cosine_similarity(s.v, qv) DESC, s.vec_id LIMIT 10
    """,
)
def emb_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH top-k over a MATERIALIZED index (build_lsh_index →
    lsh_topk_indexed): the corpus is signed once and written partitioned by
    signature; the probe signs only the query vector (driver-side, zero
    Spark jobs) and scans one signature partition (PartitionFilters prune
    at the scan), exact cosine inside the bucket. The amortized ANN path —
    contrast lsh_topk, which re-signs the corpus per query. The oracle
    regenerates the md5-derived hyperplanes and replays
    sign → bucket-filter → cosine top-k."""
    return _lsh_topk_indexed_query(spark, sf_dir, num_tables=1, salt="")


@_register(
    "emb_lsh_topk_multi",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    planes AS (
      SELECT t, p, list(val ORDER BY j) AS plane FROM (
        SELECT t, p, j,
               (CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END)
                 / 2147483648.0 AS val
        FROM (
          SELECT t, p, j,
                 ('0x' || substr(md5(((7 + t) * 1000 + p) || ':' || j), 1, 8))::BIGINT AS h
          FROM range(0, 2) tt(t), range(0, 4) pp(p), range(0, 64) jj(j)
        )
      ) GROUP BY t, p
    ),
    sigs AS (
      SELECT t, vec_id, any_value(v) AS v,
             sum(CASE WHEN list_dot_product(v, plane) >= 0
                      THEN (1::BIGINT << p) ELSE 0 END) AS sig
      FROM e, planes GROUP BY t, vec_id
    ),
    q AS (SELECT t AS qt, v AS qv, sig AS qsig FROM sigs WHERE vec_id = 0),
    cand AS (
      SELECT DISTINCT s.vec_id, s.v
      FROM sigs s JOIN q ON s.t = q.qt AND s.sig = q.qsig
      WHERE s.vec_id != 0
    )
    SELECT c.vec_id, round(list_cosine_similarity(c.v, qv), 4) AS sim
    FROM cand c, (SELECT any_value(qv) AS qv FROM q)
    ORDER BY list_cosine_similarity(c.v, qv) DESC, c.vec_id LIMIT 10
    """,
)
def emb_lsh_topk_multi(spark, sf_dir):
    """Multi-table LSH top-k (the recall knob): 2 independent hash tables
    (seeds 7, 8), probe scans one (table, signature) partition per table,
    candidates are the DEDUPED union of both buckets — recall
    1-(1-p^planes)^2 for 2x probe I/O. The oracle regenerates both plane
    sets, replays per-table bucket filters, unions, dedupes, ranks."""
    return _lsh_topk_indexed_query(spark, sf_dir, num_tables=2, salt=":multi")


@_register(
    "emb_lsh_topk_batch",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    planes AS (
      SELECT p, list(val ORDER BY j) AS plane FROM (
        SELECT p, j,
               (CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END)
                 / 2147483648.0 AS val
        FROM (
          SELECT p, j, ('0x' || substr(md5((7000 + p) || ':' || j), 1, 8))::BIGINT AS h
          FROM range(0, 4) pp(p), range(0, 64) jj(j)
        )
      ) GROUP BY p
    ),
    sigs AS (
      SELECT vec_id, any_value(v) AS v,
             sum(CASE WHEN list_dot_product(v, plane) >= 0
                      THEN (1::BIGINT << p) ELSE 0 END) AS sig
      FROM e, planes GROUP BY vec_id
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, sig AS qsig FROM sigs WHERE vec_id < 100)
    SELECT q.query_id, s.vec_id, round(list_cosine_similarity(s.v, q.qv), 4) AS sim
    FROM sigs s JOIN q ON s.sig = q.qsig
    WHERE s.vec_id >= 100
    QUALIFY row_number() OVER (
      PARTITION BY q.query_id
      ORDER BY list_cosine_similarity(s.v, q.qv) DESC, s.vec_id
    ) <= 5
    """,
)
def emb_lsh_topk_batch(spark, sf_dir):
    """BATCHED LSH probe (lsh_topk_indexed_batch): 100 query vectors served
    against the materialized signature-partitioned index in ONE job — each
    query signed as a column expression (no driver loop, no per-query
    py_signature), signed queries broadcast into an equi-join on the
    signature against a single index scan, per-query top-5 via a
    rank-limit window (WindowGroupLimit). The production dispatch shape:
    shovel routes per message, ANN serves per query-set. The oracle
    regenerates the hyperplanes and replays sign → bucket join → window
    top-k for all 100 queries."""
    import hashlib
    import os
    import shutil

    from shovel_spark.operators.similarity import (
        build_lsh_index,
        lsh_topk_indexed_batch,
    )

    e = _t(spark, sf_dir, "embeddings")
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{os.path.abspath(sf_dir)}:batch".encode()
    ).hexdigest()[:12]
    idx_path = os.path.join("/tmp/shovel_spark_lsh", tag)
    try:
        build_lsh_index(e.filter(F.col("vec_id") >= 100), idx_path, planes=4)
        queries = e.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        top = lsh_topk_indexed_batch(
            spark, idx_path, queries, k=5, planes=4
        ).select("query_id", "vec_id", F.round("sim", 4).alias("sim"))
        rows = top.collect()
        return local_rows_df(spark, rows, top.schema)
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)


@_register(
    "emb_ivf_topk_batch",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    ppos AS (
      SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS val FROM e
    ),
    cm AS (SELECT label AS cell, pos, avg(val) AS m FROM ppos GROUP BY 1, 2),
    cents AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM cm GROUP BY 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 100),
    probe AS (
      SELECT query_id, qv, cell FROM q, cents
      QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY list_cosine_similarity(centroid, qv) DESC, cell
      ) <= 3
    ),
    assigned AS (
      SELECT vec_id, arg_max(cell, list_cosine_similarity(v, centroid)) AS cell
      FROM e, cents WHERE vec_id >= 100 GROUP BY vec_id
    )
    SELECT p.query_id, e.vec_id, round(list_cosine_similarity(e.v, p.qv), 4) AS sim
    FROM e JOIN assigned a ON e.vec_id = a.vec_id JOIN probe p ON a.cell = p.cell
    QUALIFY row_number() OVER (
      PARTITION BY p.query_id
      ORDER BY list_cosine_similarity(e.v, p.qv) DESC, e.vec_id
    ) <= 5
    """,
)
def emb_ivf_topk_batch(spark, sf_dir):
    """BATCHED IVF probe (ivf_topk_indexed_batch): 100 query vectors, cell
    ranking as a broadcast crossJoin (queries x centroids — both
    config-sized) + per-query rank-limit window instead of a driver-side
    collect per query; (query, cell) pairs broadcast into one equi-join
    against the cell-partitioned index (dynamic partition pruning drops
    unprobed cells); per-query top-5 via WindowGroupLimit. One job for the
    whole batch. The oracle replays centroids → per-query nprobe cells →
    assignment → window top-k."""
    import hashlib
    import os
    import shutil

    from shovel_spark.operators.similarity import (
        build_ivf_index,
        centroids_from_labels,
        ivf_topk_indexed_batch,
    )

    e = _t(spark, sf_dir, "embeddings")
    cents = centroids_from_labels(e)
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}:{os.path.abspath(sf_dir)}:batch".encode()
    ).hexdigest()[:12]
    idx_path = os.path.join("/tmp/shovel_spark_ivf", tag)
    try:
        build_ivf_index(e.filter(F.col("vec_id") >= 100), cents, idx_path)
        queries = e.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        top = ivf_topk_indexed_batch(
            spark, idx_path, cents, queries, k=5, nprobe=3
        ).select("query_id", "vec_id", F.round("sim", 4).alias("sim"))
        rows = top.collect()
        return local_rows_df(spark, rows, top.schema)
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)


@_register(
    "emb_hard_negatives",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e WHERE vec_id < 50),
    c AS (SELECT vec_id, label, v FROM e WHERE vec_id >= 100),
    ranked AS (
      SELECT q.query_id, c.vec_id, c.label AS neg_label,
             round(list_cosine_similarity(c.v, q.qv), 4) AS sim
      FROM c JOIN q ON c.label != q.qlabel
      QUALIFY row_number() OVER (
        PARTITION BY q.query_id
        ORDER BY list_cosine_similarity(c.v, q.qv) DESC, c.vec_id
      ) <= 3
    )
    SELECT query_id, vec_id, neg_label, sim FROM ranked
    """,
)
def emb_hard_negatives(spark, sf_dir):
    """HARD-NEGATIVE MINING for embedding training: for each query vector,
    the top-3 most-similar corpus vectors with a DIFFERENT label — the
    pairs contrastive training needs most (similar representation, wrong
    class). One job for all 50 queries: broadcast queries x corpus with a
    label-mismatch equi-pred, exact cosine, per-query rank-limit window
    (WindowGroupLimit). Exhaustive here (the exactness contract); the
    production form runs the SAME ranking over lsh/ivf_topk_indexed_batch
    candidates instead of the full corpus — identical downstream shape."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
    )
    c = e.filter(F.col("vec_id") >= 100).select("vec_id", "label", "embedding")
    from shovel_spark.operators.similarity import cosine

    joined = c.join(F.broadcast(q), F.col("label") != F.col("qlabel")).select(
        "query_id",
        "vec_id",
        F.col("label").alias("neg_label"),
        cosine(F.col("embedding"), F.col("qv")).alias("__s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__s"), F.asc("vec_id"))
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("query_id", "vec_id", "neg_label", F.round("__s", 4).alias("sim"))
    )


@_register(
    "multimodal_image_features",
    """
    WITH m AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents WHERE doc_id < 64
    ),
    bt AS (
      SELECT media_id,
             ('0x' || substr(hx, CAST(2 * p - 1 AS INT), 2))::INT AS byte
      FROM (
        SELECT media_id, hx, unnest(range(1, least(n, 4096) + 1)) AS p
        FROM m
      )
    ),
    ent AS (SELECT media_id, entropy(byte) AS e FROM bt GROUP BY 1)
    SELECT m.media_id,
           CASE WHEN n = 0 THEN 0
                ELSE 64 + (('0x' || substr(hx, 1, 2))::INT % 16) * 32
           END AS width,
           CASE WHEN n = 0 THEN 0
                ELSE 64 + (('0x' || substr(hx, CAST(2 * n - 1 AS INT), 2))::INT % 16) * 32
           END AS height,
           n::BIGINT AS n_bytes,
           round(ent.e, 4) AS entropy
    FROM m LEFT JOIN ent USING (media_id)
    """,
)
def multimodal_image_features(spark, sf_dir):
    """Multimodal plumbing: documents' text bytes as opaque media payloads →
    mapInPandas feature extraction (stub decode; real batch shape). The stub
    decoder and the byte-entropy are pure byte math, so DuckDB reproduces
    width/height/n_bytes/entropy from the same utf-8 bytes — the oracle
    checks the whole Arrow round-trip, not just row counts."""
    from shovel_spark.io.multimodal import extract_image_features

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    media = d.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("data")
    )
    return extract_image_features(media).select(
        "media_id", "width", "height", "n_bytes", F.round("byte_entropy", 4).alias("entropy")
    )


@_register(
    "multimodal_image_dims",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS fmt,
           CAST(16 + (doc_id % 50) * 8 AS INT) AS width,
           CAST(16 + ((doc_id * 7) % 40) * 8 AS INT) AS height
    FROM documents WHERE doc_id < 200
    """,
)
def multimodal_image_dims(spark, sf_dir):
    """REAL image-header decode round-trip (no codec libraries): synthetic
    but spec-correct PNG/JPEG/GIF container bytes are BUILT in one pandas
    UDF (io/multimodal.synth_image_media — dimensions a pure function of
    the id) and PARSED back by extract_image_features' pure-Python header
    scanners (decode_image_header: PNG IHDR, JPEG SOFn marker walk, GIF
    logical screen descriptor). The oracle recomputes the expected
    dimensions arithmetically, so a hash match proves the decoder read
    the actual bytes correctly for every row and format."""
    from shovel_spark.io.multimodal import extract_image_features, synth_image_media

    ids = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    media = synth_image_media(ids, id_col="doc_id")
    return extract_image_features(media).select("media_id", "fmt", "width", "height")


@_register(
    "multimodal_phash_dups",
    """
    WITH m AS (
      SELECT doc_id AS media_id, doc_id % 30 AS ck
      FROM documents WHERE doc_id < 150
    ),
    h AS (
      SELECT media_id, ck,
             ('0x' || substr(md5('img:' || ck), 1, 8))::BIGINT AS hi,
             ('0x' || substr(md5('img:' || ck), 9, 8))::BIGINT AS lo
      FROM m
    ),
    p AS (  -- signed int64 from two unsigned 32-bit halves (BIGINT-safe)
      SELECT media_id, ck,
             CASE WHEN hi >= 2147483648
                  THEN (hi - 4294967296) * 4294967296 + lo
                  ELSE hi * 4294967296 + lo END AS phash
      FROM h
    )
    SELECT media_id, phash,
           media_id = min(media_id) OVER (PARTITION BY ck) AS keep,
           count(*) OVER (PARTITION BY ck) AS group_n
    FROM p ORDER BY media_id
    """,
)
def multimodal_phash_dups(spark, sf_dir):
    """IMAGE near-dup via REAL pixel decode (io/png.py + io/multimodal.py):
    150 full PNGs — 30 distinct pixel contents x 5 encoding variants
    (scanline filter None/Sub/Up/Average/Paeth, varying zlib levels), so
    every dup group is byte-DISTINCT and only decoding (IDAT inflate +
    per-row unfilter) then average-hashing the pixels can group them.
    Grouping is a phash equi-join: keep = lowest id per hash, group_n =
    cluster size. The oracle recomputes each expected phash ARITHMETICALLY
    from md5 of the content key (the synth pattern makes the 8x8
    average-hash equal the md5 64-bit prefix — see
    synth_png_block_images), so a hash match proves the whole decode →
    unfilter → downsample → threshold chain bit-for-bit.

    Scale shape: decode is map-only Arrow batches (binary never enters a
    shuffle); the dup grouping shuffles 8-byte hashes, not pixels — and it
    is a WINDOW partitioned by phash over the decoded features, not a
    self-join, so the expensive mapInPandas decode stage executes exactly
    ONCE per image (a join of feats against an aggregate of feats would
    recompute the whole decode for each side). Undecodable payloads carry
    NULL phash and are kept unconditionally as singletons — never
    deduplicated against each other."""
    from shovel_spark.io.multimodal import extract_image_features, synth_png_block_images

    ids = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150).select("doc_id")
    media = synth_png_block_images(ids, id_col="doc_id", groups=30)
    feats = extract_image_features(media).select("media_id", "phash")
    w = Window.partitionBy("phash")
    return feats.select(
        "media_id",
        "phash",
        F.when(F.col("phash").isNull(), F.lit(True))
        .otherwise(F.col("media_id") == F.min("media_id").over(w))
        .alias("keep"),
        F.when(F.col("phash").isNull(), F.lit(1))
        .otherwise(F.count("*").over(w))
        .cast("long")
        .alias("group_n"),
    ).orderBy("media_id")


@_register(
    "multimodal_audio_meta",
    """
    SELECT doc_id AS media_id,
           'wav' AS fmt,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(8000 + (doc_id % 5) * 4000 AS INT) AS sample_rate,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS INT) AS bits,
           CAST(1000 + (doc_id % 7) * 500 AS BIGINT) AS n_frames,
           (1000 + (doc_id % 7) * 500) * 1000
             // (8000 + (doc_id % 5) * 4000) AS dur_ms
    FROM documents WHERE doc_id < 120
    """,
)
def multimodal_audio_meta(spark, sf_dir):
    """REAL audio-container decode round-trip (io/multimodal.py
    decode_wav_header): spec-correct PCM WAV bytes are BUILT in one pandas
    UDF (synth_wav_media — channels/rate/bits/frames pure functions of the
    id) and PARSED back by the RIFF chunk walk (fmt + data chunks,
    word-alignment padding). The oracle recomputes the expected metadata
    arithmetically, so a hash match proves the parser read the actual
    bytes — the audio sibling of multimodal_image_dims. Duration filters
    (dur_ms) run without decoding a single sample."""
    from shovel_spark.io.multimodal import extract_audio_features, synth_wav_media

    ids = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120).select("doc_id")
    media = synth_wav_media(ids, id_col="doc_id")
    return extract_audio_features(media).select(
        "media_id", "fmt", "channels", "sample_rate", "bits", "n_frames", "dur_ms"
    )


@_register(
    "multimodal_audio_rms",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             1 + doc_id % 2 AS ch,
             CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
             8000 + (doc_id % 5) * 4000 AS sr,
             1000 + (doc_id % 7) * 500 AS nf
      FROM documents WHERE doc_id < 96
    ),
    p AS (
      SELECT media_id, ch, bits,
             md5('wav:' || ch || ':' || sr || ':' || bits || ':' || nf) AS hex,
             nf * ch * (bits // 8) AS data_size
      FROM m
    ),
    b AS (  -- the 16 md5-seed bytes the payload tiles
      SELECT media_id, bits, data_size, k,
             ('0x' || substr(hex, CAST(2 * k + 1 AS INT), 2))::BIGINT AS byte
      FROM p, range(0, 16) t(k)
    ),
    s8 AS (  -- 8-bit PCM: unsigned bytes centered at 128, one per sample
      SELECT media_id, data_size AS n_samples, byte - 128 AS val,
             data_size // 16
               + CASE WHEN k < data_size % 16 THEN 1 ELSE 0 END AS cnt
      FROM b WHERE bits = 8
    ),
    s16 AS (  -- 16-bit LE signed: sample j from seed bytes (2j, 2j+1)
      SELECT lo.media_id, lo.data_size // 2 AS n_samples,
             CASE WHEN lo.byte + 256 * hi.byte >= 32768
                  THEN lo.byte + 256 * hi.byte - 65536
                  ELSE lo.byte + 256 * hi.byte END AS val,
             (lo.data_size // 2) // 8
               + CASE WHEN lo.k // 2 < (lo.data_size // 2) % 8
                      THEN 1 ELSE 0 END AS cnt
      FROM b lo JOIN b hi
        ON lo.media_id = hi.media_id AND hi.k = lo.k + 1
      WHERE lo.bits = 16 AND lo.k % 2 = 0
    ),
    u AS (SELECT * FROM s8 UNION ALL SELECT * FROM s16)
    SELECT media_id,
           CAST(min(n_samples) AS BIGINT) AS n_samples,
           CAST(sum(cnt * val * val) AS BIGINT) AS sum_sq,
           CAST(max(abs(val)) AS BIGINT) AS peak,
           round(sqrt(sum(cnt * val * val) * 1.0 / min(n_samples)), 4) AS rms
    FROM u GROUP BY media_id
    """,
)
def multimodal_audio_rms(spark, sf_dir):
    """REAL PCM sample decode (io/multimodal.decode_wav_samples): the synth
    WAVs' data chunks are actually decoded — 8-bit unsigned-centered and
    16-bit little-endian signed paths both exercised — into exact integer
    (n_samples, sum_sq, peak), from which RMS loudness derives. The synth
    payload tiles a 16-byte md5 seed, so the oracle reconstructs every
    sample arithmetically (byte k of the digest, repetition counts from
    data_size) WITHOUT parsing a container: a value match proves the chunk
    walk, the sample-width decode, and the statistics bit-for-bit. This is
    the loudness/silence/clipping gate of an audio curation pipeline.

    Scale shape: map-only Arrow batches (samples never leave the map
    stage; 24 bytes of stats per payload downstream)."""
    from shovel_spark.io.multimodal import extract_audio_pcm_stats, synth_wav_media

    ids = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 96).select("doc_id")
    media = synth_wav_media(ids, id_col="doc_id")
    s = extract_audio_pcm_stats(media)
    return s.select(
        "media_id", "n_samples", "sum_sq", "peak",
        F.round(F.sqrt(F.col("sum_sq") / F.col("n_samples")), 4).alias("rms"),
    )


_PD_BOILER = (
    "subscribe to our newsletter for daily updates and follow us on social "
    "media platforms for the latest breaking news coverage"
)  # exactly 20 words = exactly 2 paragraphs of 10


@_register(
    "docs_paragraph_dedup",
    rf"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 200
      UNION ALL
      SELECT doc_id + 100000, '{_PD_BOILER}' || ' ' || text
      FROM documents WHERE doc_id < 200 AND doc_id % 10 = 0
    ),
    w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM corpus),
    p AS (
      SELECT doc_id, i AS idx,
             array_to_string(
               list_slice(w, CAST(i * 10 + 1 AS INT), CAST(i * 10 + 10 AS INT)), ' '
             ) AS para
      FROM (SELECT doc_id, w, unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS i
            FROM w WHERE len(w) > 0)
    ),
    k AS (
      SELECT doc_id, idx, para,
             row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, idx) AS rn
      FROM p
    ),
    reb AS (
      SELECT doc_id, count(*) AS n_kept, string_agg(para, ' ' ORDER BY idx) AS t
      FROM k WHERE rn = 1 GROUP BY doc_id
    )
    SELECT w.doc_id, CAST(ceil(len(w.w) / 10.0) AS BIGINT) AS n_paras,
           coalesce(reb.n_kept, 0) AS n_kept,
           md5(coalesce(reb.t, '')) AS text_md5
    FROM w LEFT JOIN reb USING (doc_id)
    """,
)
def docs_paragraph_dedup(spark, sf_dir):
    """Paragraph-level dedup with reassembly (operators/dedup.py
    paragraph_dedup — the RefinedWeb line-dedup granularity): 200 docs
    plus 20 variants carrying a shared 20-word boilerplate prefix (2
    paragraphs) followed by a byte-identical copy of their original's
    body. The global first-occurrence policy keeps the boilerplate in
    exactly ONE document and strips the variants to (at most) nothing —
    every surviving doc's REBUILT TEXT is value-checked via md5, not just
    counted, so the reassembly order and byte content replay exactly."""
    from shovel_spark.operators.dedup import paragraph_dedup

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id", "text")
    variants = (
        d.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.concat_ws(" ", F.lit(_PD_BOILER), F.col("text")))
    )
    out = paragraph_dedup(d.unionByName(variants), para_words=10)
    return out.select(
        "doc_id", "n_paras", "n_kept", F.md5("text").alias("text_md5")
    )


@_register(
    "docs_gopher_rules",
    r"""
    WITH t AS (
      SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             len(w) AS n,
             greatest(len(w), 1) AS nz,
             length(regexp_replace(text, '\s+', '', 'g')) AS chars,
             len(regexp_extract_all(text, '(#|\.\.\.)')) AS n_sym,
             len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
             len(regexp_extract_all(text,
                 '(?i)\b(the|be|to|of|and|that|have|with)\b')) AS n_stop,
             1.0 - len(list_distinct(w)) / greatest(len(w), 1) AS dupfrac
      FROM t
    )
    SELECT doc_id,
           n >= 30 AND n <= 100000 AS wc_ok,
           chars / nz >= 3.0 AND chars / nz <= 10.0 AS mwl_ok,
           n_sym / nz <= 0.1 AS sym_ok,
           n_alpha / nz >= 0.80 AS alpha_ok,
           n_stop >= 2 AS stop_ok,
           dupfrac <= 0.5 AS rep_ok,
           (n >= 30 AND n <= 100000) AND (chars / nz >= 3.0 AND chars / nz <= 10.0)
             AND (n_sym / nz <= 0.1) AND (n_alpha / nz >= 0.80)
             AND (n_stop >= 2) AND (dupfrac <= 0.5) AS gopher_pass
    FROM s
    """,
)
def docs_gopher_rules(spark, sf_dir):
    """Per-rule Gopher quality flags (operators/quality.py gopher_flags,
    Rae et al. 2021 appendix A1.1): word-count band, mean-word-length
    band, symbol ratio, alphabetic-word fraction, stopword floor,
    repetition ceiling — each an independent boolean so the pipeline can
    report per-rule removal rates (the audit surface C4/Gopher papers
    publish), plus the AND gate. Map-only Column math over one
    tokenization; the oracle recomputes every rule from the same
    whitespace tokens. The two corpus-tunable knobs (word-count floor,
    repetition ceiling) are set for the synthetic tables' tiny
    vocabulary (30 words, dup<=0.5) so every varying rule actually
    gates documents here — with the web-text defaults the AND gate
    would be constant-false on this corpus (see gopher_flags)."""
    from shovel_spark.operators.quality import gopher_flags

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return gopher_flags(d, min_words=30, max_dup_frac=0.5).select(
        "doc_id", "wc_ok", "mwl_ok", "sym_ok", "alpha_ok", "stop_ok", "rep_ok",
        "gopher_pass",
    )


# ---------------------------------------------------------------------------
# Broadcast-mode routing, grouping sets, window frames, approximate aggs
# ---------------------------------------------------------------------------

@_register(
    "broadcast_sink_counts",
    """
    WITH nonerr AS (SELECT * FROM events WHERE event_type != 'error'),
    m AS (
      SELECT 'billing' AS sink, value FROM nonerr WHERE event_type = 'purchase'
      UNION ALL SELECT 'crm', value FROM nonerr WHERE event_type = 'signup'
      UNION ALL SELECT 'analytics', value FROM nonerr WHERE value >= 20
      UNION ALL SELECT 'bigval', value FROM nonerr WHERE value >= 150
      UNION ALL SELECT 'dead_letter', value FROM events WHERE event_type = 'error'
    )
    SELECT sink, count(*) AS n, round(sum(value), 2) AS total_value
    FROM m GROUP BY 1
    """,
)
def broadcast_sink_counts(spark, sf_dir):
    """Broadcast-mode dispatch (reference: src/outputs/pipeline.js mode=
    broadcast): one row reaches EVERY matching sink — when-array + explode,
    rejects trump everything."""
    ev = _t(spark, sf_dir, "events")
    err = F.col("event_type") == "error"
    matches = F.array_compact(
        F.array(
            F.when(F.col("event_type") == "purchase", F.lit("billing")),
            F.when(F.col("event_type") == "signup", F.lit("crm")),
            F.when(F.col("value") >= 20, F.lit("analytics")),
            F.when(F.col("value") >= 150, F.lit("bigval")),
        )
    )
    sinks = F.when(err, F.array(F.lit("dead_letter"))).otherwise(matches)
    return (
        ev.select(F.explode(sinks).alias("sink"), F.col("value"))
        .groupBy("sink")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@_register(
    "cube_priority_status",
    """
    SELECT o_orderpriority, o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def cube_priority_status(spark, sf_dir):
    """Full cube grouping sets (all subtotal combinations)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )


@_register(
    "moving_avg_peak",
    """
    WITH m AS (
      SELECT user_id,
             avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma
      FROM events
    )
    SELECT user_id, round(max(ma), 3) AS peak_3evt_avg FROM m GROUP BY 1
    """,
)
def moving_avg_peak(spark, sf_dir):
    """Analytic window frame (ROWS BETWEEN): peak 3-event moving average."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return (
        ev.withColumn("ma", F.avg("value").over(w))
        .groupBy("user_id")
        .agg(F.round(F.max("ma"), 3).alias("peak_3evt_avg"))
    )


@_register(
    "value_deciles",
    """
    WITH d AS (
      SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS decile
      FROM events
    )
    SELECT CAST(decile AS INT) AS decile, count(*) AS n, round(avg(value), 3) AS avg_value
    FROM d GROUP BY 1
    """,
)
def value_deciles(spark, sf_dir):
    """Exact global deciles WITHOUT a single-partition window
    (operators/windows.distributed_ntile): range-repartition on the sort
    keys, per-partition row_number, per-partition counts → cumulative
    offsets (driver state = #partitions rows), map-side ntile arithmetic.
    Identical ntile(10) semantics to the oracle's global window — the
    plan just survives 10^12 rows (see test_windows.py's plan assertion:
    every WindowExec is partitioned)."""
    from shovel_spark.operators.windows import distributed_ntile

    ev = _t(spark, sf_dir, "events")
    tiled = distributed_ntile(
        ev.select("value", "event_id"), 10, ["value", "event_id"], tile_col="decile"
    )
    return tiled.groupBy("decile").agg(
        F.count("*").alias("n"), F.round(F.avg("value"), 3).alias("avg_value")
    )


@_register(
    "events_value_quantiles",
    """
    SELECT event_type, count(*) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users,
           round(quantile_cont(value, 0.495), 1) AS p50_lo,
           round(quantile_cont(value, 0.505), 1) AS p50_hi,
           TRUE AS p50_in_bounds,
           round(quantile_cont(value, 0.985), 1) AS p99_lo,
           round(quantile_cont(value, 0.995), 1) AS p99_hi,
           TRUE AS p99_in_bounds,
           TRUE AS users_in_bounds
    FROM events GROUP BY 1
    """,
)
def events_value_quantiles(spark, sf_dir):
    """Approximate aggregates (SURVEY.md §2.8 'absent in reference'):
    approx quantiles + HLL distinct — the 10^12-row substitutes for global
    sorts and exact distincts.

    Sketch internals are engine-specific, so the oracle is an INVARIANT
    check rather than value equality: the rank-error window [q-eps, q+eps]
    is computed EXACTLY by both engines (value-hashed: p50_lo/hi, p99_lo/hi
    via continuous-interpolation percentile — identical definition in Spark
    and DuckDB), and Spark asserts its approx results land inside it
    (booleans; the oracle's TRUE literals fail the hash if they don't).
    eps=0.005 is 50x percentile_approx's guaranteed rank error at
    accuracy=10000; the HLL bound is 5 sigma at rsd=0.02."""
    ev = _t(spark, sf_dir, "events")
    # array-form percentile/percentile_approx: ONE value buffer / ONE sketch
    # per group serves all four bounds (four scalar percentile aggs would
    # each buffer the whole group)
    bounds = F.array(F.lit(0.495), F.lit(0.505), F.lit(0.985), F.lit(0.995))
    qs = F.array(F.lit(0.5), F.lit(0.99))
    # exact count_distinct must NOT share the agg with the sketch functions:
    # Spark rewrites a mixed distinct/non-distinct agg to pre-group by
    # (event_type, user_id), building a percentile buffer + HLL sketch PER
    # USER and merging thousands of them (measured 17x slower). Two cheap
    # aggs + a 5-row broadcast join instead.
    sketches = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.percentile("value", bounds).alias("_ex"),
        F.percentile_approx("value", qs, 10000).alias("_ap"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_au"),
    )
    users = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        # count(user_id), not count(*): the oracle's count(DISTINCT user_id)
        # and the HLL sketch both EXCLUDE a NULL user_id
        .agg(F.count("user_id").alias("users"))
    )
    a = sketches.join(F.broadcast(users), "event_type")
    return a.select(
        "event_type",
        "n",
        "users",
        F.round(F.col("_ex")[0], 1).alias("p50_lo"),
        F.round(F.col("_ex")[1], 1).alias("p50_hi"),
        F.col("_ap")[0].between(F.col("_ex")[0], F.col("_ex")[1]).alias("p50_in_bounds"),
        F.round(F.col("_ex")[2], 1).alias("p99_lo"),
        F.round(F.col("_ex")[3], 1).alias("p99_hi"),
        F.col("_ap")[1].between(F.col("_ex")[2], F.col("_ex")[3]).alias("p99_in_bounds"),
        (F.abs(F.col("_au") - F.col("users")) <= 0.1 * F.col("users")).alias("users_in_bounds"),
    )


@_register(
    "range_join_error_purchases",
    """
    SELECT e.user_id, count(*) AS n_pairs,
           round(sum(p.value), 2) AS paired_value
    FROM events e JOIN events p
      ON e.user_id = p.user_id
     AND e.event_type = 'error' AND p.event_type = 'purchase'
     AND p.ts BETWEEN e.ts - INTERVAL 1 HOUR AND e.ts + INTERVAL 1 HOUR
    GROUP BY 1
    """,
)
def range_join_error_purchases(spark, sf_dir):
    """Range (interval) join: purchases within ±1 h of each error, per user.

    Equi-join on user_id carries the shuffle; the range predicate filters
    inside the join — at 10^12 rows you'd bucket by (user, time-bucket) to
    keep the range join bounded; here AQE suffices.
    """
    ev = _t(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id"), F.unix_micros(F.col("ts").cast("timestamp")).alias("e_us")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us"),
        F.col("value"),
    )
    hour_us = 3600 * 1_000_000
    return (
        e.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_us") >= F.col("e_us") - hour_us)
            & (F.col("p_us") <= F.col("e_us") + hour_us),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"), F.round(F.sum("value"), 2).alias("paired_value"))
    )


@_register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → two-fact join → top-k.
    Catalyst pushes the segment/date filters into all three scans."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(rev, 2).alias("revenue"), rev.alias("__r"))
        .orderBy(F.desc("__r"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey", "revenue", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate")
        )
    )


@_register(
    "q5_local_supplier_volume",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY 1
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join (2 facts, 4 dims) with a same-nation
    theta condition; dims broadcast, facts shuffle once on orderkey."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, (F.col("l_suppkey") == s.s_suppkey) & (F.col("c_nationkey") == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@_register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-07-01'
    GROUP BY 1, 2, 3
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): date-windowed fact join,
    returnflag filter pushed to the lineitem scan, nation broadcast,
    top-20 customers by lost revenue."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(rev, 2).alias("revenue"), rev.alias("__r"))
        .orderBy(F.desc("__r"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


@_register(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'ECONOMY'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-06-01'
      AND l_shipdate < TIMESTAMP '1995-09-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): one date-windowed fact scan,
    part dim broadcast, conditional-sum ratio in a single aggregate —
    no second pass over the window."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-09-01").cast("timestamp"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part"))
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "ECONOMY", net).otherwise(0.0)
    return li.join(p, F.col("l_partkey") == p.p_partkey).agg(
        F.round(100.0 * F.sum(promo) / F.sum(net), 4).alias("promo_pct"),
        F.round(F.sum(net), 2).alias("total_revenue"),
    )


@_register(
    "q4_late_ship_priority",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY 1
    """,
)
def q4_late_ship_priority(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): EXISTS over the fact
    table — a left-semi join on orderkey with the correlated date predicate
    in the join condition (adapted to this schema's columns: 'late' =
    shipped over 60 days after the order date)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            # INTERVAL, not date_add: date_add truncates the timestamp to a
            # date, silently diverging from the oracle's `+ INTERVAL 60 DAY`
            # the moment order dates carry a time-of-day component
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@_register(
    "salted_join_user_value",
    """
    SELECT t.tier, count(*) AS n, round(sum(e.value), 2) AS total_value
    FROM events e
    JOIN (SELECT DISTINCT user_id, user_id % 3 AS tier FROM events) t
      ON e.user_id = t.user_id
    GROUP BY 1
    """,
)
def salted_join_user_value(spark, sf_dir):
    """operators/joins.salted_join: skew-defused equi-join (shuffle on
    (key, salt)); results identical to the plain join the oracle runs."""
    from shovel_spark.operators.joins import salted_join

    ev = _t(spark, sf_dir, "events")
    tiers = ev.select("user_id").distinct().withColumn(
        "tier", F.pmod(F.col("user_id"), F.lit(3))
    )
    return salted_join(ev, tiers, "user_id", salt=8).groupBy("tier").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )


@_register(
    "value_median_udaf",
    """
    SELECT event_type, round(median(value), 3) AS med
    FROM events GROUP BY 1
    """,
)
def value_median_udaf(spark, sf_dir):
    """Pandas UDAF (GROUPED_AGG): exact median per group via Arrow batches —
    the UDAF surface (SURVEY.md §2.8)."""
    from shovel_spark.functions.udafs import median_udaf

    ev = _t(spark, sf_dir, "events")
    # note: a GROUPED_AGG pandas UDF cannot mix with non-pandas aggregates
    # in one agg() — keep the aggregation pandas-only
    return ev.groupBy("event_type").agg(F.round(median_udaf("value"), 3).alias("med"))


@_register(
    "user_zscore_extremes",
    """
    WITH z AS (
      SELECT user_id, event_id,
             (value - avg(value) OVER (PARTITION BY user_id))
             / stddev_samp(value) OVER (PARTITION BY user_id) AS z
      FROM events
    )
    SELECT user_id, round(max(z), 4) AS max_z, round(min(z), 4) AS min_z
    FROM z GROUP BY 1
    """,
)
def user_zscore_extremes(spark, sf_dir):
    """Grouped-map applyInPandas: per-user z-score normalization in one
    Arrow batch per key (the arbitrary-pandas-logic escape hatch); the
    oracle reproduces it with window functions."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        pdf = pdf.assign(z=(v - v.mean()) / v.std(ddof=1))
        return pdf[["user_id", "z"]]

    z = ev.groupBy("user_id").applyInPandas(zscore, "user_id long, z double")
    return z.groupBy("user_id").agg(
        F.round(F.max("z"), 4).alias("max_z"), F.round(F.min("z"), 4).alias("min_z")
    )


@_register(
    "user_zscore_extremes_native",
    """
    WITH z AS (
      SELECT user_id, event_id,
             (value - avg(value) OVER (PARTITION BY user_id))
             / stddev_samp(value) OVER (PARTITION BY user_id) AS z
      FROM events
    )
    SELECT user_id, round(max(z), 4) AS max_z, round(min(z), 4) AS min_z
    FROM z GROUP BY 1
    """,
)
def user_zscore_extremes_native(spark, sf_dir):
    """The native twin of user_zscore_extremes: the same per-user z-score
    via two window aggregates (avg/stddev over user) — whole-stage codegen,
    no Python stage. This is the HOT-PATH form; the applyInPandas one above
    stays as the arbitrary-pandas-logic surface demo. Same oracle."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    w = Window.partitionBy("user_id")
    z = ev.select(
        "user_id",
        ((F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)).alias("z"),
    )
    return z.groupBy("user_id").agg(
        F.round(F.max("z"), 4).alias("max_z"), F.round(F.min("z"), 4).alias("min_z")
    )


@_register(
    "pivot_event_values",
    """
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 2) AS click,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase,
           round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 2) AS view
    FROM events GROUP BY 1
    """,
)
def pivot_event_values(spark, sf_dir):
    """Pivot (crosstab): per-user value totals by event type. Pivot values
    are declared (no extra distinct-scan job) — required at scale."""
    ev = _t(spark, sf_dir, "events")
    p = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .sum("value")
    )
    return p.select(
        "user_id",
        F.round(F.coalesce("click", F.lit(0.0)), 2).alias("click"),
        F.round(F.coalesce("purchase", F.lit(0.0)), 2).alias("purchase"),
        F.round(F.coalesce("view", F.lit(0.0)), 2).alias("view"),
    )


@_register(
    "orders_above_avg",
    """
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY 1
    """,
)
def orders_above_avg(spark, sf_dir):
    """Scalar subquery through the engine's SQL surface (spark.sql) — the
    subquery plans as a broadcast scalar, one extra scan, no per-row work."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders_v
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_v)
        GROUP BY o_orderpriority
        """
    )


@_register(
    "grok_log_roundtrip",
    """
    SELECT event_type AS etype, count(*) AS n, CAST(sum(user_id) AS BIGINT) AS user_sum,
           max(event_id) AS max_eid
    FROM events
    """
    + "GROUP BY 1",
)
def grok_log_roundtrip(spark, sf_dir):
    """Grok compiler (functions/grok.py): render events as log lines, grok
    the typed fields back out, aggregate — the oracle computes the same
    aggregates from the raw columns, so any extraction drift mismatches."""
    from shovel_spark.functions.grok import compile_grok

    ev = _t(spark, sf_dir, "events")
    line = F.concat_ws(
        " ",
        F.col("user_id").cast("string"),
        F.col("event_type"),
        F.col("event_id").cast("string"),
    )
    g = compile_grok("%{INT:user:long} %{WORD:etype} %{INT:eid:long}", line)
    parsed = ev.select(g.alias("g")).select("g.*")
    return (
        parsed.filter(F.col("ok"))
        .groupBy(F.col("etype"))
        .agg(
            F.count("*").alias("n"),
            F.sum("user").alias("user_sum"),
            F.max("eid").alias("max_eid"),
        )
    )


@_register(
    "xml_roundtrip",
    """
    SELECT event_type AS etype, count(*) AS n,
           CAST(sum(user_id) AS BIGINT) AS user_sum, max(event_id) AS max_eid
    FROM events GROUP BY 1
    """,
)
def xml_roundtrip(spark, sf_dir):
    """XML codec pair (codecs.decode_xml / encode_xml — Spark 4
    from_xml/to_xml, JVM-side, no Python): render each event as an XML
    document, parse the typed fields back out, aggregate; the oracle
    computes the same aggregates from the raw columns, so any
    encode/decode drift mismatches. Completes the §2.2 decoder family
    (json/json5/csv/msgpack/protobuf/xml)."""
    from shovel_spark.functions.codecs import decode_xml, encode_xml

    ev = _t(spark, sf_dir, "events")
    xml = encode_xml(
        F.struct(
            F.col("event_type").alias("t"),
            F.col("user_id").alias("u"),
            F.col("event_id").alias("e"),
        )
    )
    parsed = ev.select(xml.alias("x")).select(
        decode_xml(F.col("x"), "t STRING, u BIGINT, e BIGINT").alias("s")
    )
    return parsed.select("s.*").groupBy(F.col("t").alias("etype")).agg(
        F.count("*").alias("n"),
        F.sum("u").alias("user_sum"),
        F.max("e").alias("max_eid"),
    )


@_register(
    "proto_roundtrip",
    """
    SELECT event_type AS etype, count(*) AS n,
           CAST(sum(user_id) AS BIGINT) AS user_sum, max(event_id) AS max_eid
    FROM events GROUP BY 1
    """,
)
def proto_roundtrip(spark, sf_dir):
    """Protobuf codec contract (reference: src/decoders/protobuf.js +
    src/encoders/protobuf.js over a .proto schema): events encoded to wire
    bytes and decoded back, then aggregated — the oracle computes the same
    aggregates from the raw columns, so any wire-format drift mismatches."""
    from shovel_spark.functions.codecs import encode_protobuf, make_proto_decoder
    from shovel_spark.functions.wire import parse_proto

    spec = parse_proto(
        "message Event { required int64 user = 1; required string etype = 2;"
        " required int64 eid = 3; }"
    )["Event"]
    ev = _t(spark, sf_dir, "events")
    payload = F.struct(
        F.col("user_id").alias("user"),
        F.col("event_type").alias("etype"),
        F.col("event_id").alias("eid"),
    )
    dec = make_proto_decoder(spec, "user long, etype string, eid long")
    decoded = (
        ev.select(encode_protobuf(payload, spec).alias("bin"))
        .select(dec(F.col("bin")).alias("r"))
        .select("r.*")
    )
    return decoded.groupBy("etype").agg(
        F.count("*").alias("n"),
        F.sum("user").alias("user_sum"),
        F.max("eid").alias("max_eid"),
    )


@_register(
    "proto_delimited_roundtrip",
    """
    SELECT count(*) AS n, CAST(sum(event_id) AS BIGINT) AS eid_sum,
           count(DISTINCT user_id) AS n_users
    FROM events
    """,
)
def proto_delimited_roundtrip(spark, sf_dir):
    """Delimited protobuf framing (reference: src/decoders/protobuf.js:111-141
    1→N stream mode; encoder Buffer.concat src/encoders/protobuf.js:57-62):
    all of a user's events packed into ONE varint-framed payload, decoded
    back out with the 1→N fan-out, re-aggregated."""
    from shovel_spark.functions.codecs import encode_protobuf, make_proto_decoder
    from shovel_spark.functions.wire import ProtoSpec

    spec = ProtoSpec([(1, "user", "int64"), (2, "eid", "int64")])
    ev = _t(spark, sf_dir, "events")
    packed = ev.groupBy("user_id").agg(
        F.collect_list(
            F.struct(F.col("user_id").alias("user"), F.col("event_id").alias("eid"))
        ).alias("recs")
    )
    dec = make_proto_decoder(spec, "user long, eid long", delimited=True)
    unpacked = (
        packed.select(encode_protobuf(F.col("recs"), spec, delimited=True).alias("bin"))
        .select(F.explode(dec(F.col("bin"))).alias("r"))
        .select("r.*")
    )
    return unpacked.agg(
        F.count("*").alias("n"),
        F.sum("eid").alias("eid_sum"),
        F.countDistinct("user").alias("n_users"),
    )


@_register(
    "msgpack_roundtrip",
    """
    SELECT event_type AS etype, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
    """,
)
def msgpack_roundtrip(spark, sf_dir):
    """msgpack codec contract (reference: src/decoders/msgpack.js +
    src/encoders/msgpack.js): struct → spec bytes → struct, aggregates must
    survive the round-trip bit-for-bit."""
    from shovel_spark.functions.codecs import encode_msgpack, make_msgpack_decoder

    ev = _t(spark, sf_dir, "events")
    payload = F.struct(F.col("event_type").alias("etype"), F.col("value"))
    dec = make_msgpack_decoder("etype string, value double")
    decoded = (
        ev.select(encode_msgpack(payload).alias("bin"))
        .select(dec(F.col("bin")).alias("r"))
        .select("r.*")
    )
    return decoded.groupBy("etype").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )


@_register(
    "emb_kmeans_cells",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS centroid
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)
    ),
    a1 AS (
      SELECT vec_id, arg_max(cell, list_cosine_similarity(v, centroid)) AS cell
      FROM e, c0 GROUP BY vec_id
    ),
    m1 AS (
      SELECT cell, pos, round(avg(val), 6) AS m FROM (
        SELECT a1.cell, generate_subscripts(v, 1) AS pos, unnest(v) AS val
        FROM e JOIN a1 USING (vec_id)
      ) GROUP BY 1, 2
    ),
    c1 AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM m1 GROUP BY 1),
    a2 AS (
      SELECT vec_id, arg_max(cell, list_cosine_similarity(v, centroid)) AS cell
      FROM e, c1 GROUP BY vec_id
    ),
    m2 AS (
      SELECT cell, pos, round(avg(val), 6) AS m FROM (
        SELECT a2.cell, generate_subscripts(v, 1) AS pos, unnest(v) AS val
        FROM e JOIN a2 USING (vec_id)
      ) GROUP BY 1, 2
    ),
    c2 AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM m2 GROUP BY 1),
    a3 AS (
      SELECT vec_id, arg_max(cell, list_cosine_similarity(v, centroid)) AS cell
      FROM e, c2 GROUP BY vec_id
    )
    SELECT c2.cell, count(*) AS n_members,
           round(sqrt(list_dot_product(centroid, centroid)), 4) AS centroid_norm
    FROM c2 JOIN a3 ON c2.cell = a3.cell
    GROUP BY c2.cell, centroid
    ORDER BY c2.cell
    """,
)
def emb_kmeans_cells(spark, sf_dir):
    """Iterative spherical k-means (Lloyd's, 2 iterations, k=4,
    deterministic lowest-id init): the oracle replays both iterations as
    chained CTEs — centroid rounding between iterations keeps the two
    engines' trajectories bit-identical, so cluster membership counts and
    centroid norms must match exactly."""
    from shovel_spark.operators.similarity import (
        dot,
        ivf_assign,
        kmeans_centroids,
    )

    e = _t(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(e, k=4, iters=2)
    assigned = ivf_assign(e, cents, "embedding", "vec_id").select("vec_id", "cell")
    counts = assigned.groupBy("cell").agg(F.count("*").alias("n_members"))
    norm = F.round(F.sqrt(dot(F.col("centroid"), F.col("centroid"))), 4)
    return (
        cents.join(counts, "cell")
        .select("cell", "n_members", norm.alias("centroid_norm"))
        .orderBy("cell")
    )


@_register(
    "emb_semantic_dedup",
    """
    WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    e AS (
      SELECT vec_id, v FROM e0
      UNION ALL
      SELECT vec_id + 100000, list_transform(v, x -> x * 1.5)
      FROM e0 WHERE vec_id < 20
    ),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS centroid
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)
    ),
    a1 AS (
      SELECT vec_id, arg_max(cell, list_cosine_similarity(v, centroid)) AS cell
      FROM e, c0 GROUP BY vec_id
    ),
    m1 AS (
      SELECT cell, pos, round(avg(val), 6) AS m FROM (
        SELECT a1.cell, generate_subscripts(v, 1) AS pos, unnest(v) AS val
        FROM e JOIN a1 USING (vec_id)
      ) GROUP BY 1, 2
    ),
    c1 AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM m1 GROUP BY 1),
    a2 AS (
      SELECT vec_id, arg_max(cell, list_cosine_similarity(v, centroid)) AS cell
      FROM e, c1 GROUP BY vec_id
    ),
    m2 AS (
      SELECT cell, pos, round(avg(val), 6) AS m FROM (
        SELECT a2.cell, generate_subscripts(v, 1) AS pos, unnest(v) AS val
        FROM e JOIN a2 USING (vec_id)
      ) GROUP BY 1, 2
    ),
    c2 AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM m2 GROUP BY 1),
    a3 AS (
      SELECT vec_id, arg_max(cell, list_cosine_similarity(v, centroid)) AS cell
      FROM e, c2 GROUP BY vec_id
    ),
    av AS (SELECT e.vec_id, a3.cell, e.v FROM e JOIN a3 USING (vec_id)),
    prs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE list_cosine_similarity(x.v, y.v) >= 0.999
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM prs
      UNION SELECT id_b, id_a FROM prs
    ),
    l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
    l1 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l0 l LEFT JOIN edges g ON g.src = l.id LEFT JOIN l0 ln ON ln.id = g.dst
      GROUP BY l.id, l.label
    ),
    l2 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l1 l LEFT JOIN edges g ON g.src = l.id LEFT JOIN l1 ln ON ln.id = g.dst
      GROUP BY l.id, l.label
    ),
    l3 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l2 l LEFT JOIN edges g ON g.src = l.id LEFT JOIN l2 ln ON ln.id = g.dst
      GROUP BY l.id, l.label
    ),
    lab AS (
      SELECT av.vec_id, av.cell, coalesce(l3.label, av.vec_id) AS component,
             round(list_cosine_similarity(av.v, c2.centroid), 6) AS cs
      FROM av JOIN c2 USING (cell) LEFT JOIN l3 ON l3.id = av.vec_id
    ),
    mn AS (SELECT component, min(cs) AS mcs FROM lab GROUP BY 1),
    kp AS (
      SELECT lab.component, min(lab.vec_id) AS kid
      FROM lab JOIN mn ON lab.component = mn.component AND lab.cs = mn.mcs
      GROUP BY 1
    )
    SELECT lab.vec_id, lab.cell, lab.component,
           (lab.vec_id = kp.kid) AS keep
    FROM lab JOIN kp USING (component)
    ORDER BY lab.vec_id
    """,
)
def emb_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (similarity.semantic_dedup, public
    SemDeDup paper): embeddings plus scale-perturbed copies (cosine with
    the original is exactly 1, scale-invariant — planted semantic dups)
    are k-means-clustered (k=4, 2 iterations, the emb_kmeans_cells
    trajectory), paired only WITHIN a cell at cosine >= 0.999, grouped by
    3 rounds of min-label propagation, and each component keeps its
    farthest-from-centroid member (min rounded centroid_sim, ties -> min
    id). The oracle replays the entire chain — clustering, in-cell
    pairing, label propagation, keep election — so a hash match certifies
    every discrete decision on every row."""
    from shovel_spark.operators.similarity import semantic_dedup

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    corpus = e.unionByName(
        e.filter(F.col("vec_id") < 20).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
        )
    )
    return semantic_dedup(
        corpus, k=4, iters=2, threshold=0.999, cc_iters=3
    ).select("vec_id", "cell", "component", "keep").orderBy("vec_id")


@_register(
    "docs_dup_clusters",
    f"""
    WITH {_ND_MINHASH_CTES},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
    l1 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l0 l
      LEFT JOIN edges e ON e.src = l.id
      LEFT JOIN l0 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    ),
    l2 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l1 l
      LEFT JOIN edges e ON e.src = l.id
      LEFT JOIN l1 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    ),
    l3 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l2 l
      LEFT JOIN edges e ON e.src = l.id
      LEFT JOIN l2 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    )
    SELECT label AS canonical, count(*) AS cluster_size
    FROM l3 GROUP BY 1 ORDER BY 1
    """,
)
def docs_dup_clusters(spark, sf_dir):
    """Dup-cluster resolution: MinHash near-dup pairs → connected components
    (min-label propagation, 3 fixed rounds) → one canonical id + size per
    cluster — the keep-one-per-cluster step of a dedup pipeline. The oracle
    replays the same three propagation rounds as chained CTEs."""
    from shovel_spark.operators.dedup import dup_clusters, minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        _near_dup_corpus(spark, sf_dir), threshold=0.5, num_hashes=16, bands=8,
        family="md5",
    )
    return dup_clusters(pairs, iters=3).orderBy("canonical")


@_register(
    "docs_subword_tokens",
    r"""
    WITH t AS (
      SELECT lang,
             len(list_filter(regexp_split_to_array(trim(text), '[\s\x0B!-/:-@\[-`{-~]+'),
                             x -> x != ''))
             + length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) AS subtok
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(subtok) AS BIGINT) AS total_subtokens,
           round(avg(subtok), 2) AS avg_subtokens
    FROM t GROUP BY 1
    """,
)
def docs_subword_tokens(spark, sf_dir):
    """BPE-ish token counting (textstats.word_token_count: words and
    punctuation marks counted as separate tokens — a deterministic stand-in
    for a real subword tokenizer's count). Oracle recomputes the same count
    with explicit ASCII punctuation classes (Java \\p{Punct} == !-~ ASCII
    ranges, spelled out so RE2 and Java agree)."""
    from shovel_spark.functions.textstats import word_token_count

    d = _t(spark, sf_dir, "documents")
    return d.withColumn("subtok", word_token_count(F.col("text"))).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("subtok").alias("total_subtokens"),
        F.round(F.avg("subtok"), 2).alias("avg_subtokens"),
    )


@_register(
    "events_zorder_stats",
    """
    WITH z AS (
      SELECT CAST(list_sum(list_transform(range(0, 16),
               i -> (((user_id % 65536) >> i) & 1) * (1::BIGINT << CAST(2*i AS INT))
                  + (((CAST(floor(value) AS BIGINT) % 65536) >> i) & 1)
                    * (1::BIGINT << CAST(2*i + 1 AS INT)))) AS BIGINT) AS zkey,
             user_id, value
      FROM events
    )
    SELECT zkey >> 14 AS zbucket, count(*) AS n,
           min(user_id) AS min_user, max(user_id) AS max_user,
           round(sum(value), 2) AS total_value
    FROM z GROUP BY 1 ORDER BY 1
    """,
)
def events_zorder_stats(spark, sf_dir):
    """Z-order (Morton) clustering key over (user_id, value): coarse zkey
    buckets carry narrow per-bucket user ranges — the property that makes
    min/max stats prune scans on either dimension. The oracle recomputes
    the interleave with the same shift arithmetic."""
    from shovel_spark.operators.layout import zorder_key

    ev = _t(spark, sf_dir, "events")
    z = ev.withColumn(
        "zkey",
        zorder_key(F.pmod(F.col("user_id"), F.lit(65536)), F.pmod(F.floor("value").cast("long"), F.lit(65536))),
    )
    return (
        z.groupBy(F.shiftright("zkey", 14).alias("zbucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("zbucket")
    )


# ---------------------------------------------------------------------------
# End-to-end training-data cleaning pipeline (flagship composite)
# ---------------------------------------------------------------------------

@_register(
    "docs_clean_corpus",
    f"""
    WITH raw AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + 200000, lang, text FROM documents WHERE doc_id < 60
      UNION ALL
      SELECT doc_id + 100000, lang,
             array_to_string(regexp_split_to_array(trim(text), '\\s+')[2:], ' ')
      FROM documents WHERE doc_id < 40
      UNION ALL
      SELECT doc_id + 300000, lang, repeat('!?#$%& ', 50)
      FROM documents WHERE doc_id < 30
    ),
    scored AS MATERIALIZED (
      SELECT doc_id, lang, text,
        round((
          (CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END) +
          (CASE WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                     / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) +
          (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / greatest(length(text), 1)) +
          (CASE WHEN length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0
                     / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.0 END)
        ) / 4.0, 6) AS q
      FROM raw
    ),
    flt AS MATERIALIZED (SELECT * FROM scored WHERE q >= 0.5),
    keep AS (
      SELECT min(doc_id) AS doc_id
      FROM flt GROUP BY md5(regexp_replace(trim(text), '\\s+', ' ', 'g'))
    ),
    corpus AS MATERIALIZED (
      SELECT doc_id, text FROM flt WHERE doc_id IN (SELECT doc_id FROM keep)
    ),
    {_nd_chain_ctes(50)},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
    l1 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l0 l
      LEFT JOIN edges e ON e.src = l.id
      LEFT JOIN l0 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    ),
    l2 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l1 l
      LEFT JOIN edges e ON e.src = l.id
      LEFT JOIN l1 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    ),
    l3 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l2 l
      LEFT JOIN edges e ON e.src = l.id
      LEFT JOIN l2 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    ),
    kept AS (
      SELECT f.doc_id, f.lang, f.q,
             len(regexp_split_to_array(trim(f.text), '\\s+')) AS tokens
      FROM flt f
      WHERE f.doc_id IN (SELECT doc_id FROM keep)
        AND f.doc_id NOT IN (SELECT id FROM l3 WHERE id != label)
    )
    SELECT lang, count(*) AS n_kept,
           CAST(sum(tokens) AS BIGINT) AS total_tokens,
           round(avg(q), 4) AS avg_quality
    FROM kept GROUP BY 1
    """,
)
def docs_clean_corpus(spark, sf_dir):
    """FLAGSHIP composite: the end-to-end training-data cleaning pipeline —
    quality filter → exact dedup → MinHash near-dup clustering → keep one
    canonical per cluster → per-lang corpus stats. Each stage is the real
    operator (textstats.quality_score, dedup.exact_dedup,
    dedup.minhash_dedup_pairs, dedup.connected_components) chained the way
    a 100 TB cleaning job would chain them; the input is documents plus
    deterministic exact dups (+200000), near-dups with the first word
    dropped (+100000), and pure-punctuation junk (+300000) so every stage
    provably removes something. The oracle replays all four stages in
    DuckDB, including the full MinHash chain and three label-propagation
    rounds.

    Scale notes: the only shuffles are the md5-fingerprint groupBy (16-byte
    keys), the (band, signature) bucket join, and per-round label joins —
    text bodies never shuffle after scoring; candidate pairs come from
    bucket collisions, never n^2."""
    from shovel_spark.functions.textstats import quality_score
    from shovel_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        minhash_dedup_pairs,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    exact_copies = d.filter(F.col("doc_id") < 60).withColumn(
        "doc_id", F.col("doc_id") + 200000
    )
    near_copies = (
        d.filter(F.col("doc_id") < 40)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", _drop_first_word("text"))
    )
    junk = d.filter(F.col("doc_id") < 30).withColumn(
        "doc_id", F.col("doc_id") + 300000
    ).withColumn("text", F.repeat(F.lit("!?#$%& "), 50))
    raw = d.unionByName(exact_copies).unionByName(near_copies).unionByName(junk)

    # quality_score already rounds to 6 dp (oracle parity)
    flt = raw.withColumn("q", quality_score(F.col("text"))).filter(F.col("q") >= 0.5)
    # survivors feed three consumers (pair generation, the cluster-drop
    # anti-join, the final agg): checkpoint once so score+dedup don't
    # re-execute per consumer
    surv = exact_dedup(flt).localCheckpoint(eager=False)
    # max_doc_freq=50: the boilerplate skew cap (dedup.shingle_table) wired
    # the way a production run would set it — a no-op on this corpus (max
    # organic shingle doc-freq ~14) but replayed by the oracle either way
    pairs = minhash_dedup_pairs(
        surv.select("doc_id", "text"), threshold=0.5, num_hashes=16, bands=8,
        max_doc_freq=50, family="md5",
    )
    cc = connected_components(pairs, iters=3)
    dropped = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    kept = surv.join(dropped, "doc_id", "left_anti")
    tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return kept.withColumn("tokens", tokens).groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.sum("tokens").alias("total_tokens"),
        F.round(F.avg("q"), 4).alias("avg_quality"),
    )


@_register(
    "docs_benchmark_contamination",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 20
      UNION ALL
      SELECT doc_id + 400000,
             text || ' ' || (SELECT text FROM documents WHERE doc_id = 3)
      FROM documents WHERE doc_id >= 20 AND doc_id < 25
    ),
    bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
    c_sh AS ({_ND_SHINGLE_SQL}),
    b_sh AS (
      SELECT DISTINCT shingle FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, greatest(len(w) - 2, 1) + 1),
                 i -> array_to_string(list_slice(w, i, i + 2), ' ')))) AS shingle
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM bench)
      )
    )
    SELECT c_sh.doc_id, CAST(count(DISTINCT c_sh.shingle) AS BIGINT) AS overlap
    FROM c_sh JOIN b_sh ON c_sh.shingle = b_sh.shingle
    GROUP BY 1 HAVING count(DISTINCT c_sh.shingle) >= 3
    ORDER BY 1
    """,
)
def docs_benchmark_contamination(spark, sf_dir):
    """Benchmark decontamination (dedup.contamination_overlap): docs < 20
    act as the eval set; the corpus is the remaining docs plus five
    deliberately contaminated ones (benchmark doc 3's text appended).
    Flags every corpus doc sharing >= 3 distinct 3-gram shingles with any
    benchmark doc — the leak filter an LLM training pipeline runs before
    training. The oracle replays shingling and the overlap join. Note
    _ND_SHINGLE_SQL reads from a CTE named ``corpus``."""
    from shovel_spark.operators.dedup import contamination_overlap

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") < 20)
    clean = d.filter(F.col("doc_id") >= 20)
    contaminated = (
        clean.filter(F.col("doc_id") < 25)
        .withColumn("doc_id", F.col("doc_id") + 400000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" " + _doc_text(d, 3))))
    )
    corpus = clean.unionByName(contaminated)
    return contamination_overlap(corpus, bench, min_overlap=3).orderBy("doc_id")


@_register(
    "docs_crawl_frontier",
    """
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
             ) AS rank
      FROM documents
    )
    SELECT doc_id, source, n_chars, rank,
           ('0x' || substr(md5(source), 1, 8))::BIGINT % 4 AS worker
    FROM ranked WHERE rank <= 5
    ORDER BY source, rank
    """,
)
def docs_crawl_frontier(spark, sf_dir):
    """Crawl-frontier next-batch selection (operators/frontier.py):
    per source (the host analog), the 5 highest-priority docs (priority =
    n_chars, doc_id tie-break), each assigned to its owning fetch worker
    by md5 host hash — one owner per host, so politeness needs no
    cross-worker coordination. The oracle replays the ranking and the
    worker hash exactly.

    Scale shape: the rank<=K filter compiles to WindowGroupLimit
    (plan-asserted in pytest) — a hot host is pruned to K rows per input
    partition map-side BEFORE the shuffle, instead of sorting its whole
    queue in one window partition."""
    from shovel_spark.operators.frontier import frontier_next

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return (
        frontier_next(
            d, "source", "doc_id", priority_col="n_chars", per_host=5, n_workers=4
        )
        .select("doc_id", "source", "n_chars", "rank", "worker")
        .orderBy("source", "rank")
    )


@_register(
    "docs_corpus_datacard",
    r"""
    WITH base AS (
      SELECT lang, n_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS toks,
             md5(text) AS h
      FROM documents
    ),
    agg AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS total_tokens,
             CAST(count(DISTINCT h) AS BIGINT) AS distinct_texts,
             round(avg(n_chars), 4) AS avg_chars,
             round(avg(CASE WHEN toks < 50 THEN 1.0 ELSE 0.0 END), 6) AS pct_short
      FROM base GROUP BY 1
    ),
    hashed AS (
      SELECT DISTINCT lang,
             ('0x' || substr(md5(h), 1, 15))::BIGINT AS hh
      FROM base
    ),
    rho AS (
      SELECT lang, hh % 64 AS bucket,
             CASE WHEN hh // 64 = 0 THEN 55
                  ELSE strpos(reverse(bin(hh // 64)), '1') END AS r
      FROM hashed
    ),
    regs AS (SELECT lang, bucket, max(r) AS reg FROM rho GROUP BY 1, 2),
    ag2 AS (
      SELECT lang, count(*) AS nz, sum(power(2.0, -reg)) AS s
      FROM regs GROUP BY 1
    ),
    est AS (
      SELECT lang,
             CASE WHEN (0.709 * 4096.0 / (s + (64 - nz))) <= 160.0 AND 64 - nz > 0
                  THEN round(64.0 * ln(64.0 / (64 - nz)), 4)
                  ELSE round(0.709 * 4096.0 / (s + (64 - nz)), 4) END AS est_distinct
      FROM ag2
    )
    SELECT a.lang, n_docs, total_tokens, distinct_texts,
           round(1.0 - distinct_texts / n_docs, 6) AS dup_rate,
           avg_chars, pct_short, est_distinct
    FROM agg a JOIN est USING (lang)
    ORDER BY a.lang
    """,
)
def docs_corpus_datacard(spark, sf_dir):
    """Corpus datacard — the per-language report a training-data release
    ships (docs, tokens, dup rate, length profile) composed from the
    round's primitives: exact content identity via md5, the shared token
    convention, AND the grouped HLL distinct estimate alongside the
    exact count — because at 100 TB the datacard runs on the sketch
    (bounded registers per language) and the exact distinct is only
    affordable at test scale. The oracle replays every aggregate and the
    HLL registers bit-for-bit.

    Scale shape: one map-side-combinable groupBy per aggregate family
    over the lang key (bounded cardinality); the HLL state is 64 longs
    per language; no windows, no data-sized joins."""
    from shovel_spark.functions.textstats import tokens
    from shovel_spark.operators.sketches import (
        hll_build_grouped,
        hll_cardinality_grouped,
    )

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        "n_chars",
        F.size(tokens(F.col("text"))).alias("toks"),
        F.md5("text").alias("h"),
    )
    agg = base.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.count_distinct("h").alias("distinct_texts"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(
            F.avg(F.when(F.col("toks") < 50, 1.0).otherwise(0.0)), 6
        ).alias("pct_short"),
    )
    hll = hll_cardinality_grouped(
        hll_build_grouped(base, "lang", "h", b=6), "lang", b=6
    ).select("lang", F.round("est", 4).alias("est_distinct"))
    return (
        agg.join(hll, "lang")
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            "distinct_texts",
            F.round(
                1.0 - F.col("distinct_texts") / F.col("n_docs"), 6
            ).alias("dup_rate"),
            "avg_chars",
            "pct_short",
            "est_distinct",
        )
        .orderBy("lang")
    )


@_register(
    "docs_sitemap_frontier",
    """
    WITH entries AS (
      SELECT source AS host, doc_id,
             '<url><loc>/p' || doc_id || '</loc>'
             || CASE WHEN doc_id % 3 = 0
                     THEN '<lastmod>2026-01-'
                          || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                          || '</lastmod>' ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN ''
                     ELSE '<priority>0.' || CAST(doc_id % 10 AS VARCHAR)
                          || '</priority>' END
             || '</url>' AS entry
      FROM documents
    ),
    sm AS (
      SELECT host,
             '<urlset>' || string_agg(entry, '' ORDER BY doc_id) || '</urlset>' AS xml
      FROM entries GROUP BY 1
    ),
    blocks AS (
      SELECT host, unnest(regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1)) AS b
      FROM sm
    ),
    parsed AS (
      SELECT host,
             regexp_extract(b, '<loc>(.*?)</loc>', 1) AS loc,
             nullif(regexp_extract(b, '<lastmod>(.*?)</lastmod>', 1), '') AS lastmod,
             coalesce(
               CAST(nullif(regexp_extract(b, '<priority>(.*?)</priority>', 1), '')
                    AS DOUBLE),
               0.5) AS priority
      FROM blocks
      WHERE len(regexp_extract(b, '<loc>(.*?)</loc>', 1)) > 0
    ),
    ranked AS (
      SELECT host, loc, lastmod, priority,
             row_number() OVER (
               PARTITION BY host ORDER BY priority DESC, loc
             ) AS rank
      FROM parsed
    )
    SELECT host, loc, lastmod, priority, rank,
           ('0x' || substr(md5(host), 1, 8))::BIGINT % 4 AS worker
    FROM ranked WHERE rank <= 3
    ORDER BY host, rank
    """,
)
def docs_sitemap_frontier(spark, sf_dir):
    """Sitemap-seeded crawl frontier (frontier.parse_sitemap +
    frontier_next): each host's sitemap.xml is synthesized
    deterministically (every 3rd URL carries <lastmod>, every 5th omits
    <priority> and must default to 0.5 per sitemaps.org), parsed by the
    map-only regexp extractor, and the top-3 URLs per host by advertised
    priority are scheduled onto workers — discovery (sitemap) feeding
    politeness (frontier), the other half of the robots.txt story. The
    oracle replays XML assembly, block extraction, the priority default,
    ranking and the worker hash.

    Scale shape (the OPERATOR pipeline — parse + rank): extraction is
    map-only regexp work over already-fetched sitemap bodies; ranking is
    the WindowGroupLimit-pruned per-host top-K, so past the parse
    nothing data-sized shuffles beyond the K-per-host survivors. The
    collect_list XML SYNTHESIS stage above the operator is test-only
    scaffolding standing in for fetched sitemap files — in production
    the xml column arrives from the crawler and that stage does not
    exist (a real hot host's sitemap is also capped at 50k URLs/file by
    the spec, with index files pointing at shards)."""
    from shovel_spark.operators.frontier import frontier_next, parse_sitemap

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    entry = F.concat(
        F.lit("<url><loc>/p"),
        F.col("doc_id").cast("string"),
        F.lit("</loc>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("<lastmod>2026-01-"),
                F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
                F.lit("</lastmod>"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("")).otherwise(
            F.concat(
                F.lit("<priority>0."),
                (F.col("doc_id") % 10).cast("string"),
                F.lit("</priority>"),
            )
        ),
        F.lit("</url>"),
    )
    sitemaps = (
        d.select(F.col("source").alias("host"), F.col("doc_id"), entry.alias("__e"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("doc_id", "__e"))),
                        lambda s: s["__e"],
                    ),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("sitemap_xml")
        )
    )
    parsed = parse_sitemap(sitemaps)
    return (
        frontier_next(
            parsed, "host", "loc", priority_col="priority", per_host=3, n_workers=4
        )
        .select("host", "loc", "lastmod", "priority", "rank", "worker")
        .orderBy("host", "rank")
    )


@_register(
    "events_compaction_plan",
    """
    WITH manifest AS (
      SELECT event_type AS partition,
             'part-' || lpad(CAST(user_id % 20 AS VARCHAR), 2, '0') AS file,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS bytes
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    planned AS (
      SELECT partition, file, bytes,
             CAST(floor(
               (CAST(sum(bytes) OVER (
                  PARTITION BY partition ORDER BY bytes DESC, file
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS BIGINT) - bytes) / 200000.0
             ) AS BIGINT) AS bin
      FROM manifest
    ),
    summary AS (
      SELECT partition, CAST(count(*) AS BIGINT) AS n_files,
             CAST(count(DISTINCT bin) AS BIGINT) AS n_bins,
             CAST(sum(bytes) AS BIGINT) AS bytes_total
      FROM planned GROUP BY 1
    )
    SELECT p.partition, p.file, p.bytes, p.bin, s.n_files, s.n_bins
    FROM planned p JOIN summary s USING (partition)
    ORDER BY p.partition, p.bin, p.bytes DESC, p.file
    """,
)
def events_compaction_plan(spark, sf_dir):
    """Small-file compaction planning (operators/maintenance.py): a
    deterministic synthetic manifest (one "file" per (event_type, user
    bucket), bytes from aggregated values) is binned into 200 KB rewrite
    groups by the largest-first running-sum rule — the OPTIMIZE-planning
    half of lakehouse maintenance, which this repo's own batch-keyed
    streaming writers make necessary at scale. The oracle replays the
    manifest, the cumulative binning and the per-partition summary.

    Scale shape: the plan runs over file METADATA (a manifest row per
    file), windowed per table partition — never over data."""
    from shovel_spark.operators.maintenance import (
        compaction_plan,
        compaction_summary,
    )

    manifest = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type").alias("partition"),
            F.concat(
                F.lit("part-"),
                F.lpad((F.col("user_id") % 20).cast("string"), 2, "0"),
            ).alias("file"),
        )
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("bytes"))
    )
    plan = compaction_plan(manifest, 200_000).localCheckpoint()
    return (
        plan.join(
            compaction_summary(plan).select("partition", "n_files", "n_bins"),
            "partition",
        )
        .select("partition", "file", "bytes", "bin", "n_files", "n_bins")
        .orderBy("partition", "bin", F.col("bytes").desc(), "file")
    )


@_register(
    "docs_robots_filter",
    """
    WITH hosts AS (
      SELECT DISTINCT source AS host,
             CAST(substring(source, 4) AS INT) % 2 AS par
      FROM documents
    ),
    robots AS (
      SELECT host,
             CASE WHEN par = 0
                  THEN 'User-agent: *' || chr(10) || 'Disallow: /private'
                       || chr(10) || 'Allow: /private/ok' || chr(10)
                       || 'Disallow: /tmp' || chr(10) || chr(10)
                       || 'User-agent: badbot' || chr(10) || 'Disallow: /'
                  ELSE 'User-agent: *' || chr(10) || 'Disallow: /tmp'
             END AS txt
      FROM hosts
    ),
    lines AS (
      SELECT host, unnest(range(len(l))) AS idx, unnest(l) AS raw
      FROM (SELECT host, string_split(txt, chr(10)) AS l FROM robots)
    ),
    lp AS (
      SELECT host, idx, trim(regexp_replace(raw, '#.*$', '')) AS line
      FROM lines
    ),
    grouped AS (
      SELECT host, idx, line,
             last_value(
               CASE WHEN lower(line) LIKE 'user-agent:%'
                    THEN lower(trim(substring(line, 12))) END IGNORE NULLS
             ) OVER (PARTITION BY host ORDER BY idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS agent
      FROM lp
    ),
    rules AS (
      SELECT host, agent,
             CASE WHEN lower(line) LIKE 'allow:%' THEN 'allow'
                  WHEN lower(line) LIKE 'disallow:%' THEN 'disallow' END AS rule,
             CASE WHEN lower(line) LIKE 'allow:%' THEN trim(substring(line, 7))
                  WHEN lower(line) LIKE 'disallow:%' THEN trim(substring(line, 10))
             END AS prefix
      FROM grouped WHERE agent IS NOT NULL
    ),
    star AS (
      SELECT host, rule, prefix FROM rules
      WHERE agent = '*' AND rule IS NOT NULL AND len(prefix) > 0
    ),
    urls AS (
      SELECT doc_id, source AS host,
             CASE doc_id % 4
               WHEN 0 THEN '/private/ok/p' || doc_id
               WHEN 1 THEN '/private/p' || doc_id
               WHEN 2 THEN '/tmp/p' || doc_id
               ELSE '/pub/p' || doc_id END AS path
      FROM documents
    ),
    scored AS (
      SELECT u.doc_id, u.host, u.path,
             max(CASE WHEN s.rule IS NOT NULL
                      THEN len(s.prefix) * 2
                           + CASE WHEN s.rule = 'allow' THEN 1 ELSE 0 END
                 END) AS score
      FROM urls u
      LEFT JOIN star s
        ON s.host = u.host AND starts_with(u.path, s.prefix)
      GROUP BY 1, 2, 3
    )
    SELECT doc_id, host, path,
           CASE WHEN score IS NULL THEN true ELSE score % 2 = 1 END AS allowed
    FROM scored
    ORDER BY doc_id
    """,
)
def docs_robots_filter(spark, sf_dir):
    """robots.txt compliance (operators/robots.py): each host's policy is
    synthesized deterministically (even hosts carry a Disallow/Allow/
    Disallow block plus a separate badbot group that must NOT leak into
    the '*' verdicts; odd hosts just block /tmp), parsed by the
    line-stateful parse_robots (comment strip, group tracking via
    IGNORE-NULLS last_value, empty-Disallow drop), and a four-shape URL
    frontier is admitted by RFC 9309 longest-match (Allow wins ties).
    /private/ok/* survives on even hosts BECAUSE the longer Allow beats
    the shorter Disallow — the election, not just the match, is under
    test. The oracle replays parse, grouping, and the 2*len+allow score
    election exactly.

    Scale shape: rules are policy-sized (hosts x rules) and broadcast;
    the per-URL election is a map-side-combinable struct max; the only
    window is per-host over a robots FILE's lines."""
    from shovel_spark.operators.robots import parse_robots, robots_filter

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    par = F.substring("source", 4, 10).cast("int") % 2
    even_txt = (
        "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
        "Disallow: /tmp\n\nUser-agent: badbot\nDisallow: /"
    )
    odd_txt = "User-agent: *\nDisallow: /tmp"
    robots = (
        d.select("source").distinct()
        .select(
            F.col("source").alias("host"),
            F.when(par == 0, F.lit(even_txt)).otherwise(F.lit(odd_txt)).alias(
                "robots_txt"
            ),
        )
    )
    rules = parse_robots(robots)
    urls = d.select(
        "doc_id",
        F.col("source").alias("host"),
        F.concat(
            F.element_at(
                F.array(
                    F.lit("/private/ok/p"),
                    F.lit("/private/p"),
                    F.lit("/tmp/p"),
                    F.lit("/pub/p"),
                ),
                (F.col("doc_id") % 4 + 1).cast("int"),
            ),
            F.col("doc_id").cast("string"),
        ).alias("path"),
    )
    return robots_filter(urls, rules).orderBy("doc_id")


@_register(
    "docs_remove_boilerplate",
    r"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN 'home login signup menu search profile settings logout help about contact terms privacy sitemap feedback careers press blog forum status'
                       || ' ' || text
                  ELSE text END AS text
      FROM documents
    ),
    w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM corpus),
    p AS (
      SELECT doc_id, i AS idx,
             list_slice(w, CAST(i * 10 + 1 AS INT), CAST(i * 10 + 10 AS INT)) AS pw
      FROM (SELECT doc_id, w, unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS i
            FROM w WHERE len(w) > 0)
    ),
    g AS (
      SELECT doc_id, idx, array_to_string(pw, ' ') AS para,
             (len(pw) >= 5 AND
              len(list_filter(pw, x -> list_contains(
                    ['the', 'data', 'key', 'value', 'row'], x)))
                >= len(pw) * CAST(0.2 AS DOUBLE)) AS good
      FROM p
    ),
    k AS (
      SELECT doc_id, idx, para,
             (good
              OR coalesce(lag(good) OVER (PARTITION BY doc_id ORDER BY idx), false)
              OR coalesce(lead(good) OVER (PARTITION BY doc_id ORDER BY idx), false)
             ) AS keep
      FROM g
    ),
    reb AS (
      SELECT doc_id, count(*) AS n_kept, string_agg(para, ' ' ORDER BY idx) AS t
      FROM k WHERE keep GROUP BY doc_id
    )
    SELECT w.doc_id, CAST(ceil(len(w.w) / 10.0) AS BIGINT) AS n_paras,
           coalesce(reb.n_kept, 0) AS n_kept,
           md5(coalesce(reb.t, '')) AS text_md5
    FROM w LEFT JOIN reb USING (doc_id)
    ORDER BY w.doc_id
    """,
)
def docs_remove_boilerplate(spark, sf_dir):
    """jusText-style main-content extraction (quality.remove_boilerplate):
    every 10th document gets a 20-word nav-chrome paragraph planted at the
    front (zero stopwords — classic link-list signature); the operator
    classifies 10-word paragraphs by length + stopword ratio, applies
    jusText's near-good context rule (a bad paragraph adjacent to a good
    one survives), and reassembles each doc. The planted chrome's first
    window dies, its second window is context-saved by the adjacent real
    text — the oracle replays scoring, the lag/lead context pass, and the
    rebuilt text md5 per doc.

    Scale shape: scoring is map-only array work; the only window is
    per-doc lag/lead (bounded by a document's paragraph count); no
    content-keyed windows, no driver state."""
    from shovel_spark.operators.quality import remove_boilerplate

    chrome = (
        "home login signup menu search profile settings logout help about "
        "contact terms privacy sitemap feedback careers press blog forum status"
    )
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.lit(chrome + " "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return (
        remove_boilerplate(d)
        .select("doc_id", "n_paras", "n_kept", F.md5("text").alias("text_md5"))
        .orderBy("doc_id")
    )


@_register(
    "docs_bloom_decontamination",
    r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 20
      UNION ALL
      SELECT doc_id + 400000,
             text || ' ' || (SELECT text FROM documents WHERE doc_id = 3)
      FROM documents WHERE doc_id >= 20 AND doc_id < 25
    ),
    bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
    c_sh AS MATERIALIZED (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(w) - 2, 1) + 1),
               i -> array_to_string(list_slice(w, i, i + 2), ' ')))) AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM corpus)
    ),
    b_sh AS MATERIALIZED (
      SELECT DISTINCT shingle FROM (
        SELECT unnest(list_distinct(list_transform(
                 range(1, greatest(len(w) - 2, 1) + 1),
                 i -> array_to_string(list_slice(w, i, i + 2), ' ')))) AS shingle
        FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM bench)
      )
    ),
    setpos AS (
      SELECT ('0x' || substr(md5('bf' || i || ':' || shingle), 1, 8))::BIGINT
               % 65536 AS pos
      FROM b_sh, range(0, 4) t(i)
    ),
    words AS MATERIALIZED (
      SELECT pos // 32 AS word,
             bit_or(CAST(power(2, pos % 32) AS BIGINT)) AS w
      FROM setpos GROUP BY 1
    ),
    pr AS (
      SELECT doc_id, shingle,
             ('0x' || substr(md5('bf' || i || ':' || shingle), 1, 8))::BIGINT
               % 65536 AS pos
      FROM c_sh, range(0, 4) t(i)
    ),
    hit AS (
      SELECT doc_id, shingle,
             sum(CASE WHEN w.w IS NOT NULL
                       AND (w.w & CAST(power(2, pos % 32) AS BIGINT)) != 0
                      THEN 1 ELSE 0 END) AS nh
      FROM pr LEFT JOIN words w ON w.word = pos // 32
      GROUP BY 1, 2
    ),
    cand AS MATERIALIZED (SELECT doc_id, shingle FROM hit WHERE nh = 4),
    cc AS (
      SELECT doc_id,
             CAST(count(DISTINCT shingle) AS BIGINT) AS candidate_shingles
      FROM cand GROUP BY 1
    ),
    ec AS (
      SELECT cand.doc_id,
             CAST(count(DISTINCT cand.shingle) AS BIGINT) AS exact_shingles
      FROM cand JOIN b_sh ON cand.shingle = b_sh.shingle
      GROUP BY 1
    )
    SELECT cc.doc_id, candidate_shingles,
           coalesce(exact_shingles, 0) AS exact_shingles,
           coalesce(exact_shingles, 0) >= 3 AS contaminated
    FROM cc LEFT JOIN ec ON cc.doc_id = ec.doc_id
    ORDER BY cc.doc_id
    """,
)
def docs_bloom_decontamination(spark, sf_dir):
    """Two-tier Bloom decontamination (dedup.bloom_decontaminate): same
    eval/corpus split and planted contamination as
    docs_benchmark_contamination, but tier 1 compresses the benchmark's
    shingle set into a 65536-bit broadcast Bloom filter probed map-side
    (the shape that still works when the eval suite's shingle set is too
    large to broadcast exactly), and tier 2's exact semi-join settles the
    false-positive trickle over shortlisted shingles only. The oracle
    rebuilds the bit array, replays all four probes per shingle, the
    shortlist, and both count tiers; rows with exact < candidate are the
    absorbed false positives, and the contaminated flags must agree with
    the exact path's verdicts."""
    from shovel_spark.operators.dedup import bloom_decontaminate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") < 20)
    clean = d.filter(F.col("doc_id") >= 20)
    contaminated = (
        clean.filter(F.col("doc_id") < 25)
        .withColumn("doc_id", F.col("doc_id") + 400000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" " + _doc_text(d, 3))))
    )
    corpus = clean.unionByName(contaminated)
    return bloom_decontaminate(corpus, bench, min_overlap=3).orderBy("doc_id")


@_register(
    "docs_redact_pii",
    r"""
    WITH seeded AS (
      SELECT doc_id, lang,
             text || ' Contact user' || doc_id ||
             '@example.com or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
             '-4321 from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 today.' AS text
      FROM documents
    ),
    red AS (
      SELECT doc_id, lang, length(text) AS len_before,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS red
      FROM seeded
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(red, '<EMAIL>'))) AS BIGINT) AS n_emails,
           CAST(sum(len(regexp_extract_all(red, '<PHONE>'))) AS BIGINT) AS n_phones,
           CAST(sum(len(regexp_extract_all(red, '<IP>'))) AS BIGINT) AS n_ips,
           CAST(sum(len_before - length(red)) AS BIGINT) AS chars_removed
    FROM red GROUP BY 1
    """,
)
def docs_redact_pii(spark, sf_dir):
    """PII scrubbing (textstats.redact_pii): every document gets a
    deterministic contact line (email + phone + IPv4) appended, redaction
    replaces them with typed markers — C4-style scrub, chained
    regexp_replace fused into the scan. The oracle replays the seeding and
    the exact same engine-neutral patterns (no lookaround, ASCII classes)
    and checks marker counts and removed-character totals per lang."""
    from shovel_spark.functions.textstats import redact_pii

    d = _t(spark, sf_dir, "documents")
    seeded = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"), F.col("doc_id").cast("string"),
            # 3-3-4 digit groups so the seeded phone actually matches the
            # PHONE pattern (a 3-4-4 seed silently never redacts)
            F.lit("@example.com or 555-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(1000)).cast("string"), 3, "0"),
            F.lit("-4321 from 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".7 today."),
        ),
    )
    red = seeded.select(
        "lang",
        F.length("text").alias("len_before"),
        redact_pii(F.col("text")).alias("red"),
    )
    marker = lambda m: F.size(F.regexp_extract_all(F.col("red"), F.lit(m), F.lit(0)))  # noqa: E731
    return red.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(marker("<EMAIL>")).alias("n_emails"),
        F.sum(marker("<PHONE>")).alias("n_phones"),
        F.sum(marker("<IP>")).alias("n_ips"),
        F.sum(F.col("len_before") - F.length("red")).alias("chars_removed"),
    )


@_register(
    "docs_repetition_stats",
    r"""
    WITH w AS (
      SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ),
    base AS (
      SELECT doc_id, lang,
             1.0 - len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1) AS dup_frac,
             greatest(len(toks) - 1, 1) AS n_bigrams
      FROM w
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                    i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS bigram
      FROM w
    ),
    top_bg AS (
      SELECT doc_id, max(c) AS top_count FROM (
        SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2
      ) GROUP BY 1
    )
    SELECT lang, count(*) AS n_docs,
           round(avg(dup_frac), 4) AS avg_dup_word_frac,
           round(avg(top_count * 1.0 / n_bigrams), 4) AS avg_top_bigram_frac,
           CAST(sum(CASE WHEN top_count * 1.0 / n_bigrams > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repetitive
    FROM base JOIN top_bg USING (doc_id)
    GROUP BY 1
    """,
)
def docs_repetition_stats(spark, sf_dir):
    """Gopher-style repetition filters: duplicate-word fraction (pure array
    math, map-only) and top-bigram fraction (explode + two-level count —
    the shuffle carries (doc_id, bigram) with map-side partial counts,
    never text). Flags docs whose most frequent bigram exceeds 5% of all
    bigrams — the boilerplate/spam signal a training pipeline filters on.
    Oracle replays tokenization, distinct math, and the bigram mode."""
    from shovel_spark.functions.textstats import bigrams, duplicate_word_fraction, tokens

    d = _t(spark, sf_dir, "documents")
    # tokens materialized behind a projection: bigrams() is a higher-order
    # lambda, and lambdas get no CSE (an inlined split re-tokenizes per
    # bigram — measured 6x slower)
    tok = d.select("doc_id", "lang", "text", tokens(F.col("text")).alias("__toks"))
    base = tok.select(
        "doc_id", "lang",
        duplicate_word_fraction(F.col("__toks")).alias("dup_frac"),
        F.greatest(F.size(bigrams(F.col("__toks"))), F.lit(1)).alias("n_bigrams"),
    )
    top_bg = (
        tok.select("doc_id", F.explode(bigrams(F.col("__toks"))).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_count"))
    )
    j = base.join(top_bg, "doc_id")
    top_frac = F.col("top_count") / F.col("n_bigrams")
    return j.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("dup_frac"), 4).alias("avg_dup_word_frac"),
        F.round(F.avg(top_frac), 4).alias("avg_top_bigram_frac"),
        F.sum(F.when(top_frac > 0.05, 1).otherwise(0)).alias("n_repetitive"),
    )


@_register(
    "docs_hash_split",
    """
    WITH b AS (
      SELECT lang,
             ('0x' || substr(md5('7:' || doc_id), 1, 15))::BIGINT % 10000 AS bucket
      FROM documents
    )
    SELECT lang,
           CASE WHEN bucket < 9000 THEN 'train'
                WHEN bucket < 9500 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n
    FROM b GROUP BY 1, 2
    """,
)
def docs_hash_split(spark, sf_dir):
    """Deterministic train/val/test split (sampling.hash_split, md5 family
    so DuckDB replays the exact assignment): per-(lang, split) counts. The
    assignment depends only on (doc_id, seed) — stable across runs,
    partitionings, resumes, and engines; map-only, fused into the scan."""
    from shovel_spark.operators.sampling import hash_split

    d = _t(spark, sf_dir, "documents")
    s = hash_split(d, fractions={"train": 0.9, "val": 0.05, "test": 0.05}, seed=7, family="md5")
    return s.groupBy("lang", "split").agg(F.count("*").alias("n"))


@_register(
    "docs_training_corpus",
    f"""
    WITH raw AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id >= 20
      UNION ALL
      SELECT doc_id + 200000, lang, text FROM documents WHERE doc_id >= 20 AND doc_id < 80
      UNION ALL
      SELECT doc_id + 100000, lang,
             array_to_string(regexp_split_to_array(trim(text), '\\s+')[2:], ' ')
      FROM documents WHERE doc_id >= 20 AND doc_id < 60
      UNION ALL
      SELECT doc_id + 300000, lang, repeat('!?#$%& ', 50)
      FROM documents WHERE doc_id >= 20 AND doc_id < 50
      UNION ALL
      SELECT doc_id + 400000, lang,
             text || ' ' || (SELECT text FROM documents WHERE doc_id = 3)
      FROM documents WHERE doc_id >= 20 AND doc_id < 25
    ),
    scored AS MATERIALIZED (
      SELECT doc_id, lang, text,
        round((
          (CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END) +
          (CASE WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                     / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) +
          (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / greatest(length(text), 1)) +
          (CASE WHEN length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0
                     / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.0 END)
        ) / 4.0, 6) AS q
      FROM raw
    ),
    flt AS MATERIALIZED (SELECT doc_id, lang, text FROM scored WHERE q >= 0.5),
    keep AS (
      SELECT min(doc_id) AS doc_id
      FROM flt GROUP BY md5(regexp_replace(trim(text), '\\s+', ' ', 'g'))
    ),
    corpus AS MATERIALIZED (
      SELECT doc_id, text FROM flt WHERE doc_id IN (SELECT doc_id FROM keep)
    ),
    {_nd_chain_ctes(50)},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
    l1 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l0 l LEFT JOIN edges e ON e.src = l.id LEFT JOIN l0 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    ),
    l2 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l1 l LEFT JOIN edges e ON e.src = l.id LEFT JOIN l1 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    ),
    l3 AS (
      SELECT l.id, least(l.label, coalesce(min(ln.label), l.label)) AS label
      FROM l2 l LEFT JOIN edges e ON e.src = l.id LEFT JOIN l2 ln ON ln.id = e.dst
      GROUP BY l.id, l.label
    ),
    deduped AS MATERIALIZED (
      SELECT f.doc_id, f.lang, f.text FROM flt f
      WHERE f.doc_id IN (SELECT doc_id FROM keep)
        AND f.doc_id NOT IN (SELECT id FROM l3 WHERE id != label)
    ),
    bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
    b_sh AS (
      SELECT DISTINCT shingle FROM (
        SELECT unnest(list_distinct(list_transform(
                 range(1, greatest(len(w) - 2, 1) + 1),
                 i -> array_to_string(list_slice(w, i, i + 2), ' ')))) AS shingle
        FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS w FROM bench)
      )
    ),
    d_sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(w) - 2, 1) + 1),
               i -> array_to_string(list_slice(w, i, i + 2), ' ')))) AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM deduped)
    ),
    contaminated AS (
      SELECT d_sh.doc_id FROM d_sh JOIN b_sh ON d_sh.shingle = b_sh.shingle
      GROUP BY 1 HAVING count(DISTINCT d_sh.shingle) >= 8
    ),
    final AS (
      SELECT doc_id, lang,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                 '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b', '<PHONE>', 'g'),
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g') AS red,
             CASE WHEN ('0x' || substr(md5('7:' || doc_id), 1, 15))::BIGINT % 10000 < 9000 THEN 'train'
                  WHEN ('0x' || substr(md5('7:' || doc_id), 1, 15))::BIGINT % 10000 < 9500 THEN 'val'
                  ELSE 'test' END AS split
      FROM deduped
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT lang, split, count(*) AS n_docs,
           CAST(sum(len(regexp_split_to_array(trim(red), '\\s+'))) AS BIGINT) AS total_tokens
    FROM final GROUP BY 1, 2
    """,
)
def docs_training_corpus(spark, sf_dir):
    """CAPSTONE composite — the COMPLETE training-data pipeline a lab runs
    at 100 TB, as one value-checked query: quality filter → exact dedup →
    MinHash near-dup clustering (keep canonical) → benchmark
    decontamination (docs < 20 are the eval set; >= 8 shared 3-shingles
    drops the doc) → PII redaction → deterministic train/val/test split →
    per-(lang, split) doc and token counts. The input plants every failure
    mode: exact dups (+200000), near dups (+100000), junk (+300000), and
    eval-set leaks (+400000). The DuckDB oracle replays all six stages.

    Every stage is the library operator (textstats.quality_score,
    dedup.exact_dedup / minhash_dedup_pairs / connected_components /
    contamination_overlap, textstats.redact_pii, sampling.hash_split) —
    this query is composition only. Scale shape: text bodies shuffle only
    into the shingle joins (16-byte hashes + ids otherwise); candidates
    come from bucket collisions; the benchmark side broadcasts; redact and
    split are map-only."""
    from shovel_spark.functions.textstats import quality_score, redact_pii, token_count
    from shovel_spark.operators.dedup import (
        connected_components,
        contamination_overlap,
        exact_dedup,
        minhash_dedup_pairs,
    )
    from shovel_spark.operators.sampling import hash_split

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    bench = d.filter(F.col("doc_id") < 20)
    base = d.filter(F.col("doc_id") >= 20)
    exact_copies = base.filter(F.col("doc_id") < 80).withColumn(
        "doc_id", F.col("doc_id") + 200000
    )
    near_copies = (
        base.filter(F.col("doc_id") < 60)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", _drop_first_word("text"))
    )
    junk = base.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 300000
    ).withColumn("text", F.repeat(F.lit("!?#$%& "), 50))
    leaks = (
        base.filter(F.col("doc_id") < 25)
        .withColumn("doc_id", F.col("doc_id") + 400000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" " + _doc_text(d, 3))))
    )
    raw = base.unionByName(exact_copies).unionByName(near_copies).unionByName(junk).unionByName(leaks)

    # quality_score already rounds to 6 dp (oracle parity)
    flt = raw.filter(quality_score(F.col("text")) >= 0.5)
    surv = exact_dedup(flt).localCheckpoint(eager=False)
    # max_doc_freq=50: boilerplate skew cap wired as in production (no-op
    # on this corpus; the oracle replays the capped shingle table)
    pairs = minhash_dedup_pairs(
        surv.select("doc_id", "text"), threshold=0.5, num_hashes=16, bands=8,
        max_doc_freq=50, family="md5",
    )
    cc = connected_components(pairs, iters=3)
    dropped = cc.filter(F.col("id") != F.col("component")).select(F.col("id").alias("doc_id"))
    deduped = surv.join(dropped, "doc_id", "left_anti").localCheckpoint(eager=False)

    contaminated = contamination_overlap(deduped, bench, min_overlap=8).select("doc_id")
    clean = deduped.join(contaminated, "doc_id", "left_anti")

    final = hash_split(
        clean.withColumn("red", redact_pii(F.col("text"))),
        fractions={"train": 0.9, "val": 0.05, "test": 0.05}, seed=7, family="md5",
    )
    return final.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("red"))).alias("total_tokens"),
    )


@_register(
    "events_resample_dense",
    """
    WITH b AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 * 86400 AS bucket,
             value
      FROM events WHERE user_id < 20
    ),
    agg AS (
      SELECT user_id, bucket, count(*) AS n, round(sum(value), 2) AS total
      FROM b GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM agg GROUP BY 1
    ),
    grid AS (
      SELECT user_id, unnest(range(lo, hi + 1, 86400)) AS bucket FROM bounds
    )
    SELECT g.user_id,
           strftime(make_timestamp(g.bucket * 1000000), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           coalesce(a.n, 0) AS n,
           coalesce(a.total, 0.0) AS total
    FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.bucket = a.bucket
    """,
)
def events_resample_dense(spark, sf_dir):
    """Time-series resample with gap filling (timeseries.resample): daily
    per-user buckets where EVERY day between a user's first and last event
    appears — empty days as explicit zeros, which naive groupBy silently
    drops and downstream rate/delta math then miscounts. The oracle
    replays bucketing, the per-key bounds grid, and the zero-fill."""
    from shovel_spark.operators.timeseries import resample

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    out = resample(
        ev, ["user_id"], ts_col="ts", interval_seconds=86400,
        aggs={"n": F.count("*"), "total": F.round(F.sum("value"), 2)},
        fill={"n": 0, "total": 0.0},
    )
    return out.select(
        "user_id",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "n",
        "total",
    )


@_register(
    "parse_variant_props",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
           count(*) AS n
    FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
    GROUP BY 1
    """,
)
def parse_variant_props(spark, sf_dir):
    """Semi-structured decode via Spark 4 VariantType (parse_json →
    variant_get): the modern engine-native form of the JSON decoder slot —
    the variant binary encoding is parsed ONCE and field access is a typed
    path lookup, where get_json_object re-parses the string per extraction.
    The variant is projected behind one alias so filter + aggregates share
    the single parse. Oracle uses DuckDB's JSON path extraction."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get(F.col("v"), "$.k", "int")
    return (
        v.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("n"),
        )
    )


@_register(
    "events_value_histogram",
    """
    SELECT CAST(least(greatest(floor(value / 25.0), 0), 9) AS INT) AS bin,
           count(*) AS n, round(avg(value), 3) AS avg_value
    FROM events GROUP BY 1
    """,
)
def events_value_histogram(spark, sf_dir):
    """Fixed-width histogram (width_bucket shape): 10 bins of 25 over
    value, clamped at the edges — one map-only bucket expression + a
    10-row aggregate, the scan-speed distribution profile that replaces a
    global sort at 10^12 rows."""
    ev = _t(spark, sf_dir, "events")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / 25.0), F.lit(0)), F.lit(9)
    ).cast("int")
    return ev.groupBy(bin_.alias("bin")).agg(
        F.count("*").alias("n"), F.round(F.avg("value"), 3).alias("avg_value")
    )


@_register(
    "docs_chunk_udtf",
    r"""
    WITH w AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS toks
      FROM documents WHERE doc_id < 100 AND text IS NOT NULL
    ),
    chunks AS (
      SELECT lang,
             CAST(start // 40 AS INT) AS chunk_idx,
             least(50, len(toks) - start) AS n_tokens
      FROM (
        SELECT doc_id, lang, toks,
               unnest(range(0, greatest(len(toks), 1), 40)) AS start
        FROM w
      )
    )
    SELECT lang, count(*) AS n_chunks,
           round(avg(n_tokens), 3) AS avg_chunk_tokens,
           CAST(max(chunk_idx) AS INT) AS max_chunk_idx
    FROM chunks GROUP BY 1
    """,
)
def docs_chunk_udtf(spark, sf_dir):
    """Document chunking for LLM context windows (50-token chunks, 10-token
    overlap → stride 40) via a Python UDTF — the table-function plugin slot
    (Spark 4 `@udtf`, one input row → N output rows with arbitrary Python;
    the row-multiplying sibling of the applyInPandas surface demo). A
    native posexplode(sequence(...)) twin would be faster — the UDTF here
    demonstrates the extension point. The oracle replays the stride walk.
    Engine parity pinned down: Python str.split() == regexp '\\s+' split
    with empties filtered (any whitespace, no empty tokens), and NULL text
    is excluded on BOTH sides (the UDTF emits nothing; SQL least/greatest
    silently skip NULLs and would fabricate a 50-token chunk)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int")
    class ChunkText:
        def eval(self, text: str):
            if text is None:
                return
            toks = text.split()
            n = len(toks)
            # clamp only the range bound (empty doc still emits ONE chunk)
            # but report its true 0 token count — matching the oracle's
            # least(50, len(toks) - start) on the unclamped length
            for i, start in enumerate(range(0, max(n, 1), 40)):
                yield i, min(50, n - start)

    spark.udtf.register("chunk_text", ChunkText)
    d = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").isNotNull()
    )
    d.createOrReplaceTempView("docs_chunk_src")
    return spark.sql(
        """
        SELECT lang, count(*) AS n_chunks,
               round(avg(c.n_tokens), 3) AS avg_chunk_tokens,
               max(c.chunk_idx) AS max_chunk_idx
        FROM docs_chunk_src d, LATERAL chunk_text(d.text) c
        GROUP BY lang
        """
    )


@_register(
    "docs_hash_sample",
    """
    SELECT lang, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS sampled_chars
    FROM documents
    WHERE ('0x' || substr(md5('7:' || doc_id), 1, 15))::BIGINT % 10000 < 1000
    GROUP BY 1
    """,
)
def docs_hash_sample(spark, sf_dir):
    """Deterministic 10% corpus sample (sampling.hash_sample, md5 family):
    membership depends only on (doc_id, seed) — reproducible across runs
    and partitionings, and nested across fractions (the 5% sample is a
    subset of the 10%) — the ablation-grade downsample df.sample cannot
    provide. Map-only filter fused into the scan."""
    from shovel_spark.operators.sampling import hash_sample

    d = _t(spark, sf_dir, "documents")
    s = hash_sample(d, 0.10, seed=7, family="md5")
    return s.groupBy("lang").agg(
        F.count("*").alias("n_sampled"), F.sum("n_chars").alias("sampled_chars")
    )


@_register(
    "docs_tfidf_terms",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents
      WHERE text IS NOT NULL AND doc_id IS NOT NULL AND trim(text) != ''
    ),
    nn AS (SELECT count(*) AS n FROM w),
    tf AS (
      SELECT doc_id, t AS term, any_value(n) AS n, count(*) AS tf
      FROM (SELECT doc_id, len(w) AS n, unnest(w) AS t FROM w)
      GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.term,
             (tf.tf * 1.0 / tf.n) * ln((nn.n + 1.0) / (df.df + 1.0)) AS score
      FROM tf JOIN df USING (term) CROSS JOIN nn
    )
    SELECT doc_id, term, round(score, 6) AS score
    FROM scored
    WHERE doc_id < 60
    QUALIFY row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, term ASC
    ) <= 3
    """,
)
def docs_tfidf_terms(spark, sf_dir):
    """Per-doc characteristic terms by smoothed TF-IDF
    (quality.tfidf_terms): top-3 per document — the keyword/topic-tagging
    signal for mix balancing, the distinctness inverse of
    ngram_commonness. Document frequency comes from a rollup over DISTINCT
    (doc, term) pairs (stop-word reduce rows bounded at n_docs), the join
    back is AQE-skew-splittable, and the per-doc top-k is a rank-limit
    window. The oracle replays tf, smoothed idf, and the tie-broken
    ranking; corpus stats use ALL docs, output restricted to doc_id < 60."""
    from shovel_spark.operators.quality import tfidf_terms

    d = _t(spark, sf_dir, "documents")
    out = tfidf_terms(d, top_k=3)
    return out.filter(F.col("doc_id") < 60).select(
        "doc_id", "term", F.round("score", 6).alias("score")
    )


@_register(
    "docs_bm25_search",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents
      WHERE text IS NOT NULL AND doc_id IS NOT NULL AND trim(text) != ''
    ),
    d AS (SELECT doc_id, w, len(w) AS dl FROM w),
    stats AS (
      SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM d
    ),
    tf AS (
      SELECT doc_id, t AS term, any_value(dl) AS dl, count(*) AS tf
      FROM (SELECT doc_id, dl, unnest(w) AS t FROM d)
      WHERE t IN ('merge', 'spark', 'vector')
      GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             count(*) AS n_terms,
             round(sum(
               ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))
             ), 6) AS score
      FROM tf JOIN df USING (term) CROSS JOIN stats
      GROUP BY 1
    )
    SELECT doc_id, n_terms, score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 15
    """,
)
def docs_bm25_search(spark, sf_dir):
    """Okapi BM25 keyword retrieval (search.bm25_topk, Lucene idf form):
    top-15 documents for the query {merge, spark, vector} with k1=1.2,
    b=0.75. The oracle replays corpus stats (N, exact-sum avgdl), the
    query-term-filtered postings, per-term idf, the saturation formula,
    and the (score desc, doc_id) election.

    Scale shape: the explode is filtered to the 3 query terms BEFORE the
    postings groupBy (the only corpus-sized shuffle carries query-term
    rows only); df + the 1-row stats broadcast onto the postings; top-k
    is TakeOrderedAndProject, never a full sort. build_postings persists
    the same relation term-partitioned for standing-index probes."""
    from shovel_spark.operators.search import bm25_topk

    d = _t(spark, sf_dir, "documents")
    return bm25_topk(d, ["spark", "vector", "merge"], top_k=15)


@_register(
    "docs_nfc_normalize",
    """
    WITH inj AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN replace(text, 'e', 'e' || chr(769))
                  ELSE text END AS t
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    n AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM inj)
    SELECT doc_id, len(t)::BIGINT AS len_raw, len(nt)::BIGINT AS len_nfc,
           (t != nt) AS changed, md5(nt) AS nfc_md5
    FROM n ORDER BY doc_id
    """,
)
def docs_nfc_normalize(spark, sf_dir):
    """Unicode NFC normalization (unicodefn.nfc, Arrow-batched pandas
    UDF over unicodedata — one of the engine's few deliberate Python
    paths, since the JVM exposes no NFC builtin): docs with id % 3 == 0
    get every 'e' decomposed to e + U+0301 in BOTH engines, then both
    normalize — composed output md5-checked against DuckDB's
    nfc_normalize (both implement UAX #15), lengths and changed flags
    replayed exactly.

    Scale shape: map-only projection, no shuffle; Arrow batch transfer
    (no per-row pickling); composes in front of every content-hash
    dedup operator, which is the production reason it exists."""
    from shovel_spark.functions.unicodefn import nfc

    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    inj = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.replace(F.col("text"), F.lit("e"), F.lit("e\u0301")),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    n = inj.withColumn("nt", nfc(F.col("t")))
    return n.select(
        "doc_id",
        F.length("t").cast("long").alias("len_raw"),
        F.length("nt").cast("long").alias("len_nfc"),
        (F.col("t") != F.col("nt")).alias("changed"),
        F.md5(F.encode("nt", "UTF-8")).alias("nfc_md5"),
    )


@_register(
    "docs_phrase_mining",
    r"""
    WITH toks AS MATERIALIZED (
      SELECT list_filter(regexp_split_to_array(trim(text), '\s+'),
                         w -> w != '') AS t
      FROM documents WHERE text IS NOT NULL AND trim(text) != ''
    ),
    uni AS MATERIALIZED (
      SELECT w, count(*)::BIGINT AS c
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
    ),
    nn AS (SELECT sum(c)::BIGINT AS n FROM uni),
    bi AS (
      SELECT t[u.gi] AS word_a, t[u.gi + 1] AS word_b, count(*)::BIGINT AS pair_count
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(gi)
      GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT word_a, word_b, pair_count,
           round((pair_count - 5.0) * (SELECT n FROM nn)
                 / (ua.c::DOUBLE * ub.c), 6) AS score
    FROM bi JOIN uni ua ON bi.word_a = ua.w JOIN uni ub ON bi.word_b = ub.w
    ORDER BY score DESC, word_a, word_b LIMIT 20
    """,
)
def docs_phrase_mining(spark, sf_dir):
    """Collocation mining (phrases.top_phrases, the word2phrase criterion
    of Mikolov et al. 2013): top-20 adjacent bigrams by
    (count(ab) - delta) * N / (count(a) * count(b)) with min_count=5,
    delta=5. The oracle replays unigram/bigram counts, the discounted
    score, and the (score desc, a, b) election.

    Scale shape: two map-side-combined corpus groupBys down to
    vocab-sized relations; the score join keys on words (AQE-splittable,
    never corpus-sized) with a 1-row N broadcast; top-k is
    TakeOrderedAndProject."""
    from shovel_spark.operators.phrases import top_phrases

    d = _t(spark, sf_dir, "documents")
    return top_phrases(d, top_k=20, min_count=5, delta=5.0)


def _bpe_iter_ctes(n_merges: int) -> str:
    """DuckDB CTE replay of bpe_train merge steps (operators/bpe.py): per
    step, adjacent-pair counts over the current symbol tables, the
    (count desc, left, right) election, and the double-separator literal
    `replace` merge — the same greedy left-to-right semantics Spark runs,
    so every step's elected pair and count match bit-for-bit."""
    parts = []
    for i in range(1, n_merges + 1):
        p = i - 1
        parts.append(
            f"""
    p{i} AS (
      SELECT syms[u.gi] AS l, syms[u.gi + 1] AS r, sum(cnt)::BIGINT AS c
      FROM (SELECT cnt, string_split(trim(s, ' '), '  ') AS syms FROM s{p}),
           UNNEST(generate_series(1, len(syms) - 1)) AS u(gi)
      GROUP BY 1, 2
    ),
    b{i} AS MATERIALIZED (
      SELECT {i}::BIGINT AS step, l, r, c
      FROM p{i} ORDER BY c DESC, l, r LIMIT 1
    ),
    s{i} AS MATERIALIZED (
      SELECT word, cnt,
             replace(s, ' ' || b.l || '  ' || b.r || ' ',
                        ' ' || b.l || b.r || ' ') AS s
      FROM s{p} CROSS JOIN b{i} b
    )"""
        )
    return ",".join(parts)


_BPE_WORDS_CTES = r"""
    bpe_words AS MATERIALIZED (
      SELECT w AS word, count(*)::BIGINT AS cnt
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
            FROM documents
            WHERE text IS NOT NULL AND trim(text) != '')
      WHERE w != '' AND regexp_matches(w, '^[ -~]+$')
      GROUP BY 1
    ),
    s0 AS MATERIALIZED (
      SELECT word, cnt,
             ' ' || array_to_string(
                      list_append(string_split(word, ''), '</w>'), '  ') || ' ' AS s
      FROM bpe_words
    )"""


@_register(
    "docs_bpe_merges",
    f"""
    WITH {_BPE_WORDS_CTES},
    {_bpe_iter_ctes(8)}
    SELECT step, l AS merge_left, r AS merge_right, c AS pair_count
    FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2 UNION ALL
          SELECT * FROM b3 UNION ALL SELECT * FROM b4 UNION ALL
          SELECT * FROM b5 UNION ALL SELECT * FROM b6 UNION ALL
          SELECT * FROM b7 UNION ALL SELECT * FROM b8)
    ORDER BY step
    """,
)
def docs_bpe_merges(spark, sf_dir):
    """BPE vocabulary learning (bpe.bpe_train, Sennrich et al. 2016):
    the first 8 merges learned from the documents corpus — per step the
    elected (left, right) pair and its corpus frequency, ties broken
    (count desc, left, right). The oracle replays the whole trajectory:
    word-frequency table, char+</w> init, per-step pair counts, election,
    and the greedy double-separator replace merge, bit-for-bit.

    Scale shape: the corpus is touched ONCE (word_counts groupBy down to
    the vocabulary); every merge iteration runs on the vocab-sized table
    — one pair-count groupBy + a 1-row TakeOrdered election per step,
    localCheckpoint truncating lineage. Driver state = num_merges rows."""
    from shovel_spark.operators.bpe import bpe_train, word_counts

    d = _t(spark, sf_dir, "documents")
    merges, _ = bpe_train(spark, word_counts(d), num_merges=8)
    return merges.select(
        "step",
        F.col("left").alias("merge_left"),
        F.col("right").alias("merge_right"),
        "pair_count",
    )


def _bpe_encode_sql(n_merges: int) -> str:
    """Chained-replace SQL expression encoding one word `w` with the
    learned merges b1..bN in training order (bpe.bpe_segment's unrolled
    form, including the opaque-symbol fallback for non-ASCII words)."""
    expr = (
        "' ' || array_to_string(list_append("
        "CASE WHEN regexp_matches(w, '^[ -~]+$') THEN string_split(w, '')"
        " ELSE [w] END, '</w>'), '  ') || ' '"
    )
    for i in range(1, n_merges + 1):
        expr = (
            f"replace({expr},"
            f" ' ' || (SELECT l FROM b{i}) || '  ' || (SELECT r FROM b{i}) || ' ',"
            f" ' ' || (SELECT l FROM b{i}) || (SELECT r FROM b{i}) || ' ')"
        )
    return f"string_split(trim({expr}, ' '), '  ')"


@_register(
    "docs_bpe_fertility",
    f"""
    WITH {_BPE_WORDS_CTES},
    {_bpe_iter_ctes(8)},
    enc AS (
      SELECT doc_id, {_bpe_encode_sql(8)} AS toks
      FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
            WHERE text IS NOT NULL AND doc_id IS NOT NULL AND trim(text) != '')
      WHERE w != ''
    )
    SELECT doc_id, count(*)::BIGINT AS n_words, sum(len(toks))::BIGINT AS n_tokens,
           round(sum(len(toks))::DOUBLE / count(*), 6) AS fertility
    FROM enc GROUP BY 1
    ORDER BY doc_id
    """,
)
def docs_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility audit (bpe.bpe_segment): train 8 BPE merges on
    the corpus, segment every document with them, and report per-doc
    word count, subword token count, and fertility (tokens/word) — the
    standard tokenizer-efficiency metric a data pipeline tracks when
    reporting token budgets. The oracle replays training AND the unrolled
    chained-replace encoding.

    Scale shape: training as in docs_bpe_merges; segmentation is ONE
    map-only codegen projection (merges collected — 8 bounded rows —
    and unrolled into nested literal replaces inside a transform
    lambda), no shuffle beyond the final per-doc aggregate."""
    from shovel_spark.operators.bpe import bpe_segment, bpe_train, word_counts

    d_all = _t(spark, sf_dir, "documents")
    # train on the SAME corpus the oracle's bpe_words CTE sees (text-only
    # filter, inside word_counts); the doc_id filter applies only to the
    # per-doc output side
    merges, _ = bpe_train(spark, word_counts(d_all), num_merges=8)
    d = d_all.filter(
        F.col("text").isNotNull()
        & F.col("doc_id").isNotNull()
        & (F.trim("text") != "")
    )
    seg = bpe_segment(d, merges)
    n_words = F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda w: w != ""))
    return (
        seg.select(
            "doc_id",
            n_words.alias("n_words"),
            F.size("bpe_tokens").alias("n_tokens"),
        )
        .withColumn(
            "fertility",
            F.round(F.col("n_tokens").cast("double") / F.col("n_words"), 6),
        )
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "fertility",
        )
    )


@_register(
    "docs_tokenize_pack",
    f"""
    WITH {_BPE_WORDS_CTES},
    {_bpe_iter_ctes(8)},
    enc AS (
      SELECT doc_id, {_bpe_encode_sql(8)} AS toks
      FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
            WHERE text IS NOT NULL AND doc_id IS NOT NULL AND trim(text) != '')
      WHERE w != ''
    ),
    ntok AS (
      SELECT doc_id, sum(len(toks))::BIGINT AS n_tokens FROM enc GROUP BY 1
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS tok_start
      FROM ntok
    )
    SELECT doc_id, n_tokens, tok_start,
           tok_start // 256 AS first_block,
           (tok_start + greatest(n_tokens, 1) - 1) // 256 AS last_block,
           (tok_start + greatest(n_tokens, 1) - 1) // 256
             - tok_start // 256 + 1 AS n_blocks
    FROM c ORDER BY doc_id
    """,
)
def docs_tokenize_pack(spark, sf_dir):
    """Token-pipeline capstone: learn a BPE vocabulary on the corpus
    (bpe_train, 8 merges), segment every document with it (bpe_segment,
    one codegen map projection), then lay the SUBWORD stream into fixed
    256-token training blocks (sampling.pack_blocks) — the end-to-end
    learn-vocab -> tokenize -> pack chain an autoregressive pretraining
    data pipeline runs. The oracle replays all three phases: the merge
    trajectory, the unrolled chained-replace encoding, and the global
    offset/block arithmetic (exact integers throughout).

    Scale shape: training iterates on the vocab-sized word table;
    segmentation is map-only; packing is ONE distributed_cumsum (range
    exchange + 8-row driver offset table) — no global window, nothing
    corpus-sized on the driver."""
    from shovel_spark.operators.bpe import bpe_segment, bpe_train, word_counts
    from shovel_spark.operators.sampling import pack_blocks

    d_all = _t(spark, sf_dir, "documents")
    # train on the oracle's corpus (text-only filter); doc_id filter is
    # output-side only — see docs_bpe_fertility
    merges, _ = bpe_train(spark, word_counts(d_all), num_merges=8)
    d = d_all.filter(
        F.col("text").isNotNull()
        & F.col("doc_id").isNotNull()
        & (F.trim("text") != "")
    )
    seg = bpe_segment(d, merges).withColumn(
        "n_tokens", F.size("bpe_tokens").cast("long")
    )
    p = pack_blocks(seg, "n_tokens", block_len=256, num_partitions=8)
    return p.select(
        "doc_id", "n_tokens", "tok_start", "first_block", "last_block", "n_blocks"
    ).orderBy("doc_id")


def _lr_iter_ctes(n_iters: int, lr: float = 2.0) -> str:
    """DuckDB CTE replay of logreg_fit iterations (operators/classify.py):
    same op order, same per-iteration 6-dp rounding of weights and bias, so
    the trajectory matches the Spark fit exactly (the kmeans/pagerank
    parity recipe — rounding absorbs accumulation-order and exp() ULP
    noise)."""
    parts = []
    for i in range(1, n_iters + 1):
        p = i - 1
        parts.append(
            f"""
    dot{i} AS (
      SELECT f.doc_id, sum(f.x * w.w) AS dot
      FROM feats f JOIN w{p} w ON f.bucket = w.bucket GROUP BY 1
    ),
    resid{i} AS (
      SELECT l.doc_id,
             1.0 / (1.0 + exp(-(coalesce(d.dot, 0.0) + (SELECT b FROM b{p})))) - l.y AS r
      FROM labels l LEFT JOIN dot{i} d ON l.doc_id = d.doc_id
    ),
    grad{i} AS (
      SELECT f.bucket, sum(r.r * f.x) AS g
      FROM feats f JOIN resid{i} r ON f.doc_id = r.doc_id GROUP BY 1
    ),
    w{i} AS MATERIALIZED (
      SELECT w.bucket,
             round(w.w - {lr} * coalesce(g.g, 0.0) / (SELECT n FROM nn), 6) AS w
      FROM w{p} w LEFT JOIN grad{i} g ON w.bucket = g.bucket
    ),
    b{i} AS MATERIALIZED (
      SELECT round((SELECT b FROM b{p})
                   - {lr} * (SELECT sum(r) FROM resid{i}) / (SELECT n FROM nn), 6) AS b
    )"""
        )
    return ",".join(parts)


@_register(
    "docs_logreg_weights",
    f"""
    WITH src AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 1 THEN text || ' posmarker' ELSE text END AS text,
             CAST(doc_id % 2 AS DOUBLE) AS y
      FROM documents
      WHERE text IS NOT NULL AND doc_id IS NOT NULL AND trim(text) != ''
    ),
    labels AS (SELECT doc_id, y FROM src),
    nn AS (SELECT count(*) AS n FROM labels),
    tok AS (
      SELECT doc_id, len(w) AS n, unnest(w) AS t
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM src)
    ),
    feats AS MATERIALIZED (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 15))::BIGINT % 64 AS INT) AS bucket,
             count(*) * 1.0 / any_value(n) AS x
      FROM tok GROUP BY doc_id, 2
    ),
    w0 AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS bucket, 0.0::DOUBLE AS w),
    b0 AS (SELECT 0.0::DOUBLE AS b),
    {{_LR_CTES}}
    SELECT bucket, round(w, 4) AS weight FROM w3
    UNION ALL
    SELECT -1, round((SELECT b FROM b3), 4)
    ORDER BY bucket
    """.replace("{_LR_CTES}", _lr_iter_ctes(3)),
)
def docs_logreg_weights(spark, sf_dir):
    """Distributed logistic regression (operators/classify.py) — the
    model-based quality/language-filter tier, MLlib-free: hashed
    bag-of-words features (sparse (doc, bucket, x) rows; text never enters
    the loop), 3 full-batch GD iterations with broadcast weights and
    map-side gradients (two key-shuffles per iteration, dim+1 rows to the
    driver). A planted marker token on odd doc_ids makes the signal
    learnable; the returned weights show the fit. The oracle replays every
    iteration as CTEs with the identical op order and per-iteration 6-dp
    rounding (kmeans/pagerank parity recipe)."""
    from shovel_spark.operators.classify import hashed_features, logreg_fit

    d = (
        _t(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & F.col("doc_id").isNotNull()
            & (F.trim(F.col("text")) != "")
        )
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 1, F.concat(F.col("text"), F.lit(" posmarker"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
            (F.col("doc_id") % 2).cast("double").alias("y"),
        )
    )
    feats = hashed_features(d, dim=64, family="md5")
    weights = logreg_fit(
        feats, d.select("doc_id", "y"), dim=64, iters=3, lr=2.0
    )
    rows = [(i, round(w, 4)) for i, w in enumerate(weights[:64])] + [
        (-1, round(weights[64], 4))
    ]
    return local_rows_df(spark, rows, "bucket int, weight double")


def _pr_iter_ctes(n_iters: int) -> str:
    """DuckDB CTE replay of pagerank iterations (operators/graph.py): same
    float op order as the Spark expression so doubles agree bit-for-bit up
    to sum-order noise (final masses rounded to 4dp)."""
    parts = []
    for i in range(1, n_iters + 1):
        p = f"r{i - 1}"
        parts.append(
            f"""
    d{i} AS (
      SELECT coalesce(sum(r.rank), 0.0::DOUBLE) AS dmass
      FROM {p} r LEFT JOIN outdeg o ON r.node = o.src WHERE o.src IS NULL
    ),
    c{i} AS (
      SELECT e.dst AS node, sum(r.rank / o.deg) AS contrib
      FROM edges e JOIN {p} r ON e.src = r.node JOIN outdeg o ON e.src = o.src
      GROUP BY 1
    ),
    r{i} AS MATERIALIZED (
      SELECT nd.node,
             (1.0::DOUBLE - 0.85::DOUBLE) / nn.n
             + 0.85::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE) + d{i}.dmass / nn.n) AS rank
      FROM nodes nd CROSS JOIN nn CROSS JOIN d{i} LEFT JOIN c{i} c ON nd.node = c.node
    )"""
        )
    return ",".join(parts)


@_register(
    "docs_pagerank_mass",
    f"""
    WITH params AS (SELECT count(*) AS n FROM documents),
    edges AS MATERIALIZED (
      SELECT doc_id AS src, (doc_id * 31 + j * 17) % n AS dst
      FROM documents CROSS JOIN params CROSS JOIN (SELECT unnest([1, 2, 3]) AS j)
      WHERE doc_id % 10 != 0 AND (doc_id * 31 + j * 17) % n != doc_id
    ),
    outdeg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, 1.0::DOUBLE / nn.n AS rank FROM nodes CROSS JOIN nn
    ),
    {_pr_iter_ctes(3)}
    SELECT d.source, count(*) AS n_nodes, round(sum(r.rank), 4) AS mass
    FROM r3 r JOIN documents d ON r.node = d.doc_id
    GROUP BY 1
    """,
)
def docs_pagerank_mass(spark, sf_dir):
    """Link-graph PageRank (operators/graph.py): a deterministic synthetic
    link graph over the corpus (3 out-links per page via modular hop;
    every 10th page dangling), 3 power iterations with uniform dangling
    redistribution, then rank mass per source domain — the link-authority
    prior a web-corpus sampler weights by. The oracle replays every
    iteration as a CTE with the identical float op order."""
    from shovel_spark.operators.graph import pagerank

    d = _t(spark, sf_dir, "documents")
    n1 = d.agg(F.count("*").alias("__n"))
    edges = (
        d.filter(F.col("doc_id") % 10 != 0)
        .crossJoin(F.broadcast(n1))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        F.pmod(F.col("doc_id") * 31 + j * 17, F.col("__n"))
                        for j in (1, 2, 3)
                    ]
                )
            ).alias("dst"),
        )
        .filter(F.col("dst") != F.col("src"))
    )
    ranks = pagerank(edges, iters=3, damping=0.85)
    return (
        ranks.join(d.select("doc_id", "source"), ranks["node"] == F.col("doc_id"))
        .groupBy("source")
        .agg(F.count("*").alias("n_nodes"), F.round(F.sum("rank"), 4).alias("mass"))
    )


@_register(
    "docs_quota_sample",
    """
    SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source ORDER BY md5('7:' || doc_id), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= 7
    GROUP BY 1
    """,
)
def docs_quota_sample(spark, sf_dir):
    """Per-domain quota cap (sampling.quota_sample, md5 family): at most 7
    docs per source, chosen by id-hash order — deterministic domain
    balancing (no hot domain dominates the mix). id_sum proves the exact
    kept ROW SET matches, not just the counts. Compiles to WindowGroupLimit
    (per-partition top-k before the shuffle)."""
    from shovel_spark.operators.sampling import quota_sample

    d = _t(spark, sf_dir, "documents")
    q = quota_sample(d, "source", 7, family="md5")
    return q.groupBy("source").agg(
        F.count("*").alias("n_kept"), F.sum("doc_id").alias("id_sum")
    )


@_register(
    "docs_pack_shards",
    """
    WITH toks AS (
      SELECT doc_id,
             ('0x' || substr(md5('7:' || doc_id), 1, 15))::BIGINT % 8 AS bucket,
             md5('7:' || doc_id) AS ord_key,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
      FROM documents
    ),
    cum AS (
      SELECT bucket, n_tok,
             coalesce(sum(n_tok) OVER (
               PARTITION BY bucket ORDER BY ord_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cb
      FROM toks
    ),
    per AS (
      SELECT bucket, CAST(floor(cb / 2000) AS BIGINT) AS seq,
             count(*) AS nd, sum(n_tok) AS tk
      FROM cum GROUP BY 1, 2
    )
    SELECT bucket AS shard_bucket, count(*) AS n_shards,
           CAST(sum(nd) AS BIGINT) AS n_docs,
           CAST(sum(tk) AS BIGINT) AS total_tokens,
           CAST(max(tk) AS BIGINT) AS max_shard_tokens
    FROM per GROUP BY 1
    """,
)
def docs_pack_shards(spark, sf_dir):
    """Token-budget shard packing (sampling.pack_shards, md5 family):
    concatenate-then-chunk into ~2000-token training shards inside 8 hash
    buckets, then per-bucket shard stats — the deterministic shard layout a
    trainer consumes. Pure integer math: exact cross-engine parity. The
    only window is per-bucket (num_buckets bounds the widest sort at
    100 TB)."""
    from shovel_spark.functions.textstats import token_count
    from shovel_spark.operators.sampling import pack_shards

    d = _t(spark, sf_dir, "documents").withColumn(
        "n_tok", token_count(F.col("text")).cast("long")
    )
    p = pack_shards(d, "n_tok", budget=2000, num_buckets=8, family="md5")
    per = p.groupBy("shard_bucket", "shard_seq").agg(
        F.count("*").alias("nd"), F.sum("n_tok").alias("tk")
    )
    return per.groupBy("shard_bucket").agg(
        F.count("*").alias("n_shards"),
        F.sum("nd").alias("n_docs"),
        F.sum("tk").alias("total_tokens"),
        F.max("tk").alias("max_shard_tokens"),
    )


@_register(
    "docs_pack_blocks",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tok,
             CAST(coalesce(sum(n_tok) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS tok_start
      FROM t
    )
    SELECT doc_id, tok_start,
           tok_start // 512 AS first_block,
           (tok_start + greatest(n_tok, 1) - 1) // 512 AS last_block,
           tok_start % 512 AS offset_in_block,
           (tok_start + greatest(n_tok, 1) - 1) // 512
             - tok_start // 512 + 1 AS n_blocks
    FROM c ORDER BY doc_id
    """,
)
def docs_pack_blocks(spark, sf_dir):
    """GPT-style concat-then-chunk sequence packing (sampling.pack_blocks):
    every document's whitespace-token count is laid into ONE global token
    stream in doc_id order and cut into fixed 512-token training blocks,
    documents spanning block boundaries. The Spark side computes the global
    start offsets with distributed_cumsum (range exchange + per-partition
    windows + an 8-row driver offset table — NO single-partition global
    window); the oracle replays the same offsets with a plain global window
    cumsum, which DuckDB can afford at sf0.01. Pure integer arithmetic
    (offsets far below 2^52, so the floor-divide is exact): every offset,
    block id, and span matches bit-for-bit."""
    from shovel_spark.functions.textstats import token_count
    from shovel_spark.operators.sampling import pack_blocks

    d = _t(spark, sf_dir, "documents").withColumn(
        "n_tok", token_count(F.col("text")).cast("long")
    )
    p = pack_blocks(d, "n_tok", block_len=512, num_partitions=8)
    return p.select(
        "doc_id", "tok_start", "first_block", "last_block",
        "offset_in_block", "n_blocks",
    ).orderBy("doc_id")


from shovel_spark.functions.urls import _URL_RE as _URL_ORACLE_RE  # noqa: E402
from shovel_spark.functions.urls import tracking_drop_sql as _tracking_drop_sql  # noqa: E402


@_register(
    "docs_canonical_urls",
    f"""
    WITH raw AS (
      SELECT source,
             'https://' || source || '.example.com/p/' || doc_id
               || '/?b=2&a=1&utm_source=feed' AS u
      FROM documents
      UNION ALL
      SELECT source,
             CASE WHEN doc_id % 50 = 0 THEN 'not a url'
                  ELSE 'HTTPS://' || source || '.EXAMPLE.com:443/p/' || doc_id
                       || '?a=1&fbclid=' || doc_id || '&b=2#x' END AS u
      FROM documents
    ),
    parsed AS MATERIALIZED (
      SELECT source, u,
             lower(regexp_extract(u, '{_URL_ORACLE_RE}', 1)) AS scheme,
             lower(regexp_replace(regexp_extract(u, '{_URL_ORACLE_RE}', 2),
                                  '^[^@]*@', '')) AS host0,
             regexp_replace(regexp_extract(u, '{_URL_ORACLE_RE}', 3), '/+$', '') AS path,
             coalesce(array_to_string(list_sort(list_filter(
               string_split(regexp_extract(u, '{_URL_ORACLE_RE}', 4), '&'),
               p -> p != '' AND NOT ({_tracking_drop_sql()}))), '&'), '') AS q
      FROM raw
    ),
    hosted AS (
      SELECT source, scheme, path, q,
             CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
                  WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
                  ELSE host0 END AS host
      FROM parsed
    ),
    canon AS MATERIALIZED (
      SELECT source,
             CASE WHEN host = '' THEN NULL
                  WHEN q = '' THEN scheme || '://' || host || path
                  ELSE scheme || '://' || host || path || '?' || q END AS c,
             array_to_string(list_reverse(string_split(host, '.')), '.') AS s
      FROM hosted
    )
    SELECT source,
           count(*) AS n_raw,
           CAST(count(CASE WHEN c IS NULL THEN 1 END) AS BIGINT) AS n_bad,
           count(DISTINCT c) AS n_canon,
           count(DISTINCT CASE WHEN c IS NOT NULL THEN s END) AS n_surt,
           CAST(sum(length(c)) AS BIGINT) AS len_sum
    FROM canon GROUP BY 1
    """,
)
def docs_canonical_urls(spark, sf_dir):
    """URL canonicalization (functions/urls.py): two noisy crawl variants of
    every page (tracking params, mixed-case host, default port, fragment,
    trailing slash — plus some unparseable rows) must collapse to ONE
    canonical key per page; per-source raw/bad/canonical/SURT counts and a
    length checksum prove the exact canonical strings match. Map-only
    codegen expressions — the first dedup stage of a crawl fuses into the
    scan."""
    from shovel_spark.functions.urls import canonical_url, surt_host

    d = _t(spark, sf_dir, "documents")
    va = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/p/"), F.col("doc_id"),
        F.lit("/?b=2&a=1&utm_source=feed"),
    )
    vb = F.when(F.col("doc_id") % 50 == 0, F.lit("not a url")).otherwise(
        F.concat(
            F.lit("HTTPS://"), F.col("source"), F.lit(".EXAMPLE.com:443/p/"),
            F.col("doc_id"), F.lit("?a=1&fbclid="), F.col("doc_id"), F.lit("&b=2#x"),
        )
    )
    raw = d.select("source", F.explode(F.array(va, vb)).alias("u"))
    canon = raw.select(
        "source",
        canonical_url(F.col("u")).alias("c"),
        surt_host(F.col("u")).alias("s"),
    )
    return canon.groupBy("source").agg(
        F.count("*").alias("n_raw"),
        F.count(F.when(F.col("c").isNull(), 1)).alias("n_bad"),
        F.count_distinct(F.col("c")).alias("n_canon"),
        F.count_distinct(F.when(F.col("c").isNotNull(), F.col("s"))).alias("n_surt"),
        F.sum(F.length("c")).alias("len_sum"),
    )


@_register(
    "pages_snapshot_diff",
    """
    WITH old AS (
      SELECT 'p/' || doc_id AS url, md5(text) AS fp
      FROM documents
    ),
    newer AS (
      SELECT 'p/' || doc_id AS url,
             md5(CASE WHEN doc_id % 3 = 0 THEN 'v2 ' || text ELSE text END) AS fp
      FROM documents WHERE doc_id % 5 != 0
      UNION ALL
      SELECT 'p/' || (doc_id + 100000), md5(text)
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT CASE WHEN o.fp IS NULL THEN 'added'
                WHEN n.fp IS NULL THEN 'removed'
                WHEN o.fp = n.fp THEN 'unchanged'
                ELSE 'changed' END AS status,
           count(*) AS n
    FROM old o FULL OUTER JOIN newer n ON o.url = n.url
    GROUP BY 1
    """,
)
def pages_snapshot_diff(spark, sf_dir):
    """Crawl-delta report (operators/merge.py snapshot_diff): a re-crawl
    changes every 3rd page, drops every 5th, discovers new urls for every
    7th; the diff classifies every url as added / removed / changed /
    unchanged from content fingerprints — refresh-rate and churn
    accounting for recurring crawls. One full-outer key-join; fingerprints
    shuffle, content never does."""
    from shovel_spark.operators.merge import snapshot_diff

    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("p/"), F.col("doc_id"))
    old = d.select(url.alias("url"), F.col("text"))
    newer = (
        d.filter(F.col("doc_id") % 5 != 0)
        .select(
            url.alias("url"),
            F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("v2 "), F.col("text")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 0).select(
                F.concat(F.lit("p/"), F.col("doc_id") + 100000).alias("url"),
                "text",
            )
        )
    )
    diff = snapshot_diff(old, newer, "url", F.md5("text"))
    return diff.groupBy("status").agg(F.count("*").alias("n"))


@_register(
    "pages_snapshot_upsert",
    """
    WITH old AS (
      SELECT 'https://' || source || '.example.com/p/' || doc_id AS url,
             1000 AS ts, text, source
      FROM documents
    ),
    newer AS (
      SELECT 'https://' || source || '.example.com/p/' || doc_id AS url,
             2000 AS ts, 'v2 ' || text AS text, source
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT 'https://' || source || '.example.com/p/' || (doc_id + 100000) AS url,
             2000 AS ts, text, source
      FROM documents WHERE doc_id % 7 = 0
    ),
    tagged AS (
      SELECT *, 0 AS origin FROM old
      UNION ALL
      SELECT *, 1 AS origin FROM newer
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY url ORDER BY ts DESC, origin DESC, text
      ) AS rn FROM tagged
    )
    SELECT source, count(*) AS n_urls,
           CAST(count(CASE WHEN ts = 2000 THEN 1 END) AS BIGINT) AS n_from_new,
           CAST(sum(length(text)) AS BIGINT) AS text_len_sum
    FROM ranked WHERE rn = 1
    GROUP BY 1
    """,
)
def pages_snapshot_upsert(spark, sf_dir):
    """Recurring-crawl snapshot merge (operators/merge.py upsert_latest —
    the Iceberg MERGE INTO analog): a re-crawl updates every 3rd page and
    discovers new urls; keep-latest-per-url must yield exactly one row per
    url with re-crawled text winning. Per-source counts + text length
    checksum prove the exact surviving row set. One key-shuffle,
    WindowGroupLimit (plan-asserted in test_merge)."""
    from shovel_spark.operators.merge import upsert_latest

    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/p/"), F.col("doc_id"))
    old = d.select(url.alias("url"), F.lit(1000).alias("ts"), "text", "source")
    newer = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select(
            url.alias("url"),
            F.lit(2000).alias("ts"),
            F.concat(F.lit("v2 "), F.col("text")).alias("text"),
            "source",
        )
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 0).select(
                F.concat(
                    F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
                    F.col("doc_id") + 100000,
                ).alias("url"),
                F.lit(2000).alias("ts"),
                "text",
                "source",
            )
        )
    )
    merged = upsert_latest(old, newer, "url", "ts", tiebreak="text")
    return merged.groupBy("source").agg(
        F.count("*").alias("n_urls"),
        F.count(F.when(F.col("ts") == 2000, 1)).alias("n_from_new"),
        F.sum(F.length("text")).alias("text_len_sum"),
    )


@_register(
    "docs_lang_rebalance",
    """
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
    w AS (
      SELECT lang, n, CAST(floor(sqrt(n) * 1000 + 0.5) AS BIGINT) AS wq
      FROM counts
    ),
    z AS (SELECT sum(wq) AS z FROM w),
    cut AS (
      SELECT lang,
             CAST(floor(least(1.0, 150 * wq / z.z / n) * 10000 + 0.5) AS BIGINT)
               AS cutoff
      FROM w CROSS JOIN z
    )
    SELECT d.lang, count(*) AS n_kept, CAST(sum(d.doc_id) AS BIGINT) AS id_sum
    FROM documents d JOIN cut c ON d.lang = c.lang
    WHERE ('0x' || substr(md5('7:' || d.doc_id), 1, 15))::BIGINT % 10000 < c.cutoff
    GROUP BY 1
    """,
)
def docs_lang_rebalance(spark, sf_dir):
    """Temperature-based data mixing (sampling.temperature_fractions α=0.5 +
    stratified_hash_sample, md5 family): rebalance the skewed language
    distribution toward a 150-doc target — head languages downsampled, tail
    kept whole. Weights are integer-quantized (sqrt·1000) so the weight sum
    is exact and the oracle replays the identical IEEE float chain; id_sum
    proves the exact kept row set. Only the k-row count summary crosses to
    the driver (k-means budget); the sample filter is map-only."""
    from shovel_spark.operators.sampling import (
        stratified_hash_sample,
        temperature_fractions,
    )

    d = _t(spark, sf_dir, "documents")
    counts = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    fracs = temperature_fractions(counts, target_total=150, alpha=0.5)
    s = stratified_hash_sample(d, "lang", fracs, family="md5")
    return s.groupBy("lang").agg(
        F.count("*").alias("n_kept"), F.sum("doc_id").alias("id_sum")
    )


@_register(
    "docs_crawl_refresh",
    """
    WITH old_snap AS (
      SELECT 'https://' || source || '.example.com/p/' || doc_id
               || '/?b=2&a=1&utm_source=feed' AS u,
             1000 AS ts, text, source, lang
      FROM documents
    ),
    new_snap AS (
      SELECT 'HTTPS://' || source || '.EXAMPLE.com:443/p/' || doc_id
               || '?a=1&b=2&fbclid=x#f' AS u,
             2000 AS ts, 'v2 ' || text AS text, source, lang
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT 'https://' || source || '.example.com/p/' || (doc_id + 100000)
               || '/?b=2&a=1&utm_source=feed' AS u,
             2000 AS ts, text, source, lang
      FROM documents WHERE doc_id % 7 = 0
    ),
    tagged AS (
      SELECT *, 0 AS origin FROM old_snap
      UNION ALL
      SELECT *, 1 AS origin FROM new_snap
    ),
    parsed AS (
      SELECT ts, text, source, lang, origin,
             lower(regexp_extract(u, '{RE}', 1)) AS scheme,
             lower(regexp_replace(regexp_extract(u, '{RE}', 2),
                                  '^[^@]*@', '')) AS host0,
             regexp_replace(regexp_extract(u, '{RE}', 3), '/+$', '') AS path,
             coalesce(array_to_string(list_sort(list_filter(
               string_split(regexp_extract(u, '{RE}', 4), '&'),
               p -> p != '' AND NOT ({DROP}))), '&'), '') AS q
      FROM tagged
    ),
    canon AS MATERIALIZED (
      SELECT ts, text, source, lang, origin,
             CASE WHEN q = '' THEN scheme || '://' || host || path
                  ELSE scheme || '://' || host || path || '?' || q END AS curl
      FROM (
        SELECT *, CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
                       WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
                       ELSE host0 END AS host
        FROM parsed
      ) WHERE host != ''
    ),
    merged AS MATERIALIZED (
      SELECT curl, ts, text, source, lang FROM (
        SELECT *, row_number() OVER (
          PARTITION BY curl ORDER BY ts DESC, origin DESC, text
        ) AS rn FROM canon
      ) WHERE rn = 1
    ),
    quota AS MATERIALIZED (
      SELECT curl, text, source, lang FROM (
        SELECT *, row_number() OVER (
          PARTITION BY source ORDER BY md5('7:' || curl), curl
        ) AS rn FROM merged
      ) WHERE rn <= 15
    ),
    counts AS (SELECT lang, count(*) AS n FROM quota GROUP BY 1),
    w AS (
      SELECT lang, n, CAST(floor(sqrt(n) * 1000 + 0.5) AS BIGINT) AS wq
      FROM counts
    ),
    z AS (SELECT sum(wq) AS z FROM w),
    cut AS (
      SELECT lang,
             CAST(floor(least(1.0, 200 * wq / z.z / n) * 10000 + 0.5) AS BIGINT)
               AS cutoff
      FROM w CROSS JOIN z
    )
    SELECT q.lang, count(*) AS n_pages,
           count(DISTINCT q.source) AS n_sources,
           CAST(sum(length(q.text)) AS BIGINT) AS text_len_sum
    FROM quota q JOIN cut c ON q.lang = c.lang
    WHERE ('0x' || substr(md5('7:' || q.curl), 1, 15))::BIGINT % 10000 < c.cutoff
    GROUP BY 1
    """.replace("{RE}", _URL_ORACLE_RE).replace("{DROP}", _tracking_drop_sql()),
)
def docs_crawl_refresh(spark, sf_dir):
    """CAPSTONE crawl-management composite — the recurring-crawl refresh a
    web corpus runs every snapshot, chaining this round's operators:
    noisy re-crawl URLs → canonical_url (variants collapse to one key) →
    upsert_latest (re-crawled text wins) → quota_sample (≤15 pages per
    source domain) → temperature mixing (α=0.5 toward a 200-page target).
    One DuckDB oracle replays all five stages; per-lang counts, source
    spread, and a text checksum pin the exact surviving rows."""
    from shovel_spark.functions.urls import canonical_url
    from shovel_spark.operators.merge import upsert_latest
    from shovel_spark.operators.sampling import (
        quota_sample,
        stratified_hash_sample,
        temperature_fractions,
    )

    d = _t(spark, sf_dir, "documents")
    old_u = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/p/"), F.col("doc_id"),
        F.lit("/?b=2&a=1&utm_source=feed"),
    )
    old = d.select(old_u.alias("u"), F.lit(1000).alias("ts"), "text", "source", "lang")
    upd_u = F.concat(
        F.lit("HTTPS://"), F.col("source"), F.lit(".EXAMPLE.com:443/p/"),
        F.col("doc_id"), F.lit("?a=1&b=2&fbclid=x#f"),
    )
    ins_u = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
        F.col("doc_id") + 100000, F.lit("/?b=2&a=1&utm_source=feed"),
    )
    newer = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select(
            upd_u.alias("u"), F.lit(2000).alias("ts"),
            F.concat(F.lit("v2 "), F.col("text")).alias("text"), "source", "lang",
        )
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 0).select(
                ins_u.alias("u"), F.lit(2000).alias("ts"), "text", "source", "lang"
            )
        )
    )
    canonize = lambda s: (  # noqa: E731
        s.withColumn("curl", canonical_url(F.col("u")))
        .filter(F.col("curl").isNotNull())
        .drop("u")
    )
    merged = upsert_latest(canonize(old), canonize(newer), "curl", "ts", tiebreak="text")
    quota = quota_sample(merged, "source", 15, id_col="curl", family="md5").localCheckpoint()
    counts = {r["lang"]: r["n"] for r in quota.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    fracs = temperature_fractions(counts, target_total=200, alpha=0.5)
    mixed = stratified_hash_sample(quota, "lang", fracs, id_col="curl", family="md5")
    return mixed.groupBy("lang").agg(
        F.count("*").alias("n_pages"),
        F.count_distinct("source").alias("n_sources"),
        F.sum(F.length("text")).alias("text_len_sum"),
    )


@_register(
    "docs_ngram_commonness",
    """
    WITH toks AS MATERIALIZED (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w) - 1, 1) + 1),
                    i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS gram
      FROM toks
    ),
    keyed AS MATERIALIZED (
      SELECT doc_id,
             ('0x' || substr(md5('7:' || gram), 1, 15))::BIGINT AS gk
      FROM grams WHERE doc_id IS NOT NULL
    ),
    counts AS (SELECT gk, count(*) AS cnt FROM keyed GROUP BY 1),
    per_doc AS (
      SELECT k.doc_id, sum(c.cnt) / count(*) AS commonness
      FROM keyed k JOIN counts c ON k.gk = c.gk
      GROUP BY 1
    )
    SELECT d.lang, count(*) AS n_docs, round(avg(p.commonness), 4) AS avg_common,
           round(max(p.commonness), 4) AS max_common
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    GROUP BY 1
    """,
)
def docs_ngram_commonness(spark, sf_dir):
    """Corpus-statistical quality tier (operators/quality.py): score every
    doc by the mean corpus frequency of its bigrams (the corpus is the
    model — the IDF-shaped two-pass between heuristics and a real LM),
    then per-lang count/avg/max. Grams shuffle as 8-byte md5-family hashes
    (never strings); per-doc math is exact integers until one division, so
    the oracle replays the join bit-for-bit."""
    from shovel_spark.operators.quality import ngram_commonness

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = ngram_commonness(d, family="md5")
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("commonness"), 4).alias("avg_common"),
        F.round(F.max("commonness"), 4).alias("max_common"),
    )
