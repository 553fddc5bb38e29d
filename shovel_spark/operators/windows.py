"""Reusable event-time window operators — sessionization and as-of joins.

SURVEY.md §2.8 additions beyond the reference (node-shovel processes one
message at a time and has no event-time semantics at all — reference:
src/core/processor.js handles each message independently). These are the
batch forms; the streaming analogs live in streaming/stateful.py
(applyInPandasWithState session windows).

Both are single-shuffle per key group: one hash exchange on the key
columns, then sort-within-partition window work — no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from shovel_spark.session import local_rows_df
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort on this type (maps cannot be sort keys;
    arrays/structs are orderable iff their element/field types are)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key session id: a new session starts when the gap from
    the previous event exceeds ``gap_seconds`` (classic inactivity
    sessionization, lag + cumulative sum — one shuffle on the keys).

    ``order_cols`` breaks ties among equal timestamps deterministically
    (pass a unique id column). Session ids are 1-based and contiguous per
    key; ``max(session_id)`` is the key's session count. Gap comparison is
    at microsecond precision — a seconds-truncating cast can disagree with
    an INTERVAL comparison at exact boundaries.
    """
    order = [ts_col, *(order_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    gap_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    new_session = F.when(prev.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    cum = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(cum))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join (pandas ``merge_asof`` semantics): each left row
    gets the ``value_cols`` of the LATEST right row with
    ``right_ts <= left_ts`` for the same key, or NULL when none precedes.

    Scale-correct distributed form — union-tag, NOT a range join: tag both
    sides, union on (key, ts), one window pass carrying the latest right
    ROW forward in time order, keep left rows. One shuffle on the key
    columns total; a range-join formulation would explode to
    |left|x|right| candidate pairs per key before filtering. Ties
    (right_ts == left_ts) count as preceding — right rows sort before
    left rows at equal timestamps.

    The whole right row travels as ONE struct and ``last(ignorenulls)``
    picks it atomically — filling each column independently would stitch a
    NULL-valued column from an older right row onto the rest of a newer
    one (a frankensteined match pandas would never produce); a NULL inside
    the matched row stays NULL. Several right rows sharing (key, ts)
    resolve to the greatest ORDERABLE carried fields (maps cannot be sort
    keys, so they are excluded from the tiebreak — carried map columns
    still work, but rows differing ONLY in a map at an exactly tied
    timestamp tie arbitrarily) — otherwise arbitrary but DETERMINISTIC
    across runs and partitionings, which a distributed engine must
    substitute for pandas' "last in input order".

    The right timestamp is also carried as ``{right_ts}{suffix}`` so
    callers can window/expire matches (e.g. drop matches older than 7
    days) without a second join.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in {*on, right_ts}
    ]
    carried = [right_ts, *value_cols]
    out_names = {c: (f"{c}{suffix}" if c in left.columns or c == right_ts else c) for c in carried}

    reserved = {"__ts", "__is_left", "__carry", "__match"}
    clash = reserved & {*left.columns, *right.columns}
    if clash:
        raise ValueError(
            f"asof_join: input columns {sorted(clash)} collide with internal "
            f"names {sorted(reserved)}; rename them first"
        )
    # a suffixed output must not silently overwrite a DIFFERENT left column
    # (left 'v' + right 'v' -> 'v_asof' clobbering a distinct left 'v_asof'),
    # and two carried columns must not suffix onto the same output name
    seen: dict[str, str] = {}
    for c, out in out_names.items():
        if out != c and out in left.columns:
            raise ValueError(
                f"asof_join: output column {out!r} (for right column {c!r}) "
                f"collides with an existing left column; pass a different suffix"
            )
        if out in seen:
            raise ValueError(
                f"asof_join: right columns {seen[out]!r} and {c!r} both map to "
                f"output {out!r}; pass a different suffix"
            )
        seen[out] = c

    l_tag = left.withColumn("__ts", F.col(left_ts).cast("timestamp")).withColumn(
        "__is_left", F.lit(1)
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("__carry"),
    ).withColumn("__is_left", F.lit(0))
    both = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right rows order BEFORE left rows at equal __ts (0 < 1): an exact-tie
    # right row is visible to the left row — the <= in "right_ts <= left_ts";
    # the orderable carried fields as the final key make equal-ts right
    # rows deterministic (the full struct would fail analysis if any
    # carried column is a map)
    r_fields = {f.name: f.dataType for f in right.schema.fields}
    tiebreak = [
        F.col("__carry")[c] for c in carried if _orderable(r_fields[c])
    ]
    w = Window.partitionBy(*on).orderBy("__ts", "__is_left", *tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = both.withColumn("__match", F.last("__carry", ignorenulls=True).over(w))
    for c in carried:
        filled = filled.withColumn(out_names[c], F.col("__match")[c])
    return filled.filter(F.col("__is_left") == 1).drop(
        "__ts", "__is_left", "__carry", "__match"
    )


def _range_ranked(
    df: DataFrame, order_cols: list[str], num_partitions: int | None
) -> DataFrame:
    """Step 1 of distributed_ntile, exposed (uncheckpointed) so plan tests
    can assert the window is PARTITIONED: range exchange on the sort keys,
    then row_number within each range partition."""
    num_partitions = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    part = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return part.withColumn("__rn", F.row_number().over(w))


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[str],
    num_partitions: int | None = None,
    tile_col: str = "tile",
) -> DataFrame:
    """Global ``ntile(n_tiles)`` over ``order_cols`` WITHOUT the
    single-partition global window (``Window.orderBy(...)`` with no
    partitionBy moves every row to one task — fine at 10^5 rows, a
    scale-killer at 10^12). Exact ntile semantics: with N rows, the first
    ``N % n_tiles`` tiles hold ``N // n_tiles + 1`` rows, the rest
    ``N // n_tiles``.

    Distributed two-pass shape:
      1. range-repartition on the sort keys (the same exchange a global
         sort would do — but the per-partition work stays per-partition),
         rank WITHIN each partition (``row_number`` over a partitioned
         window), materialize once (localCheckpoint) so the counting pass
         and the rank pass can't see different partitionings;
      2. per-partition row counts → cumulative offsets — driver state is
         ``num_partitions`` rows, never data-sized — broadcast-JOINED back
         as a tiny (pid, offset) frame (an inlined when-chain would nest
         one CASE per partition: thousands of range partitions would blow
         up Catalyst analysis / codegen at exactly the scale this function
         exists for), so global rank = local rank + partition offset and
         the tile is pure map-side arithmetic.

    ``order_cols`` must be a total order (include a unique id) or tile
    assignment at duplicate keys is arbitrary, like ntile itself.
    """
    ranked = _range_ranked(df, order_cols, num_partitions).localCheckpoint()
    sizes = {
        r["__pid"]: r["c"]
        for r in ranked.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    }
    n_total = sum(sizes.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):  # range partition i holds the i-th key range
        offsets[pid] = acc
        acc += sizes[pid]
    off_df = local_rows_df(
        ranked.sparkSession,
        [(int(pid), int(o)) for pid, o in offsets.items()],
        "__pid int, __off long",
    )
    ranked = ranked.join(F.broadcast(off_df), "__pid", "left").withColumn(
        "__off", F.coalesce(F.col("__off"), F.lit(0).cast("long"))
    )
    rk = F.col("__rn").cast("long") + F.col("__off")  # 1..N global rank
    base, rem = divmod(n_total, n_tiles)
    if base == 0:  # fewer rows than tiles: tile k = row k (ntile semantics)
        tile = rk
    else:
        cut = rem * (base + 1)  # last rank served by the fat tiles
        tile = F.when(
            rk <= F.lit(cut), F.floor((rk - 1) / F.lit(base + 1)) + 1
        ).otherwise(F.lit(rem) + F.floor((rk - F.lit(cut) - 1) / F.lit(base)) + 1)
    return ranked.withColumn(tile_col, tile.cast("int")).drop(
        "__pid", "__rn", "__off"
    )


def distributed_cumsum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    num_partitions: int | None = None,
    out_col: str = "cumsum",
    inclusive: bool = True,
) -> DataFrame:
    """Global running total of ``value_col`` over the total order
    ``order_cols`` WITHOUT the single-partition global window
    (``Window.orderBy(...)`` with no partitionBy funnels every row through
    one task — the same scale-killer distributed_ntile avoids).

    Classic two-pass distributed prefix sum:
      1. range-repartition on the sort keys (so partition i holds the i-th
         key range), running total WITHIN each partition (window
         partitioned by ``__pid`` — fully parallel); localCheckpoint pins
         the partitioning so both passes see the same layout;
      2. per-partition TOTALS → exclusive prefix over partition ids —
         driver state is ``num_partitions`` rows, never data-sized —
         broadcast-joined back as a tiny (pid, offset) frame (not an
         inlined CASE chain, which would nest one branch per partition);
         global running total = local running total + partition offset.

    ``inclusive=False`` yields the EXCLUSIVE prefix sum (total of rows
    strictly before this one in the order) — what concat-then-chunk
    sequence packing needs for each document's start offset.

    Values are summed as longs (NULL adds 0). ``order_cols`` must be a
    total order (include a unique id) or the running total at duplicate
    keys depends on physical row order.
    """
    num_partitions = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    v = F.coalesce(F.col(value_col).cast("long"), F.lit(0).cast("long"))
    part = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    end = Window.currentRow if inclusive else -1
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    local = F.coalesce(F.sum(v).over(w), F.lit(0).cast("long"))
    sums = {
        r["__pid"]: r["s"]
        for r in part.groupBy("__pid").agg(F.sum(v).alias("s")).collect()
    }
    offsets: list[tuple[int, int]] = []
    acc = 0
    for pid in sorted(sums):  # range partition i holds the i-th key range
        offsets.append((int(pid), acc))
        acc += int(sums[pid] or 0)
    off_df = local_rows_df(part.sparkSession, offsets, "__pid int, __off long")
    return (
        part.withColumn("__local", local)
        .join(F.broadcast(off_df), "__pid", "left")
        .withColumn(
            out_col,
            F.col("__local") + F.coalesce(F.col("__off"), F.lit(0).cast("long")),
        )
        .drop("__pid", "__off", "__local")
    )


def funnel_times(
    df: DataFrame,
    steps: list[str],
    key_cols: list[str],
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: per key, the earliest time each ``steps``
    stage was reached IN ORDER (greedy: stage k's time is the first
    matching event strictly after stage k-1's time; NULL from the first
    unreached stage on). The classic log-pipeline conversion query —
    which users viewed, then clicked, then purchased, in that order.

    Output: key columns + one ``t_<step>`` timestamp per step (a step name
    appearing twice gets positional suffixes). Conversion counts per stage
    are one aggregation away (count of non-NULL t_k).

    Scale shape: one filtered min-aggregation per stage, each an equi-join
    on the key against the previous stage's (key, timestamp) — k-1
    broadcast-or-shuffle joins over PER-KEY ROWS (one row per key after
    stage 1), never over raw events more than once per stage. No windows,
    no sort of the event stream.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    out_names = []
    seen: dict[str, int] = {}
    for s in steps:
        n = seen.get(s, 0)
        seen[s] = n + 1
        out_names.append(f"t_{s}" if n == 0 else f"t_{s}_{n}")

    first = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(*key_cols)
        .agg(F.min(ts_col).alias(out_names[0]))
    )
    acc = first
    for step, prev_name, name in zip(steps[1:], out_names, out_names[1:]):
        nxt = (
            df.filter(F.col(type_col) == step)
            .join(acc.select(*key_cols, prev_name), key_cols)
            .filter(F.col(ts_col) > F.col(prev_name))
            .groupBy(*key_cols)
            .agg(F.min(ts_col).alias(name))
        )
        acc = acc.join(nxt, key_cols, "left")
    keys_all = df.select(*key_cols).distinct()
    return keys_all.join(acc, key_cols, "left")
