"""Distributed global ranking without a single-partition window.

``Window.orderBy(...)`` with no partitionBy collapses every row into
ONE task - the classic Spark scale-killer for "assign a global rank".
The scalable idiom (the same two-pass layout TeraSort and Spark's own
zipWithIndex use) is implemented here:

  1. range-partition the rows by the order key (a shuffle that keeps
     every partition's key range disjoint and sorted ACROSS partitions),
  2. count rows per partition (a tiny per-partition agg - one row per
     partition reaches the driver),
  3. broadcast the cumulative offsets back and add them to each row's
     WITHIN-partition row_number (an ordinary partitioned window).

Every stage is bounded: the only driver materialization is one count
per partition, and no task ever holds more than its range slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_rank_pid"
_ROW = "_rank_row"


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_cols)`` as a distributed
    two-pass plan.  ``order_cols`` must be a TOTAL order (add a unique
    id as the last column) for the result to be deterministic - the
    same requirement the single-partition window has, minus the single
    partition.  Rank is 1-based, in ``out``."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    # materialize the range layout ONCE: RangePartitioner's boundary
    # sampling is seeded by the RDD id, so re-executing the same plan
    # in the counts job and the rank job could place boundaries
    # differently - the pass-1 offsets would then be wrong for the
    # pass-2 layout.  localCheckpoint pins a single execution (and is
    # what makes the two passes read the same shuffle anyway instead
    # of shuffling twice).
    ranged = (
        df.repartitionByRange(int(n), *cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    # pass 1: per-partition counts; ONE ROW PER PARTITION hits the
    # driver, never row data
    counts = {
        r[_PID]: r["c"]
        for r in ranged.groupBy(_PID).agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # pass 2: within-partition row_number (partitioned window - no
    # global exchange) + the broadcast offset
    off = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    w = Window.partitionBy(_PID).orderBy(*cols)
    return (
        ranged.withColumn(_ROW, F.row_number().over(w))
        .withColumn(out, (off[F.col(_PID)] + F.col(_ROW)).cast("bigint"))
        .drop(_PID, _ROW)
    )


def grouped_ntile(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column | str],
    n: int,
    out: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """``NTILE(n) OVER (PARTITION BY part_cols ORDER BY order_cols)``
    without a per-group single-task sort.

    A plain partitioned window puts each GROUP in one task - fine when
    groups are many and small, a scale-killer when a handful of giant
    groups hold the corpus (e.g. quartiles per language: 5 groups over
    billions of docs = 5 tasks).  Here the rows are range-partitioned
    by (group, order) so one group spans MANY ordered partitions, and
    the same two-pass offset layout as :func:`global_row_number` turns
    within-partition row numbers into exact within-group ranks:

      1. range-shuffle on (part_cols + order_cols), pin the layout,
      2. count rows per (physical partition x group) - the driver sees
         one scalar per slice, never row data (bounded by
         #partitions x #groups; this operator targets LOW-cardinality
         grouping, where that product is tiny),
      3. broadcast-join the per-slice rank offsets + per-group totals
         back and evaluate NTILE's exact bucket arithmetic (the first
         ``total mod n`` buckets get ``ceil(total/n)`` rows, the rest
         ``floor(total/n)`` - identical to the SQL-standard NTILE, so
         a DuckDB oracle can hash-check it).

    ``order_cols`` must extend to a total order within each group (add
    a unique id last) for determinism."""
    ranked = grouped_rank(df, part_cols, order_cols, num_partitions)
    q = F.floor(F.col("_gtotal") / n).cast("bigint")
    rem = (F.col("_gtotal") % n).cast("bigint")
    rank = F.col("_grank")
    # SQL-standard NTILE: first `total mod n` buckets take q+1 rows, rest q
    bucket = F.when(
        rank <= (q + 1) * rem, F.floor((rank - 1) / (q + 1)) + 1
    ).otherwise(rem + F.floor((rank - (q + 1) * rem - 1) / F.greatest(q, F.lit(1))) + 1)
    return (
        ranked.withColumn(out, bucket.cast("bigint"))
        .select(*df.columns, out)
    )


def grouped_rank(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column | str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact within-group rank + group total as the two-pass range
    layout (see :func:`grouped_ntile` for the full rationale):
    returns ``df``'s columns plus ``_grank`` (1-based rank within the
    (part_cols) group under order_cols) and ``_gtotal`` (group row
    count) - the shared substrate for grouped NTILE, percent_rank,
    and chunked rolling windows over few-giant-group data."""
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    pcols = [F.col(c) for c in part_cols]
    nparts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    ranged = (
        df.repartitionByRange(int(nparts), *pcols, *ocols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    # pass 1: per-(partition, group) counts - scalars only
    rows = ranged.groupBy(_PID, *part_cols).agg(F.count("*").alias("_c")).collect()

    def _gkey(r):
        return tuple((r[c] is None, r[c]) for c in part_cols)

    totals: dict[tuple, int] = {}
    for r in rows:
        totals[_gkey(r)] = totals.get(_gkey(r), 0) + r["_c"]
    offsets, acc, cur = [], 0, None
    for r in sorted(rows, key=lambda r: (_gkey(r), r[_PID])):
        if _gkey(r) != cur:
            cur, acc = _gkey(r), 0
        offsets.append(
            (r[_PID], *[r[c] for c in part_cols], acc, totals[_gkey(r)])
        )
        acc += r["_c"]
    from pyspark.sql.types import LongType, StructField, StructType

    base = ranged.select(_PID, *part_cols).schema
    schema = StructType(
        list(base.fields)
        + [StructField("_off", LongType()), StructField("_total", LongType())]
    )
    offdf = df.sparkSession.createDataFrame(offsets, schema)
    # pass 2: within-slice row_number + offset = exact within-group rank
    # (null-safe join: a NULL group key is a group like any other)
    left, right = ranged.alias("_l"), F.broadcast(offdf).alias("_r")
    cond = F.col(f"_l.{_PID}") == F.col(f"_r.{_PID}")
    for c in part_cols:
        cond = cond & F.col(f"_l.{c}").eqNullSafe(F.col(f"_r.{c}"))
    w = Window.partitionBy(f"_l.{_PID}", *[f"_l.{c}" for c in part_cols]).orderBy(
        *ocols
    )
    return (
        left.join(right, cond)
        .withColumn("_grank", (F.col("_off") + F.row_number().over(w)).cast("bigint"))
        .withColumn("_gtotal", F.col("_total").cast("bigint"))
        .select(*[f"_l.{c}" for c in df.columns], "_grank", "_gtotal")
    )


# Group sizes up to this many rows use Spark's buffered exact
# ``percentile`` aggregate directly; above it the plan switches to the
# distributed rank-based selection below.  2M doubles is ~16 MB of
# sort buffer - comfortably one-task territory - while the failure
# mode this guards against (5 market segments x billions of fact rows
# at 100 TB) is 3 orders of magnitude past it.  Same probe-and-switch
# family as q103's rolling-substrate valve (queries/windows.py), whose
# threshold is lower because a windowed aggregate serializes the whole
# group through one task TIMELINE, not just one sort buffer.
GIANT_GROUP_ROWS = 2_000_000


def grouped_exact_percentile(
    df: DataFrame,
    part_cols: list[str],
    specs: list[tuple[str, float, str]],
    extra_aggs: list[Column] | None = None,
    giant_group_rows: int | None = None,
    input_rows: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact interpolated percentiles per group, size-aware.

    ``specs`` is a list of ``(value_col, fraction, out_name)``; the
    result has one row per ``part_cols`` group with each ``out_name``
    as a DOUBLE plus any ``extra_aggs`` (ordinary aggregate Columns
    evaluated over the same groups).  ``part_cols=[]`` means one
    global group.

    Spark's ``percentile`` is a sort-based TypedImperativeAggregate
    that BUFFERS each group's values in one task - the right tool when
    groups are small, a scale-killer when a handful of giant groups
    hold the corpus (5 market segments x billions of rows = 5 tasks
    each sorting a corpus-sized slice).  This helper probes the max
    group size first (one partial-agg scan returning a single scalar,
    the q103 pattern) and picks:

      - ``max group <= giant_group_rows``: one ``groupBy().agg()``
        with ``F.percentile`` - identical to the naive plan.
      - above: the :func:`grouped_rank` two-pass range layout per
        value column.  Every row gets its exact within-group rank and
        the group's non-null count without any single-task sort; the
        percentile then SELECTS the two boundary order statistics per
        requested fraction (<= 2 rows per spec per group survive the
        filter) and interpolates with the exact formula Spark's
        ``percentile`` uses - ``lo == hi ? v_lo : (hi-pos)*v_lo +
        (pos-lo)*v_hi`` with ``pos = p*(n-1)`` - so the switch cannot
        change the answer.

    Because BOTH branches are exact, the switch only affects the
    PLAN, never the result - so the size signal may be a cheap upper
    bound.  Callers that know their input grain pass ``input_rows``
    (e.g. the base fact table's parquet row count - a columnless
    metadata-weight scan): at or below the threshold the small plan
    is provably safe and NO probe job runs at all; above it the
    giant plan is taken directly (for the low-cardinality groupings
    this operator targets, a fact-scale input means fact-scale
    groups).  Without ``input_rows`` the helper probes the exact max
    group size - one partial-agg scan returning a single scalar.
    ``giant_group_rows=None`` reads the module-level
    ``GIANT_GROUP_ROWS`` at call time (tests pin it low to drive the
    giant branch through the real registered queries against the
    DuckDB oracle).

    NULL handling matches ``F.percentile``: NULL values are excluded
    per value column (the group's count is the non-null count), and a
    group whose values are all NULL still appears with NULL
    percentiles.  Ties need no tiebreak: ranks among equal values are
    arbitrary but the VALUE at any rank is deterministic."""
    extra_aggs = list(extra_aggs or [])
    if giant_group_rows is None:
        giant_group_rows = GIANT_GROUP_ROWS

    if input_rows is not None:
        probe = input_rows  # caller-supplied upper bound on max group
    else:
        probe = (
            df.groupBy(*part_cols)
            .agg(F.count("*").alias("_n"))
            .agg(F.max("_n").alias("m"))
            .collect()[0]["m"]
        ) or 0

    if probe <= giant_group_rows:
        # one ARRAY-form percentile per value column: all of a column's
        # fractions share a single sort buffer instead of one buffered
        # aggregate per fraction
        by_col = {}
        for v, p, out in specs:
            by_col.setdefault(v, []).append((p, out))
        aggs = [
            F.percentile(v, F.array(*[F.lit(p) for p, _ in ps])).alias(
                f"_gep_a_{i}"
            )
            for i, (v, ps) in enumerate(by_col.items())
        ]
        res = df.groupBy(*part_cols).agg(*aggs, *extra_aggs)
        sel = [
            F.element_at(f"_gep_a_{i}", j + 1).alias(out)
            for i, (v, ps) in enumerate(by_col.items())
            for j, (_, out) in enumerate(ps)
        ]
        extra_names = [c for c in res.columns if not c.startswith("_gep_a_")]
        out_names = [out for _, _, out in specs]
        return res.select(
            *part_cols,
            *sel,
            *[c for c in extra_names if c not in part_cols],
        ).select(*part_cols, *out_names, *[
            c for c in extra_names if c not in part_cols
        ])

    # giant-group branch: extras fold in an ordinary partial agg; each
    # value column gets its own rank layout.  A global percentile
    # (part_cols=[]) runs as a one-value group key, dropped on return.
    dummy = not part_cols
    if dummy:
        df = df.withColumn("_gep_g", F.lit(1))
        part_cols = ["_gep_g"]
    if extra_aggs:
        base = df.groupBy(*part_cols).agg(*extra_aggs)
    else:
        base = df.groupBy(*part_cols).agg(F.count("*").alias("_gep_drop"))

    for vcol in dict.fromkeys(v for v, _, _ in specs):  # ordered unique
        vspecs = [(v, p, out) for v, p, out in specs if v == vcol]
        sub = df.select(*part_cols, vcol).filter(F.col(vcol).isNotNull())
        ranked = grouped_rank(sub, part_cols, [vcol], num_partitions)

        def _pos(p):
            return F.lit(float(p)) * (F.col("_gtotal") - F.lit(1)).cast(
                "double"
            )

        need = F.lit(False)
        for _, p, _ in vspecs:
            pos = _pos(p)
            need = (
                need
                | (F.col("_grank") == F.floor(pos) + 1)
                | (F.col("_grank") == F.ceil(pos) + 1)
            )
        aggs = []
        for _, p, out in vspecs:
            pos = _pos(p)
            lo, hi = F.floor(pos) + 1, F.ceil(pos) + 1
            v = F.col(vcol).cast("double")
            aggs += [
                F.max(F.when(F.col("_grank") == lo, v)).alias(f"_l_{out}"),
                F.max(F.when(F.col("_grank") == hi, v)).alias(f"_h_{out}"),
                F.max(pos).alias(f"_p_{out}"),
            ]
        g = ranked.filter(need).groupBy(*part_cols).agg(*aggs)
        sel = []
        for _, _, out in vspecs:
            pp = F.col(f"_p_{out}")
            vlo, vhi = F.col(f"_l_{out}"), F.col(f"_h_{out}")
            sel.append(
                F.when(F.floor(pp) == F.ceil(pp), vlo)
                .otherwise((F.ceil(pp) - pp) * vlo + (pp - F.floor(pp)) * vhi)
                .alias(out)
            )
        ptab = g.select(*part_cols, *sel)
        # one row per group on the right - broadcast; left join keeps
        # all-NULL groups (their percentile is NULL, like F.percentile)
        left, right = base.alias("_b"), F.broadcast(ptab).alias("_q")
        cond = F.lit(True)
        for c in part_cols:
            cond = cond & F.col(f"_b.{c}").eqNullSafe(F.col(f"_q.{c}"))
        base = left.join(right, cond, "left").select(
            *[f"_b.{c}" for c in base.columns],
            *[f"_q.{out}" for _, _, out in vspecs],
        )

    # restore the caller's column order: part, percentiles, extras
    out_names = [out for _, _, out in specs]
    extra_names = [c for c in base.columns if c not in set(part_cols) | set(out_names)]
    res = base.select(*part_cols, *out_names, *[c for c in extra_names if c != "_gep_drop"])
    return res.drop("_gep_g") if dummy else res


def prefix_max(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    out_incl: str = "pmax_incl",
    out_strict: str = "pmax_strict",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running maximum of ``value_col`` over a GLOBAL order, without a
    single-partition window - the prefix-scan sibling of
    :func:`global_row_number` (same two-pass range layout).

    Adds two columns:
      - ``out_incl``:  max(value) over all rows at-or-before this row
        in ``order_cols`` order (``ROWS UNBOUNDED PRECEDING..CURRENT``),
      - ``out_strict``: the same excluding the current row (NULL for
        the globally first row) - the pair a 2-D skyline/Pareto filter
        needs (dominated iff an earlier point already reached your
        value).

    ``order_cols`` must be a total order for determinism.  Pass 1
    ships ONE scalar (the partition max) per range slice to the
    driver; pass 2 is an ordinary partitioned running-max window plus
    the broadcast exclusive prefix of the slice maxima - no task ever
    holds more than its range slice, so the scan distributes at any
    scale."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    ranged = (
        df.repartitionByRange(int(n), *cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    # pass 1: one max per partition reaches the driver (scalars only)
    pmax = {
        r[_PID]: r["m"]
        for r in ranged.groupBy(_PID).agg(F.max(value_col).alias("m")).collect()
    }
    vtype0 = ranged.schema[value_col].dataType
    if not pmax:  # empty input: just shape the output schema
        return (
            ranged.withColumn(out_incl, F.lit(None).cast(vtype0))
            .withColumn(out_strict, F.lit(None).cast(vtype0))
            .drop(_PID)
        )
    # exclusive running max over the partition maxima, in range order
    prefix, acc = {}, None
    for pid in sorted(pmax):
        prefix[pid] = acc
        if pmax[pid] is not None and (acc is None or pmax[pid] > acc):
            acc = pmax[pid]
    vtype = ranged.schema[value_col].dataType
    off = F.create_map(
        *[
            c
            for pid in sorted(prefix)
            for c in (F.lit(pid), F.lit(prefix[pid]).cast(vtype))
        ]
    )
    w = Window.partitionBy(_PID).orderBy(*cols)
    incl_local = F.max(value_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    strict_local = F.max(value_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    part_prefix = off[F.col(_PID)]
    return (
        ranged.withColumn(out_incl, F.greatest(incl_local, part_prefix))
        .withColumn(out_strict, F.greatest(strict_local, part_prefix))
        .drop(_PID)
    )


def prefix_sum(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    out: str = "psum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running sum of ``value_col`` over a GLOBAL order - the scan
    primitive behind sweep-line algorithms (interval concurrency,
    inventory balances, gap accounting) - with the same two-pass range
    layout as :func:`prefix_max`: pass 1 ships one per-partition sum
    to the driver, pass 2 adds the broadcast exclusive prefix to an
    ordinary partitioned running-sum window.  ``order_cols`` must be a
    total order for determinism.  NULL values count as zero."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    ranged = (
        df.repartitionByRange(int(n), *cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    psums = {
        r[_PID]: r["s"]
        for r in ranged.groupBy(_PID).agg(F.sum(value_col).alias("s")).collect()
    }
    vtype = ranged.schema[value_col].dataType
    if not psums:
        return ranged.withColumn(out, F.lit(None).cast(vtype)).drop(_PID)
    prefix, acc = {}, 0
    for pid in sorted(psums):
        prefix[pid] = acc
        acc += psums[pid] or 0
    off = F.create_map(
        *[
            c
            for pid in sorted(prefix)
            for c in (F.lit(pid), F.lit(prefix[pid]).cast(vtype))
        ]
    )
    w = Window.partitionBy(_PID).orderBy(*cols)
    local = F.sum(value_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn(
            out, F.coalesce(local, F.lit(0).cast(vtype)) + off[F.col(_PID)]
        )
        .drop(_PID)
    )
