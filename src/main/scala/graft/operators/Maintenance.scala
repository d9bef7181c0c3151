package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Table-maintenance operators for the lakehouse side of the pipeline:
  * changelog application (the MERGE primitive every day-2 ingest needs)
  * and multi-dimensional data layout (Z-order clustering for min-max
  * file skipping). The reference's analog is "re-run the Lambda and
  * overwrite the partition" (`/root/reference/src/app.py:44-58`); at
  * 100 TB the overwrite becomes a keyed merge and the layout becomes
  * the difference between scanning 1% and 100% of the files.
  */
object Maintenance {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** CHANGELOG APPLY (CDC merge, latest-wins): fold an ordered stream of
    * upsert/delete operations into a base snapshot — the core of every
    * incremental-ingest table format (Delta/Iceberg/Hudi MERGE), here as
    * a plain co-partitioned relational plan with no format dependency.
    *
    * Fixture semantics (derived deterministically from the TPC-H-ish
    * tables so the DuckDB oracle reproduces them):
    *   - base    = orders with o_orderkey % 4 != 0 (day-1 snapshot; the
    *               excluded quarter makes the INSERT path reachable)
    *   - changelog = lineitem rows as order-level ops: key = l_orderkey,
    *               seq = l_linenumber (unique per key), op = 'D' when
    *               l_returnflag = 'R' else 'U', payload = the line's
    *               rounded net price and quantity
    *
    * Latest-wins resolution picks the max-seq op per key (one window
    * pass over the changelog — the only changelog shuffle), then a FULL
    * OUTER join against the base decides per key:
    *   base only          -> keep   (unchanged row)
    *   both, latest op U  -> update (payload replaces base values)
    *   latest only, op U  -> insert
    *   latest op D        -> row dropped (delete; delete-of-absent is a
    *                         no-op)
    *
    * Scale shape: the window and the join hash on the same key, so the
    * changelog is exchanged once and the join reuses the partitioning;
    * the base is exchanged once (at 100 TB: bucketed base -> zero base
    * exchange, and a small daily changelog broadcasts — AQE picks that
    * up from the post-window size). Output is the new snapshot, i.e.
    * copy-on-write MERGE without the table-format machinery. */
  def cdcMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "orders")
      .filter($"o_orderkey" % 4 =!= 0)
      .select($"o_orderkey".as("key"),
              $"o_orderstatus".as("base_status"),
              round($"o_totalprice", 2).as("base_price"))

    val latest = t(s, dir, "lineitem")
      .select($"l_orderkey".as("key"),
              $"l_linenumber".as("seq"),
              when($"l_returnflag" === "R", "D").otherwise("U").as("op"),
              // portable cent rounding: multiply/add/floor/divide are all
              // correctly-rounded IEEE ops, so this is bit-identical on
              // any engine — round(x, 2) is NOT (engines disagree on the
              // half-cent boundary; one row per ~10k at fixture scale)
              (floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100
                 + 0.5).cast("double") / 100).as("new_price"),
              $"l_quantity".as("new_qty"))
      // the synthetic lineitem reuses l_linenumber within an order, so
      // seq alone is not a total order — break ties on the op payload
      // (identical-payload ties are then harmless by construction)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"key")
          .orderBy($"seq".desc, $"op", $"new_price", $"new_qty")))
      .filter($"rn" === 1)
      .drop("rn", "seq")

    base.join(latest, Seq("key"), "full_outer")
      .filter($"op".isNull || $"op" === "U")   // latest D -> drop
      .select(
        $"key",
        when($"op".isNull, "keep")
          .when($"base_status".isNull, "insert")
          .otherwise("update").as("action"),
        when($"op".isNull, $"base_price").otherwise($"new_price").as("price"),
        when($"op".isNull, lit(null).cast("double")).otherwise($"new_qty")
          .as("qty"))
      .orderBy($"key")
  }

  /** TIME-GRID RESAMPLE + FORWARD FILL (gap fill): regularize each
    * user's irregular event stream onto an hourly grid spanning that
    * user's own [first, last] event hour, carrying the last observed
    * value across empty hours — the standard pre-step for any
    * fixed-step sequence model (metric forecasting, session features)
    * over event logs.
    *
    * Three shapes, none of which puts event-rate volume on the wire:
    *   1. per-(user, hour) "observed" value = the value of the LAST
    *      event in that hour, as a `max_by(value, (ts, event_id))`
    *      AGGREGATE — (ts, event_id) is a total order so both engines
    *      pick the same row, and because it is an aggregate (not a
    *      row_number window) the partial combine collapses each hour
    *      map-side: the exchange carries distinct (user, hour) buckets,
    *      not events;
    *   2. per-user span (min/max hour) -> `sequence()` + explode
    *      generates the grid WITHOUT a cross join or a driver loop:
    *      grid rows are born distributed, sized rate-independent
    *      (span-hours per user, not events);
    *   3. grid LEFT JOIN observed (bucket-sized both sides), then
    *      `last(value, ignoreNulls)` over (user ORDER BY hour) forward-
    *      fills. The frame is unbounded-preceding→current — Spark
    *      evaluates it in one running pass per partition, no re-scan
    *      per row.
    *
    * The fill itself COPIES doubles (no arithmetic), so the result is
    * hash-exact against the DuckDB oracle's IGNORE NULLS window.
    * Scale: state per user is one running value; grid volume is
    * users × span-hours, independent of event rate — the operator gets
    * CHEAPER relative to input as streams densify. Leading unobserved
    * hours fill with null (no value yet), matching the oracle. */
  def eventsGapfill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = graft.queries.Relational.eventsNs(s, dir)
      .withColumn("hb", expr("ts_ns div 3600000000000"))

    val obs = e.groupBy($"user_id", $"hb")
      .agg(max_by($"value", struct($"ts_ns", $"event_id")).as("value"))

    val grid = e.groupBy($"user_id")
      .agg(min($"hb").as("lo"), max($"hb").as("hi"))
      .select($"user_id", explode(expr("sequence(lo, hi)")).as("hb"))

    grid.join(obs, Seq("user_id", "hb"), "left")
      .select($"user_id", ($"hb" * 3600).as("win_start"),
        last($"value", ignoreNulls = true).over(
          Window.partitionBy($"user_id").orderBy($"hb")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("value"),
        $"value".isNotNull.cast("long").as("observed"))
      .orderBy($"user_id", $"win_start")
  }

  /** SCD TYPE-2 HISTORY BUILD: the versioned-dimension twin of
    * [[cdcMerge]] — instead of folding the changelog to a latest-wins
    * snapshot, emit EVERY version each key ever held, with its validity
    * interval and a current flag. Same deterministic fixture: base =
    * 3/4 of orders (version 0), changelog = lineitem rows as ordered
    * ops on the order key (delete when l_returnflag = 'R').
    *
    * One window shuffle on key does all the work: ops get a dense
    * per-key version number (row_number over the same total order
    * cdcMerge uses for latest-wins, so the two operators provably agree
    * on "latest"), the base rows join in as version 0, and a single
    * `lead(ver)` closes each interval. Delete ops are TOMBSTONES: they
    * close the prior version's interval (their version number is
    * consumed by lead) but emit no row themselves — filtered AFTER the
    * lead window, which is what makes a key whose history ends in D
    * have no current row, exactly the rows cdcMerge drops.
    *
    * Scale: ops and base hash on the same key; the window and the
    * full-outer-shaped union are one exchange each at 100 TB (bucketed
    * dimension -> zero base exchange). History output is
    * changelog-sized, never corpus×versions. `is_current` per key is
    * `valid_to_ver IS NULL`, so the [[cdcMerge]] snapshot is exactly
    * `WHERE is_current = 1` of this relation — the invariant
    * Scd2Spec pins. */
  def cdcScd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // base rows enter the SAME version window as the changelog with a
    // sentinel seq = -1 (below every l_linenumber), so ONE window
    // exchange numbers the whole history — windowing ops separately and
    // unioning after costs a second corpus exchange for no semantics
    val base = t(s, dir, "orders")
      .filter($"o_orderkey" % 4 =!= 0)
      .select($"o_orderkey".as("key"), lit(-1L).as("seq"), lit("I").as("op"),
              round($"o_totalprice", 2).as("price"),
              lit(null).cast("double").as("qty"))

    val ops = t(s, dir, "lineitem")
      .select($"l_orderkey".as("key"),
              $"l_linenumber".cast("long").as("seq"),
              when($"l_returnflag" === "R", "D").otherwise("U").as("op"),
              (floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100
                 + 0.5).cast("double") / 100).as("price"),
              $"l_quantity".as("qty"))

    // ascending version order whose LAST element is exactly the row
    // cdcMerge's (seq DESC, op ASC, price ASC, qty ASC) rn=1 picks:
    // ties on seq order DESCENDING by payload so the minimal-payload
    // tie lands last — that equality is what Scd2Spec pins. A base row
    // gets ver 0; a changelog-only key starts its history at ver 0 too
    // (dense per-key numbering, no reserved slot for an absent base).
    // The lead() window shares the partitioning AND the sort order of
    // the row_number window, so Spark plans one exchange + one sort.
    base.unionByName(ops)
      .withColumn("ver", (row_number().over(
        Window.partitionBy($"key")
          .orderBy($"seq", $"op".desc, $"price".desc, $"qty".desc))
        - 1).cast("long"))
      .withColumn("valid_to_ver", lead($"ver", 1).over(
        Window.partitionBy($"key").orderBy($"ver")))
      .filter($"op" =!= "D")
      .select($"key", $"ver", $"op", $"price", $"qty", $"valid_to_ver",
        $"valid_to_ver".isNull.cast("long").as("is_current"))
      .orderBy($"key", $"ver")
  }

  /** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE: refresh a per-group
    * aggregate view from a persisted day-1 state plus a delta batch,
    * WITHOUT rescanning the base — the day-2 economics that make a
    * 100 TB warehouse viable (the full-recompute alternative rescans
    * everything for a 1% delta). Companion to [[cdcMerge]] (which
    * maintains the TABLE; this maintains a VIEW over it) and to
    * `dedup_incremental_idx` (same persisted-state pattern for the
    * dedup index).
    *
    * View: per (l_returnflag, l_linestatus) — row count, integer
    * quantity sum, price cent-sum, min/max ship epoch-day, derived avg.
    * Every stored measure is a MERGEABLE partial (counts/sums add,
    * min/max combine) over INTEGERS — mergeability is a theorem for
    * these, so state ⊕ delta ≡ recompute exactly, and the DuckDB oracle
    * IS the full recompute: the gate proves the incremental path
    * reconstructs the truth bit-for-bit. (A double sum would break
    * this: addition order differs between the split and unsplit plans
    * — same reason the rolling windows and PageRank are integer.)
    * Derived ratios (avg) are computed at READ time from the partials,
    * one correctly-rounded division — never stored, so they cannot
    * drift from their numerator/denominator.
    *
    * Plan: the day-1 state is a localCheckpoint'd partial aggregate
    * (standing in for the persisted snapshot a warehouse would read
    * back — the `dedup_incremental_idx` parquet round-trip pattern,
    * kept in-memory here to keep the query self-contained); the delta
    * batch partial-aggregates (group-sized wire volume) and one
    * group-keyed merge folds it in. Work per refresh ∝ delta + |view|,
    * never ∝ base. */
  def mvIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def partials(df: DataFrame): DataFrame = df
      .select($"l_returnflag", $"l_linestatus",
        expr("cast(l_quantity as bigint)").as("qty_i"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)")
          .as("cents"),
        expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
          .as("ship_day"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"), sum($"qty_i").as("sum_qty"),
           sum($"cents").as("sum_price_cents"),
           min($"ship_day").as("min_ship_day"),
           max($"ship_day").as("max_ship_day"))

    val li = t(s, dir, "lineitem")
    val state = partials(li.filter($"l_orderkey" % 4 =!= 0))
      .localCheckpoint()
    val delta = partials(li.filter($"l_orderkey" % 4 === 0))

    state.unionByName(delta)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"n_rows").as("n_rows"), sum($"sum_qty").as("sum_qty"),
           sum($"sum_price_cents").as("sum_price_cents"),
           min($"min_ship_day").as("min_ship_day"),
           max($"max_ship_day").as("max_ship_day"))
      .select($"l_returnflag", $"l_linestatus", $"n_rows", $"sum_qty",
        $"sum_price_cents", $"min_ship_day", $"max_ship_day",
        ($"sum_qty".cast("double") / $"n_rows".cast("double")).as("avg_qty"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TABLE PROFILER (ANALYZE-style column statistics, long format): one
    * row per column of `documents` with null count, exact distinct
    * count, lexicographic min/max, and the modal value with its count —
    * the pre-flight every curation pipeline runs before touching a new
    * 100 TB corpus (which join keys are safe, which columns are
    * degenerate, what the skew key will be).
    *
    * Shape: ONE scan feeds a `stack()` (Expand) into (column, value)
    * pairs — 5× rows but each row is two fields, and the expansion
    * happens AFTER the parquet scan so column pruning still holds. Two
    * partial-aggregated shuffles follow: per-(column, value) counts
    * (this is the only corpus-sized exchange; partial aggs collapse
    * repeats map-side), then per-column rollup of the distinct/min/max/
    * null stats from the value-level relation — at that point rows =
    * distinct values, already ≪ corpus. The mode is a size-1
    * WindowGroupLimit over the same value-level relation (map-side
    * top-1 per column, ties broken on value asc so both engines agree).
    * Numeric columns profile through their canonical string form
    * (documented: min/max are lexicographic — a profiler convention,
    * not a bug; the oracle casts identically). */
  def tableProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val stacked = t(s, dir, "documents")
      .select(expr(
        s"stack(${cols.length}, " +
          cols.map(c => s"'$c', cast($c as string)").mkString(", ") +
        ") as (col_name, value)"))

    val perValue = Dedup.tracked(
      stacked.groupBy($"col_name", $"value").agg(count(lit(1)).as("n")))

    val stats = perValue.groupBy($"col_name").agg(
      sum(when($"value".isNull, $"n").otherwise(0L)).as("n_nulls"),
      count(when($"value".isNotNull, lit(1))).as("n_distinct"),
      min($"value").as("min_value"),
      max($"value").as("max_value"))

    val mode = perValue
      .filter($"value".isNotNull)
      .withColumn("rk", row_number().over(
        Window.partitionBy($"col_name").orderBy($"n".desc, $"value")))
      .filter($"rk" === 1)
      .select($"col_name", $"value".as("top_value"), $"n".as("top_count"))

    stats.join(mode, Seq("col_name"), "left").orderBy($"col_name")
  }

  /** Morton (Z-order) interleave of the low `bits` bits of `x` and `y`
    * as a SQL expression — bit i of x lands at position 2i, bit i of y
    * at 2i+1. `shr` spells the right-shift (Spark: `shiftright(e, i)`;
    * DuckDB: `e >> i`); everything else — `& 1`, multiply-by-2^k as the
    * left shift, `+` as the disjoint-bit OR — parses identically in
    * both engines, so the interleave is generated ONCE and cannot
    * drift between plan and oracle. */
  private[graft] def zValueSql(x: String, y: String, bits: Int,
                               shr: (String, Int) => String): String =
    (0 until bits).map { i =>
      s"((${shr(x, i)} & 1) * ${1L << (2 * i)} + (${shr(y, i)} & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  private[graft] val ZBits = 16

  /** Min-max normalization of `e` onto the full [0, 2^ZBits) code range
    * — WITHOUT it, a dimension whose values span fewer than ZBits bits
    * (partkey spans ~2^11 at small sf) contributes constant-zero high
    * interleave bits, and the coarse cells split on the OTHER dimension
    * only: the layout silently degrades to a linear sort. Integer
    * arithmetic throughout; `idiv` spells the engine's integer divide
    * (Spark `div`, DuckDB `//`). */
  private[graft] def normSql(e: String, lo: String, hi: String,
                             idiv: (String, String) => String): String =
    idiv(s"(($e - $lo) * ${(1L << ZBits) - 1})", s"greatest(1, $hi - $lo)")

  /** Z-ORDER LAYOUT MAP: interleave (l_orderkey, l_partkey) into a
    * 32-bit Morton code, bucket the code equi-width into 64 cells, and
    * report each cell's row count and per-dimension min/max envelope —
    * the zone map a Z-ordered rewrite of the table would give every
    * file, and the direct measure of WHY the layout works: each cell's
    * envelope covers ~1/8 of BOTH key ranges (2^-3 per dimension for a
    * 64-cell split), so a predicate on EITHER key prunes ~7/8 of the
    * files. A linear layout gets perfect pruning on the sort key and
    * ZERO on the other — the second dimension's envelope spans every
    * file. ZorderSpec measures exactly that on real written files.
    *
    * Equi-width cells (code div 2^26), NOT ntile: equi-depth needs a
    * global sort — a single-partition window at any scale — while
    * equi-width is a narrow map + one 64-group partial aggregation,
    * the same cost as a count(*). The production write path
    * ([[zorderWrite]]) range-partitions the codes instead (equi-depth
    * files without a global window, boundaries from Spark's range
    * sampler); the QUERY stays on the deterministic equi-width grid so
    * the oracle can replay it bit-for-bit. */
  def zorderMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val z = zValueSql("xn", "yn", ZBits, (e, i) => s"shiftright($e, $i)")
    withNormalizedKeys(t(s, dir, "lineitem"))
      .withColumn("zcell", expr(s"$z div ${1L << (2 * ZBits - 6)}"))
      .groupBy($"zcell")
      .agg(count(lit(1)).as("n_rows"),
           min($"l_orderkey").as("min_ok"), max($"l_orderkey").as("max_ok"),
           min($"l_partkey").as("min_pk"), max($"l_partkey").as("max_pk"))
      .orderBy($"zcell")
  }

  /** The production Z-order write: range-partition on the Morton code
    * (equi-depth files via Spark's distributed range sampler — no
    * global window), sort within partitions so parquet row-group stats
    * stay tight, write one file per partition. Returns the output path.
    * The layout's skipping payoff is measured in ZorderSpec against a
    * linear (single-key-sorted) twin of the same data. */
  def zorderWrite(s: SparkSession, dir: String, out: String,
                  nFiles: Int): String = {
    import s.implicits._
    val z = zValueSql("xn", "yn", ZBits, (e, i) => s"shiftright($e, $i)")
    withNormalizedKeys(t(s, dir, "lineitem"))
      .withColumn("zval", expr(z))
      .repartitionByRange(nFiles, $"zval")
      .sortWithinPartitions($"zval")
      .drop("zval", "xn", "yn")
      .write.mode("overwrite").parquet(out)
    out
  }

  /** KEYED SNAPSHOT DIFF — the audit/validation operator every
    * table-maintenance family needs: classify each key across two
    * snapshot versions as added / removed / updated (unchanged rows are
    * filtered — at warehouse scale they are the overwhelming majority
    * and carry no signal). The two versions are derived deterministically
    * from the orders table (version A drops keys ≡ 4 mod 5; version B
    * drops keys ≡ 0 mod 5 and bumps the price on keys ≡ 0 mod 3), so
    * both engines construct identical inputs — the +1.0 bump is a single
    * IEEE add, bit-identical everywhere.
    *
    * Plan shape: one co-partitioned full-outer sort-merge join on the
    * key — both sides shuffle exactly once (zero times on bucketed
    * tables); classification and the unchanged-filter are narrow
    * projections over the join output. Nothing is ever collected; the
    * diff of two 100 TB snapshots is one SMJ. */
  def tableDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
    val va = o.filter($"o_orderkey" % 5 =!= 4)
    val vb = o.filter($"o_orderkey" % 5 =!= 0)
      .withColumn("o_totalprice",
        when($"o_orderkey" % 3 === 0, $"o_totalprice" + lit(1.0))
          .otherwise($"o_totalprice"))
    va.as("a").join(vb.as("b"), $"a.o_orderkey" === $"b.o_orderkey", "full_outer")
      .select(
        coalesce($"a.o_orderkey", $"b.o_orderkey").as("o_orderkey"),
        when($"a.o_orderkey".isNull, lit("added"))
          .when($"b.o_orderkey".isNull, lit("removed"))
          .when($"a.o_totalprice" =!= $"b.o_totalprice" ||
                $"a.o_orderstatus" =!= $"b.o_orderstatus", lit("updated"))
          .otherwise(lit("unchanged")).as("change_type"),
        $"a.o_totalprice".as("old_price"),
        $"b.o_totalprice".as("new_price"))
      .filter($"change_type" =!= "unchanged")
      .orderBy($"o_orderkey")
  }

  /** Attach normalized interleave inputs xn/yn. The key bounds come from
    * one min/max aggregation (at warehouse scale: footer/metadata-cheap,
    * one short job) broadcast-joined onto the scan — the same integer
    * normalization the oracle computes from its own bounds CTE. */
  private def withNormalizedKeys(li: DataFrame): DataFrame = {
    import li.sparkSession.implicits._
    val bounds = li.agg(
      min($"l_orderkey").as("lo_ok"), max($"l_orderkey").as("hi_ok"),
      min($"l_partkey").as("lo_pk"), max($"l_partkey").as("hi_pk"))
    val idiv = (a: String, b: String) => s"($a div $b)"
    li.crossJoin(broadcast(bounds))
      .withColumn("xn", expr(normSql("l_orderkey", "lo_ok", "hi_ok", idiv)))
      .withColumn("yn", expr(normSql("l_partkey", "lo_pk", "hi_pk", idiv)))
  }
}
