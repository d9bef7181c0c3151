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
