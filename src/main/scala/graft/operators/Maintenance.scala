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
}
