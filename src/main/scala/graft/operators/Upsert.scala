package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's four upsert/merge flavors (SURVEY.md §2.5) as
  * distributed DataFrame operators.
  *
  * Semantically each flavor is `target FULL OUTER JOIN source ON key`
  * with per-clause resolution — that equivalence is also the DuckDB
  * oracle used by the driver's correctness gate. The join shuffles both
  * sides on the key columns (hash-partitioned), so the operator scales
  * linearly with data volume; when the source batch is small relative to
  * the target (the daily-sync case: one day vs. all history) callers
  * should pass `broadcast(source)` — the plan then becomes a
  * broadcast outer join with zero shuffle of the large target.
  *
  * Reference sites:
  *  - unconditional: dags/mssql_to_postgresql_orders_daily.py:296-308
  *    (`ON CONFLICT ... DO UPDATE SET col = EXCLUDED.col`)
  *  - last-write-wins: dags/__pycache__/mssql_to_postgres_sync.cpython-38
  *    .pyc (strings: `WHERE transactions.updateddateutc IS NULL OR
  *    EXCLUDED.updateddateutc > transactions.updateddateutc`)
  *  - insert-only columns: csv_to_mssqldb.py:417-443 (MERGE that never
  *    updates `OrderCreatedAt`)
  *  - full refresh: dags/mssql_to_postgresql_orders_daily.py:494-505
  */
object Upsert {

  sealed trait Mode

  /** New key → insert; existing key → overwrite every non-key column. */
  case object Unconditional extends Mode

  /** Update only when the incoming `tsCol` is strictly newer, or the
    * target's is NULL (NULL-safe disjunct replicated exactly —
    * SURVEY.md §7.4 risk 4). */
  final case class LastWriteWins(tsCol: String) extends Mode

  /** Overwrite matched rows except `frozenCols`, which keep the target's
    * value (set-once semantics); inserts still carry the source value. */
  final case class InsertOnly(frozenCols: Seq[String]) extends Mode

  /** Apply one source batch onto a target snapshot. Both sides must have
    * identical schemas; the source must be unique per key (use
    * [[latestPerKey]] first, mirroring how the reference's daily batch
    * carries at most one row per PK).
    */
  def apply(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      mode: Mode = Unconditional): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val cols = target.columns.toSeq
    require(
      source.columns.toSeq == cols,
      s"schema mismatch: target=${cols.mkString(",")} " +
        s"source=${source.columns.mkString(",")}")
    val t = target
      .select(cols.map(c => col(c).as(s"t_$c")): _*)
      .withColumn("t_present", lit(true))
    val s = source
      .select(cols.map(c => col(c).as(s"s_$c")): _*)
      .withColumn("s_present", lit(true))

    val joinCond = keys
      .map(k => col(s"t_$k") <=> col(s"s_$k"))
      .reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")

    // Presence markers (not key-null checks) so legitimately-NULL data
    // columns can't be mistaken for an absent side.
    val tExists  = col("t_present").isNotNull
    val sPresent = col("s_present").isNotNull

    // Per-mode decision: does the source row win on a matched key?
    val sourceWins = mode match {
      case Unconditional | InsertOnly(_) => lit(true)
      case LastWriteWins(ts) =>
        col(s"t_$ts").isNull || col(s"s_$ts") > col(s"t_$ts")
    }

    val frozen: Set[String] = mode match {
      case InsertOnly(fc) => fc.toSet
      case _              => Set.empty
    }

    val out = cols.map { c =>
      val tc = col(s"t_$c"); val sc = col(s"s_$c")
      val updated =
        if (keys.contains(c)) tc // matched ⇒ keys equal
        else if (frozen(c)) tc
        else when(sourceWins, sc).otherwise(tc)
      when(sPresent && tExists, updated)      // matched: clause resolution
        .when(sPresent, sc)                   // source-only: insert
        .otherwise(tc)                        // target-only: keep
        .as(c)
    }
    joined.select(out: _*)
  }

  /** Type-2 slowly-changing-dimension history from a change stream:
    * every (key, change-ts) version becomes one history row with
    * `valid_from` = its timestamp, `valid_to` = the NEXT version's
    * timestamp (NULL for the current row), and `is_current`. The
    * "keep history" counterpart of the LWW upsert (which is SCD
    * type 1 — overwrite). One hash shuffle on the keys, one
    * partition-local sort for the `lead` — the same cost shape as
    * `latestPerKey`. Changes must be unique per (keys, tsCol);
    * pre-collapse with [[latestPerKey]] otherwise. */
  def scd2History(
      changes: DataFrame,
      keys: Seq[String],
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Apply a CDC changelog (Debezium/AWS DMS shape: per-row op code +
    * monotonic sequence) onto nothing — producing the final snapshot
    * the log describes. The row with the greatest `seqCol` per key
    * decides: op `D` ⇒ the key is absent from the snapshot, anything
    * else (`I`/`U`) ⇒ its row IS the current state. Late-arriving
    * lower-seq changes never override — the LWW discipline of the
    * daily sync generalized to explicit deletes (the one verb the
    * reference's upsert family cannot express).
    *
    * One hash shuffle on the keys + a per-partition sort (the
    * [[latestPerKey]] window) — linear at any scale; apply onto an
    * existing snapshot by unioning the snapshot in as seq −∞ `I` rows.
    * Sequence ties are broken by `opCol` descending (`U` > `I` > `D`
    * alphabetically reversed ⇒ a same-seq delete loses to the update —
    * pick unique sequences upstream if that matters). */
  def applyChangelog(
      changes: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: String): DataFrame =
    latestPerKey(changes, keys, seqCol, tieBreakers = Seq(opCol))
      .filter(col(opCol) =!= "D")

  /** Collapse a batch to one row per key, keeping the row with the
    * greatest `orderCol` (ties broken by the remaining columns for
    * determinism). The reference achieves this implicitly because its
    * daily extract has one row per PK. */
  def latestPerKey(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      tieBreakers: Seq[String] = Nil): DataFrame = {
    val ordering = (col(orderCol).desc +: tieBreakers.map(col(_).desc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
