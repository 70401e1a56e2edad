package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source reads (S1–S3, S11): the reference's chunked
  * `pd.read_sql` extracts re-expressed as Spark JDBC scans with
  * predicate pushdown and partitioned parallel reads.
  *
  * Design decisions vs the reference:
  *  - The date slice `CAST(OrderCreatedAt AS DATE) = ds`
  *    (dags/mssql_to_postgresql_orders_daily.py:199) is rewritten as
  *    the half-open range `ts >= d AND ts < d+1day` — semantically
  *    identical for DATETIME values, but sargable: it pushes through
  *    every JDBC dialect and uses the source's index instead of
  *    defeating it with a per-row CAST (SURVEY.md §7.4 risk 2).
  *  - pandas' single-cursor `chunksize=5000` streaming (:203,119)
  *    becomes `fetchsize` (cursor batching) + `partitionColumn`/
  *    `numPartitions` (N parallel range-split cursors) — the
  *    distributed replacement for chunk iteration.
  */
object JdbcSources {

  /** One day's slice of a table: `WHERE tsCol >= date AND
    * tsCol < date + 1 day` pushed into the source DB. Bounds use the
    * JDBC `{ts '...'}` escape with the next-day computed driver-side,
    * so the same predicate text runs on PG, SQL Server, and Derby. */
  def dateSlice(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String,
      tsCol: String,
      date: String,
      numPartitions: Int = 1,
      fetchSize: Int = 5000): DataFrame = {
    val next = java.time.LocalDate.parse(date).plusDays(1)
    datePredicate(
      spark, cfg, table,
      s"$tsCol >= {ts '$date 00:00:00'} AND $tsCol < {ts '$next 00:00:00'}",
      tsCol, numPartitions, fetchSize)
  }

  /** Half-open timestamp range [start, endExclusive) — the backfill
    * extract (O3); same portable `{ts}` bounds as [[dateSlice]]. */
  def rangeSlice(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String,
      tsCol: String,
      start: String,
      endExclusive: String,
      numPartitions: Int = 1,
      fetchSize: Int = 5000): DataFrame =
    datePredicate(
      spark, cfg, table,
      s"$tsCol >= {ts '$start 00:00:00'} AND " +
        s"$tsCol < {ts '$endExclusive 00:00:00'}",
      tsCol, numPartitions, fetchSize)

  /** Full-table NULL-predicate scan (S2):
    * `WHERE tsCol IS NULL` (mssql_to_postgresql_orders_daily.py:373). */
  def nullSlice(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String,
      tsCol: String,
      fetchSize: Int = 5000): DataFrame =
    datePredicate(spark, cfg, table, s"$tsCol IS NULL", tsCol, 1, fetchSize)

  private def datePredicate(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String,
      predicate: String,
      tsCol: String,
      numPartitions: Int,
      fetchSize: Int): DataFrame = {
    // dbtable-as-subquery pins the predicate source-side regardless of
    // dialect pushdown support — the Spark equivalent of the
    // reference's literal `WHERE` inside the extract SQL string.
    val sub = s"(SELECT * FROM $table WHERE $predicate) AS graft_slice"
    var r = spark.read
      .format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", sub)
      .option("fetchsize", fetchSize)
    cfg.props.foreach { case (k, v) => r = r.option(k, v) }
    // Partitioned parallel read needs numeric/date bounds; for the
    // single-day slice the natural split column is the timestamp.
    if (numPartitions > 1)
      r = r.option("partitionColumn", tsCol)
        .option("numPartitions", numPartitions)
    r.load()
  }

  /** Validation count-back (S11): COUNT pushed to the DB
    * (dags/mssql_to_postgresql_orders_daily.py:561-566). A control-plane
    * scalar, so it runs on one driver-side connection — no Spark job. */
  def countWhere(cfg: JdbcConfig, table: String, predicate: String): Long = {
    val conn = JdbcWrite.connect(cfg)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"SELECT COUNT(*) FROM $table WHERE $predicate")
        rs.next()
        rs.getLong(1)
      } finally st.close()
    } finally conn.close()
  }

  /** Whole-table read (used by tests and the seed path's read-back). */
  def readTable(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", cfg.url).option("dbtable", table)
    cfg.props.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }
}
