package graft.run

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpecBase
import graft.core.{Entities, Schemas}
import graft.io.{JdbcSources, JdbcWrite, RefreshSink, SqlDialect, SqlGen}

/** End-to-end transactions sync against embedded Derby, source AND
  * target (the DB-to-DB topology of
  * dags/__pycache__/mssql_to_postgres_sync.cpython-38.pyc /
  * mssql_to_postgresql_daily.cpython-38.pyc): the wide 57-column
  * entity, day-sliced on `CreatedDateUtc` (S3), lowercased (F5),
  * MERGE-upserted on the 4-column composite key with last-write-wins
  * on `updateddateutc` (S7), then count-back validated (S11).
  *
  * The source table keeps MSSQL casing; the target gets the lowercased
  * rename — both edges of the reference's casing contract are live in
  * one test.
  */
class TxSyncSpec extends SparkSpecBase {

  private val e = Entities.transactions

  private val srcCfg = graft.io.JdbcConfig(
    "jdbc:derby:memory:txsrc;create=true", batchSize = 7)

  // Config as DailySync's entity branch would build it: Derby source +
  // Derby target, transactions table names.
  private val cfg = Config.fromEnv(Map(
    "GRAFT_SOURCE_URL" -> srcCfg.url,
    "GRAFT_TARGET_URL" -> "jdbc:derby:memory:txdst;create=true",
    "SOURCE_TABLE_NAME" -> "transactions",
    "TARGET_TABLE_NAME" -> "transactions",
    "STAGING_TABLE_NAME" -> "transactions_staging"))

  private val srcTable = SqlDialect.Derby.table("APP", "transactions")

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def dec(s: String): java.math.BigDecimal =
    new java.math.BigDecimal(s).setScale(4)

  /** A full 57-column row with the listed fields set, rest NULL. */
  private def txRow(cid: String, tenant: Long, created: String,
      updated: String, amount: String, json: String): Row = {
    val vals = Map[String, Any](
      "TxCorrelationId" -> cid,
      "TenantId" -> tenant,
      "TxGroupCorrelationId" -> s"g-$cid",
      "TxRefCorrelationId" -> s"r-$cid",
      "WalletId" -> (tenant * 100),
      "FromAccountTypeId" -> 3,
      "TxBaseAmount" -> dec(amount),
      "CreatedDateUtc" -> ts(created),
      "UpdatedDateUtc" -> ts(updated),
      "IsHidden" -> false,
      "CurrencyCode" -> "TRY",
      "TxAdditionalDataJson" -> json)
    Row(Schemas.transactions.fields.map(f => vals.get(f.name).orNull): _*)
  }

  private def txDf(rows: Row*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 3), Schemas.transactions)

  // Day 1 has keys A and B; day 2 has key C.
  private def seedRows = Seq(
    txRow("A", 1, "2025-03-01 08:00:00", "2025-03-01 08:00:00", "10.0",
      """{"ch":"web","score":7}"""),
    txRow("B", 1, "2025-03-01 09:00:00", "2025-03-01 09:00:00", "20.0",
      """{"ch":"app","score":3}"""),
    txRow("C", 2, "2025-03-02 10:00:00", "2025-03-02 10:00:00", "30.0",
      """{"ch":"pos","score":9}"""))

  private def ensureSource(): Unit = {
    if (!JdbcWrite.tableExists(srcCfg, "APP", "transactions"))
      JdbcWrite.execute(srcCfg,
        SqlGen.createTable(SqlDialect.Derby, srcTable, Schemas.transactions))
  }

  private def syncDay(date: String): (Long, Long) = {
    val slice = Pipeline.extractEntityForDay(spark, cfg, e, date)
    val extracted = slice.count()
    Pipeline.loadEntityBatch(cfg, e, slice)
    (extracted, Pipeline.countEntityLoadedForDay(cfg, e, date))
  }

  private def targetState(): Map[String, (String, Timestamp, String)] =
    JdbcSources.readTable(spark, cfg.targetJdbc,
      cfg.targetDialect.table(cfg.targetSchemaName, cfg.targetTable))
      .collect().map { r =>
        r.getAs[String]("txcorrelationid") ->
          ((r.getAs[java.math.BigDecimal]("txbaseamount").toPlainString,
            r.getAs[Timestamp]("updateddateutc"),
            r.getAs[String]("txadditionaldatajson")))
      }.toMap

  test("two-day sync, LWW conflict resolution, idempotent replay (S3/S7)") {
    ensureSource()
    RefreshSink.write(txDf(seedRows: _*), srcCfg, SqlDialect.Derby, srcTable)
    Pipeline.ensureEntityTables(cfg, e)

    // Day 1: A, B. Day 2: C. Counts reconcile via target count-back.
    assert(syncDay("2025-03-01") == ((2L, 2L)))
    assert(syncDay("2025-03-02") == ((1L, 1L)))
    val afterInitial = targetState()
    assert(afterInitial.keySet == Set("A", "B", "C"))
    assert(afterInitial("A")._1 == "10.0000")

    // Source mutates: A gets a genuinely newer update; B's updateddateutc
    // moves BACKWARD (an out-of-order replica write) — LWW must apply A
    // and reject B on the replay of day 1.
    JdbcWrite.execute(srcCfg,
      s"""UPDATE $srcTable SET "TxBaseAmount" = 11.5, """ +
        """"UpdatedDateUtc" = {ts '2025-03-05 00:00:00'}, """ +
        """"TxAdditionalDataJson" = '{"ch":"pos","score":8}' """ +
        """WHERE "TxCorrelationId" = 'A'""",
      s"""UPDATE $srcTable SET "TxBaseAmount" = 99.0, """ +
        """"UpdatedDateUtc" = {ts '2025-02-01 00:00:00'} """ +
        """WHERE "TxCorrelationId" = 'B'""")

    // Replay day 1 (the reference's catchup rerun): extract still finds
    // both rows (CreatedDateUtc unchanged), the MERGE applies LWW.
    assert(syncDay("2025-03-01") == ((2L, 2L)))
    val afterReplay = targetState()
    assert(afterReplay("A") ==
      (("11.5000", ts("2025-03-05 00:00:00"), """{"ch":"pos","score":8}""")))
    assert(afterReplay("B") ==
      (("20.0000", ts("2025-03-01 09:00:00"), """{"ch":"app","score":3}""")),
      "stale source update must lose LWW")
    assert(afterReplay("C") == afterInitial("C"))

    // Idempotency (O5): replaying the same day again changes nothing.
    assert(syncDay("2025-03-01") == ((2L, 2L)))
    assert(targetState() == afterReplay)
  }

  test("range backfill (O3): single-scan 3-day extract, per-date " +
    "reconciliation, idempotent replay") {
    // isolated DBs so earlier tests' LWW mutations can't leak in
    val src2 = graft.io.JdbcConfig(
      "jdbc:derby:memory:txsrc_range;create=true", batchSize = 7)
    val cfg2 = Pipeline.entityConfig(
      Config.fromEnv(Map(
        "GRAFT_SOURCE_URL" -> src2.url,
        "GRAFT_TARGET_URL" -> "jdbc:derby:memory:txdst_range;create=true")),
      e)
    assert(cfg2.sourceTable == "transactions" &&
      cfg2.stagingTable == "transactions_staging")
    JdbcWrite.execute(src2,
      SqlGen.createTable(SqlDialect.Derby, srcTable, Schemas.transactions))
    // day 1: A, B; day 2: C; day 3: D — plus an out-of-range day 4 row
    // that the half-open range scan must NOT pick up
    RefreshSink.write(txDf(seedRows ++ Seq(
      txRow("D", 3, "2025-03-03 11:00:00", "2025-03-03 11:00:00", "40.0",
        """{"ch":"web","score":1}"""),
      txRow("E", 3, "2025-03-04 00:00:00", "2025-03-04 00:00:00", "50.0",
        """{"ch":"app","score":2}""")): _*),
      src2, SqlDialect.Derby, srcTable)
    Pipeline.ensureEntityTables(cfg2, e)

    def runRange(): Map[String, Long] = {
      val slice = Pipeline
        .extractEntityForRange(spark, cfg2, e, "2025-03-01", "2025-03-03")
        .cache()
      val extracted = slice
        .groupBy(org.apache.spark.sql.functions.to_date(
          slice(e.incrementalColumn)).as("d"))
        .count()
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      Pipeline.loadEntityBatch(cfg2, e, slice)
      slice.unpersist()
      extracted
    }

    val extracted = runRange()
    assert(extracted == Map(
      "2025-03-01" -> 2L, "2025-03-02" -> 1L, "2025-03-03" -> 1L))
    // count-back per date reconciles; day 4 never crossed
    for ((d, n) <- extracted)
      assert(Pipeline.countEntityLoadedForDay(cfg2, e, d) == n)
    assert(Pipeline.countEntityLoadedForDay(cfg2, e, "2025-03-04") == 0L)

    // idempotency (O5): replaying the whole range is a no-op
    val before = JdbcSources.readTable(spark, cfg2.targetJdbc,
      cfg2.targetDialect.table(cfg2.targetSchemaName, cfg2.targetTable))
      .collect().map(_.toString).sorted.toSeq
    assert(runRange() == extracted)
    val after = JdbcSources.readTable(spark, cfg2.targetJdbc,
      cfg2.targetDialect.table(cfg2.targetSchemaName, cfg2.targetTable))
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(after.size == 4)
  }

  test("target edge is fully lowercased, all 57 columns present (F5/F6)") {
    ensureSource()
    Pipeline.ensureEntityTables(cfg, e)
    val tgt = JdbcSources.readTable(spark, cfg.targetJdbc,
      cfg.targetDialect.table(cfg.targetSchemaName, cfg.targetTable))
    assert(tgt.columns.length == 57)
    assert(tgt.columns.forall(c => c == c.toLowerCase))
    assert(tgt.columns.toSeq ==
      Schemas.transactions.fieldNames.map(_.toLowerCase).toSeq)
  }
}
