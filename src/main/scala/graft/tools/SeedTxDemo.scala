package graft.tools

import java.sql.Timestamp

import graft.core.Schemas
import graft.io.{JdbcConfig, JdbcWrite, SqlDialect, SqlGen}

/** Seed a demo `transactions` source database (plain JDBC, no Spark) so
  * the `--entity transactions` sync entry can be driven end-to-end in
  * the sandbox — the stand-in for the reference's MSSQL source already
  * containing the wide entity.
  *
  * Usage:
  *   sbt "runMain graft.tools.SeedTxDemo jdbc:derby:/tmp/txsrc/db;create=true"
  *
  * Writes 90 deterministic rows across logical dates 2025-03-01..03
  * (30/day), key = tx-<n>, LWW timestamp a few hours after creation.
  */
object SeedTxDemo {

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: SeedTxDemo <jdbc-url>")
    val cfg = JdbcConfig(args(0))
    val d = SqlDialect.Derby
    val table = d.table("APP", "transactions")
    if (!JdbcWrite.tableExists(cfg, "APP", "transactions"))
      JdbcWrite.execute(cfg,
        SqlGen.createTable(d, table, Schemas.transactions))
    JdbcWrite.execute(cfg, s"DELETE FROM $table")

    val fields = Schemas.transactions.fieldNames
    val sql = SqlGen.insert(d, table, fields.toSeq)
    val conn = JdbcWrite.connect(cfg)
    try {
      conn.setAutoCommit(false)
      val ps = conn.prepareStatement(sql)
      try {
        for (n <- 0 until 90) {
          val day = 1 + n / 30
          val created = Timestamp.valueOf(
            f"2025-03-0$day%d ${8 + n % 12}%02d:00:00")
          val updated = Timestamp.valueOf(
            f"2025-03-0$day%d ${8 + n % 12}%02d:${n % 60}%02d:30")
          val vals = Map[String, Any](
            "TxCorrelationId" -> s"tx-$n",
            "TenantId" -> (n % 5).toLong,
            "TxGroupCorrelationId" -> s"g-${n % 10}",
            "TxRefCorrelationId" -> s"r-$n",
            "WalletId" -> (1000L + n),
            "FromAccountTypeId" -> (n % 3),
            "TxBaseAmount" ->
              new java.math.BigDecimal(n * 7 % 100).setScale(4),
            "CreatedDateUtc" -> created,
            "UpdatedDateUtc" -> updated,
            "IsHidden" -> (n % 7 == 0),
            "CurrencyCode" -> "TRY",
            "TransactionTypeCode" -> s"T${n % 4}",
            "TxAdditionalDataJson" ->
              s"""{"ch":"c${n % 3}","score":${n % 11}}""")
          Schemas.transactions.fields.zipWithIndex.foreach { case (f, i) =>
            vals.get(f.name) match {
              case Some(v) => ps.setObject(i + 1, v)
              case None => ps.setNull(i + 1, JdbcWrite.jdbcType(f.dataType))
            }
          }
          ps.addBatch()
        }
        ps.executeBatch()
        conn.commit()
      } finally ps.close()
    } finally conn.close()
    println(s"[seed-tx] 90 rows into $table at ${args(0)}")
  }
}
