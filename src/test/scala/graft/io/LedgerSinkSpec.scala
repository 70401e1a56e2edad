package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Exactly-once append against embedded Derby: the (batch_id,
  * partition_id) ledger makes whole-batch re-runs (the coarsest retry:
  * a re-submitted job) byte-for-byte no-ops, while new batches append.
  */
class LedgerSinkSpec extends SparkSpecBase {

  private val dialect = SqlDialect.Derby
  private val cfg = JdbcConfig("jdbc:derby:memory:graftledger;create=true",
    batchSize = 2)

  test("same batch twice = no duplicates; new batch appends; ledger " +
    "tracks per-partition counts") {
    import spark.implicits._
    val df = spark.range(100)
      .select(col("id"), (col("id") % 7).as("v"))
      .repartition(4)
    JdbcWrite.ensureTable(cfg, dialect, "APP", "facts", df.schema)
    LedgerSink.ensureLedger(cfg, dialect, "APP", "facts_ledger")
    val table = dialect.table("APP", "facts")
    val ledger = dialect.table("APP", "facts_ledger")

    LedgerSink.write(df, cfg, dialect, table, ledger, "b1")
    assert(JdbcSources.countWhere(cfg, table, "1=1") == 100L)

    // whole-batch re-run: every partition finds its ledger row, skips
    LedgerSink.write(df, cfg, dialect, table, ledger, "b1")
    assert(JdbcSources.countWhere(cfg, table, "1=1") == 100L)

    // a NEW batch id appends
    LedgerSink.write(df, cfg, dialect, table, ledger, "b2")
    assert(JdbcSources.countWhere(cfg, table, "1=1") == 200L)

    // ledger: 4 partitions × 2 batches, counts sum to the rows written
    assert(JdbcSources.countWhere(cfg, ledger, "1=1") == 8L)
    val read = spark.read.jdbc(cfg.url, ledger, cfg.properties)
    assert(read.agg(sum(col("n_rows"))).collect()(0).getLong(0) == 200L)

    // the ledger PK rejects a duplicate (batch, partition) marker —
    // the race-loser guarantee
    val ex = intercept[Exception] {
      JdbcWrite.execute(cfg,
        s"INSERT INTO $ledger VALUES ('b1', 0, 0)")
    }
    assert(ex.getMessage.toLowerCase.contains("duplicate") ||
      ex.getMessage.contains("23505"))
  }
}
