package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.operators.Upsert

/** The wide transactions entity end-to-end: schema shape, composite-key
  * upsert over it, and typed JSON extraction from the
  * TxAdditionalDataJson column (SURVEY §1.2). */
class SchemasSpec extends SparkSpecBase {

  test("transactions schema has the 57 recovered columns, key first") {
    assert(Schemas.transactions.fields.length == 57)
    assert(Schemas.transactionsKey.forall(Schemas.transactions.fieldNames.contains))
    // one of each family
    assert(Schemas.transactions("TxBaseAmount").dataType == DecimalType(18, 4))
    assert(Schemas.transactions("CreatedDateUtc").dataType == TimestampType)
    assert(Schemas.transactions("IsHidden").dataType == BooleanType)
    assert(Schemas.transactions("TxAdditionalDataJson").dataType == StringType)
  }

  private def txRow(cid: String, tenant: Long, updated: String,
      amount: String, json: String): Row = {
    val base = Map[String, Any](
      "TxCorrelationId" -> cid,
      "TenantId" -> tenant,
      "TxGroupCorrelationId" -> s"g-$cid",
      "TxRefCorrelationId" -> s"r-$cid",
      "TxBaseAmount" -> new java.math.BigDecimal(amount).setScale(4),
      "UpdatedDateUtc" -> java.sql.Timestamp.valueOf(updated),
      "IsHidden" -> false,
      "TxAdditionalDataJson" -> json)
    Row(Schemas.transactions.fields.map(f =>
      base.get(f.name).orNull): _*)
  }

  private def txDf(rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), Schemas.transactions)

  test("composite-key LWW upsert over the wide entity") {
    val target = txDf(
      txRow("c1", 1, "2025-01-01 00:00:00", "10.0", """{"ch":"web"}"""),
      txRow("c2", 1, "2025-01-02 00:00:00", "20.0", """{"ch":"app"}"""))
    val batch = txDf(
      txRow("c1", 1, "2025-02-01 00:00:00", "11.0", """{"ch":"pos"}"""), // newer
      txRow("c2", 1, "2024-12-01 00:00:00", "99.0", """{"ch":"x"}"""),   // older
      txRow("c3", 2, "2025-01-03 00:00:00", "30.0", """{"ch":"web"}""")) // new
    val out = Upsert(target, batch, Schemas.transactionsKey,
      Upsert.LastWriteWins("UpdatedDateUtc"))
    val amounts = out.collect().map(r =>
      r.getAs[String]("TxCorrelationId") ->
        r.getAs[java.math.BigDecimal]("TxBaseAmount").toPlainString).toMap
    assert(amounts == Map(
      "c1" -> "11.0000", // LWW applied
      "c2" -> "20.0000", // older batch row rejected
      "c3" -> "30.0000")) // inserted
  }

  test("typed from_json extraction over TxAdditionalDataJson") {
    val df = txDf(
      txRow("c1", 1, "2025-01-01 00:00:00", "1.0", """{"ch":"web","score":7}"""),
      txRow("c2", 1, "2025-01-01 00:00:00", "1.0", """not json"""))
    val parsed = df.select(col("TxCorrelationId"),
      from_json(col("TxAdditionalDataJson"),
        StructType(Seq(
          StructField("ch", StringType),
          StructField("score", LongType)))).as("j"))
      .select(col("TxCorrelationId"), col("j.ch"), col("j.score"))
      .collect().map(r => (r.getString(0), r.getString(1), Option(r.get(2))))
      .toSet
    assert(parsed == Set(
      ("c1", "web", Some(7L)),
      ("c2", null, None))) // malformed JSON → NULLs, never a job failure
  }
}
