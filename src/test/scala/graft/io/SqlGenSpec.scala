package graft.io

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert

/** Pins the generated SQL against the reference's literal statement
  * text (SURVEY.md §2.5; VERDICT r1 next-step 1: "unit tests pinning
  * the generated SQL text against the reference's strings").
  */
class SqlGenSpec extends AnyFunSuite {

  private val ordersCols = Seq(
    "orderid", "userid", "addedtocartat", "ordercreatedat",
    "amount", "product", "isdelivered")

  test("PG unconditional upsert matches orders_daily.py:296-308 clauses") {
    val sql = SqlGen.upsert(
      SqlDialect.Postgres, """public."orders"""", "orders",
      ordersCols, Seq("orderid"), Upsert.Unconditional)
    // conflict target built as quoted key list (:296-297)
    assert(sql.contains("""ON CONFLICT ("orderid") DO UPDATE SET"""))
    // update set = every non-key column as "col" = EXCLUDED."col" (:300)
    assert(sql.contains(""""userid" = EXCLUDED."userid""""))
    assert(sql.contains(""""isdelivered" = EXCLUDED."isdelivered""""))
    assert(!sql.contains(""""orderid" = EXCLUDED."orderid""""))
    // target form public."orders" (:305)
    assert(sql.startsWith("""INSERT INTO public."orders" ("orderid", "userid","""))
    assert(sql.contains("VALUES (?, ?, ?, ?, ?, ?, ?)"))
  }

  test("PG LWW upsert matches mssql_to_postgres_sync.pyc WHERE clause") {
    val sql = SqlGen.upsert(
      SqlDialect.Postgres, """public."transactions"""", "transactions",
      Seq("txcorrelationid", "tenantid", "updateddateutc", "txbaseamount"),
      Seq("txcorrelationid", "tenantid"),
      Upsert.LastWriteWins("updateddateutc"))
    // pyc strings: WHERE transactions.updateddateutc IS NULL
    //              OR EXCLUDED.updateddateutc > transactions.updateddateutc
    assert(sql.endsWith(
      """WHERE transactions."updateddateutc" IS NULL""" +
        """ OR EXCLUDED."updateddateutc" > transactions."updateddateutc""""))
    assert(sql.contains(
      """ON CONFLICT ("txcorrelationid", "tenantid") DO UPDATE SET"""))
  }

  test("upsert with every column a key is rejected (orders_daily.py:302)") {
    // reference: raise ValueError("UPSERT UPDATE SET boş olamaz.")
    assertThrows[IllegalArgumentException] {
      SqlGen.upsert(SqlDialect.Postgres, """public."t"""", "t",
        Seq("k1", "k2"), Seq("k1", "k2"), Upsert.Unconditional)
    }
  }

  test("MSSQL MERGE matches csv_to_mssqldb.py:409-443 clause shapes") {
    val cols = Seq(
      "OrderID", "UserID", "AddedToCartAt", "OrderCreatedAt",
      "Amount", "Product", "IsDelivered")
    val sql = SqlGen.merge(
      SqlDialect.SqlServer, "dbo.orders", "dbo.orders_staging",
      cols, Seq("OrderID"), Upsert.InsertOnly(Seq("OrderCreatedAt")))
    // ON condition t.[key] = s.[key] (:414)
    assert(sql.contains("ON (t.[OrderID] = s.[OrderID])"))
    // update set excludes keys AND OrderCreatedAt (:417-422)
    assert(sql.contains("t.[UserID] = s.[UserID]"))
    assert(!sql.contains("t.[OrderCreatedAt] = s.[OrderCreatedAt]"))
    assert(!sql.contains("t.[OrderID] = s.[OrderID],"))
    // T-SQL NOT MATCHED BY TARGET → INSERT all columns from s (:434-437)
    assert(sql.contains("WHEN NOT MATCHED BY TARGET THEN INSERT"))
    assert(sql.contains(
      "INSERT ([OrderID], [UserID], [AddedToCartAt], [OrderCreatedAt], " +
        "[Amount], [Product], [IsDelivered])"))
    assert(sql.contains(
      "VALUES (s.[OrderID], s.[UserID], s.[AddedToCartAt], " +
        "s.[OrderCreatedAt], s.[Amount], s.[Product], s.[IsDelivered])"))
    assert(sql.contains("USING dbo.orders_staging AS s"))
  }

  test("LWW MERGE guards the update clause, not the insert clause") {
    val sql = SqlGen.merge(
      SqlDialect.Derby, """"APP"."t"""", """"APP"."s"""",
      Seq("k", "ts", "v"), Seq("k"),
      Upsert.LastWriteWins("ts"), withByTarget = false)
    assert(sql.contains(
      """WHEN MATCHED AND (t."ts" IS NULL OR s."ts" > t."ts") THEN UPDATE"""))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT"))
    assert(!sql.contains("BY TARGET"))
  }

  test("PG truncate keeps RESTART IDENTITY (orders_daily.py:494)") {
    assert(SqlGen.truncate(SqlDialect.Postgres, """public."incomplete_orders"""")
      == """TRUNCATE TABLE public."incomplete_orders" RESTART IDENTITY""")
    // MSSQL staging truncate is the plain form (csv_to_mssqldb.py:450)
    assert(SqlGen.truncate(SqlDialect.SqlServer, "dbo.orders_staging")
      == "TRUNCATE TABLE dbo.orders_staging")
  }
}
