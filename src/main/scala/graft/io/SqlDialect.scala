package graft.io

/** Identifier quoting per target DB, mirroring the reference's two
  * styles: PostgreSQL double quotes
  * (dags/mssql_to_postgresql_orders_daily.py:292) and SQL Server
  * brackets (csv_to_mssqldb.py:410-411). Derby (used by the test suite
  * as the in-JVM JDBC target — it ships with Spark) uses ANSI double
  * quotes like PostgreSQL.
  */
sealed trait SqlDialect {
  def quote(ident: String): String

  /** schema-qualified, quoted table reference, e.g. `public."orders"`
    * or `dbo.orders` — the reference qualifies PG tables as
    * `public."t"` (quoted table, bare schema) and MSSQL as `dbo.t`
    * (both bare); replicated exactly. */
  def table(schema: String, name: String): String
}

object SqlDialect {

  /** PostgreSQL: `"ident"`, tables as `public."orders"`
    * (mssql_to_postgresql_orders_daily.py:305). */
  case object Postgres extends SqlDialect {
    def quote(ident: String): String = "\"" + ident + "\""
    def table(schema: String, name: String): String =
      s"""$schema."$name""""
  }

  /** SQL Server: `[ident]`, tables as `dbo.orders`
    * (csv_to_mssqldb.py:410,434-435). */
  case object SqlServer extends SqlDialect {
    def quote(ident: String): String = "[" + ident + "]"
    def table(schema: String, name: String): String = s"$schema.$name"
  }

  /** Apache Derby (test target): ANSI `"ident"`; Derby folds unquoted
    * identifiers to upper case, so everything is quoted. */
  case object Derby extends SqlDialect {
    def quote(ident: String): String = "\"" + ident + "\""
    def table(schema: String, name: String): String =
      s""""$schema"."$name""""
  }
}
