package graft.io

import org.apache.spark.sql.types._

import graft.operators.Upsert

/** Generated SQL text for the sink family (the reference's C10
  * "identifier quoting / SQL generation" surface). Pure string
  * building — unit-testable without any database.
  *
  * Shapes replicated from the reference:
  *  - PG upsert: `INSERT INTO public."t" (cols) VALUES %s ON CONFLICT
  *    (keys) DO UPDATE SET c = EXCLUDED.c, ...`
  *    (dags/mssql_to_postgresql_orders_daily.py:296-308); the JDBC
  *    writer uses a `(?, ?, ...)` placeholder tuple with addBatch in
  *    place of psycopg2's `%s` page expansion.
  *  - conditional (last-write-wins) upsert: same plus `WHERE t.ts IS
  *    NULL OR EXCLUDED.ts > t.ts`
  *    (dags/__pycache__/mssql_to_postgres_sync.cpython-38.pyc strings).
  *  - MSSQL MERGE: `MERGE dbo.t AS t USING dbo.staging AS s ON (...)
  *    WHEN MATCHED THEN UPDATE SET ... WHEN NOT MATCHED BY TARGET THEN
  *    INSERT (...) VALUES (...)` with key + insert-only columns
  *    excluded from the update set (csv_to_mssqldb.py:409-443).
  *  - full refresh: `TRUNCATE TABLE public."t" RESTART IDENTITY` then
  *    plain INSERT (dags/mssql_to_postgresql_orders_daily.py:494-505).
  */
object SqlGen {

  private def placeholders(n: Int): String =
    Seq.fill(n)("?").mkString("(", ", ", ")")

  /** Plain batched INSERT (the full-refresh load statement). */
  def insert(d: SqlDialect, table: String, cols: Seq[String]): String = {
    val colList = cols.map(d.quote).mkString(", ")
    s"INSERT INTO $table ($colList) VALUES ${placeholders(cols.size)}"
  }

  /** PostgreSQL-style `INSERT ... ON CONFLICT` upsert, one row per
    * execution (batched by the writer). `conflictTable` is the bare
    * table name used to qualify the target side of the LWW predicate —
    * the reference writes `transactions.updateddateutc`, not the
    * schema-qualified form.
    */
  def upsert(
      d: SqlDialect,
      table: String,
      conflictTable: String,
      cols: Seq[String],
      keys: Seq[String],
      mode: Upsert.Mode): String = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val colList = cols.map(d.quote).mkString(", ")
    val conflictTarget = keys.map(d.quote).mkString(", ")
    val updateCols = cols.filterNot(keys.contains)
    require(updateCols.nonEmpty, "UPSERT UPDATE SET cannot be empty")
    val updateSet = updateCols
      .map(c => s"${d.quote(c)} = EXCLUDED.${d.quote(c)}")
      .mkString(", ")
    val base =
      s"INSERT INTO $table ($colList) VALUES ${placeholders(cols.size)} " +
        s"ON CONFLICT ($conflictTarget) DO UPDATE SET $updateSet"
    mode match {
      case Upsert.Unconditional => base
      case Upsert.LastWriteWins(ts) =>
        val t = s"$conflictTable.${d.quote(ts)}"
        s"$base WHERE $t IS NULL OR EXCLUDED.${d.quote(ts)} > $t"
      case Upsert.InsertOnly(frozen) =>
        val set = updateCols
          .filterNot(frozen.contains)
          .map(c => s"${d.quote(c)} = EXCLUDED.${d.quote(c)}")
          .mkString(", ")
        require(set.nonEmpty, "UPSERT UPDATE SET cannot be empty")
        s"INSERT INTO $table ($colList) VALUES ${placeholders(cols.size)} " +
          s"ON CONFLICT ($conflictTarget) DO UPDATE SET $set"
    }
  }

  /** Set-based MERGE from a staging table (csv_to_mssqldb.py:409-443).
    * `withByTarget` controls the `NOT MATCHED [BY TARGET]` spelling:
    * T-SQL writes `BY TARGET`, ANSI/Derby omits it.
    */
  def merge(
      d: SqlDialect,
      target: String,
      staging: String,
      cols: Seq[String],
      keys: Seq[String],
      mode: Upsert.Mode,
      withByTarget: Boolean = true): String = {
    require(keys.nonEmpty, "MERGE requires at least one key column")
    val onCond =
      keys.map(k => s"t.${d.quote(k)} = s.${d.quote(k)}").mkString(" AND ")
    val frozen: Set[String] = mode match {
      case Upsert.InsertOnly(fc) => fc.toSet
      case _                     => Set.empty
    }
    val updateSet = cols
      .filterNot(keys.contains)
      .filterNot(frozen)
      .map(c => s"t.${d.quote(c)} = s.${d.quote(c)}")
      .mkString(", ")
    require(updateSet.nonEmpty, "MERGE UPDATE SET cannot be empty")
    val matched = mode match {
      case Upsert.LastWriteWins(ts) =>
        val tq = s"t.${d.quote(ts)}"; val sq = s"s.${d.quote(ts)}"
        s"WHEN MATCHED AND ($tq IS NULL OR $sq > $tq) THEN UPDATE SET $updateSet"
      case _ =>
        s"WHEN MATCHED THEN UPDATE SET $updateSet"
    }
    val insertCols = cols.map(d.quote).mkString(", ")
    val insertVals = cols.map(c => s"s.${d.quote(c)}").mkString(", ")
    val notMatched = if (withByTarget) "NOT MATCHED BY TARGET" else "NOT MATCHED"
    s"MERGE INTO $target AS t USING $staging AS s ON ($onCond) " +
      s"$matched WHEN $notMatched THEN INSERT ($insertCols) VALUES ($insertVals)"
  }

  /** Full-refresh truncate. PG spelling keeps the reference's
    * `RESTART IDENTITY` (mssql_to_postgresql_orders_daily.py:494);
    * other dialects take the plain form (csv_to_mssqldb.py:450). */
  def truncate(d: SqlDialect, table: String): String = d match {
    case SqlDialect.Postgres => s"TRUNCATE TABLE $table RESTART IDENTITY"
    case _                   => s"TRUNCATE TABLE $table"
  }

  /** CREATE TABLE from a Spark schema — used to stand up staging/test
    * tables; type mapping covers the reference's column types
    * (mssql_init/mssql_init.sql:24-32). */
  def createTable(d: SqlDialect, table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType              => "BIGINT"
        case IntegerType           => "INTEGER"
        case ShortType             => "SMALLINT"
        case DoubleType            => "DOUBLE"
        case FloatType             => "REAL"
        case BooleanType           => "BOOLEAN"
        case TimestampType         => "TIMESTAMP"
        case DateType              => "DATE"
        case dt: DecimalType       => s"DECIMAL(${dt.precision}, ${dt.scale})"
        case StringType            => "VARCHAR(4000)"
        case BinaryType            => "BLOB"
        case other =>
          throw new IllegalArgumentException(s"no JDBC type for $other")
      }
      s"${d.quote(f.name)} $t"
    }
    s"CREATE TABLE $table (${cols.mkString(", ")})"
  }
}
