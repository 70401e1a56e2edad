package graft.run

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.core.{Conversions, Schemas, Sessions}
import graft.io._
import graft.operators.Upsert

/** Entry point 3 (SURVEY §3.3): CSV → staging → MERGE seed loader, the
  * Spark re-expression of csv_to_mssqldb.py.
  *
  * Usage:
  *   sbt "runMain graft.run.CsvSeed --csv /path/orders.csv \
  *        [--target-url jdbc:...] [--target-dialect derby] \
  *        [--run-date 2025-05-11]"
  *
  * Stages (each mirrors a reference step):
  *  1. read CSV with the DECLARED all-string schema — no inference
  *     (:210; schema inference is the source of the reference's type
  *     hacks, SURVEY §1.3);
  *  2. align/pad to the expected column list (F6, :226-234);
  *  3. typed coercion per column with per-column loss audit
  *     (C1-C5, :242-327 and :251-256);
  *  4. drop rows with NULL in any upsert-key column (F3, :337-362);
  *  5. stage + set-based MERGE with OrderCreatedAt insert-only
  *     (S9+S10, :410-466).
  */
object CsvSeed {

  /** Coerce one raw string column to its declared type (C1-C5). */
  private def coerce(c: Column, dt: DataType): Column = dt match {
    case LongType          => Conversions.tryToLong(c)
    case IntegerType       => Conversions.tryToInt(c)
    case d: DecimalType    => Conversions.tryToDecimal(c, d.precision, d.scale)
    case TimestampType     => Conversions.parseTimestampMulti(c)
    case BooleanType       => Conversions.parseBoolean(c)
    case StringType        => c
    case other             => c.try_cast(other)
  }

  /** Raw string frame → typed frame per `schema`, plus the per-column
    * coercion-loss audit (A3): one long per typed column. */
  def coerceWithAudit(
      raw: DataFrame,
      schema: StructType): (DataFrame, Map[String, Long]) = {
    val typed = raw.select(schema.fields.map(f =>
      coerce(col(f.name), f.dataType).as(f.name)).toIndexedSeq: _*)
    val auditCols = schema.fields.filter(_.dataType != StringType).map { f =>
      Conversions.coercionLossCount(col(f.name),
        coerce(col(f.name), f.dataType)).as(f.name)
    }
    val audit =
      if (auditCols.isEmpty) Map.empty[String, Long]
      else {
        val row = raw.agg(auditCols.head, auditCols.tail.toIndexedSeq: _*)
          .collect()(0)
        schema.fields.filter(_.dataType != StringType).zipWithIndex.map {
          case (f, i) => f.name -> row.getLong(i)
        }.toMap
      }
    (typed, audit)
  }

  /** The full read-and-transform stage (csv_to_mssqldb.py:183-370),
    * returned with its audit so tests can pin the fixture behavior.
    *
    * `runDate` (F7): keep only rows whose parsed OrderCreatedAt falls
    * on that logical date — the per-logical-date CSV filter of
    * deneme_3_case.pyc ("Filtering data for CreatedDateUtc =="),
    * applied AFTER coercion so the filter sees typed timestamps, in
    * the sargable half-open form. NULL timestamps drop out of a dated
    * run, like the reference's equality filter. */
  def readAndTransform(
      spark: SparkSession,
      path: String,
      keys: Seq[String],
      runDate: Option[String] = None): (DataFrame, Map[String, Long], Long) = {
    val raw = spark.read
      .option("header", "true")
      .option("quote", "\"")
      .schema(Schemas.ordersCsvRaw)
      .csv(path)
    val aligned = Conversions.alignToSchema(raw, Schemas.ordersCsvRaw)
    val (typed, audit) = coerceWithAudit(aligned, Schemas.orders)
    val sliced = runDate match {
      case Some(d) => typed.filter(
        Pipeline.daySlice(col("OrderCreatedAt"), d))
      case None => typed
    }
    val kept = sliced.na.drop("any", keys)
    val dropped = sliced.count() - kept.count()
    (kept, audit, dropped)
  }

  def main(args: Array[String]): Unit = {
    val opts = Args.parse(args)
    val cfg = opts.config
    val path = opts.get("csv")
      .orElse(cfg.csvFilePath)
      .getOrElse(sys.error("missing --csv (or CSV_FILE_PATH)"))
    // resolve configured lowercase key names against entity case
    val keys = cfg.uniqueKeyColumns.map { k =>
      Schemas.orders.fieldNames
        .find(_.equalsIgnoreCase(k.replace("_", ""))) // order_id ≙ OrderID
        .orElse(Schemas.orders.fieldNames.find(_.equalsIgnoreCase(k)))
        .getOrElse(k)
    }
    val spark = Sessions.local("graft-csv-seed")

    val runDate = opts.get("run-date")
    runDate.foreach(d =>
      println(s"[csv-seed] filtering data for OrderCreatedAt == $d"))
    val (batch, audit, droppedKeys) =
      readAndTransform(spark, path, keys, runDate)
    audit.toSeq.sortBy(_._1).foreach { case (c, n) =>
      if (n > 0) println(s"[csv-seed] coercion losses in $c: $n")
    }
    println(s"[csv-seed] rows dropped for NULL key: $droppedKeys")

    val d = cfg.targetDialect
    val jdbc = cfg.targetJdbc.copy(batchSize = cfg.stagingLoadChunkSize)
    val target = d.table(cfg.targetSchemaName, cfg.targetTable)
    val staging = d.table(cfg.targetSchemaName, cfg.stagingTable)
    JdbcWrite.ensureTable(jdbc, d, cfg.targetSchemaName, cfg.targetTable,
      Schemas.orders)
    JdbcWrite.ensureTable(jdbc, d, cfg.targetSchemaName, cfg.stagingTable,
      Schemas.orders)
    // OrderCreatedAt is set-once: excluded from MERGE updates
    // (csv_to_mssqldb.py:417-422)
    MergeSink.write(batch, jdbc, d, target, staging, keys,
      Upsert.InsertOnly(Seq("OrderCreatedAt")),
      withByTarget = d == SqlDialect.SqlServer)

    val loaded = JdbcSources.countWhere(jdbc, target, "1=1")
    val staged = batch.count()
    Pipeline.reconcile("csv-seed (target total ≥ batch)", staged,
      math.min(staged, loaded)) // target may hold prior rows; batch ⊆ target
    println(s"[csv-seed] batch=$staged targetTotal=$loaded")
    spark.stop()
  }
}
