package graft.run

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.core.{Conversions, Schemas, Sessions}
import graft.io._
import graft.operators.Upsert

/** Entry point 3 (SURVEY §3.3): CSV → staging → MERGE seed loader, the
  * Spark re-expression of csv_to_mssqldb.py — entity-generic, covering
  * both the 7-column orders seed and the wide ~57-column transactions
  * seed of the `deneme_3_case` pyc DAG (same flow, different entity:
  * "Filtering data for CreatedDateUtc ==", transactions_staging,
  * composite conflict key).
  *
  * Usage:
  *   sbt "runMain graft.run.CsvSeed --csv /path/orders.csv \
  *        [--entity orders|transactions] [--target-url jdbc:...] \
  *        [--target-dialect derby] [--run-date 2025-05-11]"
  *
  * Stages (each mirrors a reference step; line cites are
  * csv_to_mssqldb.py — the deneme_3_case pyc replays the same
  * function bodies for transactions):
  *  1. read CSV with the DECLARED all-string schema — no inference
  *     (:210; schema inference is the source of the reference's type
  *     hacks, SURVEY §1.3);
  *  2. align/pad to the expected column list (F6, :226-234);
  *  3. typed coercion per column with per-column loss audit
  *     (C1-C5, :242-327 and :251-256);
  *  4. drop rows with NULL in any upsert-key column (F3, :337-362);
  *  5. stage + set-based MERGE with the entity's creation timestamp
  *     insert-only (S9+S10, :410-466).
  */
object CsvSeed {

  /** What a CSV-seedable entity needs beyond its schema: the
    * logical-date filter column (the reference filters the
    * transactions CSV on `CreatedDateUtc`, the orders CSV on
    * `OrderCreatedAt`), the default conflict key, and the MERGE mode
    * (creation timestamp set-once in both DAGs —
    * csv_to_mssqldb.py:417-422). Casing is the CSV/MSSQL edge
    * (PascalCase), because the seed target IS the source database of
    * the daily sync. */
  final case class SeedEntity(
      name: String,
      schema: StructType,
      dateCol: String,
      defaultKeys: Seq[String],
      mode: Upsert.Mode)

  val entities: Map[String, SeedEntity] = Map(
    "orders" -> SeedEntity("orders", Schemas.orders, "OrderCreatedAt",
      Schemas.ordersKey, Upsert.InsertOnly(Seq("OrderCreatedAt"))),
    "transactions" -> SeedEntity("transactions", Schemas.transactions,
      "CreatedDateUtc", Schemas.transactionsKey,
      Upsert.InsertOnly(Seq("CreatedDateUtc"))))

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
    * `runDate` (F7): keep only rows whose parsed `dateCol` falls on
    * that logical date — the per-logical-date CSV filter of
    * deneme_3_case.pyc ("Filtering data for CreatedDateUtc =="),
    * applied AFTER coercion so the filter sees typed timestamps, in
    * the sargable half-open form. NULL timestamps drop out of a dated
    * run, like the reference's equality filter. */
  def readAndTransform(
      spark: SparkSession,
      path: String,
      keys: Seq[String],
      runDate: Option[String] = None,
      schema: StructType = Schemas.orders,
      dateCol: String = "OrderCreatedAt"): (DataFrame, Map[String, Long], Long) = {
    val rawSchema =
      StructType(schema.fields.map(f => StructField(f.name, StringType)))
    val raw = spark.read
      .option("header", "true")
      .option("quote", "\"")
      // RFC-4180 doubled-quote escaping, the csv module/pandas default
      // the reference reads with (JSON-in-string columns of the
      // transactions CSV carry embedded quotes); Spark's default
      // escape is backslash
      .option("escape", "\"")
      .schema(rawSchema)
      .csv(path)
    val aligned = Conversions.alignToSchema(raw, rawSchema)
    val (typed, audit) = coerceWithAudit(aligned, schema)
    val sliced = runDate match {
      case Some(d) => typed.filter(Pipeline.daySlice(col(dateCol), d))
      case None => typed
    }
    val kept = sliced.na.drop("any", keys)
    val dropped = sliced.count() - kept.count()
    (kept, audit, dropped)
  }

  /** Resolve configured key names (lowercase/underscored at the env
    * edge, e.g. `order_id`, `txcorrelationid`) against the entity's
    * CSV-edge casing; names that resolve for a DIFFERENT entity (the
    * env default `order_id` during a transactions seed) fall back to
    * the entity's own conflict key. */
  def resolveKeys(se: SeedEntity, configured: Seq[String]): Seq[String] = {
    val resolved = configured.map { k =>
      se.schema.fieldNames
        .find(_.equalsIgnoreCase(k.replace("_", ""))) // order_id ≙ OrderID
        .orElse(se.schema.fieldNames.find(_.equalsIgnoreCase(k)))
        .getOrElse(k)
    }
    if (resolved.forall(se.schema.fieldNames.contains)) resolved
    else {
      println(s"[csv-seed] configured keys ${configured.mkString(",")} " +
        s"don't all exist on ${se.name}; using entity key " +
        se.defaultKeys.mkString(","))
      se.defaultKeys
    }
  }

  /** One seed run, callable from tests: read+transform the CSV, stage
    * + MERGE into the target, count back. Returns (staged, loaded). */
  def seed(
      spark: SparkSession,
      cfg: Config,
      se: SeedEntity,
      path: String,
      runDate: Option[String]): (Long, Long) = {
    val keys = resolveKeys(se, cfg.uniqueKeyColumns)
    runDate.foreach(d =>
      println(s"[csv-seed] filtering data for ${se.dateCol} == $d"))
    val (batch, audit, droppedKeys) =
      readAndTransform(spark, path, keys, runDate, se.schema, se.dateCol)
    audit.toSeq.sortBy(_._1).foreach { case (c, n) =>
      if (n > 0) println(s"[csv-seed] coercion losses in $c: $n")
    }
    println(s"[csv-seed] rows dropped for NULL key: $droppedKeys")

    val d = cfg.targetDialect
    val jdbc = cfg.targetJdbc.copy(batchSize = cfg.stagingLoadChunkSize)
    val target = d.table(cfg.targetSchemaName, cfg.targetTable)
    val staging = d.table(cfg.targetSchemaName, cfg.stagingTable)
    JdbcWrite.ensureTable(jdbc, d, cfg.targetSchemaName, cfg.targetTable,
      se.schema)
    JdbcWrite.ensureTable(jdbc, d, cfg.targetSchemaName, cfg.stagingTable,
      se.schema)
    MergeSink.write(batch, jdbc, d, target, staging, keys, se.mode,
      withByTarget = d == SqlDialect.SqlServer)

    val loaded = JdbcSources.countWhere(jdbc, target, "1=1")
    val staged = batch.count()
    Pipeline.reconcile("csv-seed (target total ≥ batch)", staged,
      math.min(staged, loaded)) // target may hold prior rows; batch ⊆ target
    println(s"[csv-seed] batch=$staged targetTotal=$loaded")
    (staged, loaded)
  }

  def main(args: Array[String]): Unit = {
    val opts = Args.parse(args)
    val entityName = opts.get("entity").getOrElse("orders")
    val se = entities.getOrElse(entityName,
      sys.error(s"unknown --entity $entityName (orders | transactions)"))
    val cfg0 = opts.config
    // env defaults name the orders tables; a transactions seed that
    // wasn't given explicit names substitutes transactions /
    // transactions_staging (the reference's STAGING_TABLE_NAME)
    val cfg = cfg0.copy(
      targetTable =
        if (cfg0.targetTable == "orders") se.name else cfg0.targetTable,
      stagingTable = if (cfg0.stagingTable == "orders_staging")
        s"${se.name}_staging" else cfg0.stagingTable)
    val path = opts.get("csv")
      .orElse(cfg.csvFilePath)
      .getOrElse(sys.error("missing --csv (or CSV_FILE_PATH)"))
    val spark = Sessions.local("graft-csv-seed")
    seed(spark, cfg, se, path, opts.get("run-date"))
    spark.stop()
  }
}
