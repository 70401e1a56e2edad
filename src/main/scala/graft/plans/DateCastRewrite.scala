package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Optimizer rule: `CAST(ts AS DATE) = <date>` → the half-open range
  * `ts >= d AND ts < d+1day`.
  *
  * The reference slices its incremental scans with exactly the cast
  * form (`WHERE CAST(OrderCreatedAt AS DATE) = ?` —
  * dags/mssql_to_postgresql_orders_daily.py:199), which defeats both
  * index use on the DB side and predicate pushdown on the engine side:
  * a cast wrapped around the column is opaque to parquet/JDBC filter
  * translation, so the scan reads everything (SURVEY.md §7.4 risk 2).
  * The rewritten range is sargable and pushes to any source.
  *
  * Semantics: in a fixed-offset session timezone, day `d` covers
  * exactly the timestamps in `[d 00:00, d+1 00:00)`, so the rewrite
  * is an identity — including NULL handling (NULL ts fails both
  * forms). Guarded to UTC sessions (graft pins UTC in
  * [[graft.core.Tables.RequiredConf]]): under a DST-shifting zone the
  * epoch arithmetic below would be wrong, so the rule simply bows
  * out rather than being subtly incorrect.
  */
object RewriteDateCastEquality extends Rule[LogicalPlan] {

  private val MicrosPerDay = 86400000000L

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.sessionLocalTimeZone != "UTC") plan
    else plan.transformAllExpressions {
      case EqualTo(Cast(ts, DateType, _, _), Literal(days: Int, DateType))
          if ts.dataType == TimestampType =>
        range(ts, days)
      case EqualTo(Literal(days: Int, DateType), Cast(ts, DateType, _, _))
          if ts.dataType == TimestampType =>
        range(ts, days)
    }

  private def range(ts: Expression, days: Int): Expression =
    And(
      GreaterThanOrEqual(ts, Literal(days * MicrosPerDay, TimestampType)),
      LessThan(ts, Literal((days + 1L) * MicrosPerDay, TimestampType)))
}

/** graft's SparkSessionExtensions: registered by
  * [[graft.core.Sessions]] via `spark.sql.extensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RewriteDateCastEquality)
}
