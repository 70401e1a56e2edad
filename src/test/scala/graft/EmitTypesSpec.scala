package graft

import org.apache.spark.sql.types._

/** Emit-type lint over the ENTIRE gated catalog (VERDICT r12 item 2).
  *
  * The catalog has an emit convention the other 342 queries always
  * obeyed and nothing enforced: decimals (and any other exotic type)
  * are INTERNAL arithmetic; the output boundary carries only the
  * proven-green scalar set {BIGINT, INT, DOUBLE, VARCHAR, BOOLEAN}.
  * Three rounds in a row, newly added queries landed driver-red for
  * exactly this — the driver's typed hash canonicalizes a
  * Spark-parquet decimal and a DuckDB decimal differently even when
  * every value is bit-identical (r12's red set was precisely the 8
  * decimal-output queries). This walk builds every query's DataFrame
  * at sf0.001 and fails on ANY column outside the proven set, so the
  * regression class dies at `sbt test` time instead of costing a
  * round. (The GuardsSpec source-lint treatment, applied to schemas.)
  *
  * Date/Timestamp are deliberately NOT in the set: no green query has
  * ever emitted one (dates go through the shared `dateFmt` →
  * VARCHAR). Widening the set requires a driver-green round proving
  * the new type first.
  */
class EmitTypesSpec extends SparkSpecBase {

  private val Allowed: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, StringType, BooleanType)

  test("every gated query emits only proven-green boundary types " +
    "(no DECIMAL or other exotic column ever reaches the driver)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"testdata missing: $dir")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, dir).schema
          catch { case _: Throwable =>
            // a few queries assert scale-dependent plan shape
            // (q_join_aqe_skew needs real skew for AQE to split) —
            // their SCHEMA is still lintable one sf up
            try fn(spark, "/root/testdata/sf0.01").schema
            catch { case e: Throwable =>
              fail(s"$name failed to build at sf0.001 AND sf0.01: " +
                e.getMessage)
            }
          }
        schema.fields.collect {
          case f if !Allowed.contains(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(offenders.isEmpty,
      "columns outside the proven-green emit set (cast to BIGINT or " +
        "DOUBLE at the boundary — Guards.emitBigint / " +
        s"Guards.emitDouble):\n${offenders.mkString("\n")}")
  }
}
