package graft

import java.nio.file.{Files, Paths}

import graft.core.Sessions

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (dev loop
    // only — the driver always runs the full catalog)
    val only = args.lift(2).map(_.split(",").toSet)
    val spark = Sessions.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape (shared graft.core.Jsons definition) — a tab
    // or CR in builder-authored SQL would otherwise make the driver's
    // json.load fail and silently zero the round's correctness.
    def q(s: String): String = graft.core.Jsons.str(s)
    // Registration guard: an oracle whose key matches no query is a
    // DEAD GATE (it would never be compared against anything), and a
    // query without an oracle silently downgrades to the weaker
    // rows-only check — both fail loudly here instead.
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    require(orphanOracles.isEmpty,
      s"oracleSql keys with no matching query: $orphanOracles")
    val unGated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    if (unGated.nonEmpty)
      System.err.println(s"[verify] WARNING rows-only (no oracle): $unGated")
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Full catalog manifest: a query that throws before writing its
    // output must show up as a FAIL in the compare, not vanish. Written
    // from the FULL queries map even under a dev-loop filter, so the
    // manifest size always equals the registration size.
    Files.writeString(Paths.get(s"$outDir/catalog.json"),
      SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
