package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class TopKSpec extends SparkSpecBase {

  test("bounded-heap grouped top-k equals the window formulation " +
    "regardless of partitioning, incl. ties and small groups") {
    import spark.implicits._
    // 3 groups: one large with duplicate scores (ties → id asc), one
    // exactly k, one smaller than k
    val rows = (1L to 40L).map(i => (1L, i, (i % 7).toDouble)) ++
      Seq((2L, 100L, 5.0), (2L, 101L, 5.0), (2L, 102L, 1.0)) ++
      Seq((3L, 200L, 9.0))
    val df = rows.toDF("g", "id", "score")
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id").asc)
    val expected = df
      .select(col("g"), col("id"), col("score"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    for (parts <- Seq(1, 5, 16)) {
      val got = df.repartition(parts)
        .groupBy(col("g"))
        .agg(TopK.topKAgg(col("score"), col("id"), 3).as("tk"))
        .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("g"), col("e.id"), (col("pos") + 1).as("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected, s"parts=$parts")
    }
  }
}
