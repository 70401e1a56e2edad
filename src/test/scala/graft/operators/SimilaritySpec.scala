package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

/** ANN quality sanity on the real testdata: the approximate paths must
  * recover a meaningful share of the exact top-k, and the IVF cell
  * assignment must cover the corpus exactly once. */
class SimilaritySpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF top-k recalls a substantial share of exact top-k") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 5)
    val exact = pairsOf(
      Similarity.topKPerQuery(emb, q, "vec_id", "embedding", k = 10))
    val ivf = pairsOf(
      Similarity.ivfTopKPerQuery(emb, q, "vec_id", "embedding",
        k = 10, nCells = 16, nProbe = 4))
    assert(ivf.size == exact.size) // k rows per query either way
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
  }

  test("every corpus vector is assigned to exactly one IVF cell") {
    val emb = Tables.embeddings(spark, dir)
    // nProbe = nCells ⇒ probing everything ⇒ IVF degenerates to exact
    val all = Similarity.ivfTopKPerQuery(emb,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 10, nCells = 8, nProbe = 8)
    val exact = Similarity.topKPerQuery(emb,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 10)
    assert(pairsOf(all) == pairsOf(exact),
      "full probing must equal the exact search")
  }
}
