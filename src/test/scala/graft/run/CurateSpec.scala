package graft.run

import org.apache.spark.sql.functions.{col, expr}

import graft.SparkSpecBase
import graft.core.Tables
import graft.operators.Curation

class CurateSpec extends SparkSpecBase {

  private val recipeText =
    """# demo recipe
      |strata = lang
      |id = doc_id
      |text = text
      |quality = ln(1 + n_chars)
      |drop_permille = 100
      |total_target = 200
      |n_shards = 4
      |""".stripMargin

  test("a parsed recipe runs the EXACT standardPipeline composition") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val viaRecipe = CurationRecipe.parse(recipeText).run(docs)
    val direct = Curation.standardPipeline(
      docs, Seq("lang"), "doc_id", expr("text"),
      expr("ln(1 + n_chars)"), dropPermille = 100, totalTarget = 200,
      nShards = 4)
    assert(viaRecipe.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaRecipe).count() == 0)
    assert(viaRecipe.count() > 0)
    // shard layout present and within bounds
    val shards = viaRecipe.select(col("shard").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(shards.nonEmpty && shards.forall(s => s >= 0 && s < 4))
    viaRecipe.unpersist(false)
    direct.unpersist(false)
  }

  test("defaulted seeds match standardPipeline's defaults") {
    val r = CurationRecipe.parse(recipeText)
    assert(r.sampleSeed == 19 && r.shardSeed == 23)
    val r2 = CurationRecipe.parse(
      recipeText + "sample_seed = 7\nshard_seed = 11\n")
    assert(r2.sampleSeed == 7 && r2.shardSeed == 11)
  }

  test("a DSIR-armed recipe inserts the selection stage between " +
      "dedup and the rebalance; identity settings replay the plain run") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val armed = CurationRecipe.parse(recipeText +
      "dsir_target = lang = 'en'\ndsir_keep_permille = 500\n")
    assert(armed.dsirTargetExpr.contains("lang = 'en'") &&
      armed.dsirKeepPermille == 500)
    val viaRecipe = armed.run(docs)
    val direct = Curation.standardPipeline(
      docs, Seq("lang"), "doc_id", expr("text"),
      expr("ln(1 + n_chars)"), dropPermille = 100, totalTarget = 200,
      nShards = 4, dsirTarget = Some(expr("lang = 'en'")),
      dsirKeepPermille = 500)
    assert(viaRecipe.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaRecipe).count() == 0)
    assert(viaRecipe.count() > 0)
    // the selection is not a no-op: the armed run keeps a different
    // (smaller-or-reshaped) id set than the plain pipeline
    val plain = CurationRecipe.parse(recipeText).run(docs)
    assert(viaRecipe.select(col("doc_id")).exceptAll(
      plain.select(col("doc_id"))).count() +
      plain.select(col("doc_id")).exceptAll(
        viaRecipe.select(col("doc_id"))).count() > 0,
      "DSIR stage changed nothing — suspicious")
    // keep_permille = 1000 (or no target) is the identity
    val ident = Curation.standardPipeline(
      docs, Seq("lang"), "doc_id", expr("text"),
      expr("ln(1 + n_chars)"), dropPermille = 100, totalTarget = 200,
      nShards = 4, dsirTarget = Some(expr("lang = 'en'")),
      dsirKeepPermille = 1000)
    assert(ident.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(ident).count() == 0)
    Seq(viaRecipe, direct, plain, ident).foreach(_.unpersist(false))
    // arming the share without naming a target refuses loudly
    val e = intercept[IllegalArgumentException](CurationRecipe.parse(
      recipeText + "dsir_keep_permille = 500\n"))
    assert(e.getMessage.contains("dsir_target"))
  }

  test("validation failures name the offending key") {
    def err(s: String): String =
      intercept[IllegalArgumentException](CurationRecipe.parse(s))
        .getMessage
    assert(err(recipeText.replace("quality = ln(1 + n_chars)", ""))
      .contains("quality"))
    assert(err(recipeText + "typo_key = 1\n").contains("typo_key"))
    assert(err(recipeText.replace("drop_permille = 100",
      "drop_permille = 1000")).contains("drop_permille"))
    assert(err(recipeText.replace("total_target = 200",
      "total_target = abc")).contains("total_target"))
    assert(err(recipeText + "n_shards = 9\n").contains("duplicate"))
    assert(err("strata\n").contains("key=value"))
  }
}
