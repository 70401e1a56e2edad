package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data contracts — the generalized form of the
  * reference's count-back validation (A1/A3): a set of named row-level
  * expectations evaluated over a frame in ONE aggregation pass, each
  * reporting its violation count. The per-day `extracted == loaded`
  * check the reference runs after every sync is the degenerate single
  * expectation; real pipelines gate loads on a battery of them
  * (not-null keys, value ranges, enum membership, referential counts).
  *
  * Scale shape: all row-level expectations fold into ONE map-side-
  * combined global aggregate — no shuffle of data rows, one pass, no
  * matter how many checks. Uniqueness is the exception (it is a
  * per-key property, not a per-row one) and costs its one hash shuffle
  * on the key columns via [[duplicateKeys]].
  *
  * NULL discipline: a NULL predicate result counts as a VIOLATION
  * (SQL's `WHERE` would silently drop it — a contract must not pass on
  * unknowns). */
object Expectations {

  /** One named row-level contract: `pred` must hold for every row. */
  final case class Expect(name: String, pred: Column)

  /** Evaluate all expectations in one pass. Returns one row per
    * expectation: (check, n_rows, n_violations) — stable output order
    * by check name. */
  def validate(df: DataFrame, expects: Seq[Expect]): DataFrame = {
    require(expects.nonEmpty, "at least one expectation required")
    require(expects.map(_.name).distinct.size == expects.size,
      s"duplicate expectation names: ${expects.map(_.name)}")
    // outer coalesce: sum over ZERO rows (an empty batch — a
    // legitimate no-data day) is NULL, which would make the contract
    // neither pass nor fail; an empty frame has zero violations
    val aggs = count(lit(1)).as("n_rows") +: expects.map { e =>
      coalesce(sum(when(coalesce(e.pred, lit(false)), 0L).otherwise(1L)),
        lit(0L)).as(s"__v_${e.name}")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single row to (check, n_rows, n_violations) rows
    val stacked = expects.map { e =>
      struct(lit(e.name).as("check"), col("n_rows"),
        col(s"__v_${e.name}").as("n_violations"))
    }
    row.select(explode(array(stacked: _*)).as("x"))
      .select(col("x.check"), col("x.n_rows"), col("x.n_violations"))
  }

  /** Keys violating a uniqueness contract: (key*, n_rows) for every
    * key with more than one row. One hash shuffle on the keys. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "uniqueness needs at least one key column")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)
  }

  /** Contracts as OBSERVED metrics: the same named expectations as
    * [[validate]], attached to the frame with `Dataset.observe` so the
    * violation counts are computed DURING whatever action the caller
    * runs next (typically the sink write) — zero extra scan, zero
    * extra job, which at 100 TB is the difference between "validate"
    * and "validate for free". Read the counts from the `Observation`
    * after the action:
    *
    * {{{
    * val obs = org.apache.spark.sql.Observation("contracts")
    * Expectations.observedValidate(df, obs, checks).write...
    * val violations = obs.get  // Map: n_rows, v_<name> per check
    * }}}
    *
    * Same NULL discipline as [[validate]] (NULL predicate = violation,
    * empty batch = zero violations). On a STREAMING frame attach the
    * metrics with `observe(name, ...)` and read them per micro-batch
    * from `StreamingQueryProgress.observedMetrics` instead — the
    * expectation expressions are identical. */
  def observedValidate(
      df: DataFrame,
      obs: org.apache.spark.sql.Observation,
      expects: Seq[Expect]): DataFrame = {
    require(expects.nonEmpty, "at least one expectation required")
    require(expects.map(_.name).distinct.size == expects.size,
      s"duplicate expectation names: ${expects.map(_.name)}")
    val aggs = count(lit(1)).as("n_rows") +: expects.map { e =>
      coalesce(sum(when(coalesce(e.pred, lit(false)), 0L).otherwise(1L)),
        lit(0L)).as(s"v_${e.name}")
    }
    df.observe(obs, aggs.head, aggs.tail: _*)
  }

  /** k-anonymity / l-diversity audit — the release-gate contract for
    * training data carrying person-adjacent attributes: every
    * quasi-identifier equivalence class (the rows sharing all
    * `quasiCols` values) must hold ≥ k rows (re-identification
    * resistance) and ≥ l distinct `sensitiveCol` values (attribute-
    * disclosure resistance; a 50-row class is still unsafe if all 50
    * share one sensitive value). Standard definitions from the public
    * literature (Sweeney 2002; Machanavajjhala et al. 2007).
    *
    * Scale shape: one two-level aggregation — (quasi*, sensitive)
    * cells then quasi* classes, both map-side combined — and a 1-row
    * summary; per-class frames never leave the executors and the
    * output is a single row no matter the corpus. NULL quasi values
    * form their own class ("unknown" is itself an identifier); NULL
    * sensitive values don't count toward diversity (an absent value
    * discloses nothing).
    *
    * Determinism: counts and integer ppm floor divisions only.
    *
    * Returns one row: (n_rows, n_classes, min_class_size — the k the
    * dataset actually achieves, n_small_classes / at_risk_ppm vs the
    * k contract, min_diversity, n_low_div_classes / low_div_ppm vs
    * the l contract). */
  def anonymityAudit(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Long,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    val cells = df
      .groupBy((quasiCols.map(col) :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__n"))
    val classes = cells
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__n")).as("__cn"),
        sum(when(col(sensitiveCol).isNotNull, 1L).otherwise(0L))
          .as("__nd"))
    classes.agg(
      sum(col("__cn")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("__cn")).as("min_class_size"),
      sum(when(col("__cn") < k, 1L).otherwise(0L)).as("n_small_classes"),
      sum(when(col("__cn") < k, col("__cn")).otherwise(0L)).as("__ar"),
      min(col("__nd")).as("min_diversity"),
      sum(when(col("__nd") < l, 1L).otherwise(0L))
        .as("n_low_div_classes"),
      sum(when(col("__nd") < l, col("__cn")).otherwise(0L)).as("__ld"))
      .select(col("n_rows"), col("n_classes"), col("min_class_size"),
        col("n_small_classes"),
        expr("__ar * 1000000 div n_rows").as("at_risk_ppm"),
        col("min_diversity"), col("n_low_div_classes"),
        expr("__ld * 1000000 div n_rows").as("low_div_ppm"))
  }

  /** Keys violating a referential-integrity contract: child keys with
    * no matching parent key, as (fk, n_rows). The child AGGREGATES to
    * its distinct keys before the anti-join, so the join carries
    * |child keys| rows, not |child rows|; the parent side reduces to
    * its distinct keys (broadcast when small — dimension tables — a
    * co-partitioned shuffle otherwise). A NULL child key is reported
    * (NULL cannot reference anything; SQL's IN would silently pass
    * it, same trap as the NULL-predicate rule in [[validate]]). */
  def orphanKeys(
      child: DataFrame,
      childKey: Column,
      parent: DataFrame,
      parentKey: Column): DataFrame = {
    val ck = child.select(childKey.as("fk"))
      .groupBy(col("fk")).agg(count(lit(1)).as("n_rows"))
    val pk = parent.select(parentKey.as("fk")).distinct()
    ck.join(pk, Seq("fk"), "left_anti")
  }
}
