package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication family for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Designed for the
  * 100 TB regime:
  *
  *  - exact dedup shuffles once on the content hash (never on the raw
  *    text when `keyExpr` is a digest), then semi-joins winners back;
  *  - MinHash signatures are computed with one explode + one groupBy
  *    (map-side combined `min` per hash function — the shuffle carries
  *    only `numHashes` longs per doc, not the shingle set);
  *  - LSH banding turns the quadratic all-pairs problem into a
  *    per-bucket join; hot buckets are capped to keep worst-case skew
  *    bounded;
  *  - n-gram Jaccard verification joins candidates on doc_id only.
  *
  * All-new capability beyond the reference (SURVEY.md §7.2 step 7).
  */
object Dedup {

  /** Exact dedup: keep, per distinct value of `key`, the single row with
    * the smallest `tieBreaker`. One hash-partitioned shuffle on the key.
    */
  def exact(df: DataFrame, key: Column, tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tieBreaker).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Word n-gram shingles (default 3-word), distinct, as an array. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    val count = size(toks)
    when(count >= n,
      array_distinct(transform(
        sequence(lit(0), count - n),
        i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array(array_join(toks, " ")))
  }

  /** MinHash signature: `numHashes` 64-bit min-hashes over the shingle
    * set, seeded per hash function via xxhash64(seed, shingle).
    * Returns (idCol, signature array<long>). The explode→groupBy(min)
    * pattern map-side-combines, so the shuffle carries one row of
    * `numHashes` longs per document. */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      text: Column,
      numHashes: Int = 64,
      shingleSize: Int = 3): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(shingles(text, shingleSize)).as("__sh"))
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("__sh"))).as(s"h$i"))
    exploded
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** LSH candidate pairs from MinHash signatures: split the signature
    * into `bands` bands, hash each band, explode to (band, bandHash)
    * buckets, and pair up documents sharing a bucket. Buckets larger
    * than `maxBucket` are dropped (skew guard: a degenerate bucket of
    * B docs would emit B² pairs). Output: (a, b) with a < b, distinct.
    */
  def lshCandidatePairs(
      signatures: DataFrame,
      idCol: String,
      bands: Int,
      maxBucket: Int = 1000): DataFrame = {
    require(bands > 0)
    val banded = signatures.select(
      col(idCol),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(
          b,
          array_join(transform(
            slice(col("signature"),
              b * (size(col("signature")) / bands) + 1,
              size(col("signature")) / bands),
            _.cast(StringType)), ","))))
        .as(Seq("band", "bucket")))
    val buckets = banded
      .groupBy("band", "bucket")
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    buckets
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
  }

  /** Estimated Jaccard similarity from two MinHash signatures:
    * fraction of agreeing hash positions. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x))
      .cast(DoubleType) / size(sigA)

  /** Exact n-gram Jaccard between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val union = (size(a) + size(b)).cast(DoubleType) - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** End-to-end MinHash-LSH near-dup pairs: signature → banded LSH →
    * candidate pairs → exact n-gram-Jaccard verification ≥ threshold.
    * Returns (a, b, jaccard). The verify join rejoins the raw shingle
    * arrays by id (two hash joins on the id column — cheap relative to
    * the pair blowup it avoids). */
  def minhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      text: Column,
      threshold: Double = 0.8,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, text, numHashes, shingleSize)
    val cand = lshCandidatePairs(sigs, idCol, bands)
    val sh = docs.select(col(idCol).as("__id"),
      shingles(text, shingleSize).as("__sh"))
    cand
      .join(sh.select(col("__id").as("a"), col("__sh").as("sh_a")), Seq("a"))
      .join(sh.select(col("__id").as("b"), col("__sh").as("sh_b")), Seq("b"))
      .select(col("a"), col("b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens: per token, xxhash64; each
    * bit contributes +1/-1 to its lane; sign of the lane sum is the
    * output bit. Implemented as 64 map-side-combined SUM aggregates —
    * one shuffle of 64 longs per doc. */
  def simhash(
      docs: DataFrame,
      idCol: String,
      text: Column): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextAnalysis.tokens(lower(text))).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    val laneSums = (0 until 64).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1L) === 1L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val lanes = tok.groupBy(col(idCol)).agg(laneSums.head, laneSums.tail: _*)
    // assemble sign bits into one long: sum of (bit_i << i) via bitwise OR
    val sim = (0 until 64)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    lanes.select(col(idCol), sim.as("simhash"))
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the four 16-bit quadrants (any
    * pair within Hamming distance ≤ maxHamming with ≤ `maxHamming` < 16
    * shares at least one exact quadrant — pigeonhole), then verify
    * full Hamming distance. Avoids the all-pairs cross join. */
  def simhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      text: Column,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 16, "quadrant blocking needs maxHamming < 16")
    val sh = simhash(docs, idCol, text)
    val blocked = sh.select(
      col(idCol),
      col("simhash"),
      posexplode(array((0 until 4).map(q =>
        shiftrightunsigned(col("simhash"), q * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("quadrant", "qval")))
    val l = blocked.select(col(idCol).as("a"), col("simhash").as("sim_a"),
      col("quadrant"), col("qval"))
    val r = blocked.select(col(idCol).as("b"), col("simhash").as("sim_b"),
      col("quadrant"), col("qval"))
    l.join(r, Seq("quadrant", "qval"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        hamming(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram-Jaccard near-dup pairs via a shingle inverted index:
    * docs sharing ≥1 shingle become candidates; stop-shingles (document
    * frequency > dfCap) are excluded from candidate generation (they
    * still count in the verification Jaccard). Classic
    * prefix-filter-style pruning: the index join emits each pair once
    * per shared rare shingle, and the final Jaccard is recomputed
    * exactly from the full shingle arrays. */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      text: Column,
      threshold: Double = 0.5,
      shingleSize: Int = 3,
      dfCap: Int = 100): DataFrame = {
    val sh = docs
      .select(col(idCol).as("__id"), shingles(text, shingleSize).as("__sh"))
    val inv = sh.select(col("__id"), explode(col("__sh")).as("__s"))
    val rare = inv.groupBy("__s").count().filter(col("count") <= dfCap)
      .select("__s")
    val rareInv = inv.join(rare, Seq("__s"))
    val cand = rareInv.select(col("__s"), col("__id").as("a"))
      .join(rareInv.select(col("__s"), col("__id").as("b")), Seq("__s"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    cand
      .join(sh.select(col("__id").as("a"), col("__sh").as("sh_a")), Seq("a"))
      .join(sh.select(col("__id").as("b"), col("__sh").as("sh_b")), Seq("b"))
      .select(col("a"), col("b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
