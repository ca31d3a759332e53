package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.expressions.TextHashExpressions.{minhash_bands, simhash64}
import graft.expressions.VectorExpressions.{float_cosine, hyperplane_bucket}

/** Deduplication family for the training-data pipeline: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant avoids the quadratic pair space. Exact dedup is
  * a hash aggregation; MinHash/SimHash/embedding near-dup all use
  * blocking/banding so the self-join only touches same-bucket candidates,
  * then verify with the exact measure. Candidate joins are equi-joins on the
  * band key (shuffle-hash/SMJ — scales out), never cross joins. */
object Dedup {

  /** Exact dedup: canonical representative per identical text (deterministic:
    * min id), plus group size. One hash-agg shuffle. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Near-dup candidates via MinHash+LSH: shingle → signature → band keys →
    * self-equi-join per band → verified n-gram Jaccard over the candidates.
    * Emits (left_id, right_id, jaccard) with left<right, jaccard ≥ threshold. */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
                 shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.6): DataFrame = {
    val rowsPerBand = numHashes / bands
    val banded = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .select(col("id"), col("text"),
        posexplode(minhash_bands(col("text"), shingleK, numHashes, bands))
          .as(Seq("band_idx", "band_key")))
    val l = banded.as("l")
    val r = banded.as("r")
    val candidates = l.join(r,
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("left_id"), col("r.id").as("right_id"),
        col("l.text").as("lt"), col("r.text").as("rt"))
      .dropDuplicates("left_id", "right_id")
    candidates
      .withColumn("jaccard", tokenSetJaccard(col("lt"), col("rt")))
      .filter(col("jaccard") >= threshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))
  }

  /** SimHash near-dup: 64-bit signature, blocked by the top `prefixBits` bits
    * (near-dups with few differing low bits share a block), verified by
    * Hamming distance ≤ maxHamming. */
  def simHashNearDup(df: DataFrame, textCol: String, idCol: String,
                     maxHamming: Int = 8, prefixBits: Int = 12): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sim", simhash64(col("text")))
      .withColumn("block", shiftrightunsigned(col("sim"), 64 - prefixBits))
    val l = sigs.as("l")
    val r = sigs.as("r")
    l.join(r, col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .withColumn("hamming", hamming64(col("l.sim"), col("r.sim")))
      .filter(col("hamming") <= maxHamming)
      .select(col("l.id").as("left_id"), col("r.id").as("right_id"), col("hamming"))
  }

  /** n-gram Jaccard pair scores within explicit blocks (`blockCol`) — the
    * exact-measure variant for modest block sizes (e.g. same source/lang). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        blockCol: String, threshold: Double): DataFrame = {
    // Token sets are computed ONCE per row on the scan side of the exchange
    // (the shuffle materializes them); the per-pair work is only the
    // intersect. Recomputing split+distinct per pair is O(pairs × text) —
    // measured 50× slower at sf0.1.
    val s = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_distinct(wsTokens(lower(col(textCol)))).as("toks"))
    val l = s.as("l")
    val r = s.as("r")
    val inter = size(array_intersect(col("l.toks"), col("r.toks"))).cast("double")
    val uni = (size(col("l.toks")) + size(col("r.toks"))).cast("double") - inter
    l.join(r, col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .withColumn("jaccard", when(uni === 0, 1.0).otherwise(inter / uni))
      .filter(col("jaccard") >= threshold)
      .select(col("l.id").as("left_id"), col("r.id").as("right_id"), col("jaccard"))
  }

  /** Embedding-cosine near-dup: hyperplane-LSH blocking + exact cosine verify. */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String, dim: Int,
                       bits: Int = 8, threshold: Double = 0.95): DataFrame = {
    val s = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", hyperplane_bucket(col("v"), bits, dim))
    val l = s.as("l")
    val r = s.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("cos", float_cosine(col("l.v"), col("r.v")))
      .filter(col("cos") >= threshold)
      .select(col("l.id").as("left_id"), col("r.id").as("right_id"), col("cos"))
  }
}
