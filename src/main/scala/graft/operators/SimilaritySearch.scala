package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions.{float_cosine, hyperplane_bucket}

/** Approximate-nearest-neighbor search over an `array<float>` embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast nested-loop scored scan
  * (queries are small, corpus is the big side; the 100 TB path streams the
  * corpus once per query batch, no shuffle of the corpus).
  *
  * Scale path: IVF-style LSH bucketing — corpus pre-bucketed by random
  * hyperplane signs; queries probe only matching buckets (optionally with
  * multi-probe by flipping bits). Recall/latency traded via `bits`. */
object SimilaritySearch {

  /** Brute-force exact top-k per query. `queries`/`corpus`: (id, vec). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("corpus_id"), col("vec").as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .withColumn("score", float_cosine(col("qv"), col("cv")))
      .filter(col("query_id") =!= col("corpus_id"))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("score"), col("corpus_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rn"))
  }

  /** LSH-bucketed ANN with MULTI-PROBE: the corpus is bucketed once; each
    * query probes its own bucket plus every bucket within Hamming distance
    * `probeHamming` of it (bit-flip neighbors — where near neighbors that
    * straddle a hyperplane land). Candidates are re-ranked by exact cosine.
    * Probing multiplies only the (small, broadcast) query side — the corpus
    * is still scanned once and shuffled never. Recall vs `bruteForceTopK` is
    * measured in DedupRecallSpec. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              bits: Int = 6, probeHamming: Int = 1): DataFrame = {
    // all bit masks with popcount <= probeHamming (identity mask included)
    val masks: Seq[Long] = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeHamming)
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .withColumn("bucket0", hyperplane_bucket(col("qv"), bits, dim))
      .withColumn("bucket", explode(array(masks.map(m =>
        col("bucket0").bitwiseXOR(lit(m))): _*)))
      .drop("bucket0")
    val c = corpus.select(col("id").as("corpus_id"), col("vec").as("cv"))
      .withColumn("bucket", hyperplane_bucket(col("cv"), bits, dim))
    broadcast(q).join(c, "bucket")
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("score", float_cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("score"), col("corpus_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rn"))
  }
}
