package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Partitioning diagnostics — the measurement side of the skew handling the
  * north rule mandates ("explicit repartitioning by conv_id with salt for
  * skewed long conversations"): before choosing a salt factor you need the
  * key-cardinality distribution, and at 10^12 rows you cannot sort keys by
  * count to get it. */
object Diagnostics {

  /** One-row key-skew profile of `df` grouped by `keyCol`: key count, row
    * count, the heaviest key (and its row count), exact p50/p99 of the
    * rows-per-key distribution, and `skew_ppm` = max/p50 in ppm — the
    * number that decides whether the downstream exchange needs salting.
    *
    * Scale shape — deliberately NO global sort of keys:
    *  1. one hash-agg keyed by the key (rows → per-key counts),
    *  2. one hash-agg keyed by the COUNT value (count-of-counts histogram —
    *     rows bounded by the number of DISTINCT per-key counts, in practice
    *     thousands even at 10^12 keys),
    *  3. quantiles from a cumulative sum over that tiny histogram (the same
    *     integer rule as `TrainingData.exactQuantiles`: smallest c with
    *     cum_keys·10^6 ≥ n_keys·ppm),
    *  4. the heaviest key via a partial-aggregatable `max(struct(count,key))`
    *     — no row_number window, no single hot partition.
    *
    * All ratios are integer cross-multiplications (no float boundaries). */
  def keySkewProfile(df: DataFrame, keyCol: String,
                     p50Ppm: Int = 500000, p99Ppm: Int = 990000): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
    val hist = counts.groupBy("c").agg(count(lit(1)).as("nk"))
    val cum = hist
      .withColumn("cum", sum(col("nk")).over(
        Window.orderBy(col("c")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_keys", sum(col("nk")).over())
      .withColumn("n_rows", sum(col("c") * col("nk")).over())
    def q(ppm: Int) =
      min(when(col("cum") * 1000000L >= col("n_keys") * ppm, col("c")))
    val dist = cum.agg(
      max(col("n_keys")).as("n_keys"), max(col("n_rows")).as("n_rows"),
      max(col("c")).as("max_key_rows"),
      q(p50Ppm).as("p50_key_rows"), q(p99Ppm).as("p99_key_rows"))
    val top = counts.agg(max(struct(col("c"), col("k"))).as("m"))
      .select(col("m.k").as("top_key"), col("m.c").as("top_key_rows"))
    dist.crossJoin(top)
      // `div`, not `/`: Spark's slash is true division (double) even on longs
      .withColumn("skew_ppm",
        expr("(max_key_rows * 1000000) div p50_key_rows"))
  }
}
