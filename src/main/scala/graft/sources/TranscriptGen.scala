package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{FixtureGen, Turn}

/** Distributed deterministic transcript-table generator.
  *
  * Each conversation is a pure function of (seed, convIdx) — `FixtureGen`
  * seeds a dedicated RNG per conversation — so the generated table is
  * IDENTICAL for any parallelism/partitioning: the property the golden tests
  * and the N-vs-4N scaling bench rely on.
  *
  * Rows are written deterministically *scrambled* (hash-ordered, not
  * turn-ordered) so the pipeline's stable-ordering logic
  * (sortWithinPartitions / window over conv_id ORDER BY turn_idx) is
  * genuinely exercised, per FIXTURES.md §A.
  */
object TranscriptGen {

  def generate(spark: SparkSession, profile: FixtureGen.Profile,
               parallelism: Int = 32, scramble: Boolean = true): Dataset[Turn] = {
    import spark.implicits._
    val base = spark.range(0, profile.numConvs.toLong, 1L, parallelism)
      .flatMap(i => FixtureGen.conversation(profile, i))
    if (!scramble) base
    else base
      // round-robin repartition: perfectly EVEN partitions (hash-expression
      // partitioning leaves 2-5× size skew from bucket collisions, which
      // makes the downstream scan stage straggler-bound), deterministic for
      // a deterministic input order; the hash sort scrambles within files
      .repartition(parallelism)
      .sortWithinPartitions(xxhash64(col("turn_idx"), col("conv_id")))
      .as[Turn]
  }

  /** Generate and persist as parquet (the raw input table for bench runs). */
  def materialize(spark: SparkSession, profile: FixtureGen.Profile,
                  path: String, parallelism: Int = 32): Unit =
    generate(spark, profile, parallelism).write.mode("overwrite").parquet(path)
}
