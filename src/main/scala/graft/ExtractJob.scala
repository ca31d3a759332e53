package graft

import org.apache.spark.sql.SparkSession
import graft.core.FixtureGen
import graft.operators.Extraction
import graft.sources.{Snapshot, TranscriptGen}

/** spark-submit-style entry for the full north-rule pipeline:
  * synthesize (or read) the transcript table → salted/skew-aware extraction →
  * checkpointed snapshot write with per-chunk lineage + extraction metrics.
  *
  * Usage: ExtractJob <workDir> [numConvs] [cores] [numChunks]
  */
object ExtractJob {
  def main(args: Array[String]): Unit = {
    val workDir = if (args.length > 0) args(0) else "target/extract-job"
    val numConvs = if (args.length > 1) args(1).toInt else 2000
    val cores = if (args.length > 2) args(2) else "32"
    val numChunks = if (args.length > 3) args(3).toInt else 32

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rawPath = s"$workDir/raw"
    val profile = FixtureGen.Profile(numConvs = numConvs)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(rawPath)))
      TranscriptGen.materialize(spark, profile, rawPath, cores.toInt)

    val turns = spark.read.parquet(rawPath).as[graft.core.Turn]
    // monsterThreshold BELOW the fixture's monster size (default
    // monsterTurns = 1200 < Config's default 2000): with the default
    // threshold the skew routing this job exists to demonstrate would
    // silently never trigger and every monster would straggle a normal
    // hash partition
    val cfg = Extraction.Config(numPartitions = cores.toInt,
      monsterThreshold = 1000L)
    val results = Extraction.extractSkewAware(turns, cfg)
    val (observedDf, obs) = Extraction.observed(results)
    val metrics = Snapshot.write(observedDf,
      s"$workDir/extracted", "conv_id", numChunks, observation = Some(obs))
    println(s"committed snapshot with metrics: $metrics")
    println(Snapshot.manifestJson(s"$workDir/extracted").take(600))
    spark.stop()
  }
}
