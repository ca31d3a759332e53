package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Turn, TurnSlim}
import graft.operators.Extraction

/** Dev profiling: stage decomposition of the extraction job. args: cores [raw] */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val rawPath = if (args.length > 1) args(1) else "/dev/shm/graft-bench/raw"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def noop(df: org.apache.spark.sql.Dataset[_]): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime(); f
        println(f"[$label] cores=$cores round=$r sec=${(System.nanoTime()-t0)/1e9}%.2f")
      }
    }

    val raw = spark.read.parquet(rawPath)
    timed("e_full_extract") {
      noop(Extraction.extract(raw.as[Turn], Extraction.Config(numPartitions = cores * 2)))
    }
    spark.stop()
  }
}
