package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Extraction

/** One extraction measurement in a dedicated JVM (spawned by Bench under
  * taskset so GC/JIT threads are ALSO confined to the N cores — a faithful
  * N-core-node emulation). args: cores rawPath warmupPath samples
  * Prints: BENCHONE <samples-csv> */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val Array(cores, rawPath, warmupPath, samples) = args
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchone-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.shuffle.unsafe.file.output.buffer", "1m")
      .config("spark.shuffle.spill.diskWriteBufferSize", "1m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def jobOn(path: String): Unit =
      Extraction.extract(spark.read.parquet(path).as[graft.core.Turn],
        Extraction.Config(numPartitions = 128))
        .write.format("noop").mode("overwrite").save()
    jobOn(warmupPath)
    val times = (1 to samples.toInt).map { _ =>
      val t0 = System.nanoTime()
      jobOn(rawPath)
      (System.nanoTime() - t0) / 1e9
    }
    println("BENCHONE " + times.mkString(","))
    spark.stop()
  }
}
