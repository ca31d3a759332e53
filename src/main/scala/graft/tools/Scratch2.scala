package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Turn, TurnSlim}
import graft.operators.Extraction

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val raw = spark.read.parquet("/dev/shm/graft-bench/raw")
    // instrumented full path: per-partition (rows, convs, fsm-wall)
    val stats = raw.select(col("conv_id"), col("turn_idx"), col("text"))
      .repartition(cores * 2, col("conv_id"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx")).as[TurnSlim]
      .mapPartitions { it =>
        val t0 = System.nanoTime()
        var rows = 0L; var convs = 0L; var spans = 0L
        Extraction.groupedForProfiling(it).foreach { case (cid, ts) =>
          convs += 1; rows += ts.size
          graft.core.ConvParser.parse(cid, ts).foreach(tr => spans += tr.spans.size)
        }
        Iterator((rows, convs, spans, (System.nanoTime() - t0) / 1e9))
      }.collect().sortBy(-_._4)
    println(f"partitions=${stats.length} totalRows=${stats.map(_._1).sum} " +
      f"wallMax=${stats.map(_._4).max}%.2f wallSum=${stats.map(_._4).sum}%.2f")
    stats.take(8).foreach { case (r, c, sp, w) => println(f"  rows=$r convs=$c spans=$sp wall=$w%.2f") }
    spark.stop()
  }
}
