package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase split of the q_snapshot_zorder shape (clustered write
  * vs manifest commit vs readWhere). Not a round artifact. */
object ZorderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerOn(spark)
    def ph(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to 2).foreach { r =>
      val dir = s"/dev/shm/graft-qfix/zprobe$r"
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
        .repartition(32)
        .select(col("event_id"), col("user_id"), col("event_type"))
      ph(s"write#$r") {
        graft.sources.Snapshot.write(ev, s"$dir/ev", "event_type", 2,
          clusterBy = Seq("zorder2(user_id, event_id)"), rowsPerFile = 500)
      }
      ph(s"stage-mimic#$r") {
        spark.read.parquet(s"$sfDir/events.parquet").repartition(32)
          .select(col("event_id"), col("user_id"), col("event_type"))
          .withColumn("_chunk", pmod(xxhash64(col("event_type")), lit(2)))
          .repartition(2, col("_chunk"))
          .sortWithinPartitions(col("_chunk"), expr("zorder2(user_id, event_id)"))
          .write.partitionBy("_chunk").mode("overwrite")
          .option("maxRecordsPerFile", 500)
          .parquet(s"$dir/stagemimic")
      }
      ph(s"readWhere#$r") {
        graft.sources.Snapshot.readWhere(spark, s"$dir/ev",
          col("user_id") < 100L && col("event_id") >= 2000L)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
