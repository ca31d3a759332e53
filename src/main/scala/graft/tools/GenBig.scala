package graft.tools
import org.apache.spark.sql.SparkSession
import graft.core.FixtureGen
import graft.sources.TranscriptGen
object GenBig {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    TranscriptGen.materialize(spark, FixtureGen.Profile(numConvs = 200000),
      "/dev/shm/graft-bench/raw", 32)
    println("rows=" + spark.read.parquet("/dev/shm/graft-bench/raw").count())
    spark.stop()
  }
}
