package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run one (or more) SparkEntry queries against an sf dir,
  * print wall seconds + row count each. args: sfDir query [query…] */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"QUERYTIME $name rows=$n sec=$sec%.2f")
    }
    spark.stop()
  }
}
