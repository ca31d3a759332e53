package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run one (or more) SparkEntry queries against an sf dir,
  * print wall seconds + row count each. args: sfDir query [query…] */
object QueryTime {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.tools.QueryTime <sfDir> <query> [query…]")
      sys.exit(2)
    }
    val sfDir = args.head
    val names = args.tail.toSeq
    // validate every name BEFORE the first timed run — a typo in the last
    // name must not waste the earlier queries' full runs
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} (see SparkEntry.queries)")
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
      // noop-sink force, same as Bench: a count() would let column pruning
      // delete the projected expression work and time only the scan
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"QUERYTIME $name sec=$sec%.2f")
    }
    spark.stop()
  }
}
