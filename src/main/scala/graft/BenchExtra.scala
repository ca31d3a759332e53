package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Optimization-round isolation harness (NOT the driver's bench — that is
  * [[Bench]], frozen). Times individual declared queries under the exact
  * same session configuration and noop-sink methodology as [[Bench]], so a
  * per-query number here is comparable to the sweep's, and dumps
  * `.explain("formatted")` plans for the round's evidence files.
  *
  * Usage: `sbt "runMain graft.BenchExtra q_bm25 q_agg_pricing"` (or `all`).
  * Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in [[Bench]];
  *      BENCH_EXTRA_REPEAT=N     repeat each query N times (default 1)
  *      BENCH_EXTRA_EXPLAIN=tag  write plans/r06/<query>_<tag>.txt
  *      BENCH_EXTRA_NO_WARMUP=1  skip the session warmup */
object BenchExtra {

  /** Mirror of Bench.newSession — keep in sync by inspection (Bench.scala
    * is frozen, so it cannot export this builder without an edit). */
  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.shuffle.unsafe.file.output.buffer", "1m")
      .config("spark.shuffle.spill.diskWriteBufferSize", "1m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeat = sys.env.getOrElse("BENCH_EXTRA_REPEAT", "1").toInt
    val explainTag = sys.env.get("BENCH_EXTRA_EXPLAIN")
    val names =
      if (args.isEmpty || args.sameElements(Array("all")))
        SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    val spark = newSession(cores)
    try {
      if (!sys.env.get("BENCH_EXTRA_NO_WARMUP").contains("1")) {
        spark.range(1 << 16).selectExpr("sum(id % 7) as s")
          .write.format("noop").mode("overwrite").save()
        spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1024)
          .write.format("noop").mode("overwrite").save()
      }
      // slow-query forensics: if a query exceeds the threshold, dump every
      // thread stack (3 dumps, 5 s apart) so the stall site is attributable
      val watchdogSec = sys.env.getOrElse("BENCH_EXTRA_WATCHDOG", "0").toInt
      val out = names.map { name =>
        val fn = SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query $name"))
        spark.sparkContext.setJobDescription(name)
        val secs = (1 to repeat).map { _ =>  // REPEAT=0 → explain only, no run
          @volatile var done = false
          if (watchdogSec > 0) {
            val t = new Thread(() => {
              var waited = 0
              while (!done && waited < watchdogSec * 1000) {
                Thread.sleep(200); waited += 200
              }
              var dumps = 0
              while (!done && dumps < 3) {
                System.err.println(s"[benchextra] WATCHDOG $name still running after ${watchdogSec + dumps * 5} s — thread dump:")
                import scala.jdk.CollectionConverters._
                for ((th, st) <- Thread.getAllStackTraces.asScala
                     if th.getState == Thread.State.RUNNABLE && st.nonEmpty) {
                  System.err.println(s"  == ${th.getName} (${th.getState})")
                  st.take(25).foreach(e => System.err.println(s"    at $e"))
                }
                dumps += 1
                var w2 = 0
                while (!done && w2 < 5000) { Thread.sleep(200); w2 += 200 }
              }
            })
            t.setDaemon(true); t.start()
          }
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          finally done = true
          val s = (System.nanoTime() - t0) / 1e9
          graft.operators.Dedup.releaseCaches()
          System.gc()
          s
        }
        explainTag.foreach { tag =>
          Files.createDirectories(Paths.get("plans/r06"))
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          Files.writeString(Paths.get(s"plans/r06/${name}_$tag.txt"), plan)
        }
        spark.sparkContext.setJobDescription(null)
        System.err.println(f"[benchextra] $name  ${secs.map(x => f"$x%.2f").mkString(",")} s")
        name -> secs
      }
      println("BENCHEXTRA " + out.map { case (n, ss) =>
        s"$n=${ss.map(x => f"$x%.3f").mkString(",")}" }.mkString(" "))
    } finally spark.stop()
  }
}
