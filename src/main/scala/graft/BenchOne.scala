package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Extraction

/** One extraction measurement in a dedicated JVM (spawned by ScalingHarness
  * under taskset so GC/JIT threads are ALSO confined to the N cores — a
  * faithful N-core-node emulation).
  * args: cores rawPath warmupPath samples [mode] [numPartitions]
  * modes: full (default) = scan→exchange→sort→FSM→noop;
  *        shuffle = scan→exchange→sort→count (no FSM);
  *        scan = scan→count;
  *        fsm = scan→FSM without exchange (wrong conv boundaries — perf
  *              shape probe only, never correctness)
  * Prints: BENCHONE <samples-csv> */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val cores = args(0)
    val rawPath = args(1)
    val warmupPath = args(2)
    val samples = args(3).toInt
    val mode = if (args.length > 4) args(4) else "full"
    val parts = if (args.length > 5) args(5).toInt else 128
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
    def jobOn(path: String): Unit = mode match {
      case "full" =>
        Extraction.extract(spark.read.parquet(path).as[graft.core.Turn],
          Extraction.Config(numPartitions = parts))
          .write.format("noop").mode("overwrite").save()
      case "shuffle" =>
        spark.read.parquet(path)
          .select("conv_id", "turn_idx", "text")
          .repartition(parts, org.apache.spark.sql.functions.col("conv_id"))
          .sortWithinPartitions("conv_id", "turn_idx")
          .write.format("noop").mode("overwrite").save()
      case "scan" =>
        spark.read.parquet(path).select("conv_id", "turn_idx", "text")
          .write.format("noop").mode("overwrite").save()
      case "fsm" =>
        spark.read.parquet(path)
          .select("conv_id", "turn_idx", "text").as[graft.core.TurnSlim]
          .mapPartitions(Extraction.parsePartitionForProfiling _)
          .write.format("noop").mode("overwrite").save()
      case "bucketed" =>
        Extraction.extractBucketed(spark, ensureBucketed(path),
          Extraction.Config(numPartitions = parts))
          .write.format("noop").mode("overwrite").save()
      case other =>
        throw new IllegalArgumentException(
          s"unknown mode '$other' — valid modes: full|shuffle|scan|fsm|bucketed")
    }
    /* Bucketed-plane table for `path`: reuses already-bucketed files across
     * JVMs via external-table DDL (the in-memory catalog forgets tables at
     * exit, the bucket files don't move); first ever use pays one
     * writeBucketed. Registration/build happens via the warmup call, so
     * timed samples measure ONLY the exchange-free extraction. */
    def ensureBucketed(path: String): String = {
      // parts is part of BOTH the table name and the directory: a different
      // bucket count is a different physical layout, never a mismatch
      val tbl = "benchone_bucketed_" + java.lang.Integer.toHexString(path.hashCode) + "_" + parts
      if (!spark.catalog.tableExists(tbl)) {
        val bpath = path + "-bucketed" + parts
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(bpath))) {
          // bpath embeds `parts`, so an existing directory always matches
          // the DDL bucket count (an empty bucket writes NO part file, so a
          // file-count check would wrongly reject sparse-but-valid layouts,
          // and could not tell a 64-bucket layout from a sparse 256-bucket
          // one anyway — different parts now land in different dirs)
          spark.sql(s"""CREATE TABLE $tbl (conv_id STRING, turn_idx INT,
            role STRING, text STRING, tool STRING, ts TIMESTAMP)
            USING parquet CLUSTERED BY (conv_id)
            SORTED BY (conv_id ASC, turn_idx ASC) INTO $parts BUCKETS
            LOCATION '$bpath'""")
        } else
          Extraction.writeBucketed(spark.read.parquet(path).as[graft.core.Turn],
            tbl, bpath, parts)
      }
      tbl
    }
    // Optional stage-level diagnostics (BENCHONE_STAGES=1): per-stage wall,
    // task-time spread, and wave tail — identifies the non-scaling stage.
    if (sys.env.get("BENCHONE_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        private val durs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
        override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
          t0.put(e.stageInfo.stageId, System.nanoTime())
          durs.put(e.stageInfo.stageId, new java.util.concurrent.ConcurrentLinkedQueue[Long]())
        }
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val q = durs.get(e.stageId); if (q != null) q.add(e.taskInfo.duration)
        }
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val id = e.stageInfo.stageId
          val wall = (System.nanoTime() - t0.getOrDefault(id, System.nanoTime())) / 1e9
          import scala.jdk.CollectionConverters._
          val ds = durs.getOrDefault(id, new java.util.concurrent.ConcurrentLinkedQueue[Long]()).asScala.toSeq.sorted
          val (n, sum) = (ds.size, ds.sum / 1e3)
          val med = if (n > 0) ds(n / 2) / 1e3 else 0.0
          val mx = if (n > 0) ds.last / 1e3 else 0.0
          System.err.println(f"BENCHSTAGE id=$id name=${e.stageInfo.name.takeWhile(_ != ' ')} " +
            f"tasks=$n wall=$wall%.2f taskSum=$sum%.2f taskMed=$med%.3f taskMax=$mx%.3f")
        }
      })
    jobOn(warmupPath)
    // bucketize the measured table OUTSIDE the timed loop (one-time build)
    if (mode == "bucketed") ensureBucketed(rawPath)
    import scala.jdk.CollectionConverters._
    def procCpuSec: Double = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime / 1e9
    def gcSec: Double = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum / 1e3
    val times = (1 to samples).map { _ =>
      val (c0, g0) = (procCpuSec, gcSec)
      val t0 = System.nanoTime()
      jobOn(rawPath)
      val wall = (System.nanoTime() - t0) / 1e9
      // wall vs process-CPU vs GC per run: CPU-seconds are nearly
      // weather-insensitive (a starved thread burns no CPU), so the 8-vs-32
      // CPU ratio isolates real per-core overhead from host contention
      System.err.println(f"BENCHDETAIL wall=$wall%.2f cpu=${procCpuSec - c0}%.1f gc=${gcSec - g0}%.2f")
      wall
    }
    println("BENCHONE " + times.mkString(","))
    spark.stop()
  }
}
