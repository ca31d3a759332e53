package graft.tools
import graft.core._
import java.util.concurrent.{Executors, TimeUnit}
import scala.jdk.CollectionConverters._
object FsmBench {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 1
    val turns = FixtureGen.turns(FixtureGen.Profile(numConvs = 40000))
    val byConv = turns.groupBy(_.conv_id).map { case (c, ts) => c -> ts.sortBy(_.turn_idx).toIndexedSeq }.toArray
    println(s"turns=${turns.size} convs=${byConv.length} threads=$threads")
    ConvParser.parseAll(turns.take(10000))

    val frames = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.startsWith("fsm-") && st.nonEmpty) {
            val key = st.take(3).mkString(" | ")
            frames.merge(key, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true); sampler.start()

    for (r <- 1 to 3) {
      val cnt = new java.util.concurrent.atomic.AtomicInteger()
      val pool = Executors.newFixedThreadPool(threads, (run: Runnable) => {
        val t = new Thread(run, s"fsm-${cnt.incrementAndGet()}"); t.setDaemon(true); t
      })
      val chunks = byConv.grouped(math.max(1, byConv.length / (threads * 4))).toSeq
      val t0 = System.nanoTime()
      val acc = new java.util.concurrent.atomic.AtomicLong()
      chunks.foreach { chunk =>
        pool.submit(new Runnable { def run(): Unit = {
          var spans = 0L
          chunk.foreach { case (c, ts) => ConvParser.parse(c, ts).foreach(spans += _.spans.size) }
          acc.addAndGet(spans)
        }})
      }
      pool.shutdown(); pool.awaitTermination(600, TimeUnit.SECONDS)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads round=$r sec=$sec%.2f thr=${turns.size / sec}%.0f")
    }
    sampling = false
    frames.asScala.toSeq.sortBy(-_._2).take(10).foreach { case (k, v) => println(s"$v x $k") }
  }
}
