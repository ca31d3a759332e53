package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase timing of the q_learned_match shape (fit vs moments vs
  * scoring) to locate the wall inside the 3.8 s bench line. Not a round
  * artifact. */
object LearnedMatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def ph(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val left = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val right = emb.filter(col("vec_id") >= 100 && col("vec_id") < 160)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    (1 to 2).foreach { round =>
      var model: graft.operators.LearnedMatch.Model = null
      ph(s"fit#$round") { model = graft.operators.LearnedMatch.fit(left, right, threshold = 0.2) }
      ph(s"score#$round") {
        graft.operators.LearnedMatch.rankPairs(
          graft.operators.LearnedMatch.scoredPairs(left, right, model), 2)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
