package graft.operators

import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J9/A4: the union-fit TF-IDF matcher family (`cosine_similarity.py:19-36`,
  * `ML_Model.py:17-55`, `Similarity.py:13-23`).
  *
  * Reference shape reproduced Spark-first: fit the IDF model on the UNION of
  * both sides' text (J9 — the reference fits the vectorizer on
  * `left ++ right`), transform each side, score all pairs with sparse cosine,
  * keep the per-left argmax (J2) — broadcast nested loop over the small side,
  * window group-limit for the reduction. */
object TfIdfMatch {

  private val cosineUdf = udf { (a: SparseVector, b: SparseVector) =>
    var i = 0; var j = 0
    var dot = 0.0
    val ai = a.indices; val av = a.values
    val bi = b.indices; val bv = b.values
    while (i < ai.length && j < bi.length) {
      if (ai(i) == bi(j)) { dot += av(i) * bv(j); i += 1; j += 1 }
      else if (ai(i) < bi(j)) i += 1
      else j += 1
    }
    val na = math.sqrt(av.map(x => x * x).sum)
    val nb = math.sqrt(bv.map(x => x * x).sum)
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
  }

  /** Best TF-IDF match per left row. `left`/`right`: (id, text). */
  def bestMatch(left: DataFrame, right: DataFrame, numFeatures: Int = 1 << 16): DataFrame = {
    val l = left.select(col("id").as("left_id"), col("text").as("left_text"))
    val r = right.select(col("id").as("right_id"), col("text").as("right_text"))

    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("tf")
      .setNumFeatures(numFeatures)
    // J9: vocabulary statistics fitted on the union of both sides
    val corpus = tf.transform(tok.transform(
      l.select(col("left_text").as("text")).unionByName(
        r.select(col("right_text").as("text")))))
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(corpus)

    def vectorize(df: DataFrame, textCol: String, out: String): DataFrame =
      idf.transform(tf.transform(tok.transform(df.withColumn("text", col(textCol)))))
        .withColumnRenamed("tfidf", out).drop("text", "words", "tf")

    val lv = vectorize(l, "left_text", "lv")
    val rv = vectorize(r, "right_text", "rv")
    val scored = lv.crossJoin(broadcast(rv))
      .withColumn("score", cosineUdf(col("lv"), col("rv")))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("left_id")).orderBy(desc("score"), col("right_id"))))
      .filter(col("rn") === 1)
      .select(col("left_id"), col("right_id"), col("score"))
  }
}
