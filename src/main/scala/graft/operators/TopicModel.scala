package graft.operators

import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.feature.{CountVectorizer, Tokenizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A4/J9 topic-model matcher (`Topic_Modelling.py:22-82`): fit CountVectorizer
  * + LDA on the UNION of both sides (the reference's union-fit idiom), embed
  * each side into topic space, score pairs by topic-distribution cosine, keep
  * per-left argmax. k=10 topics per the reference (Topic_Modelling.py:30). */
object TopicModel {

  private val cosUdf = udf { (a: Vector, b: Vector) =>
    val x = a.toArray; val y = b.toArray
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < x.length) { dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Best topic-space match per left row. `left`/`right`: (id, text). */
  def bestMatch(left: DataFrame, right: DataFrame, k: Int = 10,
                vocabSize: Int = 1 << 14, seed: Long = 42L): DataFrame = {
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val union = left.select(col("text")).unionByName(right.select(col("text")))
    val cv = new CountVectorizer().setInputCol("words").setOutputCol("tf")
      .setVocabSize(vocabSize).fit(tok.transform(union))
    val lda = new LDA().setK(k).setMaxIter(10).setSeed(seed).setFeaturesCol("tf")
      .fit(cv.transform(tok.transform(union)))

    def embed(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      lda.transform(cv.transform(tok.transform(df)))
        .select(col("id").as(idAs), col("topicDistribution").as(vecAs))

    val l = embed(left, "left_id", "lv")
    val r = embed(right, "right_id", "rv")
    l.crossJoin(broadcast(r))
      .withColumn("score", cosUdf(col("lv"), col("rv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("left_id")).orderBy(desc("score"), col("right_id"))))
      .filter(col("rn") === 1)
      .select(col("left_id"), col("right_id"), col("score"))
  }
}
