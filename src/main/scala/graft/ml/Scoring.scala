package graft.ml

import org.apache.spark.ml.classification.GBTClassificationModel
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch scoring path (reference: src/ml/prediction.py:14-71): validate the
  * feature columns, assemble, transform, attach `prediction` and the
  * positive-class `probability_up`. Stays entirely in the plan — no
  * driver-side materialization (unlike the reference's numpy roundtrip,
  * prediction.py:56-58).
  */
object Scoring {

  /** Fails listing the missing columns (prediction.py:52-54). */
  def validateFeatures(df: DataFrame, features: Seq[String]): Unit = {
    val missing = features.filterNot(df.columns.contains)
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"Missing feature columns: ${missing.mkString(", ")}")
  }

  def loadClassifier(path: String): GBTClassificationModel =
    GBTClassificationModel.load(path)

  /** model.transform + probability extraction (prediction.py:58-69). */
  def scoreClassifier(model: GBTClassificationModel, df: DataFrame,
      features: Seq[String]): DataFrame = {
    validateFeatures(df, features)
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .transform(df.na.drop("any", features))
    model.transform(assembled)
      .withColumn("probability_up", vector_to_array(col("probability"))(1))
      .drop("features", "rawPrediction", "probability")
  }
}
