package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk reporting for training-data curation: before a
  * corpus ships, measure how identifying its quasi-identifier combinations
  * are (Sweeney 2002, k-anonymity; Machanavajjhala et al. 2007,
  * l-diversity). A row is k-anonymous when at least k−1 other rows share
  * its full quasi-identifier tuple; a class is l-diverse when it contains
  * at least l distinct sensitive values — the guard against homogeneity
  * attacks where a large class still leaks because everyone in it shares
  * the sensitive attribute.
  */
object Privacy {

  /** k-anonymity / l-diversity scorecard: group rows into equivalence
    * classes by the quasi-identifier tuple, then band the classes by size
    * (k=1 singletons are directly re-identifiable; k<5 is the classic
    * publication threshold) and report per band: class count, row count,
    * row share, and the band's WORST l-diversity.
    *
    * Scale shape: one map-side-combinable groupBy on the QI tuple (the
    * only data-sized shuffle — class counting is a partial aggregate), a
    * per-class exact distinct on the sensitive column (partial too: the
    * distinct set is bounded by the class size), then an O(bands)
    * aggregate. The share division runs over the tiny band table via a
    * window — never over the data. All-integer until that one division. */
  def kAnonymityReport(df: DataFrame, quasi: Seq[Column],
      sensitive: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val classes = df
      .groupBy(quasi.zipWithIndex.map { case (c, i) => c.as(s"_qi$i") }: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_div"))
    val band = when(col("class_size") === 1, "k=1")
      .when(col("class_size") <= 4, "k=2-4")
      .when(col("class_size") <= 9, "k=5-9")
      .when(col("class_size") <= 49, "k=10-49")
      .otherwise("k>=50")
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    classes.groupBy(band.as("k_band"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"),
        min(col("l_div")).as("min_l_diversity"))
      .withColumn("row_share",
        col("n_rows").cast("double") / sum(col("n_rows")).over(all))
  }
}
