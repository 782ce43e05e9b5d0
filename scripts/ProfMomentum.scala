package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratch: A/B the r6-before vs r6-after-checkpoint ml_matrix shapes. */
object ProfMomentum {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-prof-momentum")
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => DataFrame): Unit = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label%-44s ${secs.min}%8.3f s")
    }

    import graft.features.{Features, Targets}
    import graft.queries.Core
    val bars = graft.source.Bars.bars(spark, dir)
    val feats = Features.computeAllFeatures(bars)
    val withTarget = Targets.withTarget(feats, targetType = "classification")
    val selected = withTarget.select(
      col("event_id") +: (Core.MlMatrixFeatures.map(col) :+ col("target")): _*)
    val dropped = selected.na.drop("any", Core.MlMatrixFeatures)
    val ints = Set("hour", "minute", "day_of_week", "day", "month")
    def r6cols = col("event_id") +:
      (Core.MlMatrixFeatures.map(n => if (ints(n)) col(n) else Core.r6(col(n)).as(n)) :+
        col("target"))

    // warmup
    dropped.write.format("noop").mode("overwrite").save()

    time("A: r6 pre-checkpoint, sort (r5 shape)")(
      dropped.select(r6cols: _*).localCheckpoint().orderBy("event_id"))
    time("B: checkpoint raw, r6 after, sort (new)")(
      dropped.localCheckpoint().select(r6cols: _*).orderBy("event_id"))
    time("C: checkpoint raw, r6, checkpoint, sort")(
      dropped.localCheckpoint().select(r6cols: _*).localCheckpoint().orderBy("event_id"))
    time("D: raw pipeline no r6 no sort")(dropped)
    time("E: raw pipeline, checkpoint, sort")(
      dropped.localCheckpoint().orderBy("event_id"))
    spark.stop()
  }
}
