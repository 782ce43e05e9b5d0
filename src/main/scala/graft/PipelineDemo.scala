package graft

import graft.features.{Features, Targets}
import graft.ml.MlPipeline
import graft.source.Bars
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Runnable end-to-end demo of the library's user path — the reference's
  * `python -m src.main` equivalent (ingest → features → target → temporal
  * split → GBT train → evaluate → importances) plus the streaming twin.
  * Usage: runMain graft.PipelineDemo [sfDir] [maxIter]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val maxIter = if (args.length > 1) args(1).toInt else 20
    val spark = GraftSession.local("graft-pipeline-demo")

    val feats = Targets.withTarget(Features.computeAllFeatures(Bars.bars(spark, dir)))
    val (train, test) = MlPipeline.temporalSplit(feats)
    println(s"[demo] dataset rows=${feats.count()} train=${train.count()} test=${test.count()}")

    val fcols = Features.FeatureCols
    val model = MlPipeline.classifier(maxIter).fit(MlPipeline.assemble(train, fcols))
    val scored = model.transform(MlPipeline.assemble(test, fcols))
    MlPipeline.evaluateClassifier(scored).toSeq.sortBy(_._1).foreach {
      case (k, v) => println(f"[demo] metric $k%-10s = $v%.4f")
    }
    println("[demo] top-5 importances:")
    MlPipeline.topImportances(model, fcols, 5).collect().foreach(r =>
      println(f"[demo]   ${r.getString(0)}%-16s ${r.getDouble(1)}%.4f"))

    val sq = Streams.tumblingCounts(Streams.readEventStream(spark, dir))
      .writeStream.format("memory").queryName("demo_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination(120000)
    val streamN = spark.table("demo_stream").agg(sum("n")).collect()(0).getLong(0)
    val batchN = graft.analytics.TimeWindows.tumbling(Bars.readEvents(spark, dir))
      .agg(sum("n")).collect()(0).getLong(0)
    println(s"[demo] streaming event total=$streamN batch=$batchN match=${streamN == batchN}")

    val ss = Streams.sessionCounts(Streams.readEventStream(spark, dir))
      .writeStream.format("memory").queryName("demo_sessions")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    ss.awaitTermination(120000)
    val sessions = spark.table("demo_sessions").agg(sum("n_sessions")).collect()(0).getLong(0)
    println(s"[demo] streaming sessions total=$sessions")
    spark.stop()
  }
}
