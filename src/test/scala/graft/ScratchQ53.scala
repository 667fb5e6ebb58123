package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev scratch (test scope, not shipped): stage-level timing of q53 at
  * sf0.1 — where do the seconds go between the three jobs?
  * `Test/runMain graft.ScratchQ53` */
object ScratchQ53 {
  def main(args: Array[String]): Unit = {
    val s = Tables.session(32)
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for (c <- si.completionTime; b <- si.submissionTime) yield c - b).getOrElse(-1L)
        stages += ((si.stageId, si.name.take(60), ms, si.numTasks))
      }
    })
    val q = SparkEntry.queries("q53_trailing_year")
    // warm
    q(s, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    stages.clear()
    val t0 = System.nanoTime()
    q(s, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"q53 wall: $dt%.2f s")
    stages.foreach { case (id, name, ms, n) =>
      println(f"stage $id%3d $ms%6d ms tasks=$n%3d  $name")
    }
    s.stop()
  }
}
