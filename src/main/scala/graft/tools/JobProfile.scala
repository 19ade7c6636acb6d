package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-query job/stage attribution: runs each named query twice
  * (second run reported) with a listener that records every job's
  * wall time, stage task-time and shuffle bytes — the "which of the
  * 14 jobs inside this query is slow" view the Spark UI would give.
  * Dev tool only, not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... tools/jrun.sh graft.tools.JobProfile q146_image_clusters ...
  */
object JobProfile {
  final case class JobRec(id: Int, var desc: String, start: Long,
      var end: Long = 0L, stages: mutable.Buffer[String] = mutable.Buffer())

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = mutable.Map[Int, JobRec]()
    val stageInfo = mutable.Map[Int, (String, Long, Long, Long, Int)]()
    var collect = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (collect) {
          val rec = JobRec(e.jobId,
            Option(e.properties.getProperty("spark.job.description"))
              .getOrElse(""), e.time)
          // per-job attribution: the job's graft callsite (from any
          // stage's details) + its stages' ids
          e.stageInfos.foreach { si =>
            si.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("JobProfile"))
              .foreach(l => if (rec.desc.isEmpty) rec.desc = l.trim)
          }
          rec.stages ++= e.stageInfos.map(_.stageId.toString)
          jobs(e.jobId) = rec
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (collect) jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collect) {
          val si = e.stageInfo
          val m = si.taskMetrics
          // first graft.* frame in the callsite stack — the useful
          // attribution (si.name is usually an internal Spark frame);
          // plus the stage's RDD scope chain (scan paths, operators)
          val frames = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("JobProfile"))
            .map(_.trim).getOrElse(si.name.takeWhile(_ != '\n'))
          val scopes = si.rddInfos.sortBy(_.id).map { r =>
            val sc = r.scope.map(_.name).getOrElse("")
            if (sc.nonEmpty) sc else r.name
          }.distinct.mkString(" | ")
          val where = s"$frames  [$scopes]"
          stageInfo(si.stageId) = (where,
            m.executorRunTime,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, si.numTasks)
        }
    })

    val names = if (args.nonEmpty) args.toSeq else Seq("q146_image_clusters")
    for (q <- names) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, d).count() // warm (store builds, codegen, listing)
      jobs.clear(); stageInfo.clear()
      collect = true
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      val wall = (System.nanoTime() - t0) / 1e9
      collect = false
      Thread.sleep(300) // let listener drain
      println(f"===== $q  wall=$wall%.3f s  rows=$n  jobs=${jobs.size} =====")
      val sorted = jobs.values.toSeq.sortBy(_.start)
      var prevEnd = 0L
      for (j <- sorted) {
        val dur = (j.end - j.start) / 1000.0
        val gap = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1000.0
        prevEnd = math.max(prevEnd, j.end)
        println(f"  job ${j.id}%4d  ${dur}%7.3f s  (gap ${gap}%6.3f s)  stages=${j.stages.mkString(",")}  ${j.desc.take(110)}")
      }
      val top = stageInfo.toSeq.sortBy(-_._2._2).take(12)
      println("  -- top stages by executor run time --")
      for ((sid, (nm, rt, sr, sw, nt)) <- top)
        println(f"  stage $sid%4d  runTime=${rt / 1000.0}%7.2f s  tasks=$nt%3d  shufR=${sr / 1e6}%8.2f MB  shufW=${sw / 1e6}%8.2f MB  $nm")
    }
    spark.stop()
  }
}
