package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only job profiler: runs one declared query end-to-end (prepare +
  * query fn + noop materialization) and prints every Spark job's
  * wall-time, task count, and first-stage callsite — the "count jobs
  * per verb" measurement the r17 verdict asked for on the ingest
  * lifecycle verbs (guide §1). Not part of the driver contract. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class J(id: Int, var start: Long = 0L, var end: Long = 0L,
      var tasks: Int = 0, var site: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId, e.time)
        j.site = e.stageInfos.headOption.map(_.details.linesIterator
          .filter(l => l.contains("graft") && !l.contains("JobProfile"))
          .take(1).mkString).getOrElse("")
        if (j.site.isEmpty)
          j.site = e.stageInfos.headOption.map(_.name).getOrElse("")
        jobs.put(e.jobId, j)
        e.stageIds.foreach(s => stageJob.put(s, e.jobId))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        Option(stageJob.get(e.stageId)).foreach(jid =>
          Option(jobs.get(jid)).foreach(j => j.synchronized { j.tasks += 1 }))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
    })

    // prepare (untimed in the bench) — run it, then mark the boundary
    graft.SparkEntry.prepares.get(name).foreach(p => p(spark, sfDir))
    val boundary = jobs.size()
    System.err.println(s"[profile] prepare ran ${boundary} jobs")
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    val rows = jobs.values.asScala.toSeq.sortBy(_.id)
    println(f"== $name%s: ${dt}%.2f s, ${rows.size - boundary}%d timed jobs " +
      f"(+$boundary%d prepare jobs)")
    rows.foreach { j =>
      val d = (j.end - j.start) / 1000.0
      val tag = if (j.id < boundary) "prep " else "query"
      println(f"  $tag job ${j.id}%3d ${d}%7.3f s  ${j.tasks}%4d tasks  ${j.site.trim.take(110)}")
    }
    spark.stop()
  }
}
