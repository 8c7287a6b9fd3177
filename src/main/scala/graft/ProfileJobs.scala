package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only structural profiler: run each named query (or every bench row)
  * twice and report, for the WARM run, the number of Spark jobs, stages and
  * tasks it schedules plus wall seconds. At bench SFs the data is small, so
  * job/stage count — the barrier structure — is what a row's seconds are
  * made of, and it is also the term that matters at cluster scale (each job
  * is a full scheduling round-trip; each stage a shuffle barrier).
  * Usage: runMain graft.ProfileJobs [q1,q2,...]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names: Seq[String] = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Queries.benchNames)
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val trace = sys.env.get("GRAFT_PROFILE_TRACE").contains("1")
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized {
          jobs += 1
          if (trace) {
            val d = Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("")
            val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
            println(f"[job] ${js.jobId}%3d stages=${js.stageInfos.size}%2d $site%-60s $d")
          }
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          stages += 1; tasks += sc.stageInfo.numTasks
          if (trace) {
            val si = sc.stageInfo
            val ms = (for (a <- si.completionTime; b <- si.submissionTime)
              yield a - b).getOrElse(-1L)
            val tm = si.taskMetrics
            val spillM = if (tm == null) -1L else tm.memoryBytesSpilled
            val spillD = if (tm == null) -1L else tm.diskBytesSpilled
            val gc = if (tm == null) -1L else tm.jvmGCTime
            println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%3d ${ms}%6d ms gc=${gc}%5d spillM=$spillM spillD=$spillD ${si.name.take(60)}")
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    println(f"${"query"}%-28s ${"s"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s")
    names.foreach { name =>
      val fn = Queries.queries(name)
      fn(spark, sfDir).count() // warm: caches, codegen, JIT
      Thread.sleep(300) // let the async listener bus drain
      synchronized { jobs = 0; stages = 0; tasks = 0 }
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"$name%-28s $sec%7.2f $jobs%5d $stages%6d $tasks%6d")
    }
    spark.stop()
  }
}
