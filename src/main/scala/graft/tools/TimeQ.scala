package graft.tools

import scala.collection.concurrent.TrieMap

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Warm re-run timer for declared queries, with job/stage/task counts
  * per run (SparkListener) so "is this fixed scheduler overhead or
  * compute?" is answerable from the output alone: a 2 s query with 14
  * jobs and 0.4 s of summed task time is protocol latency, not a data
  * plane to optimize.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get("graft-timeq")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNanos = new AtomicLong
    // TIMEQ_JOBS=1: one line per job (wall ms, task count, summed task
    // ms, first stage name) — pinpoints WHICH of a protocol chain's
    // jobs carry the time without the (disabled) UI
    val verbose = sys.env.get("TIMEQ_JOBS").contains("1")
    val jobT0 = TrieMap.empty[Int, Long]
    val jobTasks = TrieMap.empty[Int, (AtomicInteger, AtomicLong)]
    val stageToJob = TrieMap.empty[Int, Int]
    val jobName = TrieMap.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          jobT0(j.jobId) = System.nanoTime()
          jobTasks(j.jobId) = (new AtomicInteger, new AtomicLong)
          j.stageInfos.foreach(si => stageToJob(si.stageId) = j.jobId)
          jobName(j.jobId) =
            j.stageInfos.headOption.map(_.name.takeWhile(_ != '\n'))
              .getOrElse("?")
        }
      }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) jobT0.remove(j.jobId).foreach { t0 =>
          val (n, ns) = jobTasks.getOrElse(j.jobId,
            (new AtomicInteger, new AtomicLong))
          println(f"TIMEQJOB ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms tasks=${n.get}%3d taskMs=${ns.get / 1e6}%8.1f ${jobName.getOrElse(j.jobId, "?")}")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(t.taskMetrics).foreach { m =>
          taskNanos.addAndGet(m.executorRunTime * 1000000L)
          if (verbose) stageToJob.get(t.stageId)
            .flatMap(jobTasks.get).foreach { case (n, ns) =>
              n.incrementAndGet(); ns.addAndGet(m.executorRunTime * 1000000L)
            }
        }
      }
    })
    args.foreach { name =>
      (1 to 2).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; give the bus a beat so
        // the counts describe this run, not most of it
        Thread.sleep(200)
        println(f"TIMEQ $name run$i $wall%.2f s rows=$n " +
          f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
          f"taskTime=${taskNanos.get / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
