package graft.tools

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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(t.taskMetrics).foreach(m =>
          taskNanos.addAndGet(m.executorRunTime * 1000000L))
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
