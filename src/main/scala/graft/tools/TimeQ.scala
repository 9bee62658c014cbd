package graft.tools
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get("graft-timeq")
    args.foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"TIMEQ $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
