package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Driver-side key/value metadata for the maintained-table family
  * (Compaction / Scd2 / AggView): a java.util.Properties file under
  * `<dir>/meta`. The previous single-row-parquet form cost fixed
  * Spark jobs (listing + footer + head collect on read, a write job
  * on every fence advance) for what is bytes of bookkeeping; a
  * FileSystem stream costs none. Overwrite is create(overwrite=true)
  * — no weaker than the parquet overwrite it replaces; the
  * crash-between-data-and-meta window each caller documents is
  * unchanged.
  */
private[graft] object MetaFile {

  private def path(dir: String) = new Path(s"$dir/meta/graft.properties")

  def write(spark: SparkSession, dir: String, kv: Map[String, String]): Unit = {
    val p = path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val props = new java.util.Properties()
    kv.foreach { case (k, v) => props.setProperty(k, v) }
    val os = fs.create(p, true)
    try props.store(os, null) finally os.close()
  }

  def read(spark: SparkSession, dir: String): Map[String, String] = {
    val p = path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val is = fs.open(p)
    val props = new java.util.Properties()
    try props.load(is) finally is.close()
    import scala.jdk.CollectionConverters._
    props.stringPropertyNames().asScala.map(k => k -> props.getProperty(k)).toMap
  }
}
