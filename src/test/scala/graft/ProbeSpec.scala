package graft
import org.apache.spark.sql.functions._
class ProbeSpec extends SparkSpec {
  import spark.implicits._
  test("probe: explicit schema over partition subdirs") {
    val d = tmpDir("probe")
    Seq((1L, "a", 5), (2L, "b", 6)).toDF("id", "v", "_tp")
      .write.partitionBy("_tp").parquet(s"$d/data")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    // 1: explicit schema WITHOUT _tp, path = dataset root
    val r1 = scala.util.Try(spark.read.schema(schema).parquet(s"$d/data").columns.toSeq)
    println(s"PROBE1: $r1")
    // 2: explicit schema WITH _tp
    val with_tp = schema.add("_tp", org.apache.spark.sql.types.IntegerType)
    val r2 = scala.util.Try(spark.read.schema(with_tp).parquet(s"$d/data").collect().toSeq.sortBy(_.getLong(0)).map(_.toString))
    println(s"PROBE2: $r2")
    // 3: reading the LEAF dir directly without basePath
    val r3 = scala.util.Try(spark.read.schema(schema).parquet(s"$d/data/_tp=5").collect().toSeq.map(_.toString))
    println(s"PROBE3: $r3")
    // 4: two leaf dirs, no basePath
    val r4 = scala.util.Try(spark.read.schema(schema).parquet(s"$d/data/_tp=5", s"$d/data/_tp=6").collect().toSeq.map(_.toString))
    println(s"PROBE4: $r4")
    // 5: root without schema
    val r5 = scala.util.Try(spark.read.parquet(s"$d/data").columns.toSeq)
    println(s"PROBE5: $r5")
  }
}
