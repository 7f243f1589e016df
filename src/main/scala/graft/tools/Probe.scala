package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.select("l_shipdate").printSchema()
    val ev2 = ev.selectExpr("cast(timestamp_micros(ts div 1000) as timestamp_ntz) ts2", "ts div 1000 as ts_us")
    ev2.printSchema()
    ev2.selectExpr("ts2", "ts_us", "date_trunc('hour', ts2) h").show(3, false)
    import org.apache.spark.sql.functions._
    ev.select(md5(col("event_type")), conv(substring(md5(col("event_type")), 1, 8), 16, 10).cast("long")).show(2, false)
    ev2.limit(5).write.mode("overwrite").parquet("/tmp/probe_ts")
    spark.stop()
  }
}
