package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.{Hnsw, Ivf}
import graft.sources.Tables

/** Targeted ANN micro-benchmark: times the throughput-query shape
  * (every vector perturbed into a query, k=10) for several shard
  * counts and the routed path, with repeats — the signal Bench's
  * single-shot timing can't separate from run variance. Measurement
  * input for tuning `Hnsw.Params.numPartitions`.
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val qs = emb.select(col("vec_id").as("query_id"),
      perturbQuery(col("embedding")).as("query_vec"))

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[annbench] $label%-28s ${ts.min}%.2f s (min of 3: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    for (p <- Seq(2, 4, 8, 16)) {
      time(s"searchTopK P=$p") {
        Hnsw.searchTopK(emb, qs, 10, Hnsw.Params(numPartitions = p))
          .write.format("noop").mode("overwrite").save()
      }
    }
    val cents = Ivf.kmeans(emb, 8, 2)
    time("searchRouted C=8 nprobe=5 r=2") {
      Hnsw.searchRouted(emb, qs, 10, Hnsw.Params(), cents, nprobe = 5, replication = 2)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
