package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B: wedge-join (round-10 plan) vs edge-iterator (round-12
  * plan) triangle counting on the same cached graph — same session,
  * back to back, so machine drift cancels. Temporary diagnostic for
  * the r11 bench-swing investigation; results pinned in SCALE_SMOKE.md.
  */
object TriCompare {
  def main(args: Array[String]): Unit = {
    val m = args.headOption.flatMap(_.toIntOption).getOrElse(5000000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 1000000L
    def u(salt: Int) =
      (pmod(hash(col("id"), lit(salt)), lit(1000003)) + 0.5) / lit(1000003.0)
    def endpoint(salt: Int) = { val x = u(salt); floor(x * x * x * n).cast("long") }
    val edges = spark.range(m)
      .select(endpoint(1).as("src"), endpoint(2).as("dst")).cache()
    edges.count()

    def orientedOf(edges: DataFrame): (DataFrame, DataFrame) = {
      val und = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val withDeg = und
        .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      val apexIsA = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val oriented = withDeg.select(
        when(apexIsA, col("a")).otherwise(col("b")).as("u"),
        when(apexIsA, col("b")).otherwise(col("a")).as("v"))
      (und, oriented)
    }

    // round-10 plan: wedge self-join + closing equi-join
    def wedgePlan(): Long = {
      val (und, oriented) = orientedOf(edges)
      val w1 = oriented.select(col("u"), col("v").as("v1"))
      val w2 = oriented.select(col("u"), col("v").as("v2"))
      w1.join(w2.hint("shuffle_hash"), Seq("u")).filter(col("v1") < col("v2"))
        .join(und.hint("shuffle_hash"), col("v1") === col("a") && col("v2") === col("b"))
        .count()
    }
    // round-12 plan: sorted adjacency arrays + local intersect
    def edgeIterPlan(): Long = {
      val (_, oriented) = orientedOf(edges)
      val adj = oriented.groupBy("u")
        .agg(sort_array(collect_list(col("v"))).as("nbrs"))
      oriented
        .join(adj.select(col("u"), col("nbrs").as("nu")).hint("shuffle_hash"), Seq("u"))
        .join(adj.select(col("u").as("v"), col("nbrs").as("nv")).hint("shuffle_hash"),
          Seq("v"))
        .select(explode(array_intersect(col("nu"), col("nv"))).as("w"))
        .count()
    }
    def timed(f: => Long): (Long, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // alternate runs so drift lands on both
    val samples = (1 to 3).map { _ =>
      val (tw, sw) = timed(wedgePlan())
      val (te, se) = timed(edgeIterPlan())
      require(tw == te, s"plans disagree: $tw vs $te")
      (sw, se)
    }
    println(s"""{"tri_compare":{"m_edges":$m,"triangles":${3},""" +
      s""""wedge_sec":[${samples.map(s => f"${s._1}%.1f").mkString(",")}],""" +
      s""""edgeiter_sec":[${samples.map(s => f"${s._2}%.1f").mkString(",")}]}}""")
    spark.stop()
  }
}
