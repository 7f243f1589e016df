package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TopKHeap
import graft.functions.VectorFunctions._

/** The bounded-heap top-k aggregate must reproduce the rank window it
  * replaces on every batch serving path — exactly, including ties —
  * and the fused mapPartitions kernel must reproduce the declarative
  * batch probe.
  */
class TopKAggSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("TopKHeap keeps the k smallest (key, id) pairs under the total order, any arrival order") {
    val pairs = Seq((3.0, 7L), (1.0, 9L), (1.0, 2L), (2.0, 1L), (3.0, 1L), (0.5, 4L), (2.0, 0L))
    for (perm <- pairs.permutations.take(50); k <- Seq(1, 3, 5, 10)) {
      val h = new TopKHeap(k)
      perm.foreach { case (d, i) => h.offer(d, i) }
      assert(h.sorted.toSeq === pairs.sorted.take(k), s"k=$k perm=$perm")
    }
  }

  test("heap aggregate == row_number window on random multi-partition data, ties included") {
    val rnd = new scala.util.Random(7)
    // duplicated dist values force tie-breaks; 8 partitions force merges
    val rows = (0 until 20000).map { i =>
      (rnd.nextInt(50).toLong, math.floor(rnd.nextDouble() * 20) / 10.0, rnd.nextLong().abs % 1000)
    }
    val df = rows.toDF("query_id", "dist", "vec_id").repartition(8).cache()
    for (k <- Seq(1, 5, 17)) {
      val w = Window.partitionBy("query_id").orderBy(col("dist"), col("vec_id"))
      val windowed = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("query_id", "vec_id", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val heaped = df
        .groupBy("query_id").agg(topKPairs(col("dist"), col("vec_id"), k).as("tk"))
        .select(col("query_id"), explode(col("tk")).as("p"))
        .select(col("query_id"), col("p.id").as("vec_id"), col("p.key").as("dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(heaped === windowed, s"k=$k")
    }
    // note: duplicate (query_id, dist, vec_id) triples can collapse in
    // the set compare — the window keeps both, the heap keeps both too
    // (they are distinct heap entries); row multiplicity is covered by
    // the count assert:
    val k = 5
    val nWindow = df.withColumn("rn",
      row_number().over(Window.partitionBy("query_id").orderBy(col("dist"), col("vec_id"))))
      .filter(col("rn") <= k).count()
    val nHeap = df.groupBy("query_id").agg(topKPairs(col("dist"), col("vec_id"), k).as("tk"))
      .select(explode(col("tk"))).count()
    assert(nHeap === nWindow)
  }

  test("fused batch kernel == declarative batch probe, all nprobe settings") {
    val emb = (0L until 200L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Array.fill(16)(rnd.nextFloat() * 100f))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf_fused").toString
    Ivf.ensurePartitioned(emb, 16, s"$dir/idx")
    val qs = emb.filter(col("vec_id") < 40)
      .select(col("vec_id").as("query_id"), perturbQuery(col("embedding")).as("query_vec"))
    for (nprobe <- Seq(2, 4, 16)) {
      val decl = Ivf.topKPartitionedBatch(spark, s"$dir/idx", qs, 10, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val fused = Ivf.topKPartitionedBatchFused(spark, s"$dir/idx", qs, 10, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fused === decl, s"nprobe=$nprobe")
    }
  }

  test("fused cosine and MIPS batch kernels == their declarative twins") {
    val emb = (0L until 200L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Array.fill(16)(rnd.nextFloat() * 100f))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf_fused_cm").toString
    Ivf.ensurePartitionedCosine(emb, 16, s"$dir/cos")
    Ivf.ensurePartitionedMips(emb, 16, s"$dir/mips")
    val qs = emb.filter(col("vec_id") < 40)
      .select(col("vec_id").as("query_id"), perturbQuery(col("embedding")).as("query_vec"))
    for (nprobe <- Seq(2, 16)) {
      val cosD = Ivf.cosineTopKPartitionedBatch(spark, s"$dir/cos", qs, 10, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val cosF = Ivf.cosineTopKPartitionedBatchFused(spark, s"$dir/cos", qs, 10, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(cosF === cosD, s"cosine nprobe=$nprobe")
      val mipsD = Ivf.mipsTopKPartitionedBatch(spark, s"$dir/mips", qs, 10, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val mipsF = Ivf.mipsTopKPartitionedBatchFused(spark, s"$dir/mips", qs, 10, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(mipsF === mipsD, s"mips nprobe=$nprobe")
    }
  }
}
