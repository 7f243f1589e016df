package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Portable

/** Distributed HNSW (Hierarchical Navigable Small World) approximate
  * nearest-neighbor index — the Spark-native re-expression of the
  * reference's `Hnsw` class (hnsw.cc:94-285).
  *
  * Design (SURVEY.md §7.4): the reference's `Insert` is inherently
  * sequential (every insert reads the graph built by all previous
  * inserts, hnsw.cc:147-215), so it cannot be a Catalyst operator.
  * Instead:
  *
  *  1. Level assignment is a pure column (`Portable.levelOf`, the
  *     portable-hash analog of `RandomLevel`, hnsw.cc:140-145) — narrow,
  *     no shuffle, deterministic across cluster sizes.
  *  2. Points are hash-partitioned by id; each partition builds an
  *     independent in-memory HNSW over its subset inside
  *     `mapPartitions` (shared-nothing, no global mutable state, no
  *     driver involvement). Emits an `edges(src, dst, layer, part)`
  *     DataFrame.
  *  3. Queries search EVERY partition subgraph and merge per-query
  *     top-k (sharded-index search). Recall of the merged result is at
  *     least that of a single whole-set graph, because each shard
  *     search is an independent chance to find each true neighbor. At
  *     cluster scale the subgraphs live one-per-executor and queries
  *     fan out; at test scale the serialized shards are broadcast.
  *
  * The in-partition algorithm is the *paper* algorithm, deliberately
  * fixing the reference's two recall bugs (SURVEY.md §1.4.3-4): search
  * uses an ef-bounded best-first beam with a visited set (the reference
  * hill-climbs greedily and re-visits, hnsw.cc:247-259, recall@1≈0.30),
  * and neighbor lists are degree-capped with closest-first shrink (the
  * reference grows degree unboundedly, hnsw.cc:195-211). The recall
  * harness (`q_knn_recall` + HnswSpec) measures the improvement against
  * the exact-kNN oracle.
  */
object Hnsw {

  /** Index parameters. `m`: out-degree target per insert; `maxM`: hard
    * degree cap after shrink; `efConstruction`/`efSearch`: beam widths;
    * `maxLevel`: level clamp (hnsw.cc:124-126 semantics).
    */
  case class Params(
      m: Int = 8,
      maxM: Int = 12,
      efConstruction: Int = 64,
      efSearch: Int = 64,
      maxLevel: Int = 4,
      numPartitions: Int = 4)

  // ------------------------------------------------------------------
  // In-partition graph (plain arrays; lives only inside a task)
  // ------------------------------------------------------------------

  /** One partition's HNSW over plain primitive arrays. Deterministic:
    * insertion order is the caller's sorted order, all ties break by
    * node index.
    */
  private[operators] final class LocalGraph(p: Params) {
    private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    private[operators] val ids = mutable.ArrayBuffer.empty[Long]
    private val levels = mutable.ArrayBuffer.empty[Int]
    // adjacency(node)(layer) = neighbor node indices
    private val adj = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
    private var entry: Int = -1

    def size: Int = vecs.length

    private def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      math.sqrt(s)
    }

    /** Best-first ef-bounded search on one layer from entry points. */
    private def searchLayer(q: Array[Float], eps: Seq[Int], ef: Int, layer: Int): mutable.PriorityQueue[(Double, Int)] = {
      val visited = mutable.BitSet.empty
      // candidates: nearest first; results: farthest first (bounded by ef)
      val cand = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by[(Double, Int), (Double, Int)](t => (-t._1, -t._2)))
      val res = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by[(Double, Int), (Double, Int)](t => (t._1, t._2)))
      eps.foreach { e =>
        if (!visited(e)) {
          visited += e
          val d = dist(q, vecs(e))
          cand.enqueue((d, e)); res.enqueue((d, e))
        }
      }
      while (res.size > ef) res.dequeue()
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (res.nonEmpty && dc > res.head._1 && res.size >= ef) {
          cand.clear() // nearest candidate is farther than the worst kept result
        } else {
          adj(c)(layer).foreach { n =>
            if (!visited(n)) {
              visited += n
              val d = dist(q, vecs(n))
              if (res.size < ef || d < res.head._1) {
                cand.enqueue((d, n)); res.enqueue((d, n))
                if (res.size > ef) res.dequeue()
              }
            }
          }
        }
      }
      res
    }

    /** Insert one point with its preassigned level. */
    def insert(id: Long, vec: Array[Float], level: Int): Unit = {
      val idx = vecs.length
      vecs += vec; ids += id; levels += level
      adj += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = idx; return }

      var ep = entry
      val topLevel = levels(entry)
      // greedy descent above the insert level (hnsw.cc:151-161 analog)
      var layer = topLevel
      while (layer > level) {
        val r = searchLayer(vec, Seq(ep), 1, math.min(layer, levels(ep)))
        if (r.nonEmpty) ep = r.minBy(t => (t._1, t._2))._2
        layer -= 1
      }
      // beam insert on layers min(level, topLevel)..0 (hnsw.cc:169-213 analog)
      var eps = Seq(ep)
      layer = math.min(level, topLevel)
      while (layer >= 0) {
        val res = searchLayer(vec, eps, p.efConstruction, layer).toSeq
        val closest = res.sortBy(t => (t._1, t._2)).map(_._2)
        val neighbors = closest.take(p.m)
        neighbors.foreach { n =>
          adj(idx)(layer) += n
          adj(n)(layer) += idx
          // degree cap with closest-first shrink (absent in reference)
          if (adj(n)(layer).length > p.maxM) {
            val nv = vecs(n)
            adj(n)(layer) = adj(n)(layer)
              .map(x => (dist(nv, vecs(x)), x))
              .sortBy(identity)
              .take(p.maxM)
              .map(_._2)
          }
        }
        eps = closest.take(p.efConstruction)
        layer -= 1
      }
      if (level > levels(entry)) entry = idx
    }

    /** Top-k ANN query: greedy descent to layer 1, beam at layer 0. */
    def search(q: Array[Float], k: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      var ep = entry
      var layer = levels(entry)
      while (layer > 0) {
        val r = searchLayer(q, Seq(ep), 1, layer)
        if (r.nonEmpty) ep = r.minBy(t => (t._1, t._2))._2
        layer -= 1
      }
      searchLayer(q, Seq(ep), math.max(p.efSearch, k), 0)
        .toSeq.sortBy(t => (t._1, t._2)).take(k)
        .map { case (d, i) => (ids(i), d) }
    }

    /** All (src, dst, layer) edges, by external ids. */
    def edges: Iterator[(Long, Long, Int)] =
      adj.indices.iterator.flatMap { i =>
        adj(i).indices.iterator.flatMap { l =>
          adj(i)(l).iterator.map(j => (ids(i), ids(j), l))
        }
      }

    // -- direct loading from a persisted index (no re-insertion) --

    /** Append a node without linking. Load in ascending id order so the
      * entry point (first node reaching the max level) matches the one
      * the insert path would have selected.
      */
    def loadNode(id: Long, vec: Array[Float], level: Int): Unit = {
      val idx = vecs.length
      vecs += vec; ids += id; levels += level
      adj += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
      if (entry < 0 || level > levels(entry)) entry = idx
    }

    /** Append one directed adjacency edge by node indices. */
    def loadEdge(srcIdx: Int, dstIdx: Int, layer: Int): Unit =
      adj(srcIdx)(layer) += dstIdx
  }

  /** Per-JVM (per-executor) cache of reconstructed shard graphs, keyed
    * by the broadcast id of the index payload: every task of a search
    * job reuses one build instead of rebuilding per partition. Tiny
    * bound — entries die with the executor; at most a handful of live
    * indexes per job.
    */
  private object GraphCache {
    private val cache = new java.util.concurrent.ConcurrentHashMap[Long, Array[LocalGraph]]()
    def getOrBuild(key: Long, build: () => Array[LocalGraph]): Array[LocalGraph] = {
      if (cache.size > 8) cache.clear()
      cache.computeIfAbsent(key, _ => build())
    }
  }

  // ------------------------------------------------------------------
  // Distributed build
  // ------------------------------------------------------------------

  private def levelColumn(p: Params) =
    Portable.levelOf(col("vec_id"), p.m, p.maxLevel)

  /** Build per-partition subgraphs over `embeddings(vec_id, embedding)`.
    * Returns `edges(part, src, dst, layer)`. Deterministic: partition =
    * id mod P (not hashpartitioning of the JVM), insert order = id order
    * within each partition.
    */
  def buildEdges(embeddings: DataFrame, p: Params): DataFrame = {
    val spark = embeddings.sparkSession
    // no sortWithinPartitions: the per-part in-memory sort below is the
    // one that establishes insert order — a Tungsten sort here would be
    // paid and then discarded by the groupBy
    val prepared = embeddings
      .select(col("vec_id"), col("embedding"), levelColumn(p).as("level"),
        pmod(col("vec_id"), lit(p.numPartitions)).cast("int").as("part"))
      .repartition(p.numPartitions, col("part"))
    val outSchema = StructType(Seq(
      StructField("part", IntegerType, nullable = false),
      StructField("src", LongType, nullable = false),
      StructField("dst", LongType, nullable = false),
      StructField("layer", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    prepared.mapPartitions { rows =>
      // A task can receive several `part` values (hash partitioning of
      // the part column does not biject values onto task ids) — build
      // one independent graph per part so the shard layout is exactly
      // `vec_id % numPartitions` everywhere (build, search, reload).
      rows.toArray.groupBy(_.getAs[Int]("part")).iterator.flatMap { case (part, group) =>
        val g = new LocalGraph(p)
        group.sortBy(_.getAs[Long]("vec_id")).foreach { r =>
          g.insert(r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray,
            r.getAs[Int]("level"))
        }
        g.edges.map { case (s, d, l) => Row(part, s, d, l) }
      }
    }(enc)
  }

  /** Rebuild searchable subgraphs from stored vectors (levels are
    * recomputed from ids — they are a pure function of id) and search a
    * query DataFrame against every shard, merging per-query top-k.
    *
    * The shards are built once per executor from a broadcast of the
    * (id, vec, level) triples — the index payload, NOT the graph: the
    * deterministic build recreates identical adjacency everywhere. At
    * 100 TB the same code runs with shard-local builds and a
    * queries×shards shuffle instead of a broadcast; the declared
    * queries exercise the broadcast form.
    */
  def searchTopK(embeddings: DataFrame, queries: DataFrame, k: Int, p: Params): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val payload = embeddings
      .select(col("vec_id"), col("embedding"), levelColumn(p).as("level"))
      .as[(Long, Array[Float], Int)]
      .collect()
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(payload)
    val numParts = p.numPartitions

    val outSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    queries.select(col("query_id"), col("query_vec")).mapPartitions { rows =>
      // shard graphs built once per executor (GraphCache), not per task
      lazy val graphs: Array[LocalGraph] = GraphCache.getOrBuild(bc.id, () => {
        val data = bc.value
        val gs = Array.tabulate(numParts) { _ => new LocalGraph(p) }
        data.foreach { case (id, vec, level) =>
          gs(java.lang.Math.floorMod(id, numParts.toLong).toInt).insert(id, vec, level)
        }
        gs
      })
      rows.flatMap { r =>
        val qid = r.getLong(0)
        val q = r.getAs[Seq[Double]](1).map(_.toFloat).toArray
        graphs.iterator
          .flatMap(_.search(q, k))
          .toSeq.sortBy(t => (t._2, t._1)).take(k)
          .map { case (id, d) => Row(qid, id, math.rint(d * 1e6) / 1e6) }
      }
    }(enc)
  }

  /** Persist a built index as two Parquet tables: `nodes(vec_id,
    * embedding, level)` + `edges(part, src, dst, layer)` — the
    * relational encoding of the reference's pointer graph (SURVEY.md
    * §1.1). `load` + [[searchWithIndex]] then serve queries without
    * rebuilding.
    */
  def save(embeddings: DataFrame, p: Params, dir: String): Unit = {
    embeddings
      .select(col("vec_id"), col("embedding"), levelColumn(p).as("level"))
      .write.mode("overwrite").parquet(s"$dir/nodes")
    buildEdges(embeddings, p).write.mode("overwrite").parquet(s"$dir/edges")
  }

  /** Search a PERSISTED index: shard graphs are reconstructed from the
    * stored adjacency (no re-insertion — loading is O(edges)), then
    * queries fan out over shards exactly as in [[searchTopK]].
    */
  def searchWithIndex(nodes: DataFrame, edges: DataFrame, queries: DataFrame,
                      k: Int, p: Params): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val nodeData = nodes.select("vec_id", "embedding", "level")
      .as[(Long, Array[Float], Int)].collect().sortBy(_._1)
    val edgeData = edges.select("src", "dst", "layer")
      .as[(Long, Long, Int)].collect()
    val numParts = p.numPartitions
    val bcNodes = spark.sparkContext.broadcast(nodeData)
    val bcEdges = spark.sparkContext.broadcast(edgeData)

    val outSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    queries.select(col("query_id"), col("query_vec")).mapPartitions { rows =>
      lazy val graphs: Array[LocalGraph] = GraphCache.getOrBuild(bcNodes.id, () => {
        val gs = Array.fill(numParts)(new LocalGraph(p))
        val idxOf = new mutable.LongMap[Int]()
        bcNodes.value.foreach { case (id, vec, level) =>
          val g = gs(java.lang.Math.floorMod(id, numParts.toLong).toInt)
          idxOf(id) = g.size
          g.loadNode(id, vec, level)
        }
        bcEdges.value.foreach { case (src, dst, layer) =>
          gs(java.lang.Math.floorMod(src, numParts.toLong).toInt).loadEdge(idxOf(src), idxOf(dst), layer)
        }
        gs
      })
      rows.flatMap { r =>
        val qid = r.getLong(0)
        val q = r.getAs[Seq[Double]](1).map(_.toFloat).toArray
        graphs.iterator
          .flatMap(_.search(q, k))
          .toSeq.sortBy(t => (t._2, t._1)).take(k)
          .map { case (id, d) => Row(qid, id, math.rint(d * 1e6) / 1e6) }
      }
    }(enc)
  }

  /** Degree/size statistics per layer over a built edges table —
    * validates the linking invariants (m ≤ degree ≤ maxM after enough
    * inserts; layer sizes decay exponentially).
    */
  def degreeStats(edges: DataFrame): DataFrame =
    edges
      .groupBy("layer", "src")
      .agg(count(lit(1)).as("degree"))
      .groupBy("layer")
      .agg(
        count(lit(1)).as("n_nodes"),
        sum("degree").as("n_edges"),
        round(avg("degree"), 6).as("avg_degree"),
        max("degree").as("max_degree"))
      .orderBy("layer")

  /** Recall@k of the ANN path against exact kNN for a query batch:
    * per-query |ANN ∩ exact| / k. The `RgbTest` analog (hnsw.cc:326-368)
    * generalized to a measured recall (SURVEY.md §5.2).
    */
  def recallAtK(embeddings: DataFrame, queries: DataFrame, k: Int, p: Params): DataFrame = {
    val ann = searchTopK(embeddings, queries, k, p)
      .select(col("query_id").as("ann_qid"), col("vec_id").as("ann_id"))
    val exact = Knn.topKBatch(embeddings, queries, k)
      .select(col("query_id"), col("vec_id").as("exact_id"))
    exact.join(ann,
        col("query_id") === col("ann_qid") && col("exact_id") === col("ann_id"),
        "left")
      .groupBy("query_id")
      .agg((count(col("ann_id")) / k.toDouble).as("recall"))
  }
}
