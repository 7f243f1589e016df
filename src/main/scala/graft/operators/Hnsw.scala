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
  *  3. Queries meet shards through a cogroup shuffle (vectors keyed by
  *     shard, queries keyed by the shards they probe) and merge
  *     per-query top-k — no driver collect, no broadcast of the vector
  *     table, so the index can exceed driver RAM. [[searchTopK]] probes
  *     every shard (recall ≥ a single whole-set graph); [[searchRouted]]
  *     shards by IVF cell and probes only the nprobe nearest shards per
  *     query — O(nprobe) per query instead of O(P).
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
    * `maxLevel`: level clamp (hnsw.cc:124-126 semantics);
    * `maxShardRows`: fail-fast budget on rows buffered per BUILD TASK —
    * a task's shards' vectors and adjacency must fit its heap (size it
    * to executorHeap / (dim·4B·~3)), and crossing the budget raises a
    * sizing error instead of an OOM mid-build. Per task, not per shard:
    * hash partitioning can land several shards in one task, and it is
    * their sum that occupies the heap.
    */
  /** `diversify`: opt-in SELECT-NEIGHBORS-HEURISTIC (Malkov & Yashunin
    * 2018, Alg. 4) for neighbor selection and degree-cap shrink — a
    * candidate is kept only if it is closer to the base point than to
    * every already-kept neighbor, spreading a node's edge budget across
    * directions/clusters instead of filling it inside one blob (the
    * known recall-per-edge win on clustered real-embedding geometry;
    * pruned slots refill closest-first, the keepPrunedConnections
    * variant, so degree never drops below budget). Deterministic: the
    * candidate scan is (dist, node-index)-ordered. Off by default — the
    * closest-first baseline is the reference-faithful shape.
    */
  case class Params(
      m: Int = 8,
      maxM: Int = 12,
      efConstruction: Int = 64,
      efSearch: Int = 64,
      maxLevel: Int = 4,
      numPartitions: Int = 4,
      maxShardRows: Int = 2000000,
      diversify: Boolean = false)

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
    // result-eligibility per node (filtered ANN): ineligible nodes are
    // traversed — they keep the graph navigable — but never returned
    private val elig = mutable.ArrayBuffer.empty[Boolean]
    // adjacency(node)(layer) = neighbor node indices
    private val adj = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
    private var entry: Int = -1

    def size: Int = vecs.length

    private def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      math.sqrt(s)
    }

    /** Best-first ef-bounded search on one layer from entry points.
      * `filtered = true` restricts RESULT admission to eligible nodes
      * while traversal still walks every admitted candidate (the
      * hnswlib filtered-search shape: ineligible nodes stay navigable
      * bridges, so a selective predicate cannot disconnect the beam).
      */
    private def searchLayer(q: Array[Float], eps: Seq[Int], ef: Int, layer: Int,
                            filtered: Boolean = false): mutable.PriorityQueue[(Double, Int)] = {
      val visited = mutable.BitSet.empty
      // candidates: nearest first; results: farthest first (bounded by ef)
      val cand = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by[(Double, Int), (Double, Int)](t => (-t._1, -t._2)))
      val res = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by[(Double, Int), (Double, Int)](t => (t._1, t._2)))
      eps.foreach { e =>
        if (!visited(e)) {
          visited += e
          val d = dist(q, vecs(e))
          cand.enqueue((d, e))
          if (!filtered || elig(e)) res.enqueue((d, e))
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
                cand.enqueue((d, n))
                if (!filtered || elig(n)) {
                  res.enqueue((d, n))
                  if (res.size > ef) res.dequeue()
                }
              }
            }
          }
        }
      }
      res
    }

    /** SELECT-NEIGHBORS-HEURISTIC (Malkov & Yashunin, Alg. 4): scan
      * candidates closest-first (ties by node index — deterministic)
      * and keep a candidate only if it is closer to `base` than to
      * every already-kept neighbor. Slots left by pruning refill with
      * the closest rejected candidates (keepPrunedConnections), so the
      * selected degree equals `math.min(m, candidates)` like the
      * closest-first baseline — only the SPREAD differs.
      */
    private def selectDiverse(base: Array[Float], cands: Seq[Int], m: Int)
        : mutable.ArrayBuffer[Int] = {
      val sorted = cands.map(x => (dist(base, vecs(x)), x)).sorted
      val kept = mutable.ArrayBuffer.empty[Int]
      val rejected = mutable.ArrayBuffer.empty[Int]
      val it = sorted.iterator
      while (it.hasNext && kept.length < m) {
        val (dq, e) = it.next()
        val ev = vecs(e)
        var diverse = true
        var j = 0
        while (diverse && j < kept.length) {
          if (dist(ev, vecs(kept(j))) < dq) diverse = false
          j += 1
        }
        if (diverse) kept += e else rejected += e
      }
      var r = 0
      while (kept.length < m && r < rejected.length) { kept += rejected(r); r += 1 }
      kept
    }

    /** Insert one point with its preassigned level. */
    def insert(id: Long, vec: Array[Float], level: Int, eligible: Boolean = true): Unit = {
      val idx = vecs.length
      vecs += vec; ids += id; levels += level; elig += eligible
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
        val neighbors =
          if (p.diversify) selectDiverse(vec, closest, p.m).toSeq
          else closest.take(p.m)
        neighbors.foreach { n =>
          adj(idx)(layer) += n
          adj(n)(layer) += idx
          // degree cap (absent in reference): closest-first shrink, or
          // the diversity heuristic when opted in
          if (adj(n)(layer).length > p.maxM) {
            val nv = vecs(n)
            adj(n)(layer) =
              if (p.diversify) selectDiverse(nv, adj(n)(layer).toSeq, p.maxM)
              else adj(n)(layer)
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

    /** Top-k ANN query: greedy descent to layer 1, beam at layer 0.
      * `filtered = true` returns only result-eligible nodes (descent is
      * always unfiltered — upper layers are pure navigation).
      */
    def search(q: Array[Float], k: Int, filtered: Boolean = false): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      var ep = entry
      var layer = levels(entry)
      while (layer > 0) {
        val r = searchLayer(q, Seq(ep), 1, layer)
        if (r.nonEmpty) ep = r.minBy(t => (t._1, t._2))._2
        layer -= 1
      }
      searchLayer(q, Seq(ep), math.max(p.efSearch, k), 0, filtered)
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
    def loadNode(id: Long, vec: Array[Float], level: Int, eligible: Boolean = true): Unit = {
      val idx = vecs.length
      vecs += vec; ids += id; levels += level; elig += eligible
      adj += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
      if (entry < 0 || level > levels(entry)) entry = idx
    }

    /** Append one directed adjacency edge by node indices. */
    def loadEdge(srcIdx: Int, dstIdx: Int, layer: Int): Unit =
      adj(srcIdx)(layer) += dstIdx
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
  def buildEdges(embeddings: DataFrame, p: Params): DataFrame =
    buildEdgesBy(embeddings
      .select(col("vec_id"), col("embedding"), levelColumn(p).as("level"),
        pmod(col("vec_id"), lit(p.numPartitions)).cast("int").as("part")), p)

  /** [[buildEdges]] over an EXPLICIT shard layout: `prepared(vec_id,
    * embedding, level, part)` with any part assignment (hash shards,
    * IVF cells, …). One independent graph per part value.
    */
  def buildEdgesBy(prepared0: DataFrame, p: Params): DataFrame = {
    val spark = prepared0.sparkSession
    // no sortWithinPartitions: the per-part in-memory sort below is the
    // one that establishes insert order — a Tungsten sort here would be
    // paid and then discarded by the groupBy
    // repartition on the part value (task count = shuffle.partitions;
    // results don't depend on task placement — each task groups by the
    // part VALUE below, so any part→task assignment builds identical
    // graphs)
    val prepared = prepared0
      .select(col("vec_id"), col("embedding"), col("level"), col("part"))
      .repartition(col("part"))
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
      // Buffering is incremental so an oversized shard fails fast at the
      // row that crosses `maxShardRows`, not with an OOM after
      // materializing the rest.
      val byPart = mutable.HashMap.empty[Int, mutable.ArrayBuffer[Row]]
      var buffered = 0
      rows.foreach { r =>
        // The budget bounds the TASK's total buffered rows, not each
        // per-part buffer: several near-budget shards co-located in one
        // task would otherwise OOM without ever tripping the guard.
        if (buffered >= p.maxShardRows)
          throw new IllegalStateException(
            s"HNSW build task exceeds maxShardRows=${p.maxShardRows} rows " +
              "buffered across its shards: raise spark.sql.shuffle.partitions " +
              "(more tasks) or Params.numPartitions (smaller shards), or raise " +
              "the budget, so each task's vectors + adjacency fit its heap")
        buffered += 1
        val part = r.getAs[Int]("part")
        byPart.getOrElseUpdate(part, mutable.ArrayBuffer.empty[Row]) += r
      }
      byPart.iterator.flatMap { case (part, group) =>
        val g = new LocalGraph(p)
        group.sortBy(_.getAs[Long]("vec_id")).foreach { r =>
          g.insert(r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray,
            r.getAs[Int]("level"))
        }
        g.edges.map { case (s, d, l) => Row(part, s, d, l) }
      }
    }(enc)
  }

  /** One tagged shard record: `(part, isNode, a, b, c, vec)` — a node
    * `(part, true, vec_id, eligible(0|1), level, embedding)` or a stored
    * adjacency edge `(part, false, src, dst, layer, empty)`. The union
    * shape lets one cogroup carry both the vectors and (for persisted
    * indexes) the adjacency of a shard; the node `b` slot carries the
    * filtered-ANN result eligibility (1 everywhere when unfiltered).
    */
  private type ShardRec = (Int, Boolean, Long, Long, Int, Array[Float])

  /** The scale-path core: shard records cogrouped with the queries
    * routed to each shard. Each task materializes ONE shard's payload,
    * builds (or loads) its LocalGraph, and streams its queries through
    * it — no driver collect, no broadcast of the vector table; vectors
    * move through exactly one shuffle keyed by shard, queries through
    * one shuffle keyed by their routed shards. Per-query/per-shard
    * top-k rows then merge to a global top-k with one window keyed by
    * query (k·shards rows per query in, k out).
    *
    * `rebuild = true` re-inserts (recreating adjacency deterministically
    * from scratch); `false` loads stored nodes+edges in O(edges).
    */
  private def searchCogrouped(
      recs: org.apache.spark.sql.Dataset[ShardRec],
      qrep: org.apache.spark.sql.Dataset[(Int, Long, Array[Double])],
      k: Int, p: Params, rebuild: Boolean, filtered: Boolean = false): DataFrame = {
    val spark = recs.sparkSession
    import spark.implicits._
    val perShard = recs.groupByKey(_._1).cogroup(qrep.groupByKey(_._1)) { (_, rs, qs) =>
      if (!qs.hasNext) Iterator.empty // unprobed shard: skip the build
      else {
        val arr = rs.toArray
        val g = new LocalGraph(p)
        val nodes = arr.filter(_._2).sortBy(_._3) // id order = insert/load order
        if (rebuild) nodes.foreach { r => g.insert(r._3, r._6, r._5, r._4 != 0L) }
        else {
          val idxOf = new mutable.LongMap[Int]()
          nodes.foreach { r => idxOf(r._3) = g.size; g.loadNode(r._3, r._6, r._5, r._4 != 0L) }
          arr.foreach { r => if (!r._2) g.loadEdge(idxOf(r._3), idxOf(r._4), r._5) }
        }
        qs.flatMap { case (_, qid, qv) =>
          g.search(qv.map(_.toFloat), k, filtered).map { case (id, d) => (qid, id, d) }
        }
      }
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d"), col("vec_id"))
    perShard.toDF("query_id", "vec_id", "d")
      // replicated layouts (searchRouted r>1) can return the same vector
      // from several probed shards — collapse before ranking so dupes
      // don't occupy top-k slots (d is identical across shards: same
      // floats, same deterministic arithmetic)
      .groupBy("query_id", "vec_id").agg(min(col("d")).as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), round(col("d"), 6).as("dist"))
  }

  /** Node records for the hash-sharded layout (`part = vec_id mod P`,
    * the layout [[buildEdges]]/[[save]] use). Levels are recomputed from
    * ids — a pure function of id.
    */
  private def nodeRecs(embeddings: DataFrame, p: Params) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select(
        pmod(col("vec_id"), lit(p.numPartitions)).cast("int").as("part"),
        lit(true).as("is_node"),
        col("vec_id"), lit(1L).as("b"), levelColumn(p).as("level"), col("embedding"))
      .as[ShardRec]
  }

  /** Replicate every query to every shard (exhaustive probe). */
  private def replicateAll(queries: DataFrame, numParts: Int) = {
    val spark = queries.sparkSession
    import spark.implicits._
    queries
      .crossJoin(broadcast(spark.range(numParts).select(col("id").cast("int").as("part"))))
      .select(col("part"), col("query_id"), col("query_vec"))
      .as[(Int, Long, Array[Double])]
  }

  /** Search by rebuilding shard subgraphs executor-side and fanning
    * every query out to every shard — the queries×shards shuffle form
    * (no driver collect; see [[searchCogrouped]]). Recall of the merged
    * result is at least that of a single whole-set graph, because each
    * shard search is an independent chance to find each true neighbor.
    * For sublinear per-query cost at many shards, use [[searchRouted]].
    */
  def searchTopK(embeddings: DataFrame, queries: DataFrame, k: Int, p: Params): DataFrame =
    searchCogrouped(nodeRecs(embeddings, p), replicateAll(queries, p.numPartitions),
      k, p, rebuild = true)

  /** Persist a built index as two Parquet tables: `nodes(vec_id,
    * embedding, level)` + `edges(part, src, dst, layer)` — the
    * relational encoding of the reference's pointer graph (SURVEY.md
    * §1.1). `load` + [[searchWithIndex]] then serve queries without
    * rebuilding.
    */
  def save(embeddings: DataFrame, p: Params, dir: String): Unit = {
    // Both tables are stored PARTITIONED BY shard (`part=<k>/…`): every
    // maintenance op that touches a subset of shards — insertInto's
    // affected-shard load, compactGeneration's rebuild — becomes a
    // partition-pruned read, and compaction can byte-copy untouched
    // shards' files instead of rewriting the whole index.
    embeddings
      .select(col("vec_id"), col("embedding"), levelColumn(p).as("level"),
        pmod(col("vec_id"), lit(p.numPartitions)).cast("int").as("part"))
      .write.mode("overwrite").partitionBy("part").parquet(s"$dir/nodes")
    buildEdges(embeddings, p)
      .write.mode("overwrite").partitionBy("part").parquet(s"$dir/edges")
  }

  /** Search a PERSISTED index: shard graphs are reconstructed from the
    * stored adjacency (no re-insertion — loading is O(edges)) inside
    * the same cogroup shuffle as [[searchTopK]] — nodes and edges of a
    * shard meet their queries in one task; nothing is collected to the
    * driver.
    */
  def searchWithIndex(nodes: DataFrame, edges: DataFrame, queries: DataFrame,
                      k: Int, p: Params): DataFrame = {
    val recs = nodeRecs(nodes.select("vec_id", "embedding"), p).union(edgeRecs(edges))
    searchCogrouped(recs, replicateAll(queries, p.numPartitions), k, p, rebuild = false)
  }

  /** Stored adjacency rows as tagged shard records. */
  private def edgeRecs(edges: DataFrame): org.apache.spark.sql.Dataset[ShardRec] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(
        col("part").cast("int").as("part"), lit(false).as("is_node"),
        col("src"), col("dst"), col("layer"),
        lit(Array.empty[Float]).as("embedding"))
      .as[ShardRec]
  }

  /** [[save]] if `dir` holds no index yet (keyed by the caller choosing
    * a content-derived dir name), then the loaded `(nodes, edges)` pair.
    * This is how a serving pipeline amortizes the build the way the
    * reference does (its `Hnsw` object outlives every `FindNearest`,
    * hnsw.cc:114-137): build once, serve many batches.
    */
  def ensureSaved(embeddings: DataFrame, p: Params, dir: String): (DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    val fp = IndexMeta.cachedFingerprint(dir, s"p=$p", Seq(embeddings)) {
      fingerprint(embeddings, s"p=$p")
    }
    if (!indexValid(spark, dir, fp)) { save(embeddings, p, dir); writeFp(spark, dir, fp) }
    (spark.read.parquet(s"$dir/nodes"), spark.read.parquet(s"$dir/edges"))
  }

  /** Content fingerprint of the source table + params — see
    * [[IndexMeta.fingerprint]]. `ensureSaved*` validate it at load so a
    * regenerated source table or changed Params rebuild the index
    * instead of silently serving a stale one (an index dir under a
    * fixed root outlives the data it was built from).
    */
  private[graft] def fingerprint(embeddings: DataFrame, extra: String): String =
    IndexMeta.fingerprint(embeddings, extra)

  private def writeFp(spark: org.apache.spark.sql.SparkSession, dir: String, fp: String): Unit =
    IndexMeta.write(spark, dir, fp)

  /** A persisted index is served only when its files exist AND its
    * recorded fingerprint matches the current source data + params.
    */
  private def indexValid(spark: org.apache.spark.sql.SparkSession, dir: String,
                         fp: String): Boolean =
    IndexMeta.valid(spark, dir, "edges/_SUCCESS", fp)

  private[graft] def indexExists(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/edges/_SUCCESS")
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  // ------------------------------------------------------------------
  // Incremental insert (reference Insert, hnsw.cc:147-215)
  // ------------------------------------------------------------------

  /** Incremental insert: route `newRows(vec_id, embedding)` to their
    * hash shards, load ONLY the affected shards' stored graphs
    * (O(edges) — no re-insertion of existing points), insert the new
    * vectors through the normal beam-insert path, and re-emit those
    * shards' edge sets. Unaffected shards pass through untouched, so
    * appending a batch costs O(batch·ef + affected shard edges), not a
    * full rebuild — the engine's analog of the reference's always-on
    * incremental `Insert`. Returns the updated `(nodes, edges)`.
    */
  def insertInto(nodes: DataFrame, edges: DataFrame, newRows: DataFrame,
                 p: Params): (DataFrame, DataFrame) = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val newNodes = newRows
      .select(pmod(col("vec_id"), lit(p.numPartitions)).cast("int").as("part"),
        col("vec_id"), levelColumn(p).as("level"), col("embedding"))
      .as[(Int, Long, Int, Array[Float])]
    // affected shard ids: O(P) ints to the driver — partition-filter
    // formation, same legitimacy class as Ivf.topKPartitioned's probe
    val affected = newNodes.select(col("part")).distinct().as[Int].collect().toSeq
    val stored = nodeRecs(nodes.select("vec_id", "embedding"), p)
      .union(edgeRecs(edges))
      .filter(col("part").isin(affected: _*))
    val rebuilt = stored.groupByKey(_._1).cogroup(newNodes.groupByKey(_._1)) {
      (part, rs, fresh) =>
        val arr = rs.toArray
        val g = new LocalGraph(p)
        val idxOf = new mutable.LongMap[Int]()
        arr.filter(_._2).sortBy(_._3).foreach { r =>
          idxOf(r._3) = g.size; g.loadNode(r._3, r._6, r._5)
        }
        arr.foreach { r => if (!r._2) g.loadEdge(idxOf(r._3), idxOf(r._4), r._5) }
        fresh.toArray.sortBy(_._2).foreach { n => g.insert(n._2, n._4, n._3) }
        g.edges.map { case (s, d, l) => (part, s, d, l) }
    }.toDF("part", "src", "dst", "layer")
    val outEdges = edges.filter(!col("part").isin(affected: _*)).unionByName(rebuilt)
    val outNodes = nodes.select("vec_id", "embedding", "level")
      .unionByName(newNodes.toDF("part", "vec_id", "level", "embedding")
        .select("vec_id", "embedding", "level"))
    (outNodes, outEdges)
  }

  /** ROUTED search over a semantically-sharded layout: shards are IVF
    * cells of the (k-means-refined) `centroids` table instead of hash
    * buckets, and each query probes only its `nprobe` nearest shards by
    * centroid distance. Per-query cost is O(nprobe), independent of the
    * total shard count — the missing sublinearity of the exhaustive
    * fan-out (hash shards are statistically identical, so routing can
    * only discriminate when the sharding is semantic).
    *
    * `centroids` is `(centroid_id, centroid_vec)` with centroid_id in
    * `[0, C)` — see [[Ivf.kmeans]]. `replication` posts each vector to
    * its r nearest cells (SPANN-style boundary replication): without
    * it, neighbors sitting just across a Voronoi face are unreachable
    * and recall collapses (measured 0.78 at r=1 vs ≥0.95 at r=2 on the
    * driver corpus). Sublinearity requires C ≫ nprobe·r — at test scale
    * C is small, so the win here is structural (per-query work is
    * nprobe cells regardless of C), not yet a big constant.
    */
  def searchRouted(embeddings: DataFrame, queries: DataFrame, k: Int, p: Params,
                   centroids: DataFrame, nprobe: Int, replication: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val recs = embeddings
      .join(Ivf.assignMulti(embeddings, centroids, replication), Seq("vec_id"))
      .select(col("cell").cast("int").as("part"), lit(true).as("is_node"),
        col("vec_id"), lit(1L).as("b"), levelColumn(p).as("level"), col("embedding"))
      .as[ShardRec]
    searchCogrouped(recs, routeQueries(queries, centroids, nprobe), k, p, rebuild = true)
  }

  /** COSINE routed search by the normalize-then-L2 reduction
    * ([[Ivf.normalized]]): both sides unit-normalize, the L2 graph
    * machinery runs unchanged, and the reported score converts back as
    * `cos = 1 − d²/2`. Centroids must come from the NORMALIZED table
    * (direction cells). Output `(query_id, vec_id, cos_sim)`, highest
    * similarity first per query — [[Knn.cosineTopK]] semantics on the
    * routed scale path.
    */
  def searchRoutedCosine(embeddings: DataFrame, queries: DataFrame, k: Int, p: Params,
                         centroids: DataFrame, nprobe: Int,
                         replication: Int = 2): DataFrame = {
    val normedQ = queries.select(col("query_id"),
      graft.functions.VectorFunctions.normalizeQuery(col("query_vec")).as("query_vec"))
    // graph nodes store float32 (the ShardRec shape) — normalized
    // directions survive the downcast at ~1e-7, well inside ANN slack
    val normed = Ivf.normalized(embeddings)
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    searchRouted(normed, normedQ, k, p, centroids, nprobe, replication)
      .select(col("query_id"), col("vec_id"),
        round(lit(1.0) - col("dist") * col("dist") / lit(2.0), 6).as("cos_sim"))
  }

  /** Route each query to its `nprobe` nearest cells by centroid
    * distance — the O(nprobe)-per-query fan-out shared by the rebuilt
    * ([[searchRouted]]) and persisted ([[searchRoutedWithIndex]]) paths.
    */
  private def routeQueries(queries: DataFrame, centroids: DataFrame, nprobe: Int) = {
    val spark = queries.sparkSession
    import spark.implicits._
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("qd"), col("centroid_id"))
    queries
      .crossJoin(broadcast(centroids))
      .select(col("query_id"), col("query_vec"), col("centroid_id"),
        graft.functions.VectorFunctions.l2Distance(col("query_vec"), col("centroid_vec")).as("qd"))
      .withColumn("rn", row_number().over(byQuery))
      .filter(col("rn") <= nprobe)
      .select(col("centroid_id").cast("int").as("part"), col("query_id"), col("query_vec"))
      .as[(Int, Long, Array[Double])]
  }

  /** Persist the ROUTED (IVF-cell-sharded) index: `nodes(part, vec_id,
    * embedding, level)` carry their cell assignment (with SPANN
    * replication a vector appears in r cells), `edges` hold one
    * independent HNSW per cell, and the routing `centroids` ride along
    * in the same dir. [[searchRoutedWithIndex]] then serves query
    * batches with NO k-means, NO assignment pass and NO graph
    * construction — the reference's long-lived `Hnsw` object
    * (hnsw.cc:114-137), as on-disk state.
    */
  def saveRouted(embeddings: DataFrame, cents: DataFrame, p: Params, dir: String,
                 replication: Int = 2): Unit = {
    val assigned = embeddings
      .join(Ivf.assignMulti(embeddings, cents, replication), Seq("vec_id"))
      .select(col("cell").cast("int").as("part"), col("vec_id"),
        col("embedding"), levelColumn(p).as("level"))
    // stored partitionBy(part): maintenance reads partition-prune and
    // [[compactRouted]] can swap single cells without touching the rest
    assigned.write.mode("overwrite").partitionBy("part").parquet(s"$dir/nodes")
    buildEdgesBy(assigned, p).write.mode("overwrite").partitionBy("part").parquet(s"$dir/edges")
    // a full rebuild supersedes any snapshot lineage from a previous
    // routed index at this dir (see CellSnapshot.reset)
    CellSnapshot.reset(embeddings.sparkSession, dir)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Snapshot-resolved reads of a routed index's live node/edge rows —
    * the read path for routed serving and maintenance. Before the
    * first [[compactRouted]] these are plain `spark.read.parquet`
    * (identical plans); after one they resolve the shared
    * [[CellSnapshot]] manifest (ONE manifest governs both trees, so
    * nodes and edges can never be read at different generations).
    */
  def readRoutedNodes(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    CellSnapshot.read(spark, dir, "nodes", "part")

  def readRoutedEdges(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    CellSnapshot.read(spark, dir, "edges", "part")

  /** TIME-TRAVEL reads of a routed index AS OF published snapshot
    * `version` (`Ivf.readLayoutAt`'s routed twin): nodes and edges
    * resolve the SAME versioned manifest, so the graph is consistent
    * at any pinned version until [[vacuumRouted]] reclaims it.
    */
  def readRoutedNodesAt(spark: org.apache.spark.sql.SparkSession, dir: String,
                        version: Int): DataFrame =
    CellSnapshot.readAt(spark, dir, "nodes", "part", version)

  def readRoutedEdgesAt(spark: org.apache.spark.sql.SparkSession, dir: String,
                        version: Int): DataFrame =
    CellSnapshot.readAt(spark, dir, "edges", "part", version)

  /** Reclaim routed subtrees superseded by [[compactRouted]] — safe
    * once no reader still serves a pre-vacuum snapshot.
    */
  def vacuumRouted(spark: org.apache.spark.sql.SparkSession, dir: String,
                   keep: Int = 1): Unit =
    CellSnapshot.vacuum(spark, dir, Seq("nodes", "edges"), "part", keep)

  /** Policy-driven GC for a routed layout ([[CellSnapshot.retain]]):
    * keep current + pinned + younger-than-maxAge versions — the routed
    * twin of `Ivf.retainPartitioned`.
    */
  def retainRouted(spark: org.apache.spark.sql.SparkSession, dir: String,
                   maxAge: java.time.Duration = java.time.Duration.ZERO): Unit =
    CellSnapshot.retain(spark, dir, Seq("nodes", "edges"), "part", maxAge)

  /** Fold the tombstones into a ROUTED layout ([[saveRouted]]): ONLY
    * the cells (`part=` subtrees) holding deleted rows are rebuilt — a
    * deletion invalidates its cell's adjacency, so those cells
    * re-insert their remaining rows from scratch (same determinism as
    * a fresh build). The rebuilt node AND edge subtrees are written as
    * one new immutable [[CellSnapshot]] generation and published by a
    * single atomic manifest flip — no published file is ever deleted
    * or renamed, so a reader that planned against the previous
    * snapshot keeps a consistent index (nodes and edges at the SAME
    * generation, no missing cells) while compaction runs; superseded
    * subtrees are reclaimed by [[vacuumRouted]]. Every other cell's
    * node and edge files are not touched at all — compaction I/O is
    * proportional to the AFFECTED cells (deleted ids live in
    * ≤ replication·|tombstones| of them), never to the index size.
    * The sidecar is cleared and the source fingerprint invalidated —
    * same contract as `Ivf.compactPartitioned`: the compacted layout
    * no longer derives from its source, and a later
    * `ensureSavedRouted` against the UNCHANGED source rebuilds in full
    * (the takedown pipeline must also clean the source of record).
    */
  def compactRouted(spark: org.apache.spark.sql.SparkSession, dir: String,
                    p: Params): Unit = {
    val dels = Tombstones.ids(spark, dir).getOrElse(return)
    val nodes = readRoutedNodes(spark, dir)
    // affected cell ids: ≤ replication·|tombstones| ints to the driver
    // (partition-filter + manifest-delta formation)
    val affected = nodes.join(broadcast(dels.select("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("part").cast("long")).distinct().collect().map(_.getLong(0))
    if (affected.nonEmpty) {
      val kept = nodes.filter(col("part").isin(affected.toIndexedSeq: _*)) // partition-pruned
        .join(broadcast(dels.select("vec_id")), Seq("vec_id"), "left_anti")
        .select(col("part").cast("int").as("part"), col("vec_id"),
          col("embedding"), col("level"))
      val (v, m) = CellSnapshot.mappingOrBase(spark, dir, "nodes", "part")
      val g = v + 1
      kept.write.mode("overwrite").partitionBy("part")
        .parquet(CellSnapshot.genRoot(dir, "nodes", g))
      buildEdgesBy(kept, p).write.mode("overwrite").partitionBy("part")
        .parquet(CellSnapshot.genRoot(dir, "edges", g))
      // a part whose every row was deleted has no staged subtree and
      // simply leaves the manifest
      val survived = CellSnapshot.listParts(spark,
        CellSnapshot.genRoot(dir, "nodes", g), "part")
      CellSnapshot.publish(spark, dir, g, m -- affected ++ survived.map(_ -> g))
    }
    Tombstones.clear(spark, dir)
    IndexMeta.invalidate(spark, dir)
  }

  /** Per-cell occupancy of a ROUTED layout: `(cell, n_rows)` over LIVE
    * node rows — `Ivf.cellStats`'s routed twin, the balance diagnostic
    * that decides when to [[reclusterRouted]] (a drifted ingest piles
    * into few cells and silently degrades the 2× boundary replication
    * the routed recall depends on). Replicated rows count as stored —
    * occupancy measures what a probe of the cell pays. The scan reads
    * only `(vec_id, part)`; tombstoned ids are excluded.
    */
  def cellStatsRouted(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Ivf.withoutExcluded(
        readRoutedNodes(spark, dir).select(col("vec_id"), col("part")),
        Tombstones.ids(spark, dir))
      .groupBy(col("part").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_rows"))

  /** Cell-balance skew factor of a routed layout (`Ivf.cellSkew`'s
    * routed twin): max/mean live occupancy over the centroid set,
    * empty cells counting as 0.
    */
  def cellSkewRouted(spark: org.apache.spark.sql.SparkSession, dir: String): Double = {
    val c = routedCentroidsOf(spark, dir).count().toDouble
    val r = cellStatsRouted(spark, dir)
      .agg(max("n_rows").cast("double").as("mx"), sum("n_rows").cast("double").as("tot"))
      .head()
    if (r.isNullAt(1) || r.getDouble(1) == 0.0) 1.0
    else r.getDouble(0) / (r.getDouble(1) / c)
  }

  /** The routed recluster SCHEDULING TRIGGER (`Ivf.needsRecluster`'s
    * twin): true once [[cellSkewRouted]] crosses `maxSkew`.
    */
  def needsReclusterRouted(spark: org.apache.spark.sql.SparkSession, dir: String,
                           maxSkew: Double = 4.0): Boolean =
    cellSkewRouted(spark, dir) >= maxSkew

  /** The routed layout's SERVING centroids, resolved consistently with
    * the node/edge snapshot: the newest `centroids_g{v'}` with `v' <=`
    * the current manifest version, falling back to the build-time flat
    * `centroids` — the `Ivf.centroidsOf` at-or-below rule (published
    * centroid files are immutable; [[reclusterRouted]] stages a
    * generation-scoped file before its manifest flip).
    */
  def routedCentroidsOf(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    CellSnapshot.version(spark, dir) match {
      case Some(v) => routedCentroidsAt(spark, dir, v)
      case None    => spark.read.parquet(s"$dir/centroids")
    }

  /** The centroids pairing with [[readRoutedNodesAt]] `version` (see
    * [[routedCentroidsOf]]).
    */
  def routedCentroidsAt(spark: org.apache.spark.sql.SparkSession, dir: String,
                        version: Int): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens =
      if (!fs.exists(root)) Array.empty[Int]
      else fs.listStatus(root).map(_.getPath.getName)
        .collect { case n if n.startsWith("centroids_g") => n.stripPrefix("centroids_g") }
        .flatMap(s => scala.util.Try(s.toInt).toOption)
        .filter(_ <= version)
    if (gens.isEmpty) spark.read.parquet(s"$dir/centroids")
    else spark.read.parquet(s"$dir/centroids_g${gens.max}")
  }

  /** All three halves of the routed serving state — nodes, edges,
    * centroids — resolved against ONE manifest version (the
    * `Ivf.readLayoutWithCentroids` contract): a recluster publishing
    * between independent reads must never hand one query new routing
    * over old shards or a cross-generation node/edge mix.
    */
  private def routedServingState(spark: org.apache.spark.sql.SparkSession,
                                 dir: String): (DataFrame, DataFrame, DataFrame) =
    CellSnapshot.version(spark, dir) match {
      case Some(v) => (readRoutedNodesAt(spark, dir, v),
        readRoutedEdgesAt(spark, dir, v), routedCentroidsAt(spark, dir, v))
      case None => (CellSnapshot.read(spark, dir, "nodes", "part"),
        CellSnapshot.read(spark, dir, "edges", "part"),
        spark.read.parquet(s"$dir/centroids"))
    }

  /** RECLUSTER maintenance for the ROUTED layout — the drift repair
    * after enough appends skew the cells ([[compactRouted]] is the
    * remove half): every LIVE vector re-routes onto `newCents` with the
    * layout's SPANN boundary replication, every cell's HNSW adjacency
    * rebuilds from its new membership (cell graphs are a function of
    * membership — unlike the flat IVF recluster, moving rows without
    * rebuilding edges would serve a stale navigable structure), and the
    * new node AND edge trees publish with the generation-scoped
    * centroid sidecar under ONE atomic manifest flip. Semantics: the
    * reclustered layout serves EXACTLY like a fresh [[saveRouted]] over
    * its live vectors with the same centroids (levels are a pure
    * function of vec_id, assignment and per-cell builds are
    * deterministic) — that equality is the spec's claim. Tombstones
    * fold in and clear; the source fingerprint invalidates. Cost: one
    * full-layout read + assignment + per-cell rebuild — the honest
    * price of moving every row's cell; fire it on [[cellSkewRouted]]'s
    * cadence, not per batch.
    *
    * `newCents` must live in the space the layout stores (raw floats
    * for plain routed, unit directions for the cosine layout).
    */
  def reclusterRouted(spark: org.apache.spark.sql.SparkSession, dir: String,
                      newCents: DataFrame, p: Params, replication: Int = 2): Unit = {
    val live = Ivf.withoutExcluded(readRoutedNodes(spark, dir),
      Tombstones.ids(spark, dir))
    // one payload row per vector: replicas carry identical
    // (embedding, level), so any one of them re-routes the vector
    val uniq = live.select(col("vec_id"), col("embedding"), col("level"))
      .dropDuplicates("vec_id")
    val assigned = uniq
      .join(Ivf.assignMulti(uniq, newCents, replication), Seq("vec_id"))
      .select(col("cell").cast("int").as("part"), col("vec_id"),
        col("embedding"), col("level"))
    val (v, _) = CellSnapshot.mappingOrBase(spark, dir, "nodes", "part")
    val g = v + 1
    assigned.write.mode("overwrite").partitionBy("part")
      .parquet(CellSnapshot.genRoot(dir, "nodes", g))
    buildEdgesBy(assigned, p).write.mode("overwrite").partitionBy("part")
      .parquet(CellSnapshot.genRoot(dir, "edges", g))
    // stage routing BEFORE the flip — the flip publishes data + routing
    newCents.write.mode("overwrite").parquet(s"$dir/centroids_g$g")
    val parts = CellSnapshot.listParts(spark,
      CellSnapshot.genRoot(dir, "nodes", g), "part")
    CellSnapshot.publish(spark, dir, g, parts.map(_ -> g).toMap)
    Tombstones.clear(spark, dir)
    IndexMeta.invalidate(spark, dir)
  }

  /** Incremental APPEND into a persisted routed layout — the insert
    * half of the routed lifecycle ([[reclusterRouted]] re-balances,
    * [[compactRouted]] removes): fresh rows route onto the layout's
    * CURRENT serving centroids with its SPANN replication, and ONLY the
    * receiving cells rebuild — nodes union in, each affected cell's
    * HNSW adjacency reconstructs from its full new membership (a cell
    * graph is a function of membership: beam-inserting into stored
    * adjacency would break the grown-≡-fresh-build equality the routed
    * family pins), published as one new immutable [[CellSnapshot]]
    * generation under a single manifest flip. Untouched cells' files
    * are not touched at all, so per-batch I/O is proportional to the
    * AFFECTED cells (a batch lands in ≤ replication·|batch| of them,
    * and in practice far fewer — arrivals cluster). Semantics: the
    * grown layout serves EXACTLY like a fresh [[saveRouted]] over the
    * union (levels are pure functions of vec_id; assignment and
    * per-cell builds are deterministic) — RoutedReclusterSpec pins it.
    */
  def insertIntoRouted(spark: org.apache.spark.sql.SparkSession, dir: String,
                       rows: DataFrame, p: Params, replication: Int = 2): Unit = {
    val cents = routedCentroidsOf(spark, dir)
    val fresh = rows
      .join(Ivf.assignMulti(rows, cents, replication), Seq("vec_id"))
      .select(col("cell").cast("int").as("part"), col("vec_id"),
        col("embedding"), levelColumn(p).as("level"))
    // receiving cell ids: ≤ replication·|batch| ints to the driver
    // (partition-filter + manifest-delta formation)
    val affected = fresh.select(col("part").cast("long")).distinct()
      .collect().map(_.getLong(0))
    if (affected.isEmpty) return
    val existing = readRoutedNodes(spark, dir)
      .filter(col("part").isin(affected.toIndexedSeq: _*)) // partition-pruned
      .select(col("part").cast("int").as("part"), col("vec_id"),
        col("embedding"), col("level"))
    val union = existing.unionByName(fresh)
    val (v, m) = CellSnapshot.mappingOrBase(spark, dir, "nodes", "part")
    val g = v + 1
    union.write.mode("overwrite").partitionBy("part")
      .parquet(CellSnapshot.genRoot(dir, "nodes", g))
    buildEdgesBy(union, p).write.mode("overwrite").partitionBy("part")
      .parquet(CellSnapshot.genRoot(dir, "edges", g))
    val staged = CellSnapshot.listParts(spark,
      CellSnapshot.genRoot(dir, "nodes", g), "part")
    CellSnapshot.publish(spark, dir, g, m ++ staged.map(_ -> g))
    IndexMeta.invalidate(spark, dir)
  }

  /** Retrain routing centroids from a routed layout's OWN live rows
    * (`Ivf.retrainCentroids`'s routed twin — hash-spread seeds via one
    * TakeOrdered pass, `iters` Lloyd rounds over the distinct node
    * vectors). Feeds [[reclusterRouted]] in an automated drift repair.
    */
  def retrainCentroidsRouted(spark: org.apache.spark.sql.SparkSession, dir: String,
                             c: Int, iters: Int = 1): DataFrame = {
    val live = Ivf.withoutExcluded(
        readRoutedNodes(spark, dir).select(col("vec_id"), col("embedding")),
        Tombstones.ids(spark, dir))
      .dropDuplicates("vec_id")
    val spread = live
      .orderBy(pmod(graft.functions.Portable.md5Int(col("vec_id").cast("string")),
        lit(Int.MaxValue)), col("vec_id"))
      .limit(c)
    val seeds = spread
      .select(row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id"))).cast("long").as("rid"),
        transform(col("embedding"), x => x.cast("double")).as("centroid_vec"))
      .select((col("rid") - 1).as("centroid_id"), col("centroid_vec"))
    Ivf.kmeansWith(live, seeds, iters)
  }

  /** The full build-then-recluster routed lifecycle, memoized once per
    * dir (`Ivf.ensureReclusteredPartitioned`'s routed twin — the
    * declared `q_hnsw_recluster_topk` state).
    */
  def ensureReclusteredRouted(embeddings: DataFrame, buildCents: DataFrame,
                              newCents: DataFrame, p: Params, dir: String,
                              replication: Int = 2): Unit = {
    val spark = embeddings.sparkSession
    val fp = IndexMeta.cachedFingerprint(dir, s"routedrec;p=$p;r=$replication",
        Seq(embeddings, buildCents, newCents)) {
      fingerprint(embeddings, s"routedrec;p=$p;r=$replication;" +
        s"cb=${IndexMeta.centroidFingerprint(buildCents)};" +
        s"cn=${IndexMeta.centroidFingerprint(newCents)}")
    }
    if (!indexValid(spark, dir, fp)) {
      val path = new org.apache.hadoop.fs.Path(dir)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(path, true)
      saveRouted(embeddings, buildCents, p, dir, replication)
      reclusterRouted(spark, dir, newCents, p, replication)
      writeFp(spark, dir, fp)
    }
  }

  /** [[saveRouted]] once per dir (caller keys the dir by content/params),
    * no-op when the index already exists — the amortization point for
    * repeated-batch serving.
    */
  def ensureSavedRouted(embeddings: DataFrame, cents: DataFrame, p: Params, dir: String,
                        replication: Int = 2): Unit = {
    val spark = embeddings.sparkSession
    val fp = IndexMeta.cachedFingerprint(dir, s"p=$p;r=$replication", Seq(embeddings, cents)) {
      // centroid content rides in the fingerprint (tiny: C rows) so a
      // re-trained routing table also invalidates the persisted shards
      fingerprint(embeddings,
        s"p=$p;r=$replication;c=${IndexMeta.centroidFingerprint(cents)}")
    }
    if (!indexValid(spark, dir, fp)) {
      saveRouted(embeddings, cents, p, dir, replication)
      writeFp(spark, dir, fp)
    }
  }

  /** Serve a query batch from a PERSISTED routed index: queries route
    * through the stored centroids (broadcast — C rows), probed shards
    * load their stored adjacency in O(edges), and nothing is rebuilt.
    * Results are identical to [[searchRouted]] over the same
    * (embeddings, cents, p, nprobe, replication) — pinned by HnswSpec.
    */
  def searchRoutedWithIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                            queries: DataFrame, k: Int, p: Params, nprobe: Int,
                            predicate: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import spark.implicits._
    // Filtered ANN: the predicate (over the stored node columns) marks
    // result ELIGIBILITY — ineligible nodes still load and route the
    // beam (removing them would sever graph edges and strand whole
    // regions), but they can never appear in results.
    val eligCol = predicate.map(pr => when(pr, 1L).otherwise(0L)).getOrElse(lit(1L))
    // nodes, edges AND routing pinned to one manifest version
    val (nodes, edges, cents) = routedServingState(spark, dir)
    val recs = nodes
      .select(col("part"), lit(true).as("is_node"), col("vec_id"),
        eligCol.as("b"), col("level"), col("embedding"))
      .as[ShardRec]
      .union(edgeRecs(edges))
    searchCogrouped(recs, routeQueries(queries, cents, nprobe), k, p,
      rebuild = false, filtered = predicate.isDefined)
  }

  /** [[searchRoutedWithIndex]] under the routed dir's `_deletes`
    * tombstones ([[Tombstones]]): recorded ids load INELIGIBLE — still
    * navigable bridges, never returned — so a takedown reaches routed
    * serving (and, through [[graft.streaming.StreamingAnn]], every
    * subsequent micro-batch) immediately, with no shard rewrite. Falls
    * back to the plain path when nothing is recorded.
    */
  def searchRoutedWithIndexDeletes(spark: org.apache.spark.sql.SparkSession, dir: String,
                                   queries: DataFrame, k: Int, p: Params,
                                   nprobe: Int): DataFrame =
    Tombstones.ids(spark, dir) match {
      case None => searchRoutedWithIndex(spark, dir, queries, k, p, nprobe)
      case Some(dels) =>
        import spark.implicits._
        // nodes, edges and routing pinned to ONE manifest version (the
        // flat edge/centroid reads this path used before bypassed the
        // snapshot — after a compaction or recluster they would serve
        // gen-0 state against current nodes)
        val (nodes, edges, cents) = routedServingState(spark, dir)
        val marked = nodes
          .join(broadcast(dels.select(col("vec_id")).withColumn("__tomb", lit(true))),
            Seq("vec_id"), "left")
        val recs = marked.select(col("part"), lit(true).as("is_node"), col("vec_id"),
            when(col("__tomb").isNull, 1L).otherwise(0L).as("b"),
            col("level"), col("embedding"))
          .as[ShardRec]
          .union(edgeRecs(edges))
        searchCogrouped(recs, routeQueries(queries, cents, nprobe), k, p,
          rebuild = false, filtered = true)
    }

  /** The full incremental-append serving cycle, amortized per dir: build
    * (or reuse) the base index over `base`, [[insertInto]] the `fresh`
    * batch, flush via [[saveIndex]], and serve from the flushed files —
    * the daily-append shape of a training pipeline (reference `Insert`,
    * hnsw.cc:147-215, as an on-disk lifecycle). Both steps are skipped
    * when `dir` already holds an index whose fingerprint matches
    * (base + fresh content + params); a changed batch re-runs only the
    * insert against the persisted base.
    */
  def ensureInsertedSaved(base: DataFrame, fresh: DataFrame, p: Params,
                          baseDir: String, dir: String): (DataFrame, DataFrame) = {
    val spark = base.sparkSession
    val fp = IndexMeta.cachedFingerprint(dir, s"p=$p;incr", Seq(base, fresh)) {
      // base and fresh fingerprint SEPARATELY: the same total content
      // under a different base/fresh split builds a different graph
      // (which rows took the beam-insert path changes the edges), so a
      // moved split must invalidate even when the union is unchanged
      s"${fingerprint(base, s"p=$p;incr;base")}|${fingerprint(fresh, "fresh")}"
    }
    if (!indexValid(spark, dir, fp)) {
      val (nodes0, edges0) = ensureSaved(base, p, baseDir)
      val (nodes1, edges1) = insertInto(nodes0, edges0, fresh, p)
      saveIndex(nodes1, edges1, dir, p)
      writeFp(spark, dir, fp)
    }
    (spark.read.parquet(s"$dir/nodes"), spark.read.parquet(s"$dir/edges"))
  }

  /** Persist an ALREADY-MATERIALIZED hash-layout index pair in
    * [[save]]'s on-disk layout — the flush step after [[insertInto]],
    * proving the incremental path roundtrips through the same files a
    * fresh [[save]] writes.
    */
  def saveIndex(nodes: DataFrame, edges: DataFrame, dir: String, p: Params): Unit = {
    nodes.select(col("vec_id"), col("embedding"), col("level"),
        pmod(col("vec_id"), lit(p.numPartitions)).cast("int").as("part"))
      .write.mode("overwrite").partitionBy("part").parquet(s"$dir/nodes")
    edges.select(col("part"), col("src"), col("dst"), col("layer"))
      .write.mode("overwrite").partitionBy("part").parquet(s"$dir/edges")
  }

  // ------------------------------------------------------------------
  // Generational index maintenance (streaming-append serving state)
  // ------------------------------------------------------------------

  private def genCommit(dir: String, g: Int) =
    new org.apache.hadoop.fs.Path(s"$dir/gen=$g/_graft_commit")

  /** Latest COMMITTED generation id under a generational index root
    * (`dir/gen=N/{nodes,edges}`): the largest N whose `_graft_commit`
    * file exists. The commit file is created LAST (after every data
    * write and byte-copy of its generation) and its appearance — a
    * brand-new name, never an overwrite — is the atomic publish point,
    * the same no-mutable-marker discipline as [[CellSnapshot]] (the
    * earlier `_graft_latest` create-overwrite marker was itself a
    * truncate-then-write race for a concurrent reader; it is still
    * read as a legacy fallback for indexes written before the commit
    * files existed).
    */
  def latestGenId(spark: org.apache.spark.sql.SparkSession, dir: String): Option[Int] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return None
    val committed = fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toInt)
      .filter(g => fs.exists(genCommit(dir, g)))
      .maxOption
    committed.orElse {
      // legacy fallback: pre-commit-file indexes recorded the latest
      // generation in a `_graft_latest` marker
      val marker = new org.apache.hadoop.fs.Path(s"$dir/_graft_latest")
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          .trim.toInt)
        finally in.close()
      }
    }
  }

  /** The latest generation's `(nodes, edges)` frames, if a generation
    * exists. Serving reads THIS; appends write the next generation.
    */
  def latestGeneration(spark: org.apache.spark.sql.SparkSession, dir: String)
      : Option[(Int, DataFrame, DataFrame)] =
    latestGenId(spark, dir).map { g =>
      (g, spark.read.parquet(s"$dir/gen=$g/nodes"), spark.read.parquet(s"$dir/gen=$g/edges"))
    }

  /** Append a batch of new vectors to a GENERATIONAL index: the first
    * batch builds `gen=0` from scratch; each later batch loads the
    * latest generation, [[insertInto]]s the new rows (only affected
    * shards rebuild), and writes the result as a NEW generation before
    * creating its `_graft_commit` file (the atomic publish point —
    * see [[latestGenId]]). Generations are immutable — a reader
    * serving from gen N is never corrupted by the writer producing
    * N+1 (the overwrite-in-place alternative would have the insert
    * plan reading the very files it is replacing). This is the
    * micro-batch maintenance shape: call it from a streaming
    * `foreachBatch` sink ([[graft.streaming.StreamingAnn.maintainIndex]]).
    */
  def appendGeneration(fresh: DataFrame, dir: String, p: Params): Unit = {
    val spark = fresh.sparkSession
    latestGeneration(spark, dir) match {
      case None =>
        save(fresh, p, s"$dir/gen=0")
        commitGeneration(spark, dir, 0)
      case Some((g, nodes, edges)) =>
        val (n1, e1) = insertInto(nodes, edges, fresh, p)
        saveIndex(n1, e1, s"$dir/gen=${g + 1}", p)
        commitGeneration(spark, dir, g + 1)
    }
  }

  /** Publish generation `gen`: create its (empty, never-overwritten)
    * `_graft_commit` file — an atomic appearance of a new name, AFTER
    * every data file of the generation is in place.
    */
  private def commitGeneration(spark: org.apache.spark.sql.SparkSession, dir: String,
                               gen: Int): Unit = {
    val path = genCommit(dir, gen)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(path, true).close()
  }

  /** Reclaim old generations, keeping the newest `keep` committed ones
    * (plus any uncommitted leftovers newer than the cut — a concurrent
    * writer's in-flight generation is never touched). Generations are
    * the layout's time-travel/rollback catalog, so this is the
    * explicit storage-GC knob a maintenance pipeline runs on its own
    * cadence — UNSAFE for readers still serving a reclaimed
    * generation, same contract as `CellSnapshot.vacuum`.
    */
  def vacuumGenerations(spark: org.apache.spark.sql.SparkSession, dir: String,
                        keep: Int = 1): Unit = {
    require(keep >= 1, s"must keep at least the current generation (got $keep)")
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return
    val committed = fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toInt)
      .filter(g => fs.exists(genCommit(dir, g)))
      .sorted
    committed.dropRight(keep).foreach { g =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/gen=$g"), true)
    }
    // the legacy marker (if any) may now name a reclaimed generation —
    // committed-generation listing supersedes it entirely
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_graft_latest")
    if (fs.exists(marker)) fs.delete(marker, false)
  }

  // ------------------------------------------------------------------
  // Deletion lifecycle (tombstones + compaction)
  // ------------------------------------------------------------------
  // The reference is insert-only (hnsw.cc:147-215 has no erase); this
  // is the production lifecycle it lacks: dataset takedowns and
  // contaminated-shard purges as (1) an O(batch) tombstone append,
  // (2) immediate serve-time exclusion through the filtered-ANN
  // eligibility machinery, (3) a compaction that rewrites ONLY the
  // affected shards and byte-copies the rest.

  /** Record tombstones: append `ids(vec_id)` to the `_deletes` sidecar
    * under the index root — O(batch) I/O, no graph rewrite, repeatable
    * (batches accumulate). Serving applies them immediately
    * ([[searchWithIndexDeletes]]); [[compactGeneration]] folds them
    * into the files and clears the sidecar.
    */
  def recordDeletes(spark: org.apache.spark.sql.SparkSession, dir: String,
                    ids: DataFrame): Unit =
    Tombstones.record(spark, dir, ids)

  /** Current tombstones (distinct), or None if none recorded. */
  def deletedIds(spark: org.apache.spark.sql.SparkSession, dir: String): Option[DataFrame] =
    Tombstones.ids(spark, dir)

  /** [[searchWithIndex]] under tombstones: deleted nodes load
    * INELIGIBLE — still traversed (they stay navigable bridges, exactly
    * the filtered-ANN shape of `LocalGraph.elig`) but never returned.
    * `deletes` is the tombstone set — always small relative to the
    * corpus (it is folded away by compaction), so it broadcasts.
    */
  def searchWithIndexDeletes(nodes: DataFrame, edges: DataFrame, deletes: DataFrame,
                             queries: DataFrame, k: Int, p: Params): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val marked = nodes.select("vec_id", "embedding")
      .join(broadcast(deletes.select(col("vec_id")).distinct()
        .withColumn("__tomb", lit(true))), Seq("vec_id"), "left")
    val recs = marked.select(
        pmod(col("vec_id"), lit(p.numPartitions)).cast("int").as("part"),
        lit(true).as("is_node"), col("vec_id"),
        when(col("__tomb").isNull, 1L).otherwise(0L).as("b"),
        levelColumn(p).as("level"), col("embedding"))
      .as[ShardRec]
      .union(edgeRecs(edges))
    searchCogrouped(recs, replicateAll(queries, p.numPartitions), k, p,
      rebuild = false, filtered = true)
  }

  /** Serve the latest generation under the root's tombstones: the
    * read path a serving tier runs between a takedown and the next
    * compaction. Falls back to the plain path when nothing is deleted.
    */
  def searchLatestGeneration(spark: org.apache.spark.sql.SparkSession, dir: String,
                             queries: DataFrame, k: Int, p: Params): DataFrame = {
    val (_, nodes, edges) = latestGeneration(spark, dir)
      .getOrElse(throw new IllegalStateException(s"no generation under $dir"))
    deletedIds(spark, dir) match {
      case Some(dels) => searchWithIndexDeletes(nodes, edges, dels, queries, k, p)
      case None       => searchWithIndex(nodes, edges, queries, k, p)
    }
  }

  /** Fold the tombstones into the files: write generation N+1 in which
    * ONLY the shards holding deleted rows are rebuilt (a deletion
    * invalidates its shard's adjacency, so those shards re-insert their
    * remaining rows from scratch — same determinism as a fresh build),
    * every untouched shard's node and edge partitions are BYTE-COPIED
    * verbatim, the `_deletes` sidecar is cleared, and the generation's
    * `_graft_commit` file appears LAST (after the byte-copies — a
    * reader can never resolve a half-copied generation; see
    * [[latestGenId]]). Compaction I/O is proportional to the AFFECTED data
    * (deleted ids hash to ≤ P shards), never to the index size — the
    * property that makes takedowns affordable at 100 TB.
    */
  def compactGeneration(spark: org.apache.spark.sql.SparkSession, dir: String,
                        p: Params): Unit = {
    val (g, nodes, _) = latestGeneration(spark, dir)
      .getOrElse(throw new IllegalStateException(s"no generation under $dir"))
    val dels = deletedIds(spark, dir).getOrElse(return)
    // affected shard ids: ≤ P ints to the driver (partition-filter
    // formation) — only ids actually present in the index count
    val affected = dels.join(nodes.select("vec_id"), Seq("vec_id"), "left_semi")
      .select(pmod(col("vec_id"), lit(p.numPartitions)).cast("int").as("part"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val srcBase = s"$dir/gen=$g"
    val dstBase = s"$dir/gen=${g + 1}"
    // rebuild ONLY the affected shards (partition-pruned node read)
    val kept = nodes.filter(col("part").isin(affected: _*))
      .join(broadcast(dels.select("vec_id")), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("embedding"), col("level"), col("part").cast("int").as("part"))
    kept.write.mode("overwrite").partitionBy("part").parquet(s"$dstBase/nodes")
    buildEdgesBy(kept, p)
      .write.mode("overwrite").partitionBy("part").parquet(s"$dstBase/edges")
    // byte-copy every untouched shard's files verbatim
    copyUntouchedParts(spark, s"$srcBase/nodes", s"$dstBase/nodes", affected.toSet)
    copyUntouchedParts(spark, s"$srcBase/edges", s"$dstBase/edges", affected.toSet)
    Tombstones.clear(spark, dir)
    commitGeneration(spark, dir, g + 1)
  }

  /** Copy `part=<k>` subtrees of `src` into `dst` for every k NOT in
    * `affected` — a filesystem copy, no deserialization: untouched
    * shards land in the new generation byte-identical.
    */
  private def copyUntouchedParts(spark: org.apache.spark.sql.SparkSession,
                                 src: String, dst: String,
                                 affected: Set[Int]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val fs = srcPath.getFileSystem(conf)
    fs.listStatus(srcPath).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("part=")) {
        val k = name.stripPrefix("part=").toInt
        if (!affected.contains(k))
          org.apache.hadoop.fs.FileUtil.copy(
            fs, st.getPath, fs, new org.apache.hadoop.fs.Path(s"$dst/$name"),
            false, false, conf)
      }
    }
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
  def recallAtK(embeddings: DataFrame, queries: DataFrame, k: Int, p: Params): DataFrame =
    recallOf(searchTopK(embeddings, queries, k, p), embeddings, queries, k)

  /** Recall@k of an arbitrary ANN result `(query_id, vec_id, ...)`
    * against exact kNN — lets the routed path reuse the same harness.
    */
  def recallOf(ann0: DataFrame, embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val ann = ann0
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
