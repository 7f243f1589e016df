package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics for corpus curation — the link-graph quality signals
  * a web-scale training pipeline computes beside dedup: PageRank-style
  * centrality (crawl frontier priority, document quality priors,
  * representative selection). The near-dup CLUSTERING half of graph
  * processing already lives in [[Dedup]] (pointer-jumping connected
  * components); this adds the iterative-scoring half.
  *
  * Deterministic by construction, so the whole iteration oracle-checks:
  * fixed iteration count (no convergence test), per-node contribution
  * sums accumulate through DECIMAL(38,12) (partition-order invariant),
  * and every scalar (1/n, (1−d)/n, d) enters as the same double in
  * both engines. Dangling nodes (no out-edges) contribute nothing —
  * the dropped-mass convention, documented and mirrored in SQL.
  *
  * Scale shape: each iteration is ONE join of the edge table with the
  * current rank vector (shuffle keyed on src, then one grouped
  * aggregation keyed on dst) — the vector table carries one double per
  * node, the edge table is never materialized to the driver, and
  * `localCheckpoint` truncates the lineage so iteration t+1 reads
  * iteration t's rows instead of replaying the whole chain (the
  * [[Ivf.kmeans]] lesson, kept distributed because ranks are O(nodes),
  * not O(cells)).
  */
object Graph {

  /** Part co-occurrence edges from a `lineitem` relation: parts sharing
    * at least `minOrders` orders (src < dst, one row per pair). The
    * canonical graph-analytics input over the TPC-H-ish tables — one
    * definition shared by the declared queries and the SQL TVFs so the
    * two surfaces cannot drift. `minOrders = 1` is the raw (dense)
    * co-occurrence graph; `≥ 2` sparsifies to the repeat graph with
    * real core structure.
    */
  def partCoOccurrence(lineitem: DataFrame, minOrders: Int = 1): DataFrame = {
    val li = lineitem
      .select(col("l_orderkey"), col("l_partkey").cast("long")).distinct()
    val pairs = li.select(col("l_orderkey"), col("l_partkey").as("src"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")),
        Seq("l_orderkey"))
      .filter(col("src") < col("dst"))
    // minOrders = 1 returns the raw pair stream (one row per shared
    // order — a multigraph; every consumer canonicalizes, and an eager
    // distinct here would only buy an extra exchange)
    if (minOrders <= 1) pairs.select("src", "dst")
    else pairs.groupBy("src", "dst").agg(count(lit(1)).as("n_ord"))
      .filter(col("n_ord") >= minOrders)
      .select("src", "dst")
  }

  /** Persist a DERIVED edge relation as a saved table bucketed (and
    * sorted) by `src` — the [[Dedup.writeDigestStore]] pattern for the
    * graph substrate. Graph ops currently re-derive their edges from
    * raw relations every run (e.g. [[partCoOccurrence]]'s distinct +
    * self-join) and every PageRank iteration re-exchanges the edge
    * stream for its src-keyed contribution join; reading the store back
    * (`spark.table(table)`) makes BOTH free: the derivation is paid
    * once at write time, and the bucket layout means the per-iteration
    * edge↔rank join and the out-degree aggregation plan with NO
    * Exchange on the edge side — only the O(nodes) rank vector moves,
    * every iteration, at any scale (plan-pinned in GraphSpec). Pass the
    * edge stream already canonicalized the way the consumer expects
    * (e.g. [[partCoOccurrence]] output for the declared queries).
    */
  def writeEdgeStore(edges: DataFrame, table: String, buckets: Int = 32): Unit =
    edges.select(col("src"), col("dst"))
      .write.mode("overwrite")
      .bucketBy(buckets, "src").sortBy("src", "dst")
      .saveAsTable(table)

  /** Fixed-iteration PageRank over `edges(src, dst)` (multi-edges
    * count once per row, the adjacency-list convention). Returns
    * `(node, pr)` for every node appearing as a src or dst.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               roundTo: Int = 6): DataFrame = {
    val spark = edges.sparkSession
    // Keep the edge stream materialized ONCE per run (r17): before
    // this, every iteration's contribution join — and the node-set and
    // out-degree derivations — re-executed the caller's edge subtree
    // (for the declared purchase-graph query that is an
    // orders⋈lineitem join, re-paid iters+2 times per run). LAZY
    // localCheckpoint, not persist(): persist is plan-keyed in the
    // CacheManager, so its blocks would silently serve the NEXT
    // invocation of the same query (cross-run result caching — the
    // bench contract forbids it); a localCheckpoint is RDD-keyed and
    // dies with this run's plan. The node-set count below materializes
    // it; every later pass reads blocks. The other loops in this file
    // already kept their edge stream cut (sym/und localCheckpoints) —
    // pageRank was the one that did not.
    val e = edges.localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge table")
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val base = (1.0 - damping) / n
    var pr = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    for (_ <- 0 until iters) {
      // shuffle_hash on the O(nodes) side: the edge stream is the big
      // relation; sort-merge would re-sort it every round (the
      // triangleCounts lesson — build on the small keyed side instead)
      val contribs = e
        .join(pr.withColumnRenamed("node", "src").hint("shuffle_hash"), Seq("src"))
        .join(outDeg.hint("shuffle_hash"), Seq("src"))
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
      pr = nodes
        .join(contribs.groupBy("node")
            .agg(sum(col("c").cast("decimal(38,12)")).cast("double").as("s")),
          Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"))
        .localCheckpoint() // truncate lineage: iteration t+1 reads rows, not the chain
    }
    pr.select(col("node"), round(col("pr"), roundTo).as("pr"))
  }

  /** Per-node triangle counts over the UNDIRECTED simple graph induced
    * by `edges(src, dst)` (direction, multiplicity, and self-loops
    * dropped) — the local clustering signal (tightly-knit co-occurrence
    * neighborhoods) of link-graph curation. Returns `(node, n_tri)` for
    * EVERY node of the induced graph, zero-triangle nodes included.
    *
    * Scale shape — degree orientation (the classic O(m^{3/2}) triangle
    * enumeration): orient each undirected edge from its lower-(degree,
    * id) endpoint to the higher, making the graph a DAG in which every
    * triangle u<v<w appears exactly once as edge (u,v) plus one
    * w ∈ out(u) ∩ out(v). Oriented out-degree is O(√m) on ANY graph —
    * a power-law hub's edges orient INTO it, so the hub's neighborhood
    * is never enumerated. Naive id-ordered enumeration (the oracle's
    * form, correct but un-oriented) pays Σ deg² wedges and dies on the
    * first hub; this pays Σ outdeg² ≤ m^{3/2} regardless of skew —
    * and ships it as per-node SORTED ADJACENCY ARRAYS intersected
    * locally at each edge (edge-iterator), never as a materialized
    * wedge-row stream re-shuffled for a closing equi-join. Shuffles:
    * degree agg, adjacency build, and two node-keyed edge↔adjacency
    * joins — all O(m) rows; the only super-linear volume is the array
    * payload, bounded by the same Σ outdeg².
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint() // reused 3×: degrees, orientation, wedge closing
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // shuffle_hash throughout: every join here pairs a LARGE streamed
    // side (edges, then the wedge set) with a SMALLER keyed side (the
    // degree relation, the canonical edge set). Sort-merge would sort
    // the streamed side — for the closing join that is a sort of the
    // whole Σ outdeg² wedge stream, the single biggest cost of the
    // naive plan (~2× the query at sf0.1). Hash-partitioned build on
    // the small side keeps the wedge stream unsorted and is the shape
    // that survives scale: the build side is O(edges)/partition, never
    // O(wedges), and nothing is broadcast.
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")).hint("shuffle_hash"),
        Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")).hint("shuffle_hash"),
        Seq("b"))
    val apexIsA = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(apexIsA, col("a")).otherwise(col("b")).as("u"),
      when(apexIsA, col("b")).otherwise(col("a")).as("v"))
    // EDGE-ITERATOR closing over per-node adjacency arrays: in the
    // oriented DAG every triangle u<v<w (by the (deg,id) order) is the
    // edge (u,v) plus one w ∈ out(u) ∩ out(v). Joining each oriented
    // edge to its endpoints' sorted out-neighbor arrays and
    // intersecting LOCALLY replaces the wedge materialization (a
    // Σ outdeg² row stream re-shuffled by its outer pair for the
    // closing equi-join — the old plan's dominant shuffle) with array
    // payloads that never exceed the same Σ outdeg² bound but ship in
    // m rows and close without another exchange.
    val adj = oriented.groupBy("u")
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
    val tri = oriented
      .join(adj.select(col("u"), col("nbrs").as("nu")).hint("shuffle_hash"), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")).hint("shuffle_hash"),
        Seq("v"))
      .select(col("u"), col("v"),
        explode(array_intersect(col("nu"), col("nv"))).as("w"))
    val perNode = tri.select(col("u").as("node"))
      .union(tri.select(col("v").as("node")))
      .union(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.select(col("node")).join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** SYNCHRONOUS label propagation (community detection) over the
    * undirected simple graph of `edges(src, dst)`: every node starts
    * with its own id as label; each round, every node adopts the most
    * frequent label among its NEIGHBORS (ties → the smallest label; a
    * node with no neighbors keeps its label). Fixed `iters` rounds, no
    * convergence test — fully deterministic, so the whole iteration
    * oracle-checks as unrolled SQL (the [[pageRank]] contract). The
    * cheap community signal of link-graph curation — groups tightly
    * interlinked pages without the quadratic machinery of modularity.
    *
    * Scale shape per round: ONE join of the (symmetrized) edge list
    * with the current label vector + one (node, label) count + one
    * max_by argmax — all keyed on node ids; the label vector carries
    * one long per node and `localCheckpoint` truncates lineage between
    * rounds. Synchronous update (not the paper's async sweep) keeps
    * the result independent of row visit order — the property that
    * makes it reproducible on ANY cluster size.
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val sym = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b").as("node"), col("a").as("nbr")))
      .localCheckpoint()
    var labels = sym.select(col("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 0 until iters) {
      val freq = sym
        .join(labels.withColumnRenamed("node", "nbr").hint("shuffle_hash"), Seq("nbr"))
        .groupBy("node", "label").agg(count(lit(1)).as("n"))
      // most frequent neighbor label, ties to the smallest label:
      // max_by over (n, -label) — a single hash aggregate, no window
      val best = freq.groupBy("node")
        .agg(max_by(col("label"), struct(col("n"), (-col("label")).as("t"))).as("label"))
      labels = labels.select(col("node"))
        .join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** k-core peeling (fixed rounds) over the undirected simple graph of
    * `edges(src, dst)`: each round drops every node whose CURRENT
    * degree is below `k` (with all its incident edges), synchronously.
    * Returns `(node, deg)` for the nodes of the subgraph surviving
    * `rounds` rounds — when `rounds` reaches the peel depth this IS
    * the classic k-core (every survivor has ≥ k neighbors among
    * survivors; GraphSpec pins the fixpoint), and the fixed count
    * keeps the whole iteration deterministic and oracle-checkable as
    * unrolled SQL (the [[labelPropagation]] contract). The
    * dense-subgraph curation signal: spam link farms and boilerplate
    * template clusters sit in high cores; low-core pages are the
    * periphery.
    *
    * Scale shape per round: one degree aggregation + two left-semi
    * joins of the edge list against the O(nodes) survivor relation
    * (shuffle_hash — build on the keyed small side, stream the
    * edges), lineage truncated between rounds.
    */
  def kcore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint()
    for (_ <- 0 until rounds) {
      val keep = und.select(col("a").as("node"))
        .union(und.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
      und = und
        .join(keep.select(col("node").as("a")).hint("shuffle_hash"), Seq("a"), "leftsemi")
        .join(keep.select(col("node").as("b")).hint("shuffle_hash"), Seq("b"), "leftsemi")
        .localCheckpoint()
    }
    und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /** Connected components of the undirected graph induced by
    * `edges(src, dst)` (direction ignored; `vertices(node)` supplies
    * the full vertex set so isolated nodes come out as their own
    * singleton component). Returns `(node, component)` where
    * `component` is the smallest node id in the component — the
    * canonical deterministic labeling, so the whole iteration
    * oracle-checks as unrolled SQL (the [[labelPropagation]] contract).
    *
    * Algorithm: iterative min-label propagation with POINTER JUMPING —
    * each round every vertex adopts the smallest label among itself and
    * its neighbors (one equi-join + one aggregation keyed on node id),
    * then follows its label one hop (label := label of label), which
    * halves the remaining path length: convergence in O(log diameter)
    * rounds instead of O(diameter), and each round costs a driver
    * round-trip, so the log matters. Each round runs exactly ONE Spark
    * job whose scalar aggregate doubles as the convergence check (every
    * label is monotone non-increasing, so Σ label is unchanged iff no
    * label changed) — no data is ever collected.
    *
    * This is the op [[Dedup.nearDupClusters]] (and through it semantic
    * dedup and the leakage split) is built on.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIters: Int = 20): DataFrame = {
    // NOTE (r17 optimization round, measured and rejected): both
    // shuffle_hash hints on the per-round joins and a pre-partitioned
    // (repartition-by-v) persist of `sym` were tried here. The hints
    // REGRESSED the query ~2-4× — AQE already converts every
    // label-sided join to a runtime broadcast join once it sees the
    // actual O(nodes) exchange sizes, and a join-strategy hint pins
    // shuffled-hash and forbids exactly that conversion. The
    // pre-partitioned persist bought nothing over the plain persist
    // for the same reason (the label side broadcasts; the edge side
    // never re-exchanges). Keep this loop hint-free.
    val sym = edges.filter(col("src") =!= col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
      .union(edges.filter(col("src") =!= col("dst"))
        .select(col("dst").as("u"), col("src").as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = vertices.select(col("node"), col("node").as("component"))
    // Convergence reads off Σ component, exact in DECIMAL(38,0): every
    // per-node label is monotone non-increasing (prop takes a least();
    // jump maps a label to that node's label, itself ≤ the node id by
    // induction), so the sum is unchanged iff NO label changed — the
    // convergence check is a BY-PRODUCT of the round's materialization.
    var prevSum: Option[java.math.BigDecimal] = None
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = sym
        .join(labels.select(col("node").as("v"), col("component").as("nl")), Seq("v"))
        .groupBy(col("u").as("node"))
        .agg(min("nl").as("nmin"))
      // localCheckpoint (the iteration contract shared by every loop in
      // this file): prop is referenced TWICE by the jump self-join and
      // labels feeds the next round — without truncation each round's
      // logical plan embeds the previous round's at every reference
      // (2^rounds plan nodes). localCheckpoint stores blocks AND makes
      // the plan a leaf.
      val prop = labels
        .join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
        .localCheckpoint()
      // pointer jump: label := label(label). Labels only ever shrink
      // toward the component min and every label is itself a node id
      // from the vertex set, so the inner self-join is total.
      val next = prop
        .join(prop.select(col("node").as("component"), col("component").as("jump")),
          Seq("component"))
        .select(col("node"), col("jump").as("component"))
        .localCheckpoint()
      val newSum = next.agg(sum(col("component").cast("decimal(38,0)"))).head.getDecimal(0)
      // null-safe: an empty vertex set sums to null (and must converge
      // immediately, not NPE) — the ccAbsorb empty-batch path hits this
      converged = prevSum.exists(p =>
        if (p == null || newSum == null) p == newSum else p.compareTo(newSum) == 0)
      labels = next
      prevSum = Some(newSum)
      i += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"connectedComponents: labels still changing after $maxIters rounds — " +
          "returning PARTIALLY converged components (raise maxIters; " +
          "convergence needs ~log2(graph diameter) rounds)")
    // Reliable checkpoint on the way out: re-executions read the
    // checkpoint files, not the loop, and the final labels survive the
    // local-checkpoint blocks' lifetime.
    val out = Dedup.checkpointed(labels)
    sym.unpersist()
    out
  }

  /** [[connectedComponents]] with the vertex set derived from the edge
    * endpoints — the plain graph-analytics entry point.
    */
  def connectedComponents(edges: DataFrame): DataFrame =
    connectedComponents(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct(),
      edges)

  /** INCREMENTAL connected-components absorb: merge a batch of new
    * edges into a STORED canonical labeling (`(node, component)` where
    * `component` is the component's min node id — [[connectedComponents]]'
    * output contract) and return the full updated labeling, EXACTLY
    * equal to batch CC over the union of the stored graph and the new
    * edges — without re-running the fixpoint over the corpus. This is
    * the missing half of the incremental dedup-store contract: the
    * stores absorb PAIRS incrementally, and this absorbs their cluster
    * LABELS.
    *
    * Work ∝ the batch, not the corpus:
    *  1. Seed lookup — the batch's endpoints (bounded by 2·|batch|)
    *     BROADCAST against the store: one narrow map-side semi-join
    *     pass; the store never shuffles.
    *  2. Contract — each new edge `(u,v)` becomes an edge between the
    *     SEED LABELS `(label(u), label(v))` (a new node seeds as its
    *     own id). The contracted graph has ≤ 2·|batch| vertices.
    *  3. Re-converge — [[connectedComponents]] runs on the CONTRACTED
    *     graph only: O(log batch-diameter) rounds over ∝|batch| rows.
    *     Its min-label output over min-node labels is again the min
    *     node id of each merged component, so canonicality is
    *     preserved by construction.
    *  4. Rewrite — only labels the contraction actually changed
    *     (`old ≠ new`, bounded by the touched components) broadcast
    *     back over the store: a second narrow map-side pass, again no
    *     store-side Exchange. New nodes append with their re-converged
    *     labels.
    *
    * The equality claim (absorb ≡ batch-over-union) holds because the
    * stored labeling is a valid canonical CC of the stored graph: each
    * stored component is internally connected, so contracting it to
    * its label loses no connectivity that the new edges could use, and
    * the min over merged labels equals the min node over merged
    * components.
    */
  def ccAbsorb(stored: DataFrame, newEdges: DataFrame,
               maxIters: Int = 20): DataFrame = {
    val (updated, _, newNodes) = ccAbsorbParts(stored, newEdges, maxIters)
    updated.union(newNodes)
  }

  /** The DELTA form of [[ccAbsorb]]: only the labels the batch actually
    * changes — stored rows whose component merged (bounded by the
    * touched components' membership) plus the batch's new nodes. This
    * is what an APPEND-ONLY label store persists per batch
    * ([[Dedup.clustersIncremental]]): O(changed) rows written, never a
    * corpus rewrite. Union it with the untouched store rows to get
    * exactly [[ccAbsorb]]'s full labeling.
    */
  def ccAbsorbDelta(stored: DataFrame, newEdges: DataFrame,
                    maxIters: Int = 20): DataFrame = {
    val (_, changed, newNodes) = ccAbsorbParts(stored, newEdges, maxIters)
    changed.union(newNodes)
  }

  /** Shared absorb core → (full updated store labels, changed store
    * labels only, new-node labels).
    */
  private def ccAbsorbParts(stored: DataFrame, newEdges: DataFrame,
                            maxIters: Int): (DataFrame, DataFrame, DataFrame) = {
    val e = newEdges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    val endpoints = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint() // referenced 3×; also pins the batch size once
    // 1. seed lookup: store-side map-only (broadcast semi-join)
    val seeds = stored.join(broadcast(endpoints), Seq("node"))
      .select(col("node"), col("component"))
      .localCheckpoint() // bounded by |endpoints|; safe to broadcast back
    // 2. contract new edges to component-level edges
    val contracted = e
      .join(broadcast(seeds.select(col("node").as("src"), col("component").as("lu"))),
        Seq("src"), "left")
      .join(broadcast(seeds.select(col("node").as("dst"), col("component").as("lv"))),
        Seq("dst"), "left")
      .select(coalesce(col("lu"), col("src")).as("src"),
        coalesce(col("lv"), col("dst")).as("dst"))
    // 3. re-converge ONLY the touched subgraph. The contracted graph is
    // BATCH-BOUNDED by contract (≤ |new edges| component-level edges),
    // so the normal path is a driver-local min-label union-find — one
    // collect job instead of an iteration of label-propagation jobs
    // whose fixed scheduling cost dwarfs a small batch (measured 1.5 s
    // for 65 edges). Identical labels to [[connectedComponents]] (min
    // reachable id per set); a contract-violating giant batch falls
    // back to the distributed loop via the capped probe.
    val localCap = 100000
    // One materialization before the capped probe: limit().collect()'s
    // incremental executeTake re-runs the upstream plan once per
    // scale-up wave when the relation is under the cap (the
    // nonMinMembers lesson); the checkpoint also serves the fallback's
    // three further references.
    val contractedCk = contracted.localCheckpoint(true)
    val probe = contractedCk.limit(localCap + 1).collect()
    val remap =
      if (probe.length <= localCap) {
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        probe.foreach { r =>
          val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
          if (a != b) parent(math.max(a, b)) = math.min(a, b)
        }
        val nodes = probe.iterator.flatMap(r => Iterator(r.getLong(0), r.getLong(1)))
          .toSet
        val minOf = nodes.groupBy(find).map { case (root, members) =>
          root -> members.min
        }
        val pairs = nodes.iterator
          .map(n => (n, minOf(find(n))))
          .filter { case (n, m) => n != m }
          .toSeq.sortBy(_._1)
        import stored.sparkSession.implicits._
        pairs.toDF("oldc", "newc")
      } else connectedComponents(
        contractedCk.select(col("src").as("node"))
          .union(contractedCk.select(col("dst").as("node"))).distinct(),
        contractedCk, maxIters)
        .filter(col("node") =!= col("component"))
        .select(col("node").as("oldc"), col("component").as("newc"))
        .localCheckpoint() // bounded by touched components; broadcast below
    // 4. rewrite: store-side map-only again (broadcast joins)
    val updated = stored
      .join(broadcast(remap), stored("component") === remap("oldc"), "left")
      .select(stored("node"), coalesce(col("newc"), stored("component")).as("component"))
    val changed = stored
      .join(broadcast(remap), stored("component") === remap("oldc"))
      .select(stored("node"), col("newc").as("component"))
    // new nodes seed as their own id, so their remap key is that id
    val newNodes = endpoints
      .join(broadcast(seeds.select(col("node"))), Seq("node"), "left_anti")
      .join(broadcast(remap), col("node") === col("oldc"), "left")
      .select(col("node"), coalesce(col("newc"), col("node")).as("component"))
    (updated, changed, newNodes)
  }

  /** Degree relation `(node, out_deg, in_deg)` — the cheap centrality
    * twin (and the spec's cross-check surface).
    */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
