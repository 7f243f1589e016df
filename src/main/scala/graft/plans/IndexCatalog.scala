package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

import graft.operators.Ivf

/** Session-scoped registry of vector indexes, keyed by the DATA PATH of
  * the table they cover — the engine's analog of a database's index
  * catalog. [[IndexRewriteRule]] consults it to decide whether a naive
  * exact-kNN plan over a scanned table can be served by the IVF probe
  * instead (the reference has no planner at all — its only access path
  * is the `Hnsw` object the caller explicitly holds, hnsw.cc:114-137;
  * an engine must make the index reachable from the QUERY, not the call
  * site).
  *
  * Registering an index declares an approximation budget: the rewrite
  * probes `nprobe` of the index's C cells, which is exact when
  * `nprobe >= C` and the standard IVF recall trade below that. Entries
  * hold the collected centroid table (C·dim doubles — driver-resident
  * by design, like every IVF plan's broadcast side) plus the path of
  * the persisted `(vec_id, cell)` assignment table.
  */
object IndexCatalog {

  /** `assignPath`: the persisted `(vec_id, cell)` assignment table —
    * the in-place probe form. `partitionedPath`: optionally, a full
    * cell-PARTITIONED copy of the table ([[Ivf.writePartitionedWith]]);
    * when present, the rewrite serves the query from that copy with a
    * partition-pruned scan (a materialized-layout rewrite — unprobed
    * cells' files are never opened).
    *
    * `kind` declares the metric GEOMETRY the index was built in — the
    * rewrite only fires when the plan's score shape matches:
    *  - "l2": centroids/assignments over the raw vectors;
    *  - "cosine": over the unit-normalized copy ([[Ivf.normalized]]) —
    *    covers naive cosine-similarity top-k plans;
    *  - "mips": over the augmented copy ([[Ivf.augmented]], d+1 dims)
    *    — covers naive inner-product top-k plans (queries zero-augment
    *    before probing).
    * For cosine/mips the assignment table is the ONLY probe form (the
    * partitioned copies hold transformed vectors, which cannot serve
    * the original plan's raw-vector score expression bit-identically).
    */
  final case class IvfIndex(
      assignPath: String,
      centroids: Seq[(Long, Seq[Double])],
      nprobe: Int,
      partitionedPath: Option[String] = None,
      kind: String = "l2")

  private val registry = TrieMap.empty[String, IvfIndex]

  /** Canonical form: authority + path — "file:/x/y", "/x/y" and
    * "file:///x/y" coincide (no authority), while "s3://bucketA/x" and
    * "s3://bucketB/x" stay distinct. Scheme is still dropped (hdfs vs
    * s3 with the SAME authority+path would collide — not a layout any
    * one deployment produces).
    */
  private def canon(p: String): String = {
    val uri = new org.apache.hadoop.fs.Path(p).toUri
    Option(uri.getAuthority).getOrElse("") + uri.getPath.stripSuffix("/")
  }

  def register(dataPath: String, assignPath: String,
               centroids: Seq[(Long, Seq[Double])], nprobe: Int,
               partitionedPath: Option[String] = None,
               kind: String = "l2"): Unit =
    registry(canon(dataPath)) =
      IvfIndex(assignPath, centroids, nprobe, partitionedPath, kind)

  def lookup(dataPath: String): Option[IvfIndex] = registry.get(canon(dataPath))

  def unregister(dataPath: String): Unit = registry.remove(canon(dataPath))

  /** LEXICAL tier: a persisted TF-IDF posting layout
    * ([[graft.operators.Retrieval.writeTfidfLayout]] —
    * `dir/postings` term-clustered, `dir/idf`, `dir/norms`) registered
    * for a documents table. Registration declares the layout CURRENT
    * for the table's content (the `ensureTfidfLayout` fingerprint
    * contract) — the rewrite serves postings-derived relations from it
    * bit-exactly.
    */
  final case class TfidfIndex(layoutDir: String)

  private val lexRegistry = TrieMap.empty[String, TfidfIndex]

  /** Registration CONTRACT (what `tryRewriteTokenContains` relies on):
    * the relation at `dataPath` holds ONE row per `doc_id`, with the
    * SAME text the layout was built from. A duplicate doc_id (or
    * drifted text) would let the posting semi-join keep a row whose
    * own text lacks the term — the rewrite would be silently lossy.
    * Use the validating overload wherever a SparkSession is in hand;
    * the raw form exists for restore-from-disk paths that already
    * carry the `ensureTfidfLayout` content fingerprint.
    */
  def registerTfidf(dataPath: String, layoutDir: String): Unit =
    lexRegistry(canon(dataPath)) = TfidfIndex(layoutDir)

  /** [[registerTfidf]] with the uniqueness half of the contract
    * ASSERTED at registration time (one aggregate over doc_id — cheap
    * next to the posting build that precedes every registration; the
    * currency half is the `ensureTfidfLayout` fingerprint).
    */
  def registerTfidf(spark: SparkSession, dataPath: String,
                    layoutDir: String): Unit = {
    import org.apache.spark.sql.functions.{count, countDistinct, lit, col}
    val r = spark.read.parquet(dataPath)
      .agg(count(lit(1)), countDistinct(col("doc_id"))).head
    require(r.getLong(0) == r.getLong(1),
      s"registerTfidf($dataPath): doc_id must be unique — " +
        s"${r.getLong(0)} rows vs ${r.getLong(1)} distinct; a duplicate " +
        "doc_id makes the token-contains posting semi-join lossy")
    registerTfidf(dataPath, layoutDir)
  }

  def lookupTfidf(dataPath: String): Option[TfidfIndex] =
    lexRegistry.get(canon(dataPath))

  def unregisterTfidf(dataPath: String): Unit = lexRegistry.remove(canon(dataPath))

  def clear(): Unit = { registry.clear(); lexRegistry.clear() }

  // ------------------------------------------------------------------
  // Persistence: every build writes `indexDir/_catalog` (meta line +
  // centroid parquet), so a NEW session restores the registration from
  // disk instead of recomputing k-means — the catalog half of the
  // engine's restart story (layouts already persist; the registry was
  // the only session-lost piece).
  // ------------------------------------------------------------------

  private def writeCatalogMeta(spark: SparkSession, indexDir: String,
                               dataPath: String, cents: org.apache.spark.sql.DataFrame,
                               nprobe: Int, partitionedPath: Option[String],
                               kind: String): Unit = {
    cents.write.mode("overwrite").parquet(s"$indexDir/_catalog/centroids")
    val meta = Seq(
      s"dataPath=$dataPath", s"nprobe=$nprobe", s"kind=$kind",
      s"partitionedPath=${partitionedPath.getOrElse("")}").mkString("\n")
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/_catalog/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
  }

  /** Restore a registration persisted by any buildAndRegister* from
    * `indexDir/_catalog` — no k-means, no data scan beyond the C-row
    * centroid table. Returns the restored data path. `nprobe` may be
    * overridden at restore time (it is a serving knob, not a build
    * property).
    */
  def restore(spark: SparkSession, indexDir: String,
              nprobeOverride: Option[Int] = None): String = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/_catalog/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no persisted catalog under $indexDir/_catalog")
    val in = fs.open(p)
    val meta =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    val kv = meta.linesIterator.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
    val cents = spark.read.parquet(s"$indexDir/_catalog/centroids")
      .as[(Long, Seq[Double])].collect().toSeq
    register(kv("dataPath"), s"$indexDir/assign", cents,
      nprobeOverride.getOrElse(kv("nprobe").toInt),
      Option(kv.getOrElse("partitionedPath", "")).filter(_.nonEmpty),
      kv.getOrElse("kind", "l2"))
    kv("dataPath")
  }

  /** Build and register an IVF index over a parquet vector table:
    * k-means centroids (deterministic Lloyd, [[Ivf.kmeans]]) and the
    * persisted assignment table under `indexDir/assign`. After this,
    * any naive top-k-by-l2 plan scanning `dataPath` is eligible for the
    * probe rewrite.
    */
  def buildAndRegister(spark: SparkSession, dataPath: String,
                       c: Int, iters: Int, nprobe: Int, indexDir: String): Unit =
    buildAndRegister(spark, dataPath, c, iters, nprobe, indexDir, partitioned = false)

  /** [[buildAndRegister]] with `partitioned = true` ALSO writes the
    * cell-partitioned copy of the table and registers it, upgrading the
    * rewrite from an assignment-table join to a partition-pruned scan.
    */
  def buildAndRegister(spark: SparkSession, dataPath: String,
                       c: Int, iters: Int, nprobe: Int, indexDir: String,
                       partitioned: Boolean): Unit = {
    import spark.implicits._
    val emb = spark.read.parquet(dataPath)
    val cents = Ivf.kmeans(emb, c, iters)
    val assignPath = s"$indexDir/assign"
    Ivf.assignWith(emb, cents).write.mode("overwrite").parquet(assignPath)
    val partPath = if (partitioned) {
      val pp = s"$indexDir/cells"
      Ivf.writePartitionedWith(emb, cents, pp)
      Some(pp)
    } else None
    writeCatalogMeta(spark, indexDir, dataPath, cents, nprobe, partPath, "l2")
    register(dataPath, assignPath,
      cents.as[(Long, Seq[Double])].collect().toSeq, nprobe, partPath)
  }

  /** Build and register a COSINE index over a parquet vector table:
    * centroids and `(vec_id, cell)` assignments are computed over the
    * unit-NORMALIZED copy (the cosine→L2 reduction's geometry), but the
    * registration keys on the RAW table's path — the rewrite restricts
    * the naive plan's candidate set by cell and keeps its raw-vector
    * cosine score expression untouched, so nprobe = C is bit-exact.
    */
  def buildAndRegisterCosine(spark: SparkSession, dataPath: String,
                             c: Int, iters: Int, nprobe: Int, indexDir: String): Unit =
    buildAndRegisterCosine(spark, dataPath, c, iters, nprobe, indexDir,
      partitioned = false)

  /** [[buildAndRegisterCosine]] with `partitioned = true` ALSO writes a
    * cell-partitioned copy of the NORMALIZED table. The copy never
    * serves the rewritten plan directly (it holds unit doubles, not
    * the raw vectors the preserved score expression reads) — it exists
    * so the similarity-floor range rewrite can build/read the `_radii`
    * sidecar its lossless cell bound needs.
    */
  def buildAndRegisterCosine(spark: SparkSession, dataPath: String,
                             c: Int, iters: Int, nprobe: Int, indexDir: String,
                             partitioned: Boolean): Unit = {
    import spark.implicits._
    val normed = Ivf.normalized(spark.read.parquet(dataPath))
    val cents = Ivf.kmeans(normed, c, iters)
    val assignPath = s"$indexDir/assign"
    Ivf.assignWith(normed, cents).write.mode("overwrite").parquet(assignPath)
    val partPath = if (partitioned) {
      val pp = s"$indexDir/cells"
      Ivf.writePartitionedWith(normed, cents, pp, kind = "cosine")
      Some(pp)
    } else None
    writeCatalogMeta(spark, indexDir, dataPath, cents, nprobe, partPath, "cosine")
    register(dataPath, assignPath,
      cents.as[(Long, Seq[Double])].collect().toSeq, nprobe, partPath, kind = "cosine")
  }

  /** Build and register a MIPS index: centroids/assignments over the
    * AUGMENTED copy (d+1 dims, [[Ivf.augmented]]); queries zero-augment
    * before probing. Same candidate-restriction contract as
    * [[buildAndRegisterCosine]] — the raw dot-product score expression
    * is preserved, nprobe = C is bit-exact.
    */
  def buildAndRegisterMips(spark: SparkSession, dataPath: String,
                           c: Int, iters: Int, nprobe: Int, indexDir: String): Unit =
    buildAndRegisterMips(spark, dataPath, c, iters, nprobe, indexDir,
      partitioned = false)

  /** [[buildAndRegisterMips]] with `partitioned = true` ALSO writes a
    * cell-partitioned copy of the AUGMENTED table — like the cosine
    * variant, solely so the dot-floor range rewrite can build/read the
    * `_radii` sidecar (per-cell covering radius + max squared norm) its
    * lossless bound needs.
    */
  def buildAndRegisterMips(spark: SparkSession, dataPath: String,
                           c: Int, iters: Int, nprobe: Int, indexDir: String,
                           partitioned: Boolean): Unit = {
    import spark.implicits._
    val aug = Ivf.augmented(spark.read.parquet(dataPath))
    val cents = Ivf.kmeans(aug, c, iters)
    val assignPath = s"$indexDir/assign"
    Ivf.assignWith(aug, cents).write.mode("overwrite").parquet(assignPath)
    val partPath = if (partitioned) {
      val pp = s"$indexDir/cells"
      Ivf.writePartitionedWith(aug, cents, pp, kind = "mips")
      Some(pp)
    } else None
    writeCatalogMeta(spark, indexDir, dataPath, cents, nprobe, partPath, "mips")
    register(dataPath, assignPath,
      cents.as[(Long, Seq[Double])].collect().toSeq, nprobe, partPath, kind = "mips")
  }
}
