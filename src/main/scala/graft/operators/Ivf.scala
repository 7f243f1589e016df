package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate similarity search — the scale path
  * for vector search, complementing [[Hnsw]] (graph) and [[Knn]]
  * (exact). No counterpart exists in the reference (its only pruning
  * structure is the layer hierarchy, hnsw.cc:276-285); this is the
  * standard coarse-quantization design.
  *
  * Everything here is deterministic and declarative (no RNG, no
  * training iterations): centroids are the vectors with the C smallest
  * ids — a fixed, documented seeding rule (k-means refinement would be
  * a drop-in improvement; determinism matters more for the oracle).
  * That makes the whole operator SQL-expressible, so unlike most ANN
  * code paths it hash-checks against DuckDB.
  *
  * Scale shape: centroids are broadcast (C ≪ N always); assignment is
  * one narrow pass over the vectors (crossJoin with C rows + per-vector
  * argmin — no shuffle of the big side); the search probes `nprobe`
  * cells, i.e. reads ~nprobe/C of the data. Cell assignment would be
  * written once as a partition column (`partitionBy("cell")`) in a
  * production pipeline, making the probe a partition-pruned scan.
  */
object Ivf {

  /** The C seed centroids: `(centroid_id, centroid_vec)` as doubles.
    * Seed rule: the vectors with `vec_id < c` — correct for the dense
    * 0-based ids of every driver table. A sparse id space needs a
    * rank-based seed (`row_number over (order by vec_id) <= c`) here
    * AND in the oracle SQL; the filter form keeps both sides trivially
    * identical.
    */
  def centroids(embeddings: DataFrame, c: Int): DataFrame =
    centroidsFrom(embeddings, c, 0)

  /** [[centroids]] with a SEED OFFSET: rows `off ≤ vec_id < off + c`,
    * centroid ids re-based to `0..c-1`. Exists for composed quantizers:
    * PQ codebooks trained on the RESIDUALS of coarse cells must NOT
    * seed from the coarse seeds themselves — those rows' residuals are
    * exactly zero (each is its own cell centroid), so every product
    * codeword would start at the origin and Lloyd collapses into one
    * degenerate cell (ResidualPqSpec pins the non-degenerate path).
    */
  def centroidsFrom(embeddings: DataFrame, c: Int, off: Int): DataFrame =
    embeddings.filter(col("vec_id") >= off && col("vec_id") < off + c)
      .select((col("vec_id") - off).as("centroid_id"),
        transform(col("embedding"), x => x.cast("double")).as("centroid_vec"))

  /** Assign every vector to its nearest centroid (ties → smaller
    * centroid id). One broadcast nested-loop + per-vector argmin.
    */
  def assign(embeddings: DataFrame, c: Int): DataFrame =
    assignWith(embeddings, centroids(embeddings, c))

  /** [[assign]] with an explicit `(centroid_id, centroid_vec)` table
    * (seeded or k-means-refined). Centroids are always broadcast.
    */
  def assignWith(embeddings: DataFrame, cents: DataFrame): DataFrame =
    assignMulti(embeddings, cents, 1)

  /** Multi-assignment: every vector posted to its `r` nearest cells
    * (ties → smaller centroid id). `r = 1` is plain IVF assignment;
    * `r > 1` is SPANN-style boundary replication — a vector near a
    * Voronoi boundary lives in the neighboring cells too, which is what
    * lets cell-routed search keep recall while probing few cells. Index
    * size grows by exactly r×.
    */
  def assignMulti(embeddings: DataFrame, cents: DataFrame, r: Int): DataFrame = {
    val byVec = Window.partitionBy("vec_id").orderBy(col("cdist"), col("centroid_id"))
    embeddings
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"),
        l2Distance(col("embedding"), col("centroid_vec")).as("cdist"))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") <= r)
      .select(col("vec_id"), col("centroid_id").as("cell"))
  }

  /** Lloyd-refined centroids: `iters` FIXED iterations from the seed
    * centroids — fully deterministic (no RNG, no convergence test), so
    * the refined assignment stays oracle-checkable. Per-dimension means
    * accumulate in DECIMAL(38,12) (exact, partition-order-invariant)
    * and divide in DOUBLE — any engine reproduces the values bit-for-bit
    * (float sources cannot tie at the 12th decimal: a tie needs a
    * denominator divisible by 5^12 > 2^24). Cells that lose all members
    * keep their previous centroid.
    *
    * Each iteration: one broadcast-assign pass + one (cell, dim)
    * aggregation — both shuffle only C·dim rows; the vector table is
    * never shuffled.
    */
  def kmeans(embeddings: DataFrame, c: Int, iters: Int,
             seedOffset: Int = 0): DataFrame =
    kmeansWith(embeddings, centroidsFrom(embeddings, c, seedOffset), iters)

  /** [[kmeans]] from an EXPLICIT seed table `(centroid_id,
    * centroid_vec)` — the retrain entry point for maintenance flows
    * where the contiguous-id seed window no longer represents the
    * corpus (a drifted layout about to [[reclusterPartitioned]] wants
    * seeds spread across base AND drift rows, e.g. an id stride).
    * Deterministic given the seeds, same Lloyd arithmetic as
    * [[kmeans]].
    */
  def kmeansWith(embeddings: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    var cents = seeds.select(col("centroid_id"),
      transform(col("centroid_vec"), x => x.cast("double")).as("centroid_vec"))
    for (_ <- 0 until iters) {
      val means = embeddings
        .join(assignWith(embeddings, cents), Seq("vec_id"))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy("cell", "i")
        .agg((sum(col("x").cast("double").cast("decimal(38,12)")).cast("double")
          / count(lit(1))).as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
          s => s.getField("m")).as("new_vec"))
        .select(col("cell").as("centroid_id"), col("new_vec"))
      val next = cents.join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("new_vec"), col("centroid_vec")).as("centroid_vec"))
      // Materialize each iteration into a LOCAL relation: C·dim doubles
      // on the driver (C ≤ a few hundred by construction — this is the
      // legitimate small side of every IVF plan). Without this, iteration
      // t+1 references iteration t's plan TWICE (assign + carry-forward
      // join), so the Lloyd DAG re-executes ~2^t times per consumer —
      // and every consumer action (searchRouted routes + assigns,
      // topKWith probes + assigns) replays the whole chain. Collecting
      // makes each iteration read the vector table exactly once and
      // downstream consumers pay zero recompute. Doubles round-trip
      // exactly, so the DuckDB oracle hash is unaffected.
      cents = next.as[(Long, Seq[Double])].collect().toSeq
        .toDF("centroid_id", "centroid_vec")
    }
    cents
  }

  // Driver-resident centroid memo: C·dim doubles per entry (the
  // legitimately-small side of every IVF plan). The reference amortizes
  // Lloyd for free by keeping its index object alive across queries;
  // this is the engine's analog for DECLARED queries that each start
  // from (sfDir, c, iters).
  private val kmeansMemo =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), Array[(Long, Seq[Double])]]

  /** [[kmeans]] memoized per `(key, c, iters)` — `key` must identify the
    * input table (e.g. its directory). The memo holds the collected
    * local relation [[kmeans]] already materializes, so a hit costs one
    * local-relation rebuild and zero Spark jobs; values (and therefore
    * every downstream oracle hash) are bit-identical to the uncached
    * path.
    */
  def kmeansCached(embeddings: DataFrame, c: Int, iters: Int, key: String): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // A caller passing a different table under a reused key would get
    // bit-wrong centroids with no error — fail loudly instead.
    IndexMeta.requireKeyMatchesScan(embeddings, key)
    kmeansMemo.getOrElseUpdate((key, c, iters),
      kmeans(embeddings, c, iters).as[(Long, Seq[Double])].collect())
      .toSeq.toDF("centroid_id", "centroid_vec")
  }

  /** Materialize the cell layout: vectors written as Parquet
    * partitioned BY cell (`dir/cell=<k>/...`), plus the centroid table
    * as a `_centroids` sidecar (underscore-prefixed → invisible to
    * partition discovery). This is the production form of the index — a
    * probe becomes a partition-pruned scan that never opens unprobed
    * cells' files, and centroid recovery reads C sidecar rows instead
    * of scanning the data.
    */
  def writePartitioned(embeddings: DataFrame, c: Int, dir: String): Unit =
    writePartitionedWith(embeddings, centroids(embeddings, c), dir)

  /** [[writePartitioned]] with an EXPLICIT centroid table (seed or
    * k-means-refined): cells of the given centroids become the
    * partition column, and the centroid table itself is the sidecar —
    * so the refined layout serves probes with no assignment pass and
    * no Lloyd replay.
    */
  def writePartitionedWith(embeddings: DataFrame, cents: DataFrame, dir: String,
                           kind: String = "plain"): Unit = {
    embeddings
      .join(assignWith(embeddings, cents), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    // a full rebuild supersedes any snapshot lineage from a previous
    // layout at this dir — a stale manifest over fresh cells would
    // resolve to garbage
    CellSnapshot.reset(embeddings.sparkSession, dir)
    writeKind(embeddings.sparkSession, dir, kind)
    cents.write.mode("overwrite").parquet(s"$dir/_centroids")
  }

  /** The vector TRANSFORM the layout's rows carry (`plain` raw floats,
    * `cosine` normalized doubles, `mips` augmented doubles), recorded
    * at build time so maintenance entry points can validate instead of
    * silently mixing element types (`_graft_kind` sidecar; layouts
    * predating the marker read as `plain`).
    */
  def layoutKind(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_graft_kind")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "plain"
    else {
      val in = fs.open(p)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      finally in.close()
    }
  }

  /** Record a layout's vector-transform kind (see [[layoutKind]]) —
    * shared with the code layouts (e.g. `pq_residual`) so their
    * maintenance entry points get the same mix-up guard.
    */
  private[operators] def writeLayoutKind(spark: org.apache.spark.sql.SparkSession,
                                         dir: String, kind: String): Unit =
    writeKind(spark, dir, kind)

  private def writeKind(spark: org.apache.spark.sql.SparkSession, dir: String,
                        kind: String): Unit =
    writeScalarFile(spark, dir, "_graft_kind", kind)

  private def writeScalarFile(spark: org.apache.spark.sql.SparkSession, dir: String,
                              name: String, value: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name")
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }

  private def readScalarFile(spark: org.apache.spark.sql.SparkSession, dir: String,
                             name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  /** Snapshot-resolved read of the layout's live rows — THE read path
    * for every serving entry point. Before the first compaction this
    * is exactly `spark.read.parquet(dir)` (same plan, zero overhead);
    * after one it resolves the [[CellSnapshot]] manifest, so
    * maintenance can publish atomically while readers keep a
    * consistent view (see [[compactPartitioned]]).
    */
  def readLayout(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    CellSnapshot.read(spark, dir, "", "cell")

  /** TIME-TRAVEL read: the layout AS OF published snapshot `version`
    * ([[CellSnapshot.readAt]]) — pin the version a training run
    * consumed and re-reading it stays bit-identical through later
    * compactions (until [[vacuumPartitioned]] reclaims it). Versions
    * come from [[CellSnapshot.version]] after each publish.
    */
  def readLayoutAt(spark: org.apache.spark.sql.SparkSession, dir: String,
                   version: Int): DataFrame =
    CellSnapshot.readAt(spark, dir, "", "cell", version)

  /** Reclaim subtrees superseded by compactions ([[CellSnapshot.vacuum]]):
    * storage GC on the takedown pipeline's cadence — safe once no
    * reader still serves a pre-vacuum snapshot.
    */
  def vacuumPartitioned(spark: org.apache.spark.sql.SparkSession, dir: String,
                        keep: Int = 1): Unit =
    CellSnapshot.vacuum(spark, dir, Seq(""), "cell", keep)

  /** Policy-driven GC ([[CellSnapshot.retain]]): keep the current
    * version, every [[CellSnapshot.pin]]ned version (live training
    * runs), and versions younger than `maxAge` — the scheduler-facing
    * retention knob a production job runs nightly.
    */
  def retainPartitioned(spark: org.apache.spark.sql.SparkSession, dir: String,
                        maxAge: java.time.Duration = java.time.Duration.ZERO): Unit =
    CellSnapshot.retain(spark, dir, Seq(""), "cell", maxAge)

  /** [[writePartitioned]] once per dir, with the same content-
    * fingerprint staleness check as `Hnsw.ensureSaved` — the
    * amortization point for serving repeated probes from one layout.
    */
  def ensurePartitioned(embeddings: DataFrame, c: Int, dir: String): Unit = {
    val spark = embeddings.sparkSession
    val fp = IndexMeta.cachedFingerprint(dir, s"ivf_c=$c", Seq(embeddings)) {
      IndexMeta.fingerprint(embeddings, s"ivf_c=$c")
    }
    if (!IndexMeta.valid(spark, dir, "_SUCCESS", fp)) {
      writePartitioned(embeddings, c, dir)
      IndexMeta.write(spark, dir, fp)
    }
  }

  /** [[writePartitionedWith]] once per dir (explicit centroids — the
    * k-means-refined serving layout).
    */
  def ensurePartitionedWith(embeddings: DataFrame, cents: DataFrame, dir: String,
                            tag: String, kind: String = "plain"): Unit = {
    val spark = embeddings.sparkSession
    val fp = IndexMeta.cachedFingerprint(dir, s"ivfw_$tag", Seq(embeddings, cents)) {
      IndexMeta.fingerprint(embeddings,
        s"ivfw_$tag;c=${IndexMeta.centroidFingerprint(cents)}")
    }
    if (!IndexMeta.valid(spark, dir, "_SUCCESS", fp)) {
      writePartitionedWith(embeddings, cents, dir, kind)
      IndexMeta.write(spark, dir, fp)
    }
  }

  /** Top-k over the partitioned layout for a SINGLE query row (same
    * contract as [[topK]]): the `cell IN probed` filter is a partition
    * filter, so only nprobe/C of the files are read. Centroids come
    * from the `_centroids` sidecar — the probe never touches unprobed
    * data files at all.
    *
    * `predicate` (filtered ANN: "nearest neighbors WHERE attr = x") is
    * applied to the stored rows directly above the pruned scan, so a
    * scan-pushable predicate lands in `PushedFilters` and filtered rows
    * are dropped before any distance arithmetic. Candidates come from
    * the probed cells only — the filter narrows the candidate set, it
    * does not widen the probe.
    */
  def topKPartitioned(spark: org.apache.spark.sql.SparkSession, dir: String,
                      queries: DataFrame, k: Int, nprobe: Int,
                      roundTo: Int = 6, predicate: Option[Column] = None,
                      excluded: Option[DataFrame] = None): DataFrame = {
    val (stored, cents) = readLayoutWithCentroids(spark, dir)
    // collect() here moves exactly `nprobe` cell IDS (a handful of
    // longs) to the driver — required to form the partition filter
    // below; the vector data itself never leaves the executors
    val probed = cents.crossJoin(broadcast(queries))
      .select(col("centroid_id"),
        l2Distance(col("centroid_vec"), col("query_vec")).as("qdist"))
      .orderBy(col("qdist"), col("centroid_id"))
      .limit(nprobe)
      .collect().map(_.getLong(0))
    val pruned = stored.filter(col("cell").isin(probed: _*)) // partition-pruned
    withoutExcluded(predicate.fold(pruned)(pruned.filter), excluded)
      .crossJoin(broadcast(queries))
      .select(col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), roundTo).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** Drop `excluded(vec_id)` rows (index tombstones) from a candidate
    * set via a broadcast anti-join — O(1) plan nodes regardless of how
    * many ids are tombstoned (never an `isin` literal list), and the
    * tombstone set is contractually small (bounded by takedown rate ×
    * compaction cadence — [[Tombstones]]), so the broadcast is safe.
    */
  private[operators] def withoutExcluded(candidates: DataFrame, excluded: Option[DataFrame]): DataFrame =
    excluded.fold(candidates) { dels =>
      candidates.join(broadcast(dels.select(col("vec_id")).distinct()),
        Seq("vec_id"), "left_anti")
    }

  /** [[topKPartitioned]] under the layout's `_deletes` tombstones — the
    * serving path between a takedown and the next [[compactPartitioned]]
    * (same contract as `Hnsw.searchLatestGeneration`): recorded ids are
    * excluded from results immediately, with no layout rewrite. Falls
    * back to the plain path when nothing is deleted.
    */
  def topKPartitionedWithDeletes(spark: org.apache.spark.sql.SparkSession, dir: String,
                                 queries: DataFrame, k: Int, nprobe: Int,
                                 roundTo: Int = 6): DataFrame =
    topKPartitioned(spark, dir, queries, k, nprobe, roundTo,
      excluded = Tombstones.ids(spark, dir))

  /** [[topKPartitionedBatch]] under the layout's tombstones. */
  def topKPartitionedBatchWithDeletes(spark: org.apache.spark.sql.SparkSession, dir: String,
                                      queries: DataFrame, k: Int, nprobe: Int,
                                      roundTo: Int = 6): DataFrame =
    topKPartitionedBatch(spark, dir, queries, k, nprobe, roundTo,
      excluded = Tombstones.ids(spark, dir))

  /** Record takedown ids against a cell-partitioned layout (appends to
    * the `_deletes` sidecar; see [[Tombstones]]).
    */
  def recordDeletes(spark: org.apache.spark.sql.SparkSession, dir: String,
                    ids: DataFrame): Unit =
    Tombstones.record(spark, dir, ids)

  /** Fold the tombstones into the cell-partitioned layout: ONLY the
    * cells that hold deleted rows are rebuilt — their surviving rows
    * are written as a NEW immutable generation ([[CellSnapshot]]
    * `_gen/g=N` subtrees) and the manifest flips atomically; every
    * untouched cell's files are not touched at all, and no published
    * file is ever deleted or renamed, so a reader that planned against
    * the previous snapshot keeps a consistent view (no missing cells)
    * while — and after — compaction runs. Compaction I/O is
    * proportional to the AFFECTED cells (≤ |tombstones| of them),
    * never to the layout size; superseded subtrees are reclaimed by
    * [[vacuumPartitioned]] on the caller's cadence.
    * The `_deletes` sidecar is cleared and the layout's source
    * fingerprint is invalidated: the compacted layout no longer derives
    * from its source table, so a later `ensurePartitioned` against the
    * UNCHANGED source rebuilds in full — and resurrects the deleted
    * rows. That is deliberate: tombstones cover the serving gap between
    * a takedown and the upstream source-of-record cleanup; the takedown
    * pipeline must also delete from the source table.
    */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val dels = Tombstones.ids(spark, dir).getOrElse(return)
    val stored = readLayout(spark, dir)
    // affected cell ids: ≤ |tombstones| longs to the driver (needed to
    // form the partition filter and the manifest delta)
    // cast: the partition column's read type is inferred (int for small
    // cell ids), while centroid ids are long everywhere else
    val affected = stored.join(broadcast(dels.select("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("cell").cast("long")).distinct().collect().map(_.getLong(0))
    if (affected.nonEmpty) {
      val (v, m) = CellSnapshot.mappingOrBase(spark, dir, "", "cell")
      val g = v + 1
      val out = CellSnapshot.genRoot(dir, "", g)
      // rebuild ONLY the affected cells' rows (partition-pruned read)
      // into the next generation's tree — never over the input files
      stored.filter(col("cell").isin(affected: _*))
        .join(broadcast(dels.select("vec_id")), Seq("vec_id"), "left_anti")
        .write.mode("overwrite").partitionBy("cell").parquet(out)
      // a cell whose every row was deleted has no staged subtree — it
      // simply leaves the manifest (its centroid stays; a probe of it
      // reads zero rows)
      val survived = CellSnapshot.listParts(spark, out, "cell")
      CellSnapshot.publish(spark, dir, g, m -- affected ++ survived.map(_ -> g))
    }
    Tombstones.clear(spark, dir)
    // compaction only REMOVES rows, so the stale radii over-estimate —
    // still lossless for pruning — but regenerating costs one narrow
    // scan, so keep the sidecar's meaning exact rather than "some
    // upper bound of unknown vintage"
    dropRadii(spark, dir)
    IndexMeta.invalidate(spark, dir)
  }

  /** The layout's SERVING centroids, resolved consistently with the
    * data snapshot: the NEWEST generation-scoped sidecar
    * (`_centroids_g{v'}`, written by [[reclusterPartitioned]] for the
    * manifest version it publishes) with `v' <=` the current manifest
    * version, falling back to the build-time flat `_centroids`. The
    * "newest at-or-below" rule is what makes the whole lifecycle
    * atomic: a recluster at version g writes `_centroids_g{g}` and
    * LATER maintenance that bumps the version without moving cells
    * ([[insertInto]] appends, [[compactPartitioned]]) keeps resolving
    * g's centroids — never the pre-recluster flat file — while a
    * reader still pinned before g resolves the flat build-time
    * centroids it was built with. Published centroid files are
    * immutable (nothing ever rewrites `_centroids` in place), so
    * every version's routing is torn-proof by construction. Before the
    * first recluster no generation sidecar exists and this is exactly
    * the flat read (zero overhead beyond one directory listing).
    */
  def centroidsOf(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    CellSnapshot.version(spark, dir) match {
      case Some(v) => centroidsAt(spark, dir, v)
      case None    => spark.read.parquet(s"$dir/_centroids")
    }

  /** The centroids that pair with [[readLayoutAt]] `version` — the
    * newest `_centroids_g{v'}` with `v' <= version`, else the flat
    * build-time `_centroids` (see [[centroidsOf]] for why
    * at-or-below). Pin both halves of a time-travel read with this.
    */
  def centroidsAt(spark: org.apache.spark.sql.SparkSession, dir: String,
                  version: Int): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens =
      if (!fs.exists(root)) Array.empty[Int]
      else fs.listStatus(root).map(_.getPath.getName)
        .collect { case n if n.startsWith("_centroids_g") =>
          n.stripPrefix("_centroids_g") }
        .flatMap(s => scala.util.Try(s.toInt).toOption)
        .filter(_ <= version)
    if (gens.isEmpty) spark.read.parquet(s"$dir/_centroids")
    else spark.read.parquet(s"$dir/_centroids_g${gens.max}")
  }

  /** Both halves of the serving state — live rows AND routing
    * centroids — resolved against ONE manifest version. Every serving
    * path that needs both must use this (not separate [[readLayout]] +
    * [[centroidsOf]] calls): the two reads each re-list `_manifests`,
    * so a recluster publishing between them would hand one query new
    * centroids over the old cell scan (or vice versa). Resolving the
    * version once pins data and routing to the same snapshot.
    */
  def readLayoutWithCentroids(spark: org.apache.spark.sql.SparkSession,
                              dir: String): (DataFrame, DataFrame) =
    CellSnapshot.version(spark, dir) match {
      case Some(v) => (readLayoutAt(spark, dir, v), centroidsAt(spark, dir, v))
      case None    => (CellSnapshot.read(spark, dir, "", "cell"),
                       spark.read.parquet(s"$dir/_centroids"))
    }

  /** Per-cell occupancy of the serving layout: `(cell, n_rows)` over
    * LIVE rows — the balance diagnostic that decides when to
    * [[reclusterPartitioned]] (incremental [[insertInto]] batches keep
    * the build-time Voronoi cells, so a drifted ingest stream piles
    * into few cells and probe cost skews with it). The aggregation
    * reads only `(vec_id, cell)` — cell is the partition value and
    * vec_id is one narrow column, so the scan never touches the
    * vectors; tombstoned rows are excluded (they occupy files but no
    * longer serve).
    */
  def cellStats(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    withoutExcluded(
        readLayout(spark, dir).select(col("vec_id"), col("cell")),
        Tombstones.ids(spark, dir))
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_rows"))

  /** Cell-balance SKEW factor of the serving layout: max/mean live
    * cell occupancy over the centroid set (empty cells count as 0 —
    * a drained cell is exactly the imbalance this measures). 1.0 is
    * perfectly balanced; probe latency degrades with the factor, since
    * a probe's cost is the cells it opens. One [[cellStats]] pass +
    * a C-row aggregate.
    */
  def cellSkew(spark: org.apache.spark.sql.SparkSession, dir: String): Double = {
    val c = centroidsOf(spark, dir).count().toDouble
    val r = cellStats(spark, dir)
      .agg(max("n_rows").cast("double").as("mx"), sum("n_rows").cast("double").as("tot"))
      .head()
    if (r.isNullAt(1) || r.getDouble(1) == 0.0) 1.0
    else r.getDouble(0) / (r.getDouble(1) / c)
  }

  /** The recluster SCHEDULING TRIGGER: true once [[cellSkew]] crosses
    * `maxSkew` — the check a maintenance job runs per ingest window so
    * [[reclusterPartitioned]] (full-layout I/O) fires on drift, not on
    * a timer.
    */
  def needsRecluster(spark: org.apache.spark.sql.SparkSession, dir: String,
                     maxSkew: Double = 4.0): Boolean =
    cellSkew(spark, dir) >= maxSkew

  /** Retrain serving centroids from the layout's OWN live rows — the
    * centroid half of an automated drift repair ([[reclusterPartitioned]]
    * is the data half). Seeds are the `c` first rows in deterministic
    * hash order (one TakeOrdered pass — a per-partition heap, never a
    * global sort): hash order mixes base and drifted arrivals, the
    * reclusterscale lesson that a contiguous seed window cannot migrate
    * across a distribution gap in few Lloyd rounds. The rows (and hence
    * the trained centroids) live in the layout's stored vector space —
    * raw, normalized, or augmented — which is exactly what
    * [[reclusterPartitioned]] assigns against, so one retrain entry
    * point serves all three metric layouts.
    */
  def retrainCentroids(spark: org.apache.spark.sql.SparkSession, dir: String,
                       c: Int, iters: Int = 1): DataFrame = {
    val live = withoutExcluded(readLayout(spark, dir).drop("cell"),
      Tombstones.ids(spark, dir))
    val spread = live
      .select(col("vec_id"), col("embedding"))
      .orderBy(pmod(graft.functions.Portable.md5Int(col("vec_id").cast("string")),
        lit(Int.MaxValue)), col("vec_id"))
      .limit(c)
    val seeds = spread
      .select(row_number().over(Window.orderBy(col("vec_id"))).cast("long").as("rid"),
        transform(col("embedding"), x => x.cast("double")).as("centroid_vec"))
      .select((col("rid") - 1).as("centroid_id"), col("centroid_vec"))
    kmeansWith(live, seeds, iters)
  }

  /** RECLUSTER maintenance — the drift repair after enough
    * [[insertInto]] batches skew the layout ([[compactPartitioned]] is
    * the remove half; this is the re-balance): re-assign every LIVE
    * row to `newCents` and publish the re-partitioned tree as the next
    * snapshot generation. Semantics: the reclustered layout serves
    * exactly like a fresh [[writePartitionedWith]] build over its live
    * rows with the same centroids — that equality is the declared
    * query's oracle (the `q_ivf_insert_topk` pattern, one lifecycle
    * step further).
    *
    * Cost and atomicity at scale: one full-layout read + one
    * partitioned write — the same I/O as the original build, which is
    * the honest price of moving every row's cell; run it on the drift
    * cadence, not per batch ([[cellStats]] is the trigger). The new
    * generation's tree and its generation-scoped centroid sidecar are
    * both staged BEFORE the one-file manifest flip, so concurrent
    * readers see either the old layout with old centroids or the new
    * with new — never a torn mix (see [[centroidsOf]]). Tombstones are
    * folded in (a recluster is also a compaction) and cleared; radii
    * are dropped (cell membership moved — [[ensureRadii]] regenerates
    * on the next range query); the source fingerprint is invalidated
    * like every other maintenance write.
    *
    * `newCents` must live in the SAME vector space the layout stores
    * (raw floats for `plain`, unit doubles for `cosine`, augmented
    * doubles for `mips`) — assignment runs over stored rows as-is.
    */
  def reclusterPartitioned(spark: org.apache.spark.sql.SparkSession, dir: String,
                           newCents: DataFrame): Unit = {
    val live = withoutExcluded(readLayout(spark, dir).drop("cell"),
      Tombstones.ids(spark, dir))
    val (v, _) = CellSnapshot.mappingOrBase(spark, dir, "", "cell")
    val g = v + 1
    val out = CellSnapshot.genRoot(dir, "", g)
    live.join(assignWith(live, newCents), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(out)
    // stage the generation-scoped centroids BEFORE the manifest flip —
    // the flip is the single atomic publish point for data AND routing
    newCents.write.mode("overwrite").parquet(s"$dir/_centroids_g$g")
    val parts = CellSnapshot.listParts(spark, out, "cell")
    CellSnapshot.publish(spark, dir, g, parts.map(_ -> g).toMap)
    // the flat `_centroids` is NOT rewritten: published centroid files
    // are immutable, and [[centroidsOf]]'s newest-at-or-below rule
    // routes every version at or past g to `_centroids_g{g}` while
    // readers pinned before g keep the build-time flat file
    Tombstones.clear(spark, dir)
    dropRadii(spark, dir)
    IndexMeta.invalidate(spark, dir)
  }

  /** Payload-agnostic recluster body shared by the ENCODED layouts
    * whose per-row payload is cell-independent (plain PQ codes, SQ8
    * codes): live rows keep their payload byte-for-byte, assignment is
    * re-derived from `source` (the raw vector table — codes carry no
    * geometry), and the re-partitioned tree publishes atomically with
    * the generation-scoped centroid sidecar (the
    * [[reclusterPartitioned]] protocol). Guards live in the per-layout
    * wrappers (`Pq.reclusterEncodedPartitioned`,
    * `Sq.reclusterEncodedPartitioned`) — the coverage check here
    * protects every caller from an inner join silently dropping index
    * rows whose id is missing from `source`.
    */
  private[operators] def reclusterPayloadPartitioned(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      source: DataFrame, newCents: DataFrame): Unit = {
    val live = withoutExcluded(readLayout(spark, dir).drop("cell"),
      Tombstones.ids(spark, dir))
    // coverage guard folded INTO the rewrite pass (a left join whose
    // null cells raise): an inner join would silently DROP live rows
    // missing from `source`, and a separate count-compare pre-flight
    // would cost a second full assignment pass — at the layout sizes
    // recluster exists for, the single-pass form is the honest one
    // duplicate vec_ids in the caller-supplied source would fan live
    // rows out through the left join, duplicating index rows in the
    // published generation — collapse the assignment to one row per id
    // (the assignment relation is narrow: (vec_id, cell) only)
    val moved = live.join(
        assignWith(source, newCents).dropDuplicates("vec_id"),
        Seq("vec_id"), "left")
      .withColumn("cell",
        when(col("cell").isNotNull, col("cell")).otherwise(
          raise_error(concat(lit("recluster: live row "),
            col("vec_id").cast("string"),
            lit(" is missing from the source vector table — it covers only part " +
              "of the layout; pass the table the layout was encoded from")))
            .cast("long")))
    val (v, _) = CellSnapshot.mappingOrBase(spark, dir, "", "cell")
    val g = v + 1
    val out = CellSnapshot.genRoot(dir, "", g)
    moved.write.mode("overwrite").partitionBy("cell").parquet(out)
    newCents.write.mode("overwrite").parquet(s"$dir/_centroids_g$g")
    val parts = CellSnapshot.listParts(spark, out, "cell")
    CellSnapshot.publish(spark, dir, g, parts.map(_ -> g).toMap)
    // flat `_centroids` stays immutable — see [[reclusterPartitioned]]
    Tombstones.clear(spark, dir)
    IndexMeta.invalidate(spark, dir)
  }

  /** The full insert-then-recluster lifecycle, memoized once per dir —
    * build on `base` with `buildCents`, [[insertInto]] `fresh`, then
    * [[reclusterPartitioned]] onto `newCents` (the declared
    * `q_ivf_recluster_topk` state; the `ensureInsertedPartitioned`
    * pattern one maintenance step further).
    */
  def ensureReclusteredPartitioned(base: DataFrame, fresh: DataFrame,
                                   buildCents: DataFrame, newCents: DataFrame,
                                   dir: String, tag: String): Unit = {
    val spark = base.sparkSession
    val fp = IndexMeta.cachedFingerprint(dir, s"ivfrec_$tag",
        Seq(base, fresh, buildCents, newCents)) {
      val cb = IndexMeta.centroidFingerprint(buildCents)
      val cn = IndexMeta.centroidFingerprint(newCents)
      s"${IndexMeta.fingerprint(base, s"ivfrec_$tag;cb=$cb;cn=$cn;base")}|" +
        IndexMeta.fingerprint(fresh, "fresh")
    }
    if (!IndexMeta.valid(spark, dir, "_SUCCESS", fp)) {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      writePartitionedWith(base, buildCents, dir)
      insertInto(spark, dir, fresh)
      reclusterPartitioned(spark, dir, newCents)
      IndexMeta.write(spark, dir, fp)
    }
  }

  // ------------------------------------------------------------------
  // Range (radius) search
  // ------------------------------------------------------------------

  private def radiiPath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/_radii")

  private def dropRadii(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val p = radiiPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Per-cell covering radii (`_radii` sidecar): for each cell, the
    * max L2 distance from any member to the cell centroid. Written
    * once per layout — ONE narrow scan, amortized like the build
    * itself — and invalidated by [[insertInto]]/[[compactPartitioned]]
    * (membership changes move the covering radius). Range serving uses
    * it to skip whole cells by the triangle inequality:
    * `‖q−x‖ ≥ ‖q−c‖ − rad(cell)` for every member x, so a cell with
    * `‖q−c‖ − rad(cell) > r` can hold NO result — the pruning is
    * lossless, never a recall trade.
    */
  def ensureRadii(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val p = radiiPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val cents = centroidsOf(spark, dir)
      readLayout(spark, dir)
        .join(broadcast(cents), col("cell") === col("centroid_id"))
        .groupBy(col("cell").cast("long").as("cell"))
        .agg(
          max(l2Distance(col("embedding"), col("centroid_vec"))).as("radius"),
          // per-cell max squared norm: the MIPS similarity-floor bound
          // needs it (d² = ‖q‖² + ‖x‖² − 2·dot); L2/cosine ignore it
          max(dotProduct(col("embedding"), col("embedding"))).as("normsq"))
        .write.mode("overwrite").parquet(s"$dir/_radii")
    }
  }

  /** RANGE search over the partitioned layout: every vector within
    * `radius` of the query (rounded distance ≤ radius, ties ordered by
    * id) — the "find all matches" twin of [[topKPartitioned]], the
    * shape dedup/recommendation pipelines ask when k is unknown.
    * Cells are pruned with the [[ensureRadii]] triangle-inequality
    * bound — LOSSLESSLY, so the result equals a full-scan filter and
    * hash-checks against a one-line DuckDB oracle (the bound carries a
    * +10^-roundTo margin so boundary rows that ROUND into the radius
    * are never lost to raw-double pruning).
    *
    * Scale shape: the probe arithmetic runs on C (cell, centroid,
    * radius) rows; only eligible cells' files are opened (partition
    * filter). On clustered corpora — real embedding spaces — most
    * cells fail the bound and are never read (IvfRangeSpec proves the
    * skip on a clustered fixture); on uniform unit-sphere data every
    * cell intersects every query ball and nothing prunes, which is a
    * property of the data, not the operator.
    */
  def rangeSearch(spark: org.apache.spark.sql.SparkSession, dir: String,
                  queries: DataFrame, radius: Double, roundTo: Int = 6,
                  predicate: Option[Column] = None,
                  excluded: Option[DataFrame] = None,
                  ordered: Boolean = true): DataFrame = {
    ensureRadii(spark, dir)
    val (stored, cents) = readLayoutWithCentroids(spark, dir)
    val radii = spark.read.parquet(s"$dir/_radii")
    // ≤ C eligible cell ids to the driver — the partition filter, same
    // contract as topKPartitioned's nprobe collect
    val eligible = cents.join(radii, col("centroid_id") === col("cell"))
      .crossJoin(broadcast(queries))
      .filter(l2Distance(col("centroid_vec"), col("query_vec")) - col("radius")
        <= lit(radius) + lit(math.pow(10.0, -roundTo)))
      .select(col("centroid_id")).collect().map(_.getLong(0))
    val pruned = stored.filter(col("cell").isin(eligible.toIndexedSeq: _*))
    orderedRange(withoutExcluded(predicate.fold(pruned)(pruned.filter), excluded)
      .crossJoin(broadcast(queries))
      .select(col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), roundTo).as("dist"))
      .filter(col("dist") <= radius),
      ordered, col("dist"), col("vec_id"))
  }

  /** Range results are SETS; the `orderBy` forms are the oracle
    * anchors (deterministic row order for hashing), but a serving tier
    * must not pay a global sort of an unbounded result set — `ordered
    * = false` returns the same rows with no Sort/Exchange at the top
    * (IvfRangeSpec pins set equality).
    */
  private def orderedRange(df: DataFrame, ordered: Boolean, by: Column*): DataFrame =
    if (ordered) df.orderBy(by: _*) else df

  /** BATCH range search: `(query_id, query_vec)` rows in, every
    * `(query_id, vec_id, dist ≤ radius)` pair out. Per-query eligible
    * cells come from the same lossless triangle-inequality bound,
    * computed executor-side (C×Q rows — never collected); the scan is
    * pruned to the UNION of eligible cells (≤ C ids to the driver);
    * each candidate is scored only against the queries whose ball
    * intersects ITS cell — the same join geometry as
    * [[topKPartitionedBatch]], without the heap (range output is
    * unbounded by design).
    */
  def rangeSearchBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                       queries: DataFrame, radius: Double,
                       roundTo: Int = 6, predicate: Option[Column] = None,
                       ordered: Boolean = true,
                       excluded: Option[DataFrame] = None): DataFrame = {
    ensureRadii(spark, dir)
    val (stored, cents) = readLayoutWithCentroids(spark, dir)
    val radii = spark.read.parquet(s"$dir/_radii")
    val probePairs = cents.join(radii, col("centroid_id") === col("cell"))
      .drop("cell")
      .crossJoin(broadcast(queries))
      .filter(l2Distance(col("centroid_vec"), col("query_vec")) - col("radius")
        <= lit(radius) + lit(math.pow(10.0, -roundTo)))
      .select(col("query_id"), col("centroid_id").as("cell"))
    val unionCells = probePairs.select("cell").distinct().collect().map(_.getLong(0))
    val pruned = stored.filter(col("cell").isin(unionCells.toIndexedSeq: _*))
    orderedRange(withoutExcluded(predicate.fold(pruned)(pruned.filter), excluded)
      .join(broadcast(probePairs), Seq("cell")) // predicate scan-pushable → PushedFilters
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), roundTo).as("dist"))
      .filter(col("dist") <= radius),
      ordered, col("query_id"), col("dist"), col("vec_id"))
  }

  /** [[rangeSearch]] under the layout's `_deletes` tombstones — the
    * takedown contract on the range path (same sidecar as
    * [[topKPartitionedWithDeletes]]): recorded ids never appear in a
    * range result, no layout rewrite.
    */
  def rangeSearchWithDeletes(spark: org.apache.spark.sql.SparkSession, dir: String,
                             queries: DataFrame, radius: Double,
                             roundTo: Int = 6): DataFrame =
    rangeSearch(spark, dir, queries, radius, roundTo,
      excluded = Tombstones.ids(spark, dir))

  /** COSINE range search over an [[ensurePartitionedCosine]] layout:
    * every vector with cosine similarity ≥ `minSim` to the query. On
    * the unit sphere `cos = 1 − ‖û−v̂‖²/2`, so the similarity floor is
    * the L2 ball of radius `√(2(1−minSim))` around the normalized
    * query — the SAME lossless triangle-inequality cell pruning as
    * [[rangeSearch]] (the bound carries the rounding margin inside
    * the radicand, so boundary rows that ROUND up to `minSim` are
    * never lost). Results are scored in cosine, highest first.
    */
  def cosineRangeSearch(spark: org.apache.spark.sql.SparkSession, dir: String,
                        queries: DataFrame, minSim: Double,
                        roundTo: Int = 6, predicate: Option[Column] = None,
                        ordered: Boolean = true,
                        excluded: Option[DataFrame] = None): DataFrame = {
    ensureRadii(spark, dir)
    val qn = normalizedQuery(queries)
    val r = math.sqrt(2.0 * (1.0 - minSim) + math.pow(10.0, -roundTo))
    val (stored, cents) = readLayoutWithCentroids(spark, dir)
    val radii = spark.read.parquet(s"$dir/_radii")
    val eligible = cents.join(radii, col("centroid_id") === col("cell"))
      .crossJoin(broadcast(qn))
      .filter(l2Distance(col("centroid_vec"), col("query_vec")) - col("radius") <= lit(r))
      .select(col("centroid_id")).collect().map(_.getLong(0))
    val pruned = stored.filter(col("cell").isin(eligible.toIndexedSeq: _*)) // partition-pruned
    orderedRange(withoutExcluded(predicate.fold(pruned)(pruned.filter), excluded)
      .crossJoin(broadcast(qn))
      .select(col("vec_id"),
        round(lit(1.0) - l2DistanceSq(col("embedding"), col("query_vec")) / lit(2.0),
          roundTo).as("cos_sim"))
      .filter(col("cos_sim") >= minSim),
      ordered, col("cos_sim").desc, col("vec_id"))
  }

  /** BATCH cosine range search — [[rangeSearchBatch]]'s join geometry
    * on the normalized layout: every query's similarity floor is the
    * SAME L2 ball radius `√(2(1−minSim) + margin)` around its
    * normalized vector, so per-query eligible cells come from one
    * executor-side C×Q bound pass, the scan is pruned to the union
    * (≤ C ids to the driver), and each candidate is scored only
    * against the queries whose ball intersects ITS cell.
    */
  def cosineRangeSearchBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                             queries: DataFrame, minSim: Double,
                             roundTo: Int = 6, predicate: Option[Column] = None,
                             ordered: Boolean = true,
                             excluded: Option[DataFrame] = None): DataFrame = {
    ensureRadii(spark, dir)
    val qn = queries.select(col("query_id"),
      transform(col("query_vec"), x => x / l2Norm(col("query_vec"))).as("query_vec"))
    val r = math.sqrt(2.0 * (1.0 - minSim) + math.pow(10.0, -roundTo))
    val (stored, cents) = readLayoutWithCentroids(spark, dir)
    val radii = spark.read.parquet(s"$dir/_radii")
    val probePairs = cents.join(radii, col("centroid_id") === col("cell"))
      .drop("cell")
      .crossJoin(broadcast(qn))
      .filter(l2Distance(col("centroid_vec"), col("query_vec")) - col("radius") <= lit(r))
      .select(col("query_id"), col("centroid_id").as("cell"))
    val unionCells = probePairs.select("cell").distinct().collect().map(_.getLong(0))
    val pruned = stored.filter(col("cell").isin(unionCells.toIndexedSeq: _*))
    orderedRange(withoutExcluded(predicate.fold(pruned)(pruned.filter), excluded)
      .join(broadcast(probePairs), Seq("cell"))
      .join(broadcast(qn), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(lit(1.0) - l2DistanceSq(col("embedding"), col("query_vec")) / lit(2.0),
          roundTo).as("cos_sim"))
      .filter(col("cos_sim") >= minSim),
      ordered, col("query_id"), col("cos_sim").desc, col("vec_id"))
  }

  /** [[rangeSearchBatch]] under the layout's tombstones — the batch
    * serving form honors takedowns exactly like the single-query path
    * (same broadcast anti-join above the pruned scan).
    */
  def rangeSearchBatchWithDeletes(spark: org.apache.spark.sql.SparkSession, dir: String,
                                  queries: DataFrame, radius: Double,
                                  roundTo: Int = 6): DataFrame =
    rangeSearchBatch(spark, dir, queries, radius, roundTo,
      excluded = Tombstones.ids(spark, dir))

  /** [[cosineRangeSearch]] under the layout's tombstones (shared
    * `_deletes` contract — the similarity-floor twin of
    * [[rangeSearchWithDeletes]]).
    */
  def cosineRangeSearchWithDeletes(spark: org.apache.spark.sql.SparkSession, dir: String,
                                   queries: DataFrame, minSim: Double,
                                   roundTo: Int = 6): DataFrame =
    cosineRangeSearch(spark, dir, queries, minSim, roundTo,
      excluded = Tombstones.ids(spark, dir))

  /** MIPS range search over an [[ensurePartitionedMips]] layout: every
    * vector with inner product ≥ `minDot` — the third member of the
    * range family (L2 ball, cosine floor, dot floor). In the augmented
    * space `d(q̂,x̂)² = ‖q̂‖² + ‖x̂‖² − 2·dot(q,x)` (the query's extra
    * coordinate is 0, so the augmented dot IS the raw dot), so
    * `dot ≥ t` confines members to an L2 ball whose radius depends on
    * the member's norm — bounded per cell by the `_radii` sidecar's
    * max squared norm: a cell is skipped only when
    * `(d(q̂,c) − rad)² > ‖q̂‖² + maxnormsq(cell) − 2t + margin` (with
    * `d(q̂,c) > rad`), which no member within the floor can violate —
    * LOSSLESS, so the oracle is a plain full-scan dot filter.
    */
  def mipsRangeSearch(spark: org.apache.spark.sql.SparkSession, dir: String,
                      queries: DataFrame, minDot: Double,
                      roundTo: Int = 6, predicate: Option[Column] = None,
                      ordered: Boolean = true,
                      excluded: Option[DataFrame] = None): DataFrame = {
    ensureRadii(spark, dir)
    val qa = augmentedQuery(queries)
    val (stored, cents) = readLayoutWithCentroids(spark, dir)
    val radii = spark.read.parquet(s"$dir/_radii")
    val lb = l2Distance(col("centroid_vec"), col("query_vec")) - col("radius")
    val rsq = dotProduct(col("query_vec"), col("query_vec")) + col("normsq") -
      lit(2.0 * minDot) + lit(math.pow(10.0, -roundTo))
    val eligible = cents.join(radii, col("centroid_id") === col("cell"))
      .crossJoin(broadcast(qa))
      .filter(lb <= lit(0.0) || lb * lb <= rsq)
      .select(col("centroid_id")).collect().map(_.getLong(0))
    val pruned = stored.filter(col("cell").isin(eligible.toIndexedSeq: _*)) // partition-pruned
    orderedRange(withoutExcluded(predicate.fold(pruned)(pruned.filter), excluded)
      .crossJoin(broadcast(qa))
      .select(col("vec_id"),
        round(dotProduct(col("embedding"), col("query_vec")), roundTo).as("ip"))
      .filter(col("ip") >= minDot),
      ordered, col("ip").desc, col("vec_id"))
  }

  /** BATCH MIPS range search — [[rangeSearchBatch]]'s join geometry
    * on the augmented layout: each (cell, query) pair passes the same
    * lossless per-cell bound as [[mipsRangeSearch]] (`(d(q̂,c) − rad)²
    * ≤ ‖q̂‖² + maxnormsq(cell) − 2t + margin` unless the ball contains
    * the centroid), computed executor-side; one scan pruned to the
    * union of eligible cells serves the whole batch.
    */
  def mipsRangeSearchBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                           queries: DataFrame, minDot: Double,
                           roundTo: Int = 6, predicate: Option[Column] = None,
                           ordered: Boolean = true,
                           excluded: Option[DataFrame] = None): DataFrame = {
    ensureRadii(spark, dir)
    val qa = queries.select(col("query_id"),
      concat(transform(col("query_vec"), x => x.cast("double")), array(lit(0.0)))
        .as("query_vec"))
    val (stored, cents) = readLayoutWithCentroids(spark, dir)
    val radii = spark.read.parquet(s"$dir/_radii")
    val lb = l2Distance(col("centroid_vec"), col("query_vec")) - col("radius")
    val rsq = dotProduct(col("query_vec"), col("query_vec")) + col("normsq") -
      lit(2.0 * minDot) + lit(math.pow(10.0, -roundTo))
    val probePairs = cents.join(radii, col("centroid_id") === col("cell"))
      .drop("cell")
      .crossJoin(broadcast(qa))
      .filter(lb <= lit(0.0) || lb * lb <= rsq)
      .select(col("query_id"), col("centroid_id").as("cell"))
    val unionCells = probePairs.select("cell").distinct().collect().map(_.getLong(0))
    val pruned = stored.filter(col("cell").isin(unionCells.toIndexedSeq: _*))
    orderedRange(withoutExcluded(predicate.fold(pruned)(pruned.filter), excluded)
      .join(broadcast(probePairs), Seq("cell"))
      .join(broadcast(qa), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dotProduct(col("embedding"), col("query_vec")), roundTo).as("ip"))
      .filter(col("ip") >= minDot),
      ordered, col("query_id"), col("ip").desc, col("vec_id"))
  }

  /** [[cosineRangeSearchBatch]] under the layout's tombstones (the
    * batch similarity-floor serving form of the takedown contract).
    */
  def cosineRangeSearchBatchWithDeletes(spark: org.apache.spark.sql.SparkSession,
                                        dir: String, queries: DataFrame,
                                        minSim: Double, roundTo: Int = 6): DataFrame =
    cosineRangeSearchBatch(spark, dir, queries, minSim, roundTo,
      excluded = Tombstones.ids(spark, dir))

  /** [[mipsRangeSearch]] under the layout's tombstones (shared
    * `_deletes` contract — the dot-floor twin of
    * [[rangeSearchWithDeletes]]).
    */
  def mipsRangeSearchWithDeletes(spark: org.apache.spark.sql.SparkSession, dir: String,
                                 queries: DataFrame, minDot: Double,
                                 roundTo: Int = 6): DataFrame =
    mipsRangeSearch(spark, dir, queries, minDot, roundTo,
      excluded = Tombstones.ids(spark, dir))

  /** [[mipsRangeSearchBatch]] under the layout's tombstones (the
    * batch dot-floor serving form of the takedown contract).
    */
  def mipsRangeSearchBatchWithDeletes(spark: org.apache.spark.sql.SparkSession,
                                      dir: String, queries: DataFrame,
                                      minDot: Double, roundTo: Int = 6): DataFrame =
    mipsRangeSearchBatch(spark, dir, queries, minDot, roundTo,
      excluded = Tombstones.ids(spark, dir))

  /** Cell-local incremental insert — the append half of the layout
    * lifecycle ([[compactPartitioned]] is the remove half): assign
    * `rows(vec_id, embedding)` with the layout's own `_centroids`
    * sidecar and APPEND them to their cells. Only the receiving
    * `cell=` subtrees gain files; every other cell's files are not
    * touched at all — insert I/O is proportional to the batch, never
    * to the layout. Serving needs no change: the pruned probe scan
    * picks up appended files automatically, and assignment against
    * the UNCHANGED sidecar centroids is deterministic, so an
    * incrementally-grown layout serves identically to one built from
    * the union in a single pass (IvfInsertSpec pins this and the
    * byte-identity of non-receiving cells).
    *
    * The source fingerprint is invalidated: the layout no longer
    * derives from any single `ensurePartitioned` source, so a later
    * ensure against an updated source-of-record table rebuilds in
    * full — inserts cover the serving gap until then, mirroring the
    * tombstone contract on the delete side.
    */
  def insertInto(spark: org.apache.spark.sql.SparkSession, dir: String,
                 rows: DataFrame): Unit = {
    // raw float rows only fit a raw-float layout: a cosine layout
    // stores normalized doubles and a MIPS layout augmented doubles —
    // appending unmodified rows there would drift the parquet schema
    // and serve silently wrong results, so fail fast on the kind the
    // layout recorded at build time
    val kind = layoutKind(spark, dir)
    require(kind == "plain",
      s"Ivf.insertInto appends raw float vectors, but the layout at $dir stores " +
        s"'$kind' vectors (transformed doubles) — rebuild through " +
        "ensurePartitionedCosine/ensurePartitionedMips instead of appending")
    appendPrepared(spark, dir, rows)
  }

  /** [[insertInto]] for a COSINE layout: rows are unit-normalized (the
    * same transform [[ensurePartitionedCosine]] stores) before the
    * cell-local append, so a grown layout serves exactly like a
    * single-pass build.
    */
  def insertIntoCosine(spark: org.apache.spark.sql.SparkSession, dir: String,
                       rows: DataFrame): Unit = {
    val kind = layoutKind(spark, dir)
    require(kind == "cosine",
      s"Ivf.insertIntoCosine appends normalized vectors, but the layout at $dir " +
        s"stores '$kind' vectors")
    appendPrepared(spark, dir, normalized(rows))
  }

  /** [[insertInto]] for a MIPS layout: rows are augmented with the
    * layout's RECORDED build-time constant (`_graft_maxnorm`), not a
    * fresh max — the geometry every stored row already lives in. A new
    * row with norm > m clamps its extra coordinate to 0: its served
    * dot is still exact (see [[augmentedWith]]); only its cell
    * assignment degrades, so serving matches a single-pass build
    * whenever the base corpus contains the max-norm row.
    */
  def insertIntoMips(spark: org.apache.spark.sql.SparkSession, dir: String,
                     rows: DataFrame): Unit = {
    val kind = layoutKind(spark, dir)
    require(kind == "mips",
      s"Ivf.insertIntoMips appends augmented vectors, but the layout at $dir " +
        s"stores '$kind' vectors")
    val m = readScalarFile(spark, dir, "_graft_maxnorm").map(_.toDouble).getOrElse(
      throw new IllegalStateException(
        s"MIPS layout at $dir has no _graft_maxnorm sidecar — rebuild through " +
          "ensurePartitionedMips before appending"))
    appendPrepared(spark, dir, augmentedWith(rows, m))
  }

  /** Shared append tail: assign with the layout's frozen centroids,
    * cell-local append, drop the (now under-estimating) `_radii`
    * sidecar, invalidate the source fingerprint.
    */
  private def appendPrepared(spark: org.apache.spark.sql.SparkSession, dir: String,
                             prepared: DataFrame): Unit = {
    val cents = centroidsOf(spark, dir)
    CellSnapshot.appendAssigned(spark, dir,
      prepared.join(assignWith(prepared, cents), Seq("vec_id")))
    // inserted rows can EXTEND a cell's covering radius, so a stale
    // `_radii` sidecar would under-estimate and make range pruning
    // lossy — drop it (the next range serve regenerates in one scan)
    dropRadii(spark, dir)
    IndexMeta.invalidate(spark, dir)
  }

  /** Build-on-base + [[insertInto]]-the-rest, memoized — the
    * declared-query form of the incremental lifecycle (the IVF twin of
    * `Hnsw.ensureInsertedSaved`). `base` and `fresh` fingerprint
    * SEPARATELY: the same union under a different split is a different
    * I/O history, and the split IS what this layout witnesses.
    */
  def ensureInsertedPartitioned(base: DataFrame, fresh: DataFrame, cents: DataFrame,
                                dir: String, tag: String): Unit = {
    val spark = base.sparkSession
    val fp = IndexMeta.cachedFingerprint(dir, s"ivfins_$tag", Seq(base, fresh, cents)) {
      val c = IndexMeta.centroidFingerprint(cents)
      s"${IndexMeta.fingerprint(base, s"ivfins_$tag;c=$c;base")}|" +
        IndexMeta.fingerprint(fresh, "fresh")
    }
    if (!IndexMeta.valid(spark, dir, "_SUCCESS", fp)) {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      writePartitionedWith(base, cents, dir)
      insertInto(spark, dir, fresh)
      IndexMeta.write(spark, dir, fp)
    }
  }

  /** Build-on-base + [[insertIntoCosine]]-the-rest, memoized — the
    * cosine twin of [[ensureInsertedPartitioned]] (centroids seeded
    * from the NORMALIZED base, the same table the layout stores).
    */
  def ensureInsertedCosine(base: DataFrame, fresh: DataFrame, c: Int,
                           dir: String, tag: String): Unit = {
    val spark = base.sparkSession
    val fp = IndexMeta.cachedFingerprint(dir, s"cosins_$tag;c=$c", Seq(base, fresh)) {
      s"${IndexMeta.fingerprint(base, s"cosins_$tag;c=$c;base")}|" +
        IndexMeta.fingerprint(fresh, "fresh")
    }
    if (!IndexMeta.valid(spark, dir, "_SUCCESS", fp)) {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      val nb = normalized(base)
      writePartitionedWith(nb, centroids(nb, c), dir, kind = "cosine")
      insertIntoCosine(spark, dir, fresh)
      IndexMeta.write(spark, dir, fp)
    }
  }

  /** Build-on-base + [[insertIntoMips]]-the-rest, memoized — the MIPS
    * twin of [[ensureInsertedPartitioned]]: the augmentation constant
    * is the BASE corpus's max norm, recorded for the append (fresh
    * rows with a larger norm clamp — served dots stay exact).
    */
  def ensureInsertedMips(base: DataFrame, fresh: DataFrame, c: Int,
                         dir: String, tag: String): Unit = {
    val spark = base.sparkSession
    val fp = IndexMeta.cachedFingerprint(dir, s"mipsins_$tag;c=$c", Seq(base, fresh)) {
      s"${IndexMeta.fingerprint(base, s"mipsins_$tag;c=$c;base")}|" +
        IndexMeta.fingerprint(fresh, "fresh")
    }
    if (!IndexMeta.valid(spark, dir, "_SUCCESS", fp)) {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      val m = maxNormOf(base)
      val ab = augmentedWith(base, m)
      writePartitionedWith(ab, centroids(ab, c), dir, kind = "mips")
      writeScalarFile(spark, dir, "_graft_maxnorm", m.toString)
      insertIntoMips(spark, dir, fresh)
      IndexMeta.write(spark, dir, fp)
    }
  }

  /** BATCH top-k over the partitioned layout: `(query_id, query_vec)`
    * rows in, per-query `(query_id, vec_id, dist)` top-k out. Every
    * query probes its `nprobe` nearest cells; the scan is
    * partition-pruned to the UNION of all probed cells; each candidate
    * row is scored only against the queries that probed ITS cell
    * (broadcast probe-pair join); the bounded-heap aggregate
    * ([[heapTopKPerQuery]]) ranks per query without sorting. The whole
    * batch costs ONE pruned scan — the amortized serving shape for
    * production query streams (vs one scan per query in
    * [[topKPartitioned]]).
    */
  def topKPartitionedBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                           queries: DataFrame, k: Int, nprobe: Int,
                           roundTo: Int = 6, predicate: Option[Column] = None,
                           excluded: Option[DataFrame] = None): DataFrame = {
    val (probes, pruned) = batchPrunedCandidates(spark, dir, queries, nprobe)
    val scored = withoutExcluded(predicate.fold(pruned)(pruned.filter), excluded)
      .join(probes, Seq("cell")) // candidate meets only the queries probing its cell
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), roundTo).as("dist"))
    heapTopKPerQuery(scored, k, "dist")
  }

  /** Per-query top-k of `scored(query_id, vec_id, <scoreName>)` via the
    * bounded-heap aggregate ([[graft.functions.TopKPairsAgg]]) —
    * ascending by default, descending for similarity scores. This is
    * the batch serving rank: the `row_number` window it replaces
    * LOCAL-SORTS the full candidate-pair set before WindowGroupLimit
    * can truncate (measured 85% of flat-IVF batch wall at 1M — 125M
    * pairs sorted to keep 10/query); the heap keeps ≤k rows per
    * (query, task) with an O(1) root comparison per rejected candidate
    * and map-side partial aggregation, no sort anywhere. Identical
    * output: the (rounded score, vec_id) order is total, so results
    * and oracle hashes are unchanged. Descending scores negate on the
    * way in and back out — IEEE negation is exact, bit-identical
    * round-trip.
    */
  private[operators] def heapTopKPerQuery(scored: DataFrame, k: Int, scoreName: String,
                                          asc: Boolean = true): DataFrame = {
    val keyIn = if (asc) col(scoreName) else -col(scoreName)
    scored
      .groupBy("query_id")
      .agg(topKPairs(keyIn, col("vec_id"), k).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.id").as("vec_id"),
        (if (asc) col("p.key") else -col("p.key")).as(scoreName))
  }

  /** FUSED batch top-k — the serving-tier throughput kernel: one tight
    * per-partition primitive loop scores each pruned candidate against
    * the queries that probed its cell and feeds per-query bounded heaps
    * ([[graft.functions.TopKHeap]]), so the 10⁸–10⁹ (candidate, query)
    * pairs are never materialized as rows and never pass through the
    * aggregate framework (measured: the per-pair row/eval overhead is
    * ~3× the L2 arithmetic itself). The declarative twin
    * ([[topKPartitionedBatch]]) is the oracle-anchored form; this
    * kernel computes BIT-IDENTICAL distances (same double fold in the
    * same order as `l2Distance`) AND ranks by the same
    * `roundTo`-rounded key with the same vec_id tie order
    * ([[roundKey]] replicates Spark `round`'s HALF_UP double
    * semantics, RoundKeySpec pins the equality) — so fused results are
    * IDENTICAL to the declarative twin on every input, including
    * raw-distance ties at the k boundary that round equal. Probe
    * formation, partition pruning, and the queries-broadcast are
    * identical to the declarative path; `mapPartitions` is used
    * exactly per the custom-operator ladder — the semantics (fused
    * multi-query scan + bounded heaps) have no declarative expression.
    */
  def topKPartitionedBatchFused(spark: org.apache.spark.sql.SparkSession, dir: String,
                                queries: DataFrame, k: Int, nprobe: Int,
                                roundTo: Int = 6): DataFrame = {
    import spark.implicits._
    val (stored, cents) = readLayoutWithCentroids(spark, dir) // one-version pin
    val probePairs = batchProbePairsWith(cents, queries, nprobe)
    val unionCells = probePairs.select("cell").distinct().collect().map(_.getLong(0))
    // per-cell query lists: the same Q·nprobe payload the declarative
    // path ships through its BroadcastExchange (a broadcast IS a
    // driver collect in Spark), grouped for O(1) cell lookup
    val qByCell: Map[Long, Array[(Long, Array[Double])]] =
      probePairs.join(queries, Seq("query_id"))
        .select(col("cell"), col("query_id"), col("query_vec"))
        .as[(Long, Long, Array[Double])].collect()
        .groupBy(_._1).map { case (c, arr) => c -> arr.map(t => (t._2, t._3)) }
    val bc = spark.sparkContext.broadcast(qByCell)
    val pruned = stored
      .filter(col("cell").isin(unionCells.toIndexedSeq: _*)) // partition-pruned
      .select(col("cell"), col("vec_id"), col("embedding"))
    val perTask = pruned.as[(Long, Long, Array[Float])].mapPartitions { rows =>
      val heaps = new java.util.HashMap[Long, graft.functions.TopKHeap]()
      rows.foreach { case (cell, vid, emb) =>
        val qs = bc.value.getOrElse(cell, null)
        if (qs != null) {
          var i = 0
          while (i < qs.length) {
            val (qid, qv) = qs(i)
            // same fold as l2Distance: double accumulate in element order
            var s = 0.0; var j = 0
            while (j < emb.length) { val d = emb(j).toDouble - qv(j); s += d * d; j += 1 }
            var h = heaps.get(qid)
            if (h == null) { h = new graft.functions.TopKHeap(k); heaps.put(qid, h) }
            h.offer(roundKey(math.sqrt(s), roundTo), vid)
            i += 1
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.entrySet().iterator().asScala.flatMap { e =>
        e.getValue.sorted.iterator.map { case (d, vid) => (e.getKey, vid, d) }
      }
    }.toDF("query_id", "vec_id", "dist")
    // merge the ≤ tasks·k rows per query (keys already rounded — the
    // outer round is an exact no-op kept for schema/plan symmetry with
    // the declarative twin)
    heapTopKPerQuery(perTask, k, "dist")
      .select(col("query_id"), col("vec_id"), round(col("dist"), roundTo).as("dist"))
  }

  /** Spark `round(col, s)` for a non-negative finite double, replicated
    * on the JVM side so the fused kernels can rank by the ROUNDED key:
    * identical HALF_UP decimal semantics (RoundKeySpec property-pins
    * equality against the Catalyst expression), which makes fused
    * selection — including k-boundary ties — exactly the declarative
    * path's.
    */
  private[graft] def roundKey(d: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Shared fused-kernel engine for layouts storing DOUBLE vectors
    * (the cosine unit-direction and MIPS augmented tables): one tight
    * per-partition loop scores each pruned candidate against the
    * queries probing its cell into per-query bounded heaps keeping the
    * k SMALLEST `score` values (negate the score for largest-first
    * rankings). `score` must return the FINAL ROUNDED ranking key
    * (use [[roundKey]]), so heap selection — ties at the k boundary
    * included — is exactly the declarative twin's (key asc, vec_id
    * asc). Returns `(query_id, vec_id, key)`; callers project the
    * final score column (negation only — IEEE-exact). Same
    * probe/pruning and fold arithmetic as
    * [[topKPartitionedBatchFused]].
    */
  private def fusedHeapBatchDouble(spark: org.apache.spark.sql.SparkSession, dir: String,
                                   qPrepared: DataFrame, k: Int, nprobe: Int)
                                  (score: (Array[Double], Array[Double]) => Double)
      : DataFrame = {
    import spark.implicits._
    val (stored, cents) = readLayoutWithCentroids(spark, dir) // one-version pin
    val probePairs = batchProbePairsWith(cents, qPrepared, nprobe)
    val unionCells = probePairs.select("cell").distinct().collect().map(_.getLong(0))
    val qByCell: Map[Long, Array[(Long, Array[Double])]] =
      probePairs.join(qPrepared, Seq("query_id"))
        .select(col("cell"), col("query_id"), col("query_vec"))
        .as[(Long, Long, Array[Double])].collect()
        .groupBy(_._1).map { case (c, arr) => c -> arr.map(t => (t._2, t._3)) }
    val bc = spark.sparkContext.broadcast(qByCell)
    val perTask = stored
      .filter(col("cell").isin(unionCells.toIndexedSeq: _*)) // partition-pruned
      .select(col("cell"), col("vec_id"), col("embedding"))
      .as[(Long, Long, Array[Double])].mapPartitions { rows =>
        val heaps = new java.util.HashMap[Long, graft.functions.TopKHeap]()
        rows.foreach { case (cell, vid, emb) =>
          val qs = bc.value.getOrElse(cell, null)
          if (qs != null) {
            var i = 0
            while (i < qs.length) {
              val (qid, qv) = qs(i)
              var h = heaps.get(qid)
              if (h == null) { h = new graft.functions.TopKHeap(k); heaps.put(qid, h) }
              h.offer(score(emb, qv), vid)
              i += 1
            }
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.entrySet().iterator().asScala.flatMap { e =>
          e.getValue.sorted.iterator.map { case (d, vid) => (e.getKey, vid, d) }
        }
      }.toDF("query_id", "vec_id", "key")
    heapTopKPerQuery(perTask, k, "key") // merge the ≤ tasks·k rows per query
  }

  /** FUSED batch cosine over an [[ensurePartitionedCosine]] layout —
    * [[cosineTopKPartitionedBatch]]'s throughput kernel: the heap
    * ranks by the negated ROUNDED cosine (same double fold and same
    * rounding as the declarative twin, so selection and emitted
    * scores are identical on every input; TopKAggSpec pins equality).
    */
  def cosineTopKPartitionedBatchFused(spark: org.apache.spark.sql.SparkSession, dir: String,
                                      queries: DataFrame, k: Int, nprobe: Int,
                                      roundTo: Int = 6): DataFrame = {
    val qn = queries.select(col("query_id"),
      transform(col("query_vec"), x => x / l2Norm(col("query_vec"))).as("query_vec"))
    // heap key = NEGATED rounded cosine (same double fold as the
    // declarative `1 − ‖û−v̂‖²/2` then the same rounding), so k-boundary
    // ties resolve exactly like the oracle-anchored twin
    fusedHeapBatchDouble(spark, dir, qn, k, nprobe) { (e, q) =>
      var s = 0.0; var j = 0
      while (j < e.length) { val d = e(j) - q(j); s += d * d; j += 1 }
      -roundKey(1.0 - s / 2.0, roundTo)
    }.select(col("query_id"), col("vec_id"), (-col("key")).as("cos_sim"))
  }

  /** FUSED batch MIPS over an [[ensurePartitionedMips]] layout —
    * [[mipsTopKPartitionedBatch]]'s throughput kernel: the heap ranks
    * by the NEGATED rounded inner product (k largest, declarative tie
    * order), and the final projection un-negates (IEEE-exact).
    */
  def mipsTopKPartitionedBatchFused(spark: org.apache.spark.sql.SparkSession, dir: String,
                                    queries: DataFrame, k: Int, nprobe: Int,
                                    roundTo: Int = 6): DataFrame = {
    val qa = queries.select(col("query_id"),
      concat(transform(col("query_vec"), x => x.cast("double")), array(lit(0.0)))
        .as("query_vec"))
    // heap key = NEGATED rounded dot — see the cosine kernel's note
    fusedHeapBatchDouble(spark, dir, qa, k, nprobe) { (e, q) =>
      var s = 0.0; var j = 0
      while (j < e.length) { s += e(j) * q(j); j += 1 }
      -roundKey(s, roundTo)
    }.select(col("query_id"), col("vec_id"), (-col("key")).as("ip"))
  }

  /** Shared batch-probe machinery: per-query nprobe nearest cells →
    * `(probes, pruned)` where `probes` is the broadcast
    * `(query_id, cell)` probe-pair relation and `pruned` is the stored
    * table partition-pruned to the UNION of all probed cells.
    *
    * The probe-pair relation stays DISTRIBUTED (Q·nprobe rows computed
    * executor-side from the C-row centroid sidecar × broadcast
    * queries); the only collect moves the DISTINCT probed-cell ids —
    * ≤ C longs regardless of batch size — which must become plan
    * literals to form the partition filter. Driver traffic is bounded
    * by the cell count, never by the query batch.
    */
  private[operators] def batchPrunedCandidates(spark: org.apache.spark.sql.SparkSession,
                                               dir: String, queries: DataFrame,
                                               nprobe: Int): (DataFrame, DataFrame) = {
    // data and routing pinned to ONE manifest version (see
    // readLayoutWithCentroids) — probes formed from v's centroids prune
    // v's cell scan, never a cross-version mix
    val (probes, pruned, _) = batchPrunedCandidatesWithCents(spark, dir, queries, nprobe)
    (probes, pruned)
  }

  /** [[batchPrunedCandidates]] that ALSO returns the centroid table the
    * probes were formed from — for serving paths that need the
    * centroids again (e.g. residual LUT construction), pinned to the
    * same manifest version as the scan.
    */
  private[operators] def batchPrunedCandidatesWithCents(
      spark: org.apache.spark.sql.SparkSession, dir: String, queries: DataFrame,
      nprobe: Int): (DataFrame, DataFrame, DataFrame) = {
    val (stored, cents) = readLayoutWithCentroids(spark, dir)
    val probePairs = batchProbePairsWith(cents, queries, nprobe)
    val unionCells = probePairs.select("cell").distinct().collect().map(_.getLong(0))
    (broadcast(probePairs),
      stored.filter(col("cell").isin(unionCells.toIndexedSeq: _*)), cents)
  }

  /** The per-query probe-pair relation `(query_id, cell)`: each query's
    * `nprobe` nearest centroids, ranked executor-side (ties → smaller
    * centroid id). Q·nprobe rows, never collected.
    */
  private[operators] def batchProbePairs(spark: org.apache.spark.sql.SparkSession,
                                         dir: String, queries: DataFrame,
                                         nprobe: Int): DataFrame =
    batchProbePairsWith(centroidsOf(spark, dir), queries, nprobe)

  /** [[batchProbePairs]] against an EXPLICIT centroid table — the form
    * serving paths use so one snapshot resolution covers probes and
    * scan ([[readLayoutWithCentroids]]).
    */
  private[operators] def batchProbePairsWith(cents: DataFrame, queries: DataFrame,
                                             nprobe: Int): DataFrame = {
    val byQc = Window.partitionBy("query_id").orderBy(col("qdist"), col("centroid_id"))
    cents.crossJoin(broadcast(queries))
      .select(col("query_id"), col("centroid_id"),
        l2Distance(col("centroid_vec"), col("query_vec")).as("qdist"))
      .withColumn("rn", row_number().over(byQc))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("centroid_id").as("cell"))
  }

  /** BATCH cosine top-k over an [[ensurePartitionedCosine]] layout:
    * queries normalize (keeping their ids), the probe machinery is
    * [[topKPartitionedBatch]]'s, and the score converts back to cosine
    * (`1 − ‖û−v̂‖²/2`) ranked highest-first per query.
    */
  def cosineTopKPartitionedBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                                 queries: DataFrame, k: Int, nprobe: Int,
                                 roundTo: Int = 6): DataFrame = {
    val qn = queries.select(col("query_id"),
      transform(col("query_vec"), x => x / l2Norm(col("query_vec"))).as("query_vec"))
    val (probes, pruned) = batchPrunedCandidates(spark, dir, qn, nprobe)
    val scored = pruned
      .join(probes, Seq("cell"))
      .join(broadcast(qn), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(lit(1.0) - l2DistanceSq(col("embedding"), col("query_vec")) / lit(2.0),
          roundTo).as("cos_sim"))
    heapTopKPerQuery(scored, k, "cos_sim", asc = false)
  }

  /** Unit-normalized copy of the vector table (doubles): for unit
    * vectors, cosine similarity is a pure function of L2 distance
    * (`cos = 1 − ‖u−v‖²/2`), so EVERY L2 index path — IVF cells, HNSW
    * shards, PQ codes — serves cosine by indexing this table instead of
    * the raw one. Same reduction the blocked near-dup join proves
    * ([[Dedup.embeddingNearDupsBlocked]]).
    */
  def normalized(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double") / l2Norm(col("embedding")))
        .as("embedding"))

  /** Unit-normalize a single-row `(query_vec)` frame (double arrays). */
  def normalizedQuery(queries: DataFrame): DataFrame =
    queries.select(
      transform(col("query_vec"), x => x / l2Norm(col("query_vec"))).as("query_vec"))

  /** Cell-partitioned COSINE serving layout: the normalized table
    * partitioned by cells of its own seed centroids. Build once per
    * dir; [[cosineTopKPartitioned]] probes it.
    */
  def ensurePartitionedCosine(embeddings: DataFrame, c: Int, dir: String): Unit = {
    val normed = normalized(embeddings)
    ensurePartitionedWith(normed, centroids(normed, c), dir, tag = s"cos_c=$c",
      kind = "cosine")
  }

  /** Cosine top-k over a [[ensurePartitionedCosine]] layout: the query
    * normalizes, the probe partition-prunes exactly like
    * [[topKPartitioned]], and the score is `1 − ‖u−v‖²/2` — highest
    * similarity first, ties by vec_id ([[Knn.cosineTopK]] semantics,
    * served from a pruned scan instead of a full pass).
    */
  def cosineTopKPartitioned(spark: org.apache.spark.sql.SparkSession, dir: String,
                            queries: DataFrame, k: Int, nprobe: Int,
                            roundTo: Int = 6): DataFrame = {
    val (stored, cents) = readLayoutWithCentroids(spark, dir)
    val qn = normalizedQuery(queries)
    val probed = cents.crossJoin(broadcast(qn))
      .select(col("centroid_id"),
        l2Distance(col("centroid_vec"), col("query_vec")).as("qdist"))
      .orderBy(col("qdist"), col("centroid_id"))
      .limit(nprobe)
      .collect().map(_.getLong(0))
    stored
      .filter(col("cell").isin(probed: _*)) // partition-pruned
      .crossJoin(broadcast(qn))
      .select(col("vec_id"),
        round(lit(1.0) - l2DistanceSq(col("embedding"), col("query_vec")) / lit(2.0),
          roundTo).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  // ---- MIPS: max-inner-product search on the L2 machinery ----

  /** Augmented copy of the vector table for MIPS serving (the
    * Bachrach et al. 2014 reduction): append `sqrt(M² − ‖x‖²)` (M =
    * corpus max L2 norm) as one extra coordinate. Queries augment with
    * a 0, so `‖aug(x) − aug(q)‖² = M² + ‖q‖² − 2·x·q` — L2 NN on the
    * augmented space IS max-inner-product on the raw space, and every
    * L2 index path (IVF cells, HNSW shards, PQ codes) serves MIPS by
    * indexing this table. Because the query's extra coordinate is 0,
    * `dot(aug(x), aug(q)) == dot(x, q)` EXACTLY (adding a `+ extra·0.0`
    * term is an IEEE no-op), so scores need no back-conversion and the
    * DuckDB oracle composes from `list_inner_product` unchanged.
    *
    * The max-norm reduction to the driver is ONE scalar (a plan
    * literal) — never data-proportional. The extra coordinate clamps at
    * 0 (fp roundoff could drive `M² − ‖x‖²` epsilon-negative on the
    * max-norm row itself).
    */
  def augmented(embeddings: DataFrame): DataFrame =
    augmentedWith(embeddings, maxNormOf(embeddings))

  /** The corpus max L2 norm — THE augmentation constant: recorded at
    * MIPS-layout build time so incremental inserts augment with the
    * SAME geometry the layout was built in.
    */
  def maxNormOf(embeddings: DataFrame): Double = {
    val maxRow = embeddings.agg(max(l2Norm(col("embedding")))).collect()(0)
    // max over zero rows is null — fail with a real message instead of
    // an NPE (an augmented layout over nothing is meaningless anyway)
    require(!maxRow.isNullAt(0),
      "Ivf.augmented needs a non-empty vector table to derive the max norm from")
    maxRow.getDouble(0)
  }

  /** Augment with an EXPLICIT constant `m`: rows with norm > m clamp
    * the extra coordinate to 0 — their stored d+1-dot is still the
    * exact raw dot (the query's extra coordinate is 0), so MIPS
    * serving stays exact; only the cell-assignment geometry degrades
    * for such rows.
    */
  def augmentedWith(embeddings: DataFrame, m: Double): DataFrame =
    embeddings.select(col("vec_id"),
      concat(
        transform(col("embedding"), x => x.cast("double")),
        array(sqrt(greatest(
          lit(m * m) - dotProduct(col("embedding"), col("embedding")),
          lit(0.0))))).as("embedding"))

  /** Zero-augment a `(query_vec)` query frame: `[q, 0]` as doubles. */
  def augmentedQuery(queries: DataFrame): DataFrame =
    queries.withColumn("query_vec",
      concat(transform(col("query_vec"), x => x.cast("double")), array(lit(0.0))))

  /** Cell-partitioned MIPS serving layout: the augmented table
    * partitioned by cells of its own seed centroids — probe geometry
    * and partition pruning are [[ensurePartitioned]]'s, unchanged.
    */
  def ensurePartitionedMips(embeddings: DataFrame, c: Int, dir: String): Unit = {
    val m = maxNormOf(embeddings)
    val aug = augmentedWith(embeddings, m)
    ensurePartitionedWith(aug, centroids(aug, c), dir, tag = s"mips_c=$c",
      kind = "mips")
    // the augmentation constant, for insertIntoMips (idempotent write;
    // refreshed alongside any fingerprint-triggered rebuild)
    writeScalarFile(embeddings.sparkSession, dir, "_graft_maxnorm", m.toString)
  }

  /** MIPS top-k over an [[ensurePartitionedMips]] layout: the query
    * zero-augments, the probe partition-prunes exactly like
    * [[topKPartitioned]] (nearest augmented centroids by L2), and the
    * score is the raw inner product (see [[augmented]]) — highest
    * first, ties by vec_id ([[Knn.mipsTopK]] semantics on the pruned
    * scale path).
    */
  def mipsTopKPartitioned(spark: org.apache.spark.sql.SparkSession, dir: String,
                          queries: DataFrame, k: Int, nprobe: Int,
                          roundTo: Int = 6): DataFrame = {
    val (stored, cents) = readLayoutWithCentroids(spark, dir)
    val qa = augmentedQuery(queries)
    val probed = cents.crossJoin(broadcast(qa))
      .select(col("centroid_id"),
        l2Distance(col("centroid_vec"), col("query_vec")).as("qdist"))
      .orderBy(col("qdist"), col("centroid_id"))
      .limit(nprobe)
      .collect().map(_.getLong(0))
    stored
      .filter(col("cell").isin(probed: _*)) // partition-pruned
      .crossJoin(broadcast(qa))
      .select(col("vec_id"),
        round(dotProduct(col("embedding"), col("query_vec")), roundTo).as("ip"))
      .orderBy(col("ip").desc, col("vec_id"))
      .limit(k)
  }

  /** BATCH MIPS top-k over an [[ensurePartitionedMips]] layout: queries
    * zero-augment (keeping their ids), the probe machinery is
    * [[topKPartitionedBatch]]'s (one pruned scan for the whole batch),
    * and the score is the raw inner product ranked highest-first per
    * query through the bounded-heap aggregate.
    */
  def mipsTopKPartitionedBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                               queries: DataFrame, k: Int, nprobe: Int,
                               roundTo: Int = 6): DataFrame = {
    val qa = queries.select(col("query_id"),
      concat(transform(col("query_vec"), x => x.cast("double")), array(lit(0.0)))
        .as("query_vec"))
    val (probes, pruned) = batchPrunedCandidates(spark, dir, qa, nprobe)
    val scored = pruned
      .join(probes, Seq("cell"))
      .join(broadcast(qa), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dotProduct(col("embedding"), col("query_vec")), roundTo).as("ip"))
    heapTopKPerQuery(scored, k, "ip", asc = false)
  }

  /** Top-k by L2 for one query vector, probing the `nprobe` cells whose
    * centroids are closest to the query. Approximate (a true neighbor
    * can live in an unprobed cell) but fully deterministic.
    *
    * `queryVec` must be a double-array column present on `queries`
    * (single row).
    */
  def topK(embeddings: DataFrame, queries: DataFrame, k: Int, c: Int, nprobe: Int,
           roundTo: Int = 6): DataFrame =
    topKWith(embeddings, centroids(embeddings, c), queries, k, nprobe, roundTo)

  /** [[topK]] with an explicit centroid table — the entry point for
    * k-means-refined probing ([[kmeans]] cents): tighter cells put more
    * of each query's true neighbors inside the probed fraction.
    */
  def topKWith(embeddings: DataFrame, cents: DataFrame, queries: DataFrame,
               k: Int, nprobe: Int, roundTo: Int = 6): DataFrame = {
    val probed = cents
      .crossJoin(broadcast(queries))
      .select(col("centroid_id"),
        l2Distance(col("centroid_vec"), col("query_vec")).as("qdist"))
      .orderBy(col("qdist"), col("centroid_id"))
      .limit(nprobe)
      .select(col("centroid_id").as("cell"))
    embeddings
      .join(assignWith(embeddings, cents), Seq("vec_id"))
      .join(broadcast(probed), Seq("cell")) // semi-join shaped cell filter
      .crossJoin(broadcast(queries))
      .select(col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), roundTo).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }
}
