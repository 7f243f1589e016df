package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators._
import graft.sources.Tables

/** Ad-hoc stage profiler for optimization rounds: times labeled
  * sub-plans of the hot declared queries through the noop sink (the
  * Bench methodology at single-query granularity). Local iteration
  * aid only — the driver never runs this.
  *
  * Usage: runMain graft.tools.Prof <sfDir> <profile> [cpus]
  */
object Prof {
  private def time(label: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val t1 = System.nanoTime()
    println(f"[prof] $label%-40s ${(t1 - t0) / 1e9}%8.3f s")
  }
  private def timeAct(label: String)(act: => Unit): Unit = {
    val t0 = System.nanoTime()
    act
    val t1 = System.nanoTime()
    println(f"[prof] $label%-40s ${(t1 - t0) / 1e9}%8.3f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val profile = args(1)
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    profile match {
      case "semdedup_inc" =>
        // mirror q_image_semdedup_incremental's stages
        val q = SparkEntry.queries("q_image_semdedup_incremental")
        timeAct("full query (warm 1)") { q(spark, sfDir).write.format("noop").mode("overwrite").save() }
        timeAct("full query (warm 2)") { q(spark, sfDir).write.format("noop").mode("overwrite").save() }
        val assets = Multimodal.semAssetsFromDocuments(Tables.documents(spark, sfDir))
        time("assets (fixture encode, unsubstrated)") { assets }
        val feats = Multimodal.extractFeatures(assets, dim = 9)
          .select(col("asset_id").as("vec_id"), col("features").as("embedding"))
        time("extractFeatures (incl. encode)") { feats }
        val table = "graft_semstore_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
        val batch = feats.filter(col("vec_id") % 4 >= 1)
        timeAct("incrementalEmbeddingDedup") {
          Dedup.incrementalEmbeddingDedup(spark, table, batch, 0.99, probes = 2,
            absorb = false).write.format("noop").mode("overwrite").save()
        }
        // step-by-step replica of incrementalEmbeddingDedup's body
        timeAct("  refreshTable") { spark.catalog.refreshTable(table) }
        var b: DataFrame = null
        timeAct("  checkpointed(batch)") { b = Dedup.checkpointed(batch.select("vec_id", "embedding")) }
        var matched: DataFrame = null
        timeAct("  store candidates + filter + distinct") {
          matched = Dedup.embeddingStoreCandidates(spark, table, b, 2)
            .filter(col("cos_sim") >= 0.99)
            .select("vec_id").distinct()
          matched.write.format("noop").mode("overwrite").save()
        }
        var novel: DataFrame = null
        timeAct("  novel anti-join + localCheckpoint") {
          novel = b.join(matched, Seq("vec_id"), "left_anti").localCheckpoint(true)
        }
        timeAct("  novel.isEmpty") { val _ = novel.isEmpty }
        var blocked: DataFrame = null
        timeAct("  embeddingNearDupsBlocked(novel)") {
          blocked = Dedup.embeddingNearDupsBlocked(novel, 0.99, c = 8, probes = 2)
            .select("id1", "id2")
          blocked.write.format("noop").mode("overwrite").save()
        }
        timeAct("  nonMinMembers(blocked)") {
          Dedup.nonMinMembers(blocked).write.format("noop").mode("overwrite").save()
        }
      case "pdf" =>
        val q = SparkEntry.queries("q_pdf_extract")
        timeAct("full query (warm 1)") { q(spark, sfDir).write.format("noop").mode("overwrite").save() }
        timeAct("full query (warm 2)") { q(spark, sfDir).write.format("noop").mode("overwrite").save() }
        val glob = "target/graft_index/corpus_pdf_" + sfDir.replace("/", "_") + "/*.pdf"
        timeAct("ensurePdfFiles (marker hit)") {
          graft.sources.PdfCodec.ensurePdfFiles(Tables.documents(spark, sfDir),
            "target/graft_index/corpus_pdf_" + sfDir.replace("/", "_"), sourceDir = sfDir)
        }
        time("binaryFile scan only") {
          spark.read.format("binaryFile").load(glob).select(col("path"), col("content"))
        }
        time("scan + extractFiles") {
          graft.sources.PdfCodec.extractFiles(
            spark.read.format("binaryFile").load(glob).select(col("path"), col("content")))
        }
        time("parallelize+nio read") {
          import spark.implicits._
          val d = new java.io.File("target/graft_index/corpus_pdf_" + sfDir.replace("/", "_"))
          val paths = d.listFiles().filter(_.getName.endsWith(".pdf"))
            .map(_.getAbsolutePath).toSeq
          spark.createDataset(paths).repartition(32).mapPartitions { it =>
            it.map { p =>
              (("file:" + p), java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
            }
          }.toDF("path", "content")
        }
        time("nio read + extractFiles") {
          import spark.implicits._
          val d = new java.io.File("target/graft_index/corpus_pdf_" + sfDir.replace("/", "_"))
          val paths = d.listFiles().filter(_.getName.endsWith(".pdf"))
            .map(_.getAbsolutePath).toSeq
          graft.sources.PdfCodec.extractFiles(
            spark.createDataset(paths).repartition(32).mapPartitions { it =>
              it.map { p =>
                (("file:" + p), java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
              }
            }.toDF("path", "content"))
        }
        time("scan + extractFiles + doc_id") {
          graft.sources.PdfCodec.extractFiles(
            spark.read.format("binaryFile").load(glob).select(col("path"), col("content")))
            .select(regexp_extract(col("path"), "doc-(\\d+)\\.pdf", 1)
              .cast("long").as("doc_id"), col("text"))
        }
      case "multiprobe" =>
        val q = SparkEntry.queries("q_image_semdedup_multiprobe")
        timeAct("full query (warm 1)") { q(spark, sfDir).write.format("noop").mode("overwrite").save() }
        timeAct("full query (warm 2)") { q(spark, sfDir).write.format("noop").mode("overwrite").save() }
        val assets = Multimodal.semAssetsFromDocuments(Tables.documents(spark, sfDir))
        val feats = Dedup.checkpointed(Multimodal.extractFeatures(assets, dim = 9)
          .select(col("asset_id").as("vec_id"), col("features").as("embedding")))
        time("extractFeatures+checkpoint") { feats }
        time("blocked pairs") {
          Dedup.embeddingNearDupsBlocked(feats, 0.99, c = 8, probes = 2)
        }
        // decomposition of the blocked pair stage
        import org.apache.spark.sql.expressions.Window
        import graft.functions.VectorFunctions.{l2Norm, l2Distance, dotProduct}
        val normed = feats.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double") / l2Norm(col("embedding")))
            .as("embedding"))
        val byVec = Window.partitionBy("vec_id").orderBy(col("cdist"), col("centroid_id"))
        val cells = normed
          .crossJoin(broadcast(Ivf.centroids(normed, 8)))
          .select(col("vec_id"), col("centroid_id"),
            l2Distance(col("embedding"), col("centroid_vec")).as("cdist"))
          .withColumn("rn", row_number().over(byVec))
          .filter(col("rn") <= 2)
          .select(col("centroid_id").as("cell"), col("vec_id"))
        val posted = feats
          .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))
          .join(cells, Seq("vec_id"))
        time("  cells assign") { cells }
        time("  posted") { posted }
        val l = posted.select(col("cell"), col("vec_id").as("id1"),
          col("embedding").as("e1"), col("nrm").as("n1"))
        val r = posted.select(col("cell"), col("vec_id").as("id2"),
          col("embedding").as("e2"), col("nrm").as("n2"))
        val surv = l.join(r, Seq("cell"))
          .filter(col("id1") < col("id2"))
          .withColumn("cos_sim",
            round(dotProduct(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
          .filter(col("cos_sim") >= 0.99)
          .select("id1", "id2", "cos_sim")
        time("  sweep unsalted (no dedup)") { surv }
        time("  sweep unsalted + dropDup") { surv.dropDuplicates("id1", "id2") }
        val ls = l.withColumn("salt", pmod(hash(col("id1")), lit(8)))
        val rs = r.withColumn("salt", explode(sequence(lit(0), lit(7))))
        val survS = ls.join(rs, Seq("cell", "salt")).drop("salt")
          .filter(col("id1") < col("id2"))
          .withColumn("cos_sim",
            round(dotProduct(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
          .filter(col("cos_sim") >= 0.99)
          .select("id1", "id2", "cos_sim")
        time("  sweep salted (no dedup)") { survS }
        time("  sweep salted + dropDup") { survS.dropDuplicates("id1", "id2") }
        val pairsCk = Dedup.embeddingNearDupsBlocked(feats, 0.99, c = 8, probes = 2)
          .select(col("id1"), col("id2")).localCheckpoint(true)
        timeAct("nearDupClusters (pairs cached)") {
          Dedup.nearDupClusters(feats.select(col("vec_id").as("doc_id")), pairsCk)
            .write.format("noop").mode("overwrite").save()
        }
        println(s"[prof] pair count: ${pairsCk.count()}")
      case "cc" =>
        val edges = SparkEntry.queries("q_connected_components")
        timeAct("q_connected_components (warm 1)") { edges(spark, sfDir).write.format("noop").mode("overwrite").save() }
        timeAct("q_connected_components (warm 2)") { edges(spark, sfDir).write.format("noop").mode("overwrite").save() }
      case "pipeline" =>
        import graft.functions.TextFunctions
        val docs = Tables.documents(spark, sfDir)
        time("raw scan") { docs }
        val kept1 = CorpusPipeline.filtered(docs, "en", 0.4)
        time("lang+quality filter") { kept1 }
        var kept2: DataFrame = null
        timeAct("exact survivors + reliable ckpt") {
          kept2 = Dedup.checkpointed(
            kept1.withColumn("__rn",
              org.apache.spark.sql.functions.row_number().over(
                org.apache.spark.sql.expressions.Window
                  .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
              .filter(col("__rn") === 1).drop("__rn"))
        }
        var pairs: DataFrame = null
        timeAct("jaccard pairs") {
          pairs = Dedup.jaccardPairsExact(kept2, 0.5, 10000)
          pairs.write.format("noop").mode("overwrite").save()
        }
        timeAct("nearDupClusters + reps + final join + agg") {
          val reps = Dedup.nearDupClusters(kept2, pairs)
            .filter(col("doc_id") === col("cluster_id")).select("doc_id")
          kept2.join(reps, Seq("doc_id"))
            .groupBy("source")
            .agg(count(lit(1)).as("n_docs"),
              sum(size(TextFunctions.tokens(col("text"))).cast("long")).as("n_tokens"))
            .write.format("noop").mode("overwrite").save()
        }
        time("full curate") { CorpusPipeline.curate(docs, "en", 0.4, 0.5) }
        time("full curate again") { CorpusPipeline.curate(docs, "en", 0.4, 0.5) }
      case "tri" =>
        val edges = Graph.partCoOccurrence(Tables.lineitem(spark, sfDir))
        val und = edges.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
          .localCheckpoint()
        timeAct("und localCheckpoint") { val _ = und.count() }
        println(s"[prof] und edges: ${und.count()}")
        val deg = und.select(col("a").as("node"))
          .union(und.select(col("b").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        time("deg") { deg }
        val withDeg = und
          .join(deg.select(col("node").as("a"), col("deg").as("da")).hint("shuffle_hash"), Seq("a"))
          .join(deg.select(col("node").as("b"), col("deg").as("db")).hint("shuffle_hash"), Seq("b"))
        val apexIsA = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val oriented = withDeg.select(
          when(apexIsA, col("a")).otherwise(col("b")).as("u"),
          when(apexIsA, col("b")).otherwise(col("a")).as("v")).localCheckpoint()
        timeAct("oriented localCheckpoint") { val _ = oriented.count() }
        val adj = oriented.groupBy("u")
          .agg(sort_array(collect_list(col("v"))).as("nbrs"))
        time("adj build") { adj }
        val tri = oriented
          .join(adj.select(col("u"), col("nbrs").as("nu")).hint("shuffle_hash"), Seq("u"))
          .join(adj.select(col("u").as("v"), col("nbrs").as("nv")).hint("shuffle_hash"), Seq("v"))
          .select(col("u"), col("v"),
            explode(array_intersect(col("nu"), col("nv"))).as("w"))
        time("closing join + intersect") { tri }
        time("full triangleCounts") { Graph.triangleCounts(Graph.partCoOccurrence(Tables.lineitem(spark, sfDir))) }
        time("full triangleCounts again") { Graph.triangleCounts(Graph.partCoOccurrence(Tables.lineitem(spark, sfDir))) }
      case "ckpt" =>
        // does Dataset.checkpoint(eager=true) double-compute its plan?
        import org.apache.spark.storage.StorageLevel
        def expensive = Tables.lineitem(spark, sfDir)
          .groupBy("l_orderkey").agg(count(lit(1)).as("n"), sum("l_extendedprice").as("s"))
          .withColumn("z", sha2(concat_ws(":", col("l_orderkey"), col("n"), col("s")), 256))
        timeAct("plain noop (1x plan)") { expensive.write.format("noop").mode("overwrite").save() }
        timeAct("plain noop (again)") { expensive.write.format("noop").mode("overwrite").save() }
        timeAct("reliable checkpoint(eager)") { Dedup.checkpointed(expensive) }
        timeAct("persist + checkpoint + unpersist") {
          val c = expensive.persist(StorageLevel.MEMORY_AND_DISK)
          val out = c.checkpoint(eager = true)
          c.unpersist(false)
          out
        }
        timeAct("localCheckpoint(true)") { expensive.localCheckpoint(true) }
      case "blockedab" =>
        import org.apache.spark.sql.expressions.Window
        import graft.functions.VectorFunctions.{l2Norm, l2Distance, dotProduct}
        val emb = Tables.embeddings(spark, sfDir)
        val (c, probes, threshold) = (8, 4, 0.4)
        def normed = emb.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double") / l2Norm(col("embedding")))
            .as("embedding"))
        val byVec = Window.partitionBy("vec_id").orderBy(col("cdist"), col("centroid_id"))
        def cells = normed
          .crossJoin(broadcast(Ivf.centroids(normed, c)))
          .select(col("vec_id"), col("centroid_id"),
            l2Distance(col("embedding"), col("centroid_vec")).as("cdist"))
          .withColumn("rn", row_number().over(byVec))
          .filter(col("rn") <= probes)
          .select(col("centroid_id").as("cell"), col("vec_id"))
        // OLD form: join on cell, dropDuplicates tail
        def postedOld = emb
          .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))
          .join(cells, Seq("vec_id"))
        def oldPairs = {
          val l = postedOld.select(col("cell"), col("vec_id").as("id1"),
            col("embedding").as("e1"), col("nrm").as("n1"))
          val r = postedOld.select(col("cell"), col("vec_id").as("id2"),
            col("embedding").as("e2"), col("nrm").as("n2"))
          l.join(r, Seq("cell"))
            .filter(col("id1") < col("id2"))
            .withColumn("cos_sim",
              round(dotProduct(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
            .filter(col("cos_sim") >= threshold)
            .select("id1", "id2", "cos_sim")
            .dropDuplicates("id1", "id2")
        }
        time("old form (run 1)") { oldPairs }
        time("old form (run 2)") { oldPairs }
        time("new form (run 1)") { Dedup.embeddingNearDupsBlocked(emb, threshold, c, probes) }
        time("new form (run 2)") { Dedup.embeddingNearDupsBlocked(emb, threshold, c, probes) }
        println(s"[prof] old count: ${oldPairs.count()}  new count: " +
          s"${Dedup.embeddingNearDupsBlocked(emb, threshold, c, probes).count()}")
      case "pdflocal" =>
        // driver-local single-thread cost of extractText over the fixture
        val d = new java.io.File("target/graft_index/corpus_pdf_" +
          sfDir.replace("/", "_"))
        val pdfs = d.listFiles().filter(_.getName.endsWith(".pdf")).sortBy(_.getName)
        println(s"[prof] files: ${pdfs.length}")
        val bytes = pdfs.map(f => java.nio.file.Files.readAllBytes(f.toPath))
        val t0 = System.nanoTime()
        var chars = 0L
        bytes.foreach { b => graft.sources.PdfCodec.extractText(b).foreach(t => chars += t.length) }
        val t1 = System.nanoTime()
        println(f"[prof] extractText x${bytes.length}: ${(t1 - t0) / 1e9}%.3f s total, " +
          f"${(t1 - t0) / 1e6 / bytes.length}%.3f ms/doc, $chars chars")
        val t2 = System.nanoTime()
        bytes.foreach { b => graft.sources.PdfCodec.extractText(b) }
        val t3 = System.nanoTime()
        println(f"[prof] extractText warm x${bytes.length}: ${(t3 - t2) / 1e9}%.3f s total, " +
          f"${(t3 - t2) / 1e6 / bytes.length}%.3f ms/doc")
      case other =>
        // generic: treat as comma-separated query names, 2 runs each
        other.split(",").foreach { name =>
          val q = SparkEntry.queries(name)
          timeAct(s"$name (run 1)") { q(spark, sfDir).write.format("noop").mode("overwrite").save() }
          timeAct(s"$name (run 2)") { q(spark, sfDir).write.format("noop").mode("overwrite").save() }
          timeAct(s"$name (run 3)") { q(spark, sfDir).write.format("noop").mode("overwrite").save() }
        }
    }
    spark.stop()
  }
}
