package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the in-partition HNSW core (pure Scala —
  * no Spark session, runs in milliseconds). The key law: with a full
  * beam (ef ≥ N), layer-0 best-first search degenerates to exhaustive
  * scan, so the ANN result must EQUAL exact brute force.
  */
object HnswProps extends Properties("Hnsw.LocalGraph") {

  // maxM above any generated size: the degree-cap shrink never fires,
  // so layer 0 is provably connected and full-beam search must be
  // EXACT. (The capped path is covered by HnswSpec — a capped graph
  // can in principle disconnect, which would make this property flaky.)
  private val p = Hnsw.Params(m = 4, maxM = 100, efConstruction = 16, efSearch = 200,
    maxLevel = 3, numPartitions = 1)

  private def mkGraph(vecs: Seq[Array[Float]]): Hnsw.LocalGraph = {
    val g = new Hnsw.LocalGraph(p)
    vecs.zipWithIndex.foreach { case (v, i) =>
      // deterministic level from index (decaying), bounded by maxLevel
      g.insert(i.toLong, v, (java.lang.Long.numberOfTrailingZeros(i + 1L) / 2).min(p.maxLevel))
    }
    g
  }

  private val vecsGen: Gen[List[Array[Float]]] =
    Gen.choose(2, 60).flatMap { n =>
      Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-50, 50))
        .map(_.map(_.toFloat).toArray))
    }

  private def l2(a: Array[Float], b: Array[Float]): Double =
    math.sqrt(a.indices.map(i => { val d = a(i).toDouble - b(i); d * d }).sum)

  property("full-beam search == exact brute force (ids, nearest-first)") =
    Prop.forAll(vecsGen) { vecs =>
      val g = mkGraph(vecs)
      val q = vecs.head.map(x => x + 0.25f)
      val k = math.min(5, vecs.length)
      val ann = g.search(q, k).map(_._1)
      val exact = vecs.indices
        .map(i => (l2(q, vecs(i)), i.toLong)).sorted.take(k).map(_._2)
      Prop(ann == exact) :| s"ann=$ann exact=$exact"
    }

  property("search returns distances matching its reported ids") =
    Prop.forAll(vecsGen) { vecs =>
      val g = mkGraph(vecs)
      val q = vecs.last
      g.search(q, 3).forall { case (id, d) =>
        math.abs(d - l2(q, vecs(id.toInt))) < 1e-9
      }
    }

  property("self-query returns self first (distance 0)") =
    Prop.forAll(vecsGen) { vecs =>
      val g = mkGraph(vecs)
      // first vector may have duplicates; accept any zero-distance id
      val (_, d) = g.search(vecs.head, 1).head
      d == 0.0
    }
}
