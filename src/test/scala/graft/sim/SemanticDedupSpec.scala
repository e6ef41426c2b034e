package graft.sim

import graft.SparkSpec

/** Randomized model check for [[Similarity.semanticDedup]]: cell
  * assignment, within-cell pair generation, component labels, and
  * survivor flags all against a straight-line union-find reference. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  /** Replays NearestCentroid: float-rounded coefficients, raw-double
    * half-norms, sequential fold, strict > (ties to the lowest cell). */
  private def assignCell(v: Seq[Float], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestScore = Double.NegativeInfinity
    for (c <- cents.indices) {
      var acc = 0.0
      for (i <- v.indices) acc += cents(c)(i).toFloat.toDouble * v(i).toDouble
      val score = acc - cents(c).map(x => x * x).sum / 2.0
      if (score > bestScore) { bestScore = score; best = c }
    }
    best
  }

  test("semanticDedup matches a union-find reference on random clustered vectors") {
    val rnd = new scala.util.Random(411L)
    for (round <- 1 to 3) {
      val dim = 6
      val nCells = 4
      val cents = Array.fill(nCells)(Array.fill(dim)(rnd.nextGaussian() * 3))
      // vectors hug a random centroid so near-dup pairs are dense in-cell
      val vecs = (1L to 80L).map { i =>
        val c = cents(rnd.nextInt(nCells))
        (i, c.map(x => (x + rnd.nextGaussian() * 0.4).toFloat).toSeq)
      }
      val model = Ivf.IvfModel(cents)
      val out = Similarity.semanticDedup(
          vecs.toDF("vec_id", "embedding"), "embedding", "vec_id", model, 0.9)
        .select("vec_id", "ivf_cell", "component", "keep")
        .as[(Long, Int, Long, Boolean)].collect().sortBy(_._1)

      // reference: assign, pair within cells, union-find, min-id survivor
      val cellOf = vecs.map { case (id, v) => id -> assignCell(v, cents) }.toMap
      val parent = scala.collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      for {
        (ia, va) <- vecs; (ib, vb) <- vecs
        if ia < ib && cellOf(ia) == cellOf(ib) && cos(va, vb) >= 0.9
      } {
        val (ra, rb) = (find(ia), find(ib))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = vecs.map { case (id, _) =>
        val comp = find(id)
        (id, cellOf(id), comp, comp == id)
      }
      assert(out.toSeq == want, s"round $round")
      // sanity: some rounds actually produce non-trivial groups
      if (round == 1) assert(out.exists(!_._4), "no duplicates generated")
    }
  }
}
