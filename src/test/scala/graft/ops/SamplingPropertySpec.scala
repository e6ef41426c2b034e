package graft.ops

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck coverage of the md5-interval math every deterministic
  * sampling operator keys off ([[Sampling.hexThreshold]] /
  * [[Sampling.hashScore]]'s driver-side model): the threshold is the
  * fixed-point rounding of p·2³², hex strings order like the numbers
  * they encode, and split labels partition. The interval properties are
  * pure JVM; the budget-fill property runs Spark jobs (it pins
  * [[Sampling.tokenBudgetSample]]'s distributed prefix-sum pass against
  * the driver model across partition layouts). */
class SamplingPropertySpec extends AnyFunSuite with graft.SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  private val genP: Gen[Double] = Gen.chooseNum(0.0, 1.0)

  test("property: hexThreshold is 8 lowercase hex chars encoding " +
       "round(p * 2^32), capped at 2^32 - 1") {
    check(Prop.forAll(genP) { p =>
      val h = Sampling.hexThreshold(p)
      h.length == 8 && h.forall(c => "0123456789abcdef".contains(c)) &&
        java.lang.Long.parseLong(h, 16) ==
          math.min(math.round(p * 4294967296.0), 4294967295L)
    })
  }

  test("property: hexThreshold is monotone and orders lexicographically " +
       "like the numbers (the comparison hashSplit relies on)") {
    check(Prop.forAll(genP, genP) { (p1, p2) =>
      val (lo, hi) = if (p1 <= p2) (p1, p2) else (p2, p1)
      val (hl, hh) = (Sampling.hexThreshold(lo), Sampling.hexThreshold(hi))
      // string order == numeric order, for ANY pair from the domain
      (hl <= hh) &&
        ((hl < hh) == (java.lang.Long.parseLong(hl, 16)
          < java.lang.Long.parseLong(hh, 16)))
    })
  }

  test("property: md5-prefix split labels partition — every id gets " +
       "exactly the label of its interval, fractions ordered as given") {
    // driver-side model of hashSplit's labeled fold for 3-way splits
    def score(id: Long): String =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).take(8)
    val genFrac = for {
      a <- Gen.chooseNum(0.05, 0.9)
      b <- Gen.chooseNum(0.01, 1.0 - a)
    } yield (a, b)
    check(Prop.forAll(genFrac, Gen.chooseNum(1L, 100000L)) {
      case ((a, b), id) =>
        val t1 = Sampling.hexThreshold(a)
        val t2 = Sampling.hexThreshold(a + b)
        val s = score(id)
        val label =
          if (s < t1) "train" else if (s < t2) "val" else "test"
        // the three intervals cover the hex space exactly once
        val hits = Seq(s < t1, t1 <= s && s < t2, s >= t2).count(identity)
        hits == 1 && (label match {
          case "train" => s < t1
          case "val"   => t1 <= s && s < t2
          case "test"  => s >= t2
        })
    })
  }

  test("property: tokenBudgetSample budget fill is partition-layout " +
       "invariant and matches the smallest-hash-prefix model") {
    import spark.implicits._
    def score(id: Long): String =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).take(8)
    // heavy-tailed counts stress both the pre-filter estimate and the
    // bucket-boundary edges of the md5-prefix distributed prefix sum
    val genRows: Gen[List[(Long, Long)]] = for {
      nDocs <- Gen.chooseNum(5, 60)
      counts <- Gen.listOfN(nDocs,
        Gen.frequency(8 -> Gen.chooseNum(1L, 30L), 2 -> Gen.chooseNum(200L, 900L)))
    } yield counts.zipWithIndex.map { case (c, i) => ((i + 1).toLong, c) }
    val prop = Prop.forAll(genRows, Gen.chooseNum(1, 9),
        Gen.chooseNum(1, 7)) { (rows, tenths, parts) =>
      val total = rows.map(_._2).sum
      val budget = 1L + total * tenths / 10
      val ordered = rows.sortBy { case (id, _) => (score(id), id) }
      val model = ordered.zip(ordered.scanLeft(0L)(_ + _._2))
        .takeWhile(_._2 < budget).map(_._1._1).toSet
      val out = Sampling.tokenBudgetSample(
          rows.toDF("id", "n_tokens").repartition(parts),
          "id", "n_tokens", budget)
        .select("id").as[Long].collect().toSet
      // identical set under any layout ⇒ fill (kept-token sum) invariant
      out == model
    }
    // Spark-backed: fewer cases than the pure-JVM properties, still
    // seeded-deterministic via ScalaCheck's default RNG parameters
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: epochCappedMixture waterfill — no domain over the " +
       "epoch cap, budget exactly spent when caps allow, driver model " +
       "matches across partition layouts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def score(id: Long): String =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).take(8)
    // a few domains of varied size; ids globally unique across domains
    val genDomains: Gen[List[(String, List[(Long, Long)])]] = for {
      k <- Gen.chooseNum(1, 5)
      sizes <- Gen.listOfN(k, Gen.chooseNum(1, 12))
    } yield {
      var nextId = 0L
      sizes.zipWithIndex.map { case (nd, di) =>
        val docs = (1 to nd).map { _ =>
          nextId += 1; (nextId, (nextId % 7) * 10 + 5) // 5..65 tokens
        }.toList
        (s"dom$di", docs)
      }
    }
    val prop = Prop.forAll(genDomains, Gen.chooseNum(1, 9),
        Gen.chooseNum(1, 6), Gen.chooseNum(1, 7)) {
      (doms, tenths, epochsX, parts) =>
        val maxEpochs = epochsX * 0.5 // 0.5 .. 3.0
        val total = doms.flatMap(_._2).map(_._2).sum
        val budget = total.toDouble * tenths / 10.0
        // driver model: the same waterfill + threshold + copy rule
        val totals = doms.map { case (d, ds) => (d, ds.map(_._2).sum) }
          .sortBy { case (d, c) => (c, d) }
        var remaining = budget
        val k = totals.length
        val rates = totals.zipWithIndex.map { case ((d, c), i) =>
          val alloc = math.min(maxEpochs * c.toDouble, remaining / (k - i))
          remaining -= alloc
          (d, alloc / c.toDouble)
        }.toMap
        val model = doms.flatMap { case (d, ds) =>
          val rate = rates(d)
          val whole = math.floor(rate).toLong
          val thr = Sampling.hexThreshold(rate - whole)
          ds.flatMap { case (id, _) =>
            val copies = whole + (if (score(id) < thr) 1L else 0L)
            (0L until copies).map(e => (id, e))
          }
        }.toSet
        val rows = doms.flatMap { case (d, ds) => ds.map { case (id, n) => (d, id, n) } }
        val out = Sampling.epochCappedMixture(
            rows.toDF("dom", "id", "n").repartition(parts),
            "dom", "id", "n", budget, maxEpochs)
          .select(col("id"), col("epoch")).as[(Long, Long)].collect().toSet
        // cap respected: the allocation never exceeds maxEpochs per domain
        val capOk = rates.values.forall(_ <= maxEpochs + 1e-12)
        // budget spent exactly unless every domain capped first
        val spent = budget - remaining
        val allCapped = totals.forall { case (d, c) =>
          rates(d) >= maxEpochs - 1e-12 }
        val spendOk = allCapped || math.abs(spent - budget) < 1e-6
        out == model && capOk && spendOk
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: mixtureSchedule is a permutation of steps with the " +
       "stride-scheduling prefix bound (every prefix within ~1 of share)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val genCounts: Gen[List[Long]] = for {
      k <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(k, Gen.chooseNum(1L, 500L))
    } yield cs
    val prop = Prop.forAll(genCounts, Gen.chooseNum(10L, 120L)) { (cs, n) =>
      val counts = cs.zipWithIndex.map { case (c, i) => (s"s$i", c) }
      val out = Sampling.mixtureSchedule(spark, counts, n)
        .orderBy(col("step"))
        .select(col("step"), col("source")).as[(Long, String)]
        .collect().toSeq
      val stepsOk = out.map(_._1) == (0L until n)
      // EXACT driver model of the full (untruncated) merge: the operator
      // must equal the first n of ALL occurrence times sorted by (t, d)
      // — this is what catches occurrence under-generation (a horizon of
      // ceil(w·n) starves the dominant source of its last ~w·K steps)
      val model = counts.flatMap { case (d, c) =>
        val w = c.toDouble / cs.sum.toDouble
        // generously over-generate for the model; the operator may not
        (0L until (n + 10)).map(k => ((k + 1).toDouble / w, d))
      }.sortBy(identity).take(n.toInt).map(_._2)
      val modelOk = out.map(_._2) == model
      val total = cs.sum.toDouble
      val k = counts.size
      // the virtual-time merge's prefix bound: after t steps the t-th
      // smallest occurrence time T satisfies |T − t| ≤ #sources (each
      // source's count is within 1 of w_d·T and the counts sum to t),
      // so |count_d(t) − w_d·t| ≤ 1 + w_d·#sources. The strict ≤1 bound
      // belongs to SWRR, not to stride merging — (1,1,6) at step 5
      // already drifts to 1.25.
      val prefixOk = counts.forall { case (name, c) =>
        val w = c / total
        var seen = 0L
        out.forall { case (step, src) =>
          if (src == name) seen += 1
          math.abs(seen - w * (step + 1)) <= 1.0 + w * k + 1e-9
        }
      }
      stepsOk && modelOk && prefixOk
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
