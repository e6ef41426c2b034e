package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("quantizeInt8: codes within ±127, error bound scale/2 per element, zero vector safe") {
    val emb = graft.Tables.embeddings(spark, sf).where(col("embedding").isNotNull)
      .unionByName(Seq((-1L, Seq.fill(8)(0f), 0)).toDF("vec_id", "embedding", "label"))
    val rows = Quant.quantizeInt8(emb, "embedding")
      .select(col("vec_id"), col("embedding"), col("q8_scale"), col("q8"))
      .as[(Long, Seq[Float], Double, Seq[Byte])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, v, scale, codes) =>
      assert(codes.size === v.size)
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id codes out of range")
      if (id == -1L) {
        assert(scale === 0.0 && codes.forall(_ == 0))
      } else {
        assert(scale > 0, s"vec $id")
        // reconstruction error of the un-clamped interior: |v - c*scale| <= scale/2
        v.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c.toDouble * scale) <= scale / 2 + 1e-12,
            s"vec $id elem $x code $c scale $scale")
        }
        // absmax element must hit ±127 (that's what defines the scale)
        assert(codes.exists(c => math.abs(c.toInt) == 127), s"vec $id")
      }
    }
  }

  test("int8 expressions: generated code compiles and matches interpreted eval") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, ByteType, FloatType}
    import graft.functions.{Int8Codes, Int8Dot, Int8QueryDot, Int8Scale}
    val arrF = ArrayType(FloatType, containsNull = false)
    val arrB = ArrayType(ByteType, containsNull = false)
    val vec = new GenericArrayData(Array(0.5f, -1.0f, 0.25f, 0f))
    val scaleE = Int8Scale(BoundReference(0, arrF, nullable = false))
    val scale = scaleE.eval(InternalRow(vec)).asInstanceOf[Double]
    assert(scale === 1.0 / 127.0)
    val codesE = Int8Codes(BoundReference(0, arrF, nullable = false),
      org.apache.spark.sql.catalyst.expressions.Literal(scale))
    val codes = codesE.eval(InternalRow(vec))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(codes.toByteArray().toSeq === Seq[Byte](64, -127, 32, 0))
    // half-away-from-zero: ±0.5/scale = ±63.5 rounds away to ±64
    val tie = new GenericArrayData(Array(0.5f, -0.5f, 1.0f, -1.0f))
    val tieCodes = Int8Codes(BoundReference(0, arrF, nullable = false),
      org.apache.spark.sql.catalyst.expressions.Literal(1.0 / 127.0))
      .eval(InternalRow(tie))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(tieCodes.toByteArray().toSeq === Seq[Byte](64, -64, 127, -127))
    // codegen path: projection over all four expressions throws on bad code
    val a = new GenericArrayData(Array[Byte](1, -2, 3))
    val b = new GenericArrayData(Array[Byte](4, 5, -6))
    val dotE = Int8Dot(BoundReference(0, arrB, nullable = false),
      BoundReference(1, arrB, nullable = false))
    assert(dotE.eval(InternalRow(a, b)) === (4 - 10 - 18).toLong)
    val qdotE = Int8QueryDot(BoundReference(0, arrB, nullable = false),
      Seq[Byte](4, 5, -6))
    assert(qdotE.eval(InternalRow(a, b)) === (4 - 10 - 18).toLong)
    val projF = UnsafeProjection.create(Seq(scaleE, codesE))
    val genRow = projF(InternalRow(vec))
    assert(genRow.getDouble(0) === scale)
    assert(genRow.getArray(1).toByteArray().toSeq === Seq[Byte](64, -127, 32, 0))
    val projB = UnsafeProjection.create(Seq(dotE, qdotE))
    val genDots = projB(InternalRow(a, b))
    assert(genDots.getLong(0) === -24L && genDots.getLong(1) === -24L)
  }

  test("quantizeVec (driver mirror) matches the in-plan quantization bit-for-bit") {
    val emb = graft.Tables.embeddings(spark, sf).where(col("embedding").isNotNull)
    val planned = Quant.quantizeInt8(emb, "embedding")
      .select(col("vec_id"), col("embedding"), col("q8_scale"), col("q8"))
      .as[(Long, Seq[Float], Double, Seq[Byte])].collect()
    planned.foreach { case (id, v, scale, codes) =>
      val (ds, dc) = Quant.quantizeVec(v)
      assert(ds === scale, s"vec $id scale")
      assert(dc.toSeq === codes, s"vec $id codes")
    }
  }

  test("topKInt8 recall vs exact brute-force cosine >= 0.8 on the fixture") {
    val emb = graft.Tables.embeddings(spark, sf).where(col("embedding").isNotNull)
    val q = emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val corpus = emb.where(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "embedding", "vec_id", q, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val got = Quant.topKInt8(corpus, "embedding", "vec_id", q, k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(got.size === 10)
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall $recall; exact $exact vs int8 $got")
  }

  test("cosinePairsInt8: each pair meets once; recall vs float pairs >= 0.8") {
    val emb = graft.Tables.embeddings(spark, sf).where(col("embedding").isNotNull)
    val int8 = Quant.cosinePairsInt8(emb, "embedding", "vec_id", "label", 0.35)
      .select("id_a", "id_b", "cos8").as[(Long, Long, Double)].collect()
    // the salted join must not duplicate or reorder pairs
    assert(int8.map(p => (p._1, p._2)).distinct.length === int8.length)
    int8.foreach { case (a, b, c) =>
      assert(a < b)
      assert(c >= 0.35 && c <= 1.0 + 1e-12)
    }
    val float = Similarity.cosinePairs(emb, "embedding", "vec_id", "label", 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val got = int8.map(p => (p._1, p._2)).toSet
    if (float.nonEmpty) {
      val recall = float.intersect(got).size.toDouble / float.size
      assert(recall >= 0.8, s"int8 recall $recall (float ${float.size}, int8 ${got.size})")
    }
    // scores replay from driver-side quantization exactly
    val codes = Quant.quantizeInt8(emb, "embedding")
      .select(col("vec_id"), col("q8")).as[(Long, Seq[Byte])].collect().toMap
    int8.take(20).foreach { case (a, b, c) =>
      val (qa, qb) = (codes(a), codes(b))
      val dot = qa.zip(qb).foldLeft(0L) { case (s, (x, y)) => s + x.toLong * y.toLong }
      def nrm(q: Seq[Byte]) = math.sqrt(q.foldLeft(0L)((s, x) => s + x.toLong * x.toLong).toDouble)
      assert(c === dot.toDouble / (nrm(qa) * nrm(qb)), s"pair ($a,$b)")
    }
  }

  test("cosineInt8 of a vector with itself is 1; zero-norm guard yields 0") {
    val df = Seq(
      (1L, Seq[Byte](1, 2, 3), Seq[Byte](1, 2, 3)),
      (2L, Seq[Byte](0, 0, 0), Seq[Byte](1, 2, 3)))
      .toDF("id", "a", "b")
    val out = df.select(col("id"), Quant.cosineInt8(col("a"), col("b")).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 1.0) < 1e-15)
    assert(out(2L) === 0.0)
  }
}
