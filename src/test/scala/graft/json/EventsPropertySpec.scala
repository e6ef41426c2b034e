package graft.json

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck coverage of the TYPED positional decoder ([[Events]]) — the
  * JVM half of the lenient-coercion layer (the Spark half lives in
  * [[SyncPingPropertySpec]]). Generators emit arbitrary positional arrays
  * (any arity, any element kinds) and the properties assert the decode
  * against a driver-side model of the documented dispatch rules, plus the
  * drop-element-not-list contract of the list decoder. Pure JVM — no
  * Spark jobs. */
class EventsPropertySpec extends AnyFunSuite {

  // ── element ADT + Jackson rendering ──

  private sealed trait El
  private case class Num(v: Long) extends El
  private case class Str(v: String) extends El
  private case object JNull extends El
  private case class Obj(m: List[(String, El)]) extends El
  private case object Nested extends El // an array element — never valid

  private val genScalar: Gen[El] = Gen.oneOf(
    Gen.choose(-99999L, 99999L).map(Num),
    Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar)).map(Str),
    Gen.const(JNull))
  private val genEl: Gen[El] = Gen.frequency(
    6 -> genScalar,
    1 -> Gen.listOf(Gen.zip(
        Gen.choose(1, 4).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar)),
        genScalar)).map(l => Obj(l.take(3))),
    1 -> Gen.const(Nested))
  private val genEvent: Gen[List[El]] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, genEl))

  private val M = new ObjectMapper()

  private def renderInto(arr: ArrayNode, e: El): Unit = e match {
    case Num(v)  => arr.add(v)
    case Str(v)  => arr.add(v)
    case JNull   => arr.addNull()
    case Nested  => arr.addArray()
    case Obj(m)  =>
      val o = arr.addObject()
      m.foreach {
        case (k, Num(v)) => o.put(k, v)
        case (k, Str(v)) => o.put(k, v)
        case (k, _)      => o.putNull(k)
      }
  }

  private def render(ev: List[El]): ArrayNode = {
    val arr = M.createArrayNode()
    ev.foreach(renderInto(arr, _))
    arr
  }

  // ── the model of the documented dispatch/coercion rules ──

  private def coerce(e: El): String = e match {
    case Num(v) => v.toString
    case Str(v) => v
    case JNull  => "null"
    case _      => sys.error("never coerced")
  }

  private def model(ev: List[El]): Option[Events.Event] = {
    if (ev.size < 4 || ev.size > 6) return None
    val ts = ev.head match { case Num(v) => v; case _ => return None }
    // positions 1-3: non-null scalar value nodes only
    if (!ev.slice(1, 4).forall {
      case Num(_) | Str(_) => true; case _ => false }) return None
    val mapValues = if (ev.size == 6) ev(5) match {
      case Obj(m) => Some(m.toMap.map { case (k, v) => k -> coerce(v) })
      case _      => return None
    } else None
    val strValue = if (ev.size >= 5) ev(4) match {
      case JNull  => None
      case Num(v) => Some(v.toString)
      case Str(v) => Some(v)
      case _      => None // object/array in slot 5 coerces via toString…
    } else None
    // …but the decoder stringifies ANY node in slot 5; restrict the model
    // comparison to scalar slot-5 shapes (checked by the filter below)
    Some(Events.Event(ts, coerce(ev(1)), coerce(ev(2)), coerce(ev(3)),
      strValue, mapValues))
  }

  private def scalarSlot5(ev: List[El]): Boolean =
    ev.size < 5 || (ev(4) match {
      case Num(_) | Str(_) | JNull => true; case _ => false })

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: fromArray accepts exactly the documented shapes and " +
      "coerces positionally per the model") {
    check(Prop.forAll(genEvent.suchThat(scalarSlot5)) { ev =>
      Events.fromArray(render(ev)) == model(ev)
    })
  }

  test("property: fromJsonList drops malformed ELEMENTS, never the list; " +
      "a malformed document decodes to Nil, not a throw") {
    val genList = Gen.listOf(genEvent.suchThat(scalarSlot5)).map(_.take(8))
    check(Prop.forAll(genList) { evs =>
      val arr = M.createArrayNode()
      evs.foreach(ev => arr.add(render(ev)))
      val json = M.writeValueAsString(arr)
      Events.fromJsonList(json) == evs.flatMap(model) &&
        Events.fromJsonList(json.dropRight(1) + "garbage") == Nil &&
        Events.fromJsonList("""{"not":"an array"}""") == Nil
    })
  }

  test("property: withProcess prepends the tag; existing map keys survive") {
    // construct valid events directly — filtering arbitrary arrays down
    // to decodable ones exhausts the generator
    val genStr4 = Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    val genTagged = for {
      ts <- Gen.choose(-99999L, 99999L)
      c <- genStr4; m <- genStr4; o <- genStr4
      sv <- Gen.option(genStr4)
      mv <- Gen.option(Gen.mapOf(Gen.zip(
        Gen.oneOf(genStr4, Gen.const("telemetry_process")), genStr4))
        .map(_.take(3)))
      p <- Gen.stringOfN(4, Gen.alphaNumChar)
    } yield (Events.Event(ts, c, m, o, sv, mv), p)
    check(Prop.forAll(genTagged) { case (e, p) =>
      val tagged = e.withProcess(p)
      val m = tagged.mapValues.get
      m.keySet == e.mapValues.getOrElse(Map.empty).keySet + "telemetry_process" &&
        e.mapValues.getOrElse(Map.empty).forall { case (k, v) => m(k) == v } &&
        (e.mapValues.exists(_.contains("telemetry_process")) ||
          m("telemetry_process") == p)
    })
  }
}
