package graft.json

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.SparkSpec
import org.apache.spark.sql.Observation
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property-based coverage of the lenient JSON coercion layer (SURVEY §5's
  * rebuild strategy): ScalaCheck generators emit the VARIANT ping shapes
  * the reference tolerates — old-style single-sync vs new-style `syncs[]`,
  * ids at payload vs ping top level, `outgoing` as array vs bare object,
  * malformed documents, positional events of wrong arity — and each
  * property asserts a shred-total invariant against a driver-side model
  * of the documented contract, not against hand-picked fixtures.
  *
  * JSON is rendered with Jackson (never string interpolation) so escaping
  * can't silently weaken a property. */
class SyncPingPropertySpec extends SparkSpec {
  import spark.implicits._

  // ── generator ADT: the shape space, not the byte space ──

  private case class GOut(batches: Seq[(Long, Option[Long])], bare: Boolean)
  private case class GEngine(name: String, out: Option[GOut])
  private case class GSync(when: Option[Long], uid: Option[String],
                           engines: Seq[GEngine])
  private case class GPing(
      oldStyle: Boolean,            // sync fields inline on payload
      syncs: Seq[GSync],            // new style; head is the old-style sync
      payloadUid: Option[String],   // old-style uid home
      topUid: Option[String],       // Android-style top-level fallback
      events: Seq[Seq[String]],     // positional; head may be numeric
      malformed: Boolean)           // truncated document

  private val genStr = Gen.choose(1, 8)
    .flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
  private val genOut: Gen[GOut] = for {
    n <- Gen.choose(1, 3)
    batches <- Gen.listOfN(n, for {
      s <- Gen.choose(0L, 50L)
      f <- Gen.option(Gen.choose(0L, 9L))
    } yield (s, f))
    bare <- Gen.oneOf(true, false)
  } yield GOut(batches, bare && n == 1) // bare form carries exactly one batch
  private val genEngine: Gen[GEngine] = for {
    name <- genStr
    out <- Gen.option(genOut)
  } yield GEngine(name, out)
  private val genSync: Gen[GSync] = for {
    when <- Gen.option(Gen.choose(1L, 100000L))
    uid <- Gen.option(genStr)
    engines <- Gen.listOf(genEngine).map(_.take(3))
  } yield GSync(when, uid, engines)
  private val genEvent: Gen[Seq[String]] = for {
    arity <- Gen.choose(1, 7)
    numericTs <- Gen.oneOf(true, false)
    head = if (numericTs) "12345" else "not-a-ts"
    rest <- Gen.listOfN(math.max(arity - 1, 0), genStr)
  } yield head +: rest
  private val genPing: Gen[GPing] = for {
    oldStyle <- Gen.oneOf(true, false)
    nSyncs <- Gen.choose(0, 3)
    syncs <- Gen.listOfN(if (oldStyle) 1 else nSyncs, genSync)
    payloadUid <- Gen.option(genStr)
    topUid <- Gen.option(genStr)
    events <- Gen.listOf(genEvent).map(_.take(4))
    malformed <- Gen.frequency(4 -> false, 1 -> true)
  } yield GPing(oldStyle, syncs, payloadUid, topUid, events, malformed)
  private val genPings = Gen.listOf(genPing).map(_.take(12))

  // ── deterministic Jackson rendering of every variant shape ──

  private val M = new ObjectMapper()

  private def renderOut(o: GOut): com.fasterxml.jackson.databind.JsonNode = {
    def one(b: (Long, Option[Long])): ObjectNode = {
      val n = M.createObjectNode().put("sent", b._1)
      b._2.foreach(f => n.put("failed", f))
      n
    }
    if (o.bare) one(o.batches.head)
    else {
      val arr = M.createArrayNode()
      o.batches.foreach(b => arr.add(one(b)))
      arr
    }
  }

  private def renderEngines(engines: Seq[GEngine], into: ObjectNode): Unit =
    if (engines.nonEmpty) {
      val arr = into.putArray("engines")
      engines.foreach { e =>
        val n = arr.addObject().put("name", e.name)
        e.out.foreach(o => n.set[ObjectNode]("outgoing", renderOut(o)))
      }
    }

  private def renderEvents(events: Seq[Seq[String]], into: ObjectNode): Unit =
    if (events.nonEmpty) {
      val arr = into.putArray("events")
      events.foreach { ev =>
        val e = arr.addArray()
        ev.zipWithIndex.foreach { case (v, i) =>
          if (i == 0 && v.forall(_.isDigit)) e.add(v.toLong) else e.add(v)
        }
      }
    }

  private def render(p: GPing): String = {
    val root = M.createObjectNode()
    p.topUid.foreach(root.put("uid", _))
    val payload = root.putObject("payload")
    if (p.oldStyle) {
      val s = p.syncs.head
      s.when.foreach(payload.put("when", _))
      // old-style uid lives on the payload (sync uid slot), never per sync
      p.payloadUid.foreach(payload.put("uid", _))
      renderEngines(s.engines, payload)
    } else {
      val arr = payload.putArray("syncs")
      p.syncs.foreach { s =>
        val n = arr.addObject()
        s.when.foreach(n.put("when", _))
        s.uid.foreach(n.put("uid", _))
        renderEngines(s.engines, n)
      }
      p.payloadUid.foreach(payload.put("uid", _))
    }
    renderEvents(p.events, payload)
    val json = M.writeValueAsString(root)
    if (p.malformed) json.dropRight(1) else json
  }

  // ── the driver-side model of the documented shredding contract ──

  /** Surviving syncs of one parseable ping: `when` present and a uid
    * reachable through the documented coalesce chain. */
  private def survivors(p: GPing): Seq[GSync] =
    if (p.oldStyle) {
      val s = p.syncs.head
      val uid = p.payloadUid.orElse(p.topUid)
      if (s.when.isDefined && uid.isDefined) Seq(s) else Nil
    } else p.syncs.filter(s =>
      s.when.isDefined && s.uid.orElse(p.topUid).isDefined)

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  private def parsed(ps: Seq[GPing]) =
    SyncPing.parse(ps.map(render).toDF("json"), "json")

  test("property: processed + ignored + failed == input, failed == malformed") {
    check(Prop.forAll(genPings) { ps =>
      val obs = Observation()
      SyncPing.nestedRows(SyncPing.observeShredding(parsed(ps), obs)).count()
      val m = obs.get
      val failed = m("failed").asInstanceOf[Long]
      val ignored = m("ignored").asInstanceOf[Long]
      val processed = m("processed").asInstanceOf[Long]
      val wantFailed = ps.count(_.malformed)
      val wantProcessed = ps.count(p => !p.malformed && survivors(p).nonEmpty)
      failed + ignored + processed == ps.size &&
        failed == wantFailed && processed == wantProcessed
    })
  }

  test("property: nestedRows row count == model survivors; required cols non-null") {
    check(Prop.forAll(genPings) { ps =>
      val rows = SyncPing.nestedRows(parsed(ps))
        .select("uid", "when").collect()
      val want = ps.filterNot(_.malformed).flatMap(survivors)
      rows.length == want.size &&
        rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1))
    })
  }

  test("property: bare-object outgoing == its one-element-array form, " +
      "rollups match the model") {
    val genCase = for {
      s <- genSync if s.when.isDefined
      uid <- genStr
    } yield (s.copy(uid = Some(uid)), uid)
    check(Prop.forAll(genCase) { case (sync, uid) =>
      def ping(bare: Boolean) = GPing(
        oldStyle = false,
        syncs = Seq(sync.copy(engines = sync.engines.map(e =>
          e.copy(out = e.out.map(o =>
            o.copy(bare = bare && o.batches.size == 1)))))),
        payloadUid = None, topUid = None, events = Nil, malformed = false)
      def rollups(p: GPing) =
        SyncPing.flatRows(parsed(Seq(p)))
          .select("engine_name", "engine_outgoing_batches",
            "engine_outgoing_sent", "engine_outgoing_failed")
          .collect()
          .map(r => (r.getString(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))
          .sortBy(_._1)
      val asArray = rollups(ping(bare = false))
      val asBare = rollups(ping(bare = true))
      // the model: one row per engine (or one all-null row for none),
      // batches == list size, sums with absent `failed` counting 0
      val wantEngines = sync.engines.map { e =>
        (e.name,
          e.out.map(_.batches.size.toLong),
          e.out.map(_.batches.map(_._1).sum),
          e.out.map(_.batches.map(_._2.getOrElse(0L)).sum))
      }.sortBy(_._1)
      val modelOk =
        if (sync.engines.isEmpty)
          asArray.length == 1 && asArray.head._1 == null
        else asArray.toSeq == wantEngines
      modelOk && asArray.toSeq == asBare.toSeq
    })
  }

  test("property: eventRows keeps exactly arity-4..6 numeric-ts events " +
      "of uid-bearing pings, decoded positionally") {
    check(Prop.forAll(genPings) { ps =>
      val got = SyncPing.eventRows(parsed(ps))
        .select("event_timestamp", "event_category", "event_method",
          "event_object", "event_string_value")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
          if (r.isNullAt(4)) None else Some(r.getString(4))))
        .sorted
      val want = ps.filterNot(_.malformed)
        .filter(p => p.payloadUid.orElse(p.topUid).isDefined)
        .flatMap(_.events)
        .filter(ev => ev.size >= 4 && ev.size <= 6 && ev.head.forall(_.isDigit))
        .map(ev => (ev.head.toLong, ev(1), ev(2), ev(3),
          if (ev.size >= 5) Some(ev(4)) else None))
        .sorted
      got.toSeq == want
    })
  }
}
