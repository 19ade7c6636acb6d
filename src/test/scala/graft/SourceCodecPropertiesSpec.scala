package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{OsmMember, OsmNode, OsmRelation, OsmWay}
import graft.sources.{O5m, Opl, OsmPbf}

/** Property-based round-trips for the three writers this repo ships
  * (O5M / OPL / PBF): arbitrary entity worlds — adversarial tag
  * strings (the OPL escape set, unicode), negative/extreme 1e-7-grid
  * coordinates, 40-bit ids — must come back through each format's
  * REAL parser with the transported content intact. q112 pins the
  * cross-format digest on the reference's fixed fixture; this spec
  * walks the input space around it (raw ScalaCheck through assert,
  * like geom/GeomPropertiesSpec — no scalatestplus bridge on the
  * classpath). */
class SourceCodecPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    // pinned initial seed: a failing counterexample reproduces on
    // re-run (the repo's determinism discipline — unseeded ScalaCheck
    // failures are one-shot)
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(60)
        .withInitialSeed(org.scalacheck.rng.Seed(0x6aF7_11d3_5eed_2026L)), p)
    assert(res.passed, res.status.toString)
  }

  // --- generators ---------------------------------------------------

  /** Tag/user/role text: alphanumerics plus exactly the characters
    * the OPL escaper must handle (space, comma, '=', '%', tab) and
    * some multi-byte unicode. */
  private val txtChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', ',', '=', '%', '@', '\t'),
    1 -> Gen.oneOf('ü', '€', 'ß', '中'))
  private val txt: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, txtChar)).map(_.mkString)
  private val txtNonEmpty: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, txtChar)).map(_.mkString)

  private val tagsGen: Gen[Map[String, String]] =
    Gen.chooseNum(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.zip(txtNonEmpty, txt)).map(_.toMap))

  private val idGen: Gen[Long] = Gen.chooseNum(1L, 1L << 40)

  private val nodeGen: Gen[OsmNode] = for {
    id <- idGen
    lonN <- Gen.chooseNum(-1799999999L, 1799999999L)
    latN <- Gen.chooseNum(-899999999L, 899999999L)
    tags <- tagsGen
    user <- txt
    uid <- Gen.chooseNum(0L, 1L << 20)
  } yield OsmNode(id, version = 1, timestamp = 0L, changeset = 1L,
    uid = uid, user = user, lon = lonN / 1e7, lat = latN / 1e7,
    tags = tags)

  private val wayGen: Gen[OsmWay] = for {
    id <- idGen
    n <- Gen.chooseNum(1, 8)
    refs <- Gen.listOfN(n, idGen)
    tags <- tagsGen
  } yield OsmWay(id, nodes = refs, tags = tags)

  private val relGen: Gen[OsmRelation] = for {
    id <- idGen
    n <- Gen.chooseNum(0, 6)
    members <- Gen.listOfN(n, for {
      t <- Gen.oneOf("n", "w", "r")
      ref <- idGen
      role <- txt
    } yield OsmMember(t, ref, role))
    tags <- tagsGen
  } yield OsmRelation(id, members = members, tags = tags)

  /** A world: id-sorted, id-distinct entity lists (the writers share
    * the formats' ordered-file contract, like the reference). */
  private val worldGen: Gen[(Seq[OsmNode], Seq[OsmWay], Seq[OsmRelation])] =
    for {
      ns <- Gen.chooseNum(1, 20).flatMap(Gen.listOfN(_, nodeGen))
      ws <- Gen.chooseNum(0, 10).flatMap(Gen.listOfN(_, wayGen))
      rs <- Gen.chooseNum(0, 6).flatMap(Gen.listOfN(_, relGen))
    } yield (
      ns.groupBy(_.id).map(_._2.head).toSeq.sortBy(_.id),
      ws.groupBy(_.id).map(_._2.head).toSeq.sortBy(_.id),
      rs.groupBy(_.id).map(_._2.head).toSeq.sortBy(_.id))

  // --- canonical transported content (q112's projection) ------------

  private def grid(d: Double): Long = math.round(d * 1e7)
  private def canonN(n: OsmNode) =
    ("n", n.id, grid(n.lon), grid(n.lat), n.tags.toSeq.sorted, Nil, Nil)
  private def canonW(w: OsmWay) =
    ("w", w.id, 0L, 0L, w.tags.toSeq.sorted, w.nodes.toList, Nil)
  private def canonR(r: OsmRelation) =
    ("r", r.id, 0L, 0L, r.tags.toSeq.sorted, Nil,
      r.members.map(m => (m.mtype, m.ref, m.role)).toList)
  private def canon(ns: Seq[OsmNode], ws: Seq[OsmWay],
      rs: Seq[OsmRelation]) =
    (ns.map(canonN) ++ ws.map(canonW) ++ rs.map(canonR)).toSet

  test("O5M: encode then parse preserves the transported content") {
    check(Prop.forAll(worldGen) { case (ns, ws, rs) =>
      val p = O5m.parseBytes(O5m.encode(ns, ws, rs))
      canon(p.nodes.map(_._2), p.ways.map(_._2),
        p.relations.map(_._2)) == canon(ns, ws, rs)
    })
  }

  test("OPL: render then parse preserves the transported content") {
    check(Prop.forAll(worldGen) { case (ns, ws, rs) =>
      val entities = Opl.render(ns, ws, rs).split("\n")
        .filter(_.nonEmpty).map(Opl.parseLine).toSeq
      val pn = entities.collect { case Opl.N(_, n) => n }
      val pw = entities.collect { case Opl.W(_, w) => w }
      val pr = entities.collect { case Opl.R(_, r) => r }
      canon(pn, pw, pr) == canon(ns, ws, rs)
    })
  }

  test("PBF: encode then blob-decode preserves the transported content") {
    check(Prop.forAll(worldGen) { case (ns, ws, rs) =>
      val f = Files.createTempFile("graft_pbf_prop", ".osm.pbf")
      try {
        Files.write(f, OsmPbf.encode(ns, ws, rs))
        val ents = OsmPbf.scanBlobs(f.toString)
          .map(s => OsmPbf.decodeBlock(OsmPbf.readBlob(s)))
        val pn = ents.flatMap(_.nodes)
        val pw = ents.flatMap(_.ways)
        val pr = ents.flatMap(_.relations)
        canon(pn, pw, pr) == canon(ns, ws, rs)
      } finally Files.delete(f)
    })
  }
}
