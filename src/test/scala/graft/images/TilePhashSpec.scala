package graft.images

import graft.SparkTestBase

/** Quadrant tile hashes and the partial-crop dup rung: the kernel must
  * key on quadrant CONTENT (same content → hamming ~0; different content
  * → far), the generator's planted composites must share exactly their
  * top-left quadrant with their anchor's pattern, and the banded tile
  * query must recover the planted anchor relationships with quadrant-0
  * pairs enriched far beyond the background collision rate. */
class TilePhashSpec extends SparkTestBase {

  private val tier = "/x/sf0.0005" // 2500 rows, shared with DriftBaselineSpec

  test("tile hash keys on quadrant content, not position or the rest") {
    val w = 40; val h = 36
    val a = ImageCodec.synthPixels(7L, w, h)
    val b = ImageCodec.synthPixels(8L, w, h)
    // composite: b's pixels with a's top-left quadrant
    val comp = b.clone()
    val wl = (w + 1) / 2; val hl = (h + 1) / 2
    var y = 0
    while (y < hl) { System.arraycopy(a, y * w, comp, y * w, wl); y += 1 }
    val ta = Phash.tilePhashes(a, w, h)
    val tb = Phash.tilePhashes(b, w, h)
    val tc = Phash.tilePhashes(comp, w, h)
    assert(tc(0) == ta(0), "shared quadrant: identical pixels → identical hash")
    (1 until 4).foreach { q =>
      assert(tc(q) == tb(q), s"untouched quadrant $q must equal b's")
      assert(Phash.hamming(ta(q), tb(q)) > 6,
        s"distinct patterns must not collide at q=$q")
    }
  }

  test("degenerate dims are total: zeros, never a throw") {
    assert(Phash.tilePhashes(Array.empty[Int], 0, 0).forall(_ == 0L))
    assert(Phash.tilePhashes(Array(1, 2, 3), 3, 1).forall(_ == 0L))
  }

  test("truthPixels differs from the synth pattern exactly on the TL quadrant") {
    val i = (0L until 2500L).find(ImageGen.isTileDup)
      .getOrElse(fail("no planted tile composite in 2500 ordinals"))
    val w = 40; val h = 30
    val t = ImageGen.truthPixels(i, w, h)
    val s = ImageCodec.synthPixels(i, w, h)
    val d = ImageCodec.synthPixels(ImageGen.tileAnchor(i), w, h)
    val wl = (w + 1) / 2; val hl = (h + 1) / 2
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val k = y * w + x
        if (x < wl && y < hl) assert(t(k) == d(k), s"($x,$y) must be donor")
        else assert(t(k) == s(k), s"($x,$y) must be own pattern")
        x += 1
      }
      y += 1
    }
    // anchors are never composites themselves (fixpoint)
    assert(!ImageGen.isTileDup(ImageGen.tileAnchor(i)))
  }

  test("banded tile query recovers planted anchor pairs, enriched at q=0") {
    val allRows = graft.DedupQueries.queries("q_dedup_phash_tiles")(
      spark, tier).collect()
    assert(allRows.nonEmpty, "no tile pairs at all")
    def ord(id: String): Long = id.stripPrefix("img-").toLong
    // Exclude the mirror-planted class from the rate math: two mirrors of
    // one anchor are FULL duplicates at different dims, so they match on
    // every quadrant and occasionally clear the full-hamming ≥ 8 gate on
    // cross-resolution noise alone — legitimate output, but it dilutes
    // the q=0 enrichment this test measures on the tile-composite class.
    val rows = allRows.filterNot(r =>
      ImageGen.isMirrorDup(ord(r.getAs[String]("a_id"))) ||
        ImageGen.isMirrorDup(ord(r.getAs[String]("b_id"))))
    val byQ = rows.groupBy(_.getAs[Int]("q"))
    def sameAnchor(r: org.apache.spark.sql.Row): Boolean =
      ImageGen.tileAnchor(ord(r.getAs[String]("a_id"))) ==
        ImageGen.tileAnchor(ord(r.getAs[String]("b_id")))
    val q0 = byQ.getOrElse(0, Array.empty)
    val planted = q0.count(sameAnchor)
    assert(planted >= 10, s"expected ≥10 planted q=0 anchor pairs, got $planted")
    // enrichment: same-anchor-bucket rate at q=0 must dwarf the other
    // quadrants' background collision rate (anchor buckets are 101 wide,
    // so random pairs land in one at ~0.1% — planted composites at ~30%+)
    val rest = (1 until 4).flatMap(q => byQ.getOrElse(q, Array.empty))
    val restRate =
      if (rest.isEmpty) 0.0 else rest.count(sameAnchor).toDouble / rest.size
    val q0Rate = planted.toDouble / math.max(q0.length, 1)
    assert(q0Rate > 10 * restRate + 0.05,
      s"q0 anchor rate $q0Rate not enriched over background $restRate")
    // the contract: every reported pair is regionally near, globally far
    allRows.foreach { r =>
      assert(r.getAs[Int]("tile_hamming") <= 6)
      assert(r.getAs[Int]("full_hamming") >= 8)
    }
  }

  test("crop-duplicate clusters: composites land in their anchor's component") {
    val labels = graft.DedupQueries.queries("q_dedup_phash_tiles_cc")(
      spark, tier).collect()
      .map(r => r.getAs[String]("doc_id") -> r.getAs[String]("comp_id")).toMap
    assert(labels.nonEmpty, "no clusters at all")
    // every label is the min reachable id: label ≤ member
    labels.foreach { case (d, c) => assert(c <= d, s"$d labeled $c") }
    // at least one planted anchor co-clusters with a composite of its
    // bucket (both must be < 1000, decodable, and actually paired)
    def ord(id: String): Long = id.stripPrefix("img-").toLong
    val sameAnchor = labels.groupBy(_._2).values.exists { comp =>
      comp.size >= 2 &&
        comp.keys.map(k => ImageGen.tileAnchor(ord(k))).toSet.size == 1
    }
    assert(sameAnchor, s"no anchor-consistent component: $labels")
  }
}
