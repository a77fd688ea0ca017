package graft.images

import graft.SparkTestBase

/** Dihedral (D4) pHash family and the mirror-duplicate rung: the eight
  * variant hashes must be exact coefficient-space re-reads of ONE DCT
  * over the flip/transpose-symmetric resample (variant k of an image ==
  * variant 0 of its k-transform, ANY dims), the plain hash must diverge
  * under mirror (the blindness the rung exists to close), and the banded
  * multi-probe query must recover the generator's planted mirror-anchor
  * relationships cross-resolution. Thresholds pinned from
  * graft.dev.MirrorCalib: same-dims probe-vs-plain hamming 0 across 600
  * samples; planted cross-resolution min-probe ≤6 for 53/56. */
class MirrorPhashSpec extends SparkTestBase {

  private val tier = "/x/sf0.0005" // 2500 rows, shared with TilePhashSpec

  private def mirrorX(px: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = px(y * w + (w - 1 - x)); x += 1 }
      y += 1
    }
    out
  }

  private def rot180(px: Array[Int]): Array[Int] = px.reverse

  private def transposePx(px: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(x * h + y) = px(y * w + x); x += 1 }
      y += 1
    }
    out
  }

  test("coefficient-space transforms equal brute-force recomputation, any dims") {
    // the symmetric resample makes these EXACT even at off-multiple dims
    // (45×37: 1–2 px boxes, where the floor-box resample was 8–14 bits off)
    for (i <- Seq(3L, 11L, 42L, 977L, 1234L); (w, h) <- Seq((45, 37), (40, 30), (64, 32))) {
      val px = ImageCodec.synthPixels(i, w, h)
      val d = Phash.dihedralPhashes(px, w, h)
      assert(d(1) == Phash.dihedralPhashes(mirrorX(px, w, h), w, h)(0),
        s"flip-x variant mismatch at ordinal $i dims ($w,$h)")
      assert(d(3) == Phash.dihedralPhashes(rot180(px), w, h)(0),
        s"rot180 variant mismatch at ordinal $i dims ($w,$h)")
      assert(d(4) == Phash.dihedralPhashes(transposePx(px, w, h), h, w)(0),
        s"transpose variant mismatch at ordinal $i dims ($w,$h)")
    }
  }

  test("orbit is closed: a mirror's probe set equals the original's, permuted") {
    val w = 45; val h = 37
    val px = ImageCodec.synthPixels(7L, w, h)
    val a = Phash.dihedralPhashes(px, w, h)
    val b = Phash.dihedralPhashes(mirrorX(px, w, h), w, h)
    assert(a.toSet == b.toSet, "mirror must yield the same 8-hash orbit")
    assert(a.toSet.size >= 6, "orbit elements must be distinct for a generic image")
  }

  test("plain phash64 is structurally blind to mirrors") {
    for (i <- Seq(5L, 42L, 977L)) {
      val w = 64; val h = 32
      val px = ImageCodec.synthPixels(i, w, h)
      assert(Phash.hamming(Phash.phash64(px, w, h),
        Phash.phash64(mirrorX(px, w, h), w, h)) > 12,
        "plain phash must diverge under mirror (odd-u sign flips)")
    }
  }

  test("planted D4 rows carry the anchor's transformed pattern, all four kinds") {
    val planted = (0L until 20000L).filter(ImageGen.isMirrorDup)
    val byKind = planted.groupBy(ImageGen.mirrorKind)
    assert(byKind.keySet == Set(0, 1, 2, 3),
      s"all four transform kinds must be planted, got ${byKind.keySet}")
    val w = 48; val h = 36
    for ((kind, is) <- byKind) {
      val i = is.head
      val a = ImageGen.mirrorAnchor(i)
      assert(a != i && !ImageGen.isMirrorDup(a), "anchors are never mirrors themselves")
      assert(!ImageGen.isTileDup(i), "mirrors are disjoint from tile composites")
      val t = ImageGen.truthPixels(i, w, h)
      val expected = kind match {
        case 0 => mirrorX(ImageCodec.synthPixels(a, w, h), w, h)
        case 1 => // flip-y = rot180 ∘ flip-x
          rot180(mirrorX(ImageCodec.synthPixels(a, w, h), w, h))
        case 2 => rot180(ImageCodec.synthPixels(a, w, h))
        case _ => transposePx(ImageCodec.synthPixels(a, h, w), h, w)
      }
      assert(t.sameElements(expected), s"kind-$kind row ≠ transformed anchor pattern")
    }
  }

  test("banded mirror query recovers planted anchor pairs; plain banding is blind") {
    val rows = graft.DedupQueries.queries("q_dedup_phash_mirror")(
      spark, tier).collect()
    assert(rows.nonEmpty, "no mirror pairs at all")
    def ord(id: String): Long = id.stripPrefix("img-").toLong
    def sameAnchor(a: String, b: String): Boolean =
      ImageGen.mirrorAnchor(ord(a)) == ImageGen.mirrorAnchor(ord(b))
    val planted = rows.filter(r =>
      sameAnchor(r.getAs[String]("a_id"), r.getAs[String]("b_id")))
    assert(planted.size >= 10, s"expected ≥10 planted mirror-anchor pairs, got ${planted.size}")
    // the recovered pairs must span several TRANSFORM kinds — flips,
    // rotations, and transposes all ride the same probe banding
    val kinds = planted.flatMap { r =>
      Seq(ord(r.getAs[String]("a_id")), ord(r.getAs[String]("b_id")))
        .filter(ImageGen.isMirrorDup).map(ImageGen.mirrorKind)
    }.toSet
    assert(kinds.size >= 3, s"expected ≥3 distinct D4 kinds recovered, got $kinds")
    // the contract: some dihedral probe near, plain hashes far
    rows.foreach { r =>
      assert(r.getAs[Int]("dih_hamming") <= 6)
      assert(r.getAs[Int]("full_hamming") >= 12)
    }
    // structural blindness: the plain-phash banded rung must find NONE of
    // the mirror pairs (their plain hamming is ~32, far beyond its ≤4 cut)
    val plain = graft.DedupQueries.queries("q_dedup_phash_banded")(
      spark, tier).collect()
      .map(r => (r.getAs[String]("a_id"), r.getAs[String]("b_id"))).toSet
    val mirrorPairs = rows.map(r =>
      (r.getAs[String]("a_id"), r.getAs[String]("b_id"))).toSet
    assert(mirrorPairs.intersect(plain).isEmpty,
      "plain banding unexpectedly found mirror pairs")
  }

  test("orientation-free clusters: mirrors land in their anchor's component") {
    val labels = graft.DedupQueries.queries("q_dedup_phash_mirror_cc")(
      spark, tier).collect()
      .map(r => r.getAs[String]("doc_id") -> r.getAs[String]("comp_id")).toMap
    assert(labels.nonEmpty, "no clusters at all")
    // every label is the min reachable id: label ≤ member
    labels.foreach { case (d, c) => assert(c <= d, s"$d labeled $c") }
    def ord(id: String): Long = id.stripPrefix("img-").toLong
    // at least one planted mirror co-clusters with a node of its anchor
    // bucket — the orientation-free survivor rule plain components miss
    val mirrorJoined = labels.count { case (d, c) =>
      ImageGen.isMirrorDup(ord(d)) &&
        ImageGen.mirrorAnchor(ord(d)) == ImageGen.mirrorAnchor(ord(c)) && d != c
    }
    assert(mirrorJoined >= 3,
      s"expected ≥3 mirrors clustered into their anchor bucket, got $mirrorJoined")
  }
}
