package graft.sketch

import scala.collection.mutable

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982), with the
  * MERGEABLE combine of Agarwal et al., "Mergeable Summaries" (PODS 2012,
  * §3): sum counters pairwise, then subtract the (k+1)-th largest counter
  * value and drop non-positive entries — the merged summary keeps the MG
  * guarantee `true − n/(k+1) ≤ est ≤ true` over the COMBINED stream, so
  * partition-local sketches fold into a corpus-wide one without revisiting
  * data (the property a 10^12-token frequency pass needs).
  *
  * The per-item estimates depend on merge ORDER (Spark's partition-merge
  * order is not deterministic), so downstream operators must never emit
  * raw estimates into hash-compared output: [[graft.TextQueries]]' heavy
  * hitters use the sketch only to NOMINATE candidates (guaranteed to be a
  * superset of the true φ-heavy items whenever k ≥ 1/φ) and confirm exact
  * counts in a second bounded pass.
  */
class MisraGries(val k: Int) extends Serializable {
  require(k > 0, "k must be positive")
  val counters: mutable.Map[String, Long] = mutable.Map.empty
  var n: Long = 0L // total stream weight seen

  def add(item: String, w: Long = 1L): Unit = {
    n += w
    counters.get(item) match {
      case Some(c) => counters.update(item, c + w)
      case None =>
        if (counters.size < k) counters.update(item, w)
        else {
          // decrement all by the largest amount that zeroes >=1 counter
          // (batched decrement — equivalent to w unit MG steps)
          val dec = math.min(w, counters.values.min)
          val rem = w - dec
          counters.mapValuesInPlace((_, c) => c - dec)
          counters.filterInPlace((_, c) => c > 0)
          if (rem > 0) add(item, rem) else ()
          n -= rem // the recursive call re-counts rem
        }
    }
  }

  /** Mergeable-summaries combine: keeps the top-k merged counters after
    * subtracting the (k+1)-th largest — error bounds ADD, staying ≤ n/(k+1)
    * of the combined stream. */
  def merge(other: MisraGries): MisraGries = {
    require(other.k == k, "cannot merge sketches of different capacity")
    other.counters.foreach { case (item, c) =>
      counters.update(item, counters.getOrElse(item, 0L) + c)
    }
    n += other.n
    if (counters.size > k) {
      val kth = counters.values.toSeq.sorted(Ordering[Long].reverse)(k)
      counters.mapValuesInPlace((_, c) => c - kth)
      counters.filterInPlace((_, c) => c > 0)
    }
    this
  }

  /** Items that MIGHT have true frequency > phi*n — guaranteed to include
    * every item that DOES (no false negatives) when the summary was built
    * with k ≥ 1/phi: est ≥ true − n/(k+1) > phi·n − n/(k+1) ≥ 0. */
  def candidates(phi: Double): Seq[String] = {
    val floor = phi * n - n.toDouble / (k + 1)
    counters.collect { case (item, c) if c > floor => item }.toSeq.sorted
  }

  def toBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(k); out.writeLong(n); out.writeInt(counters.size)
    counters.toSeq.sortBy(_._1).foreach { case (s, c) =>
      out.writeUTF(s); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }
}

object MisraGries {
  def fromBytes(bytes: Array[Byte]): MisraGries = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val mg = new MisraGries(in.readInt())
    mg.n = in.readLong()
    val sz = in.readInt()
    (0 until sz).foreach { _ => val s = in.readUTF(); mg.counters.update(s, in.readLong()) }
    mg
  }
}
