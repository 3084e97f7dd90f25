package graft

import java.security.MessageDigest

import graft.ext.{Components, Curation}

/** Curation-monitor family (q232-q236): full driver-side integer/double
  * replays at both the spec fixture (sf0.001) and the driver-gate
  * fixture (sf0.01), plus the rounding-boundary margin pins the float
  * discipline requires (CLAUDE.md: never hash-compare a rounded double
  * without measuring the boundary margin).
  */
class CurationSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private case class Doc(source: String, nChars: Long, words: Seq[String])

  private def docsOf(sf: String): Seq[Doc] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "n_chars", "text").collect().toSeq
      .map(r => Doc(r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1).toSeq))

  /** (event_type, epoch-µs) pairs via the same ns→µs integer grid the
    * engine uses (Tables.events emits exact nanos).
    */
  private def eventsOf(sf: String): Seq[(String, Long)] =
    Tables.events(spark, sf).selectExpr("event_type", "ts").collect().toSeq
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 1000L)))

  private def margin(raw: Iterable[Double], scale: Double): Double =
    raw.map { x =>
      val frac = math.abs(x * scale) % 1.0
      math.abs(frac - 0.5)
    }.min

  // ---- q232 PSI drift -----------------------------------------------------

  /** Per-source (ns, k, psi_e9) plus the raw per-bucket terms for
    * margin measurement.
    */
  private def replayPsi(docs: Seq[Doc])
      : (Map[String, (Long, Long, Long)], Seq[Double]) = {
    val lx = docs.groupBy(d => (d.source, d.nChars / 100))
      .view.mapValues(_.size.toLong).toMap
    val buckets = lx.keys.map(_._2).toSet.toSeq.sorted
    val nx = buckets.map(b => b -> lx.collect {
      case ((_, bb), c) if bb == b => c
    }.sum).toMap
    val ns = docs.groupBy(_.source).view.mapValues(_.size.toLong).toMap
    val n = docs.size.toLong
    val k = buckets.size.toLong
    val rawTerms = scala.collection.mutable.ArrayBuffer.empty[Double]
    val table = ns.map { case (src, nsrc) =>
      val psi = buckets.map { b =>
        val nsx = lx.getOrElse((src, b), 0L)
        val nrx = nx(b) - nsx
        val p = (nsx + 1.0) / (nsrc + k).toDouble
        val q = (nrx + 1.0) / (n - nsrc + k).toDouble
        val term = (p - q) * math.log(p / q)
        rawTerms += term
        math.round(term * 1000000000L)
      }.sum
      src -> (nsrc, k, psi)
    }
    (table, rawTerms.toSeq)
  }

  // ---- q233 overdispersion ------------------------------------------------

  private def replayVmr(ev: Seq[(String, Long)])
      : (Map[String, (Long, Long, Long)], Seq[Double]) = {
    val daily = ev.groupBy { case (t, us) => (t, Math.floorDiv(us, 86400000000L)) }
      .view.mapValues(_.size.toLong).toMap
    val raw = scala.collection.mutable.ArrayBuffer.empty[Double]
    val table = daily.keys.map(_._1).toSet.toSeq.sorted.map { t =>
      val xs = daily.collect { case ((tt, _), x) if tt == t => x }.toSeq
      val n = xs.size.toLong
      val s1 = xs.sum
      val s2 = xs.map(x => BigInt(x) * x).sum
      val vmr = (BigInt(n) * s2 - BigInt(s1) * s1).toDouble /
        ((n - 1) * s1).toDouble
      raw += vmr
      t -> (n, s1, math.round(vmr * 10000))
    }.toMap
    (table, raw.toSeq)
  }

  // ---- q234 mixture plan --------------------------------------------------

  private def replayPlan(docs: Seq[Doc])
      : (Map[String, (Long, Long, Long, Long, Long, Long)], Seq[Double]) = {
    val toks = docs.groupBy(_.source)
      .view.mapValues(_.map(_.words.size.toLong).sum).toMap
    val z = toks.values.map(t => math.pow(t.toDouble, 0.7)).sum
    val raw = toks.values.map(t => math.pow(t.toDouble, 0.7) / z).toSeq
    val table = toks.map { case (src, t) =>
      val w = math.round(math.pow(t.toDouble, 0.7) / z * 1000000L)
      val desired = Curation.MixBudget * w / 1000000L
      val planned = math.min(desired, 4L * t)
      src -> (t, w, desired, planned, planned * 10000L / t, desired - planned)
    }
    (table, raw)
  }

  // ---- q236 OOV rate ------------------------------------------------------

  private def replayOov(docs: Seq[Doc])
      : (Map[String, (Long, Long, Long, Long)], Seq[Double]) = {
    val corpus = docs.flatMap(_.words).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val vocab = corpus.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(Curation.OovVocabK).map(_._1).toSet
    val raw = scala.collection.mutable.ArrayBuffer.empty[Double]
    val table = docs.groupBy(_.source).map { case (src, ds) =>
      val tf = ds.flatMap(_.words).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val nTok = tf.values.sum
      val oovEntries = tf.filterNot { case (w, _) => vocab(w) }
      val nOov = oovEntries.values.sum
      val rate = nOov.toDouble / nTok.toDouble
      raw += rate
      src -> (nTok, nOov, oovEntries.size.toLong, math.round(rate * 10000))
    }
    (table, raw.toSeq)
  }

  /** Per-type (n_events, n_cells, mi_part_e9) plus raw per-cell terms
    * for margin measurement (q247).
    */
  private def replayMi(events: Seq[(String, Long)])
      : (Map[String, (Long, Long, Long)], Seq[Double]) = {
    val cells = events
      .groupBy { case (t, us) => (t, ((us / 86400000000L) + 4) % 7) }
      .view.mapValues(_.size.toLong).toMap
    val r = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val c = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = events.size.toLong
    val raw = scala.collection.mutable.ArrayBuffer.empty[Double]
    val table = r.map { case (t, rt) =>
      val mi = cells.collect { case ((tt, dow), o) if tt == t =>
        val term = (o.toDouble / n.toDouble) *
          math.log((o.toDouble * n.toDouble) / (rt.toDouble * c(dow).toDouble))
        raw += term
        math.round(term * 1000000000L)
      }.sum
      t -> (rt, cells.count(_._1._1 == t).toLong, mi)
    }
    (table, raw.toSeq)
  }

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    val tag = sf.split("/").last

    test(s"q232 PSI drift: exact replay at $tag") {
      val (expected, _) = replayPsi(docsOf(sf))
      val got = Curation.q232(spark, sf).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got === expected)
      // PSI is non-negative by construction (sign(p−q) = sign(ln p/q))
      assert(got.values.forall(_._3 >= 0L))
    }

    test(s"q232 PSI: per-bucket e9 rounding margins are wide at $tag") {
      val (_, raw) = replayPsi(docsOf(sf))
      val m = margin(raw, 1e9)
      assert(m > 1e-6, s"min margin $m")
    }

    test(s"q233 overdispersion: exact replay at $tag") {
      val (expected, _) = replayVmr(eventsOf(sf))
      val got = Curation.q233(spark, sf).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got === expected)
      // every type spans many days — the n−1 denominator is live
      assert(expected.values.forall(_._1 > 1L))
    }

    test(s"q233 VMR: e4 rounding margins are wide at $tag") {
      val (_, raw) = replayVmr(eventsOf(sf))
      val m = margin(raw, 1e4)
      assert(m > 1e-6, s"min margin $m")
    }

    test(s"q234 mixture plan: exact replay at $tag") {
      val (expected, _) = replayPlan(docsOf(sf))
      val got = Curation.q234(spark, sf).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
        .toMap
      assert(got === expected)
      // plan sanity: planned ≤ desired, epochs ≤ cap, deficit ≥ 0
      assert(got.values.forall(v => v._4 <= v._3))
      assert(got.values.forall(v => v._5 <= Curation.MaxEpochsE4))
      assert(got.values.forall(v => v._6 >= 0L))
    }

    test(s"q234 weights: e6 rounding margins are wide at $tag") {
      val (_, raw) = replayPlan(docsOf(sf))
      val m = margin(raw, 1e6)
      assert(m > 1e-6, s"min margin $m")
    }

    test(s"q236 OOV rate: exact replay at $tag") {
      val (expected, _) = replayOov(docsOf(sf))
      val got = Curation.q236(spark, sf).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .toMap
      assert(got === expected)
    }

    test(s"q236 OOV: e4 rounding margins are wide at $tag") {
      val (_, raw) = replayOov(docsOf(sf))
      val m = margin(raw, 1e4)
      assert(m > 1e-6, s"min margin $m")
    }

    test(s"q247 mutual information: exact replay at $tag") {
      val (expected, _) = replayMi(eventsOf(sf))
      val got = Curation.q247(spark, sf).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got === expected)
      // MI decomposition sanity: the total over types is ≥ 0 up to
      // per-cell grid error (each cell rounds within ±0.5e-9).
      val nCells = expected.values.map(_._2).sum
      assert(expected.values.map(_._3).sum >= -nCells)
    }

    test(s"q247 MI: per-cell e9 rounding margins are wide at $tag") {
      val (_, raw) = replayMi(eventsOf(sf))
      val m = margin(raw, 1e9)
      assert(m > 1e-6, s"min margin $m")
    }
  }

  // ---- q235 cluster-disjoint split ---------------------------------------

  test("q235 cluster split: census replays from the certified q102 labels " +
    "and no component straddles a split (sf0.01)") {
    val sf = "/root/testdata/sf0.01"
    val labels = Components.q102(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    def splitOf(component: Long): String = {
      val b = md5hex(component.toString).substring(0, 2)
      if (b < "cd") "train" else if (b < "e6") "val" else "test"
    }
    // leak-freedom: split is a function of the component label, so a
    // near-dup group cannot straddle splits — certified here by
    // replaying the assignment per DOC and checking each component's
    // doc-level split set is a singleton
    val docSplit = labels.map { case (id, c) => (id, c, splitOf(c)) }
    assert(docSplit.groupBy(_._2).forall(_._2.map(_._3).toSet.size == 1))
    val expected = labels.groupBy(l => splitOf(l._2))
      .view.mapValues(ms => (ms.size.toLong, ms.map(_._2).toSet.size.toLong))
      .toMap
    val got = Components.q235(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === labels.size.toLong)
  }
}
