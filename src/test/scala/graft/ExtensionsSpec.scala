package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Extension-operator semantics on tiny local fixtures plus the sf0.001
  * testdata (read-only driver fixtures).
  */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- text analysis ----------------------------------------------------

  test("tokenCount and stopword hits") {
    val r = Seq("the cat and the hat").toDF("text")
      .select(
        TextAnalysis.tokenCount($"text"),
        TextAnalysis.stopwordHits($"text", Seq("the", "and")))
      .head()
    assert((r.getInt(0), r.getInt(1)) === ((5, 3)))
  }

  test("guessLang picks the best stopword list with stable tie-break") {
    val out = Seq(
      (1, "the cat of a hat"),          // en
      (2, "der hund und die katze"),    // de
      (3, "le chat et la maison"),      // fr
      (4, "xyz qqq zzz")                // no stopwords at all
    ).toDF("id", "text")
      .select($"id", TextAnalysis.guessLang($"text").as("g"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out === Seq("en", "de", "fr", "unknown"))
  }

  test("qualityScore rewards long non-stopword text, bounded by 1") {
    val rows = Seq(
      ("short", "a the a the"),                       // all stopwords
      ("long", Seq.fill(60)("word").mkString(" "))    // 60 plain tokens
    ).toDF("id", "text")
      .select($"id", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("short") === 0.0)
    assert(rows("long") === 1.0)
  }

  test("fingerprint is whitespace/case-canonical") {
    val fps = Seq("Hello  World", "hello world", "other").toDF("text")
      .select(TextAnalysis.fingerprint($"text")).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  // ---- dedup ------------------------------------------------------------

  test("jaccardSets on known sets") {
    val r = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Dedup.jaccardSets($"x", $"y")).head().getDouble(0)
    assert(r === 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("shingles3: trigrams for long text, empty under 3 tokens") {
    val out = Seq("a b c d", "a b").toDF("text")
      .select(Dedup.shingles3($"text").as("sh")).collect()
    assert(out(0).getSeq[String](0) === Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](0).isEmpty)
  }

  test("simhash: identical texts collide, near texts are close, disjoint far") {
    val df = Seq(
      (1L, "spark scans the table and joins rows fast"),
      (2L, "spark scans the table and joins rows fast"),    // identical
      (3L, "spark scans a table and joins rows quickly"),   // near
      (4L, "zzz qqq www eee rrr ttt yyy uuu")               // disjoint
    ).toDF("id", "text")
    val hs = Dedup.simhash(df, $"id", $"text").orderBy("__id")
      .collect().map(_.getLong(1))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hs(0) === hs(1))
    assert(hamming(hs(0), hs(2)) < hamming(hs(0), hs(3)))
  }

  test("simhash band pairs find exactly the brute-force pairs within maxHamming") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val hashed = Dedup.simhashN(docs, col("doc_id"), col("text"), bits = 32)
    val banded = Dedup.simhashBandPairs(hashed, bits = 32, bands = 4, maxHamming = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the collected fingerprints (500 docs -> fine locally)
    val hs = hashed.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (ia, ib)).toSet
    // pigeonhole: hamming<=2 over 4 bands => at least one band agrees,
    // so banding must be COMPLETE, not just sound
    assert(banded === brute)
    assert(banded.nonEmpty)
  }

  test("minhash near-dup query is deterministic across runs") {
    val a = Dedup.q57(spark, sf).collect().toSeq
    val b = Dedup.q57(spark, sf).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  // ---- similarity -------------------------------------------------------

  test("dot and l2Norm on known vectors") {
    val r = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 1.0))).toDF("a", "b")
      .select(Similarity.dot($"a", $"b"), Similarity.l2Norm($"a")).head()
    assert(r.getDouble(0) === 4.0)
    assert(r.getDouble(1) === 3.0)
  }

  test("brute-force knn: self is always the top match with sim_c 100") {
    val out = Similarity.q60(spark, sf)
    val selfRows = out.filter($"qid" === $"did").collect()
    assert(selfRows.length === 50)
    assert(selfRows.forall(_.getLong(2) === 100L))
  }

  test("LSH knn: self-bucket always found, candidate volume bounded below all-pairs") {
    val brute = Similarity.q60(spark, sf)
    val lsh = Similarity.q61(spark, sf)
    // self-match (sim 1.0) must always be in its own bucket
    assert(lsh.filter($"qid" === $"did").count() === 50)
    // candidate volume must be far below all-pairs
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(lsh.count() <= 50L * 3)
    assert(n * n > 50L * n, "sanity: all-pairs would be larger")
    assert(brute.count() === 250)
  }

  test("LSH signatures are deterministic (no RNG)") {
    val planes1 = Similarity.hyperplanes(8, 64)
    val planes2 = Similarity.hyperplanes(8, 64)
    assert(planes1.map(_.toSeq).toSeq === planes2.map(_.toSeq).toSeq)
  }

  // ---- multimodal -------------------------------------------------------

  test("binarize produces payload bytes + typed metadata struct") {
    val out = Multimodal.binarize(Seq((7L, "héllo")).toDF("id", "t"), $"id", $"t")
    assert(out.schema.fieldNames.toSeq === Seq("media_id", "payload", "meta"))
    val r = out.head()
    assert(r.getAs[Array[Byte]]("payload").length === 6) // é is 2 bytes in UTF-8
    assert(r.getStruct(2).getLong(0) === 6L)
    assert(r.getStruct(2).getString(1) === "text/plain")
  }

  test("decodeStub yields 4 deterministic features in [0,1]") {
    val media = Multimodal.binarize(Seq((1L, "abc")).toDF("id", "t"), $"id", $"t")
    val f1 = media.select(Multimodal.decodeStub($"payload")).head().getSeq[Double](0)
    val f2 = media.select(Multimodal.decodeStub($"payload")).head().getSeq[Double](0)
    assert(f1 === f2)
    assert(f1.length === 4)
    assert(f1.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("rollingHash is order-sensitive where the canonical fingerprint is not") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2")
      .select(
        TextAnalysis.rollingHash(split($"t1", " ")).as("h1"),
        TextAnalysis.rollingHash(split($"t2", " ")).as("h2"))
    val r = df.head()
    assert(r.getLong(0) !== r.getLong(1))
    // determinism
    assert(df.head().getLong(0) === r.getLong(0))
  }

  test("scrubPii redacts emails and phone tokens, passes clean text through untouched") {
    val df = Seq(
      "reach me at jane.doe+spam@sub.example.co.uk today",
      "call 555-0199 or 555-12345 now", // second token: only the 555-1234 prefix matches
      "the fast key order sort table scan" // clean corpus text — must be identity
    ).toDF("t").select(TextAnalysis.scrubPii($"t").as("s"))
    val out = df.collect().map(_.getString(0))
    assert(out(0) === "reach me at [EMAIL] today")
    assert(out(1) === "call [PHONE] or [PHONE]5 now")
    assert(out(2) === "the fast key order sort table scan")
  }

  test("decodeBatch: per-partition batch decode with typed output schema") {
    val media = Multimodal.binarize(
      Seq((1L, "hello"), (2L, "world")).toDF("id", "t"), $"id", $"t")
    val out = Multimodal.decodeBatch(spark, media).orderBy("media_id").collect()
    assert(out.length === 2)
    assert(out(0).n_bytes === 5L && out(0).width >= 1 && out(0).height >= 1)
    // deterministic checksum per payload
    val again = Multimodal.decodeBatch(spark, media).orderBy("media_id").collect()
    assert(out.map(_.checksum).toSeq === again.map(_.checksum).toSeq)
  }

  test("sampleFrames fans out n rows per media item") {
    val media = Multimodal.binarize(
      Seq((1L, "aa"), (2L, "bb")).toDF("id", "t"), $"id", $"t")
    val frames = Multimodal.sampleFrames(media, nFrames = 4)
    assert(frames.count() === 8)
    assert(frames.select("frame_idx").distinct().count() === 4)
    // per-frame keys differ (a decoder would seek per frame)
    assert(frames.select("frame_key").distinct().count() === 8)
  }

  test("portable minhash: identical shingle sets share ALL bands, disjoint none") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")),   // identical to 1
      (3L, Seq("x y z", "y z w"))             // fully disjoint
    ).toDF("doc_id", "sh")
    val sig = Dedup.minhashSignature(df, $"doc_id", $"sh", numHashes = 12)
    val pairs = Dedup.minhashBandPairs(sig, numHashes = 12, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs === Map((1L, 2L) -> 4L))
  }

  test("minhashBandJoin is strictly bipartite: no within-side pairs") {
    // All four docs share the same shingle set, so EVERY cross pair
    // collides on all 4 bands — but incoming×incoming (1,3) and
    // reference×reference (2,4) must never appear.
    val sh = Seq("a b c", "b c d", "c d e")
    val df = Seq((1L, sh), (2L, sh), (3L, sh), (4L, sh)).toDF("doc_id", "sh")
    val sig = Dedup.minhashSignature(df, $"doc_id", $"sh", numHashes = 12)
    val out = Dedup.minhashBandJoin(
      incoming = sig.filter($"__id" % 2 === 1),
      reference = sig.filter($"__id" % 2 === 0),
      numHashes = 12, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (1L, 2L) -> 4L, (1L, 4L) -> 4L, (3L, 2L) -> 4L, (3L, 4L) -> 4L))
  }

  test("q122 cross-corpus candidates are odd-incoming × even-reference") {
    val out = Dedup.q122(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) % 2 == 1 && r.getLong(1) % 2 == 0))
  }

  test("q121 filtered knn: every hit is eligible, ranks within the filtered set") {
    val docs = Tables.table(spark, sf, "documents")
    val en = docs.filter($"lang" === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val out = Similarity.q121(spark, sf).collect()
    assert(out.nonEmpty)
    // pre-filter contract: every returned neighbor is in the eligible set
    assert(out.forall(r => en.contains(r.getLong(1))))
    // exactly <= 3 per query, and self-match leads when the query is eligible
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length <= 3))
    byQ.foreach { case (qid, rows) =>
      if (en.contains(qid)) assert(rows.exists(r => r.getLong(1) == qid))
    }
  }

  test("q123 semdedup: drop list is sound and deterministic") {
    val out = Similarity.q123(spark, sf).collect()
    assert(out.nonEmpty)
    // every dropped doc was triggered by >= 1 pair at/above threshold,
    // and carries a valid cluster id (a seed vec_id < 8)
    assert(out.forall(r => r.getLong(2) >= 1L && r.getLong(3) >= 35L))
    assert(out.forall(r => r.getLong(1) >= 0L && r.getLong(1) < 8L))
    // keep-lowest-id contract: vec_id 0 has no smaller partner in any
    // cluster, so it can never appear on the drop list
    val dropped = out.map(_.getLong(0))
    assert(!dropped.contains(0L))
    assert(dropped.distinct.length === dropped.length)
    // reproducible: an independent evaluation is identical
    val again = Similarity.q123(spark, sf).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("portable minhash signature is deterministic across evaluations") {
    val df = Seq((1L, Seq("a b c", "d e f"))).toDF("doc_id", "sh")
    val s1 = Dedup.minhashSignature(df, $"doc_id", $"sh", 12).collect()
    val s2 = Dedup.minhashSignature(df, $"doc_id", $"sh", 12).collect()
    assert(s1.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq)
  }

  test("shinglesKAll keeps occurrences; shinglesK dedups them") {
    val df = Seq(Tuple1(Seq("a", "b", "a", "b", "a"))).toDF("ws")
    val all = df.select(Dedup.shinglesKAll($"ws", 2)).head().getSeq[String](0)
    assert(all === Seq("a b", "b a", "a b", "b a"))
    val dst = df.select(Dedup.shinglesK($"ws", 2)).head().getSeq[String](0)
    assert(dst === Seq("a b", "b a"))
  }

  test("deflate_len is deterministic and orders repetitive below random text") {
    import graft.ops.DeflateUtil
    import org.apache.spark.unsafe.types.UTF8String
    val repetitive = "spam ham " * 200
    val varied = (1 to 400).map(i => s"w${i * 7919 % 1000}").mkString(" ")
    val rLen = DeflateUtil.deflateLen(UTF8String.fromString(repetitive))
    val vLen = DeflateUtil.deflateLen(UTF8String.fromString(varied))
    assert(rLen === DeflateUtil.deflateLen(UTF8String.fromString(repetitive)))
    // repetitive text compresses far better
    assert(rLen.toDouble / repetitive.length <
      0.5 * vLen.toDouble / varied.length)
    // SQL registry + codegen path agree with the direct call
    val viaSql = spark.sql(
      s"SELECT deflate_len('${repetitive.take(100)}')").head().getInt(0)
    assert(viaSql ===
      DeflateUtil.deflateLen(UTF8String.fromString(repetitive.take(100))))
  }

  test("q421 warm k-means equals the in-memory two-round unroll, and the " +
    "float margins (sim e6, mean e4) sit orders above summation drift") {
    val unit = Similarity.withUnitVec(
      Tables.table(spark, sf, "embeddings"), "embedding", "u")
      .select("vec_id", "u")
    val seeds0 = unit.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"u".as("cu"))
    val c1 = Similarity.kmeansCentroidRound(unit, seeds0).localCheckpoint(true)
    val cold = Similarity.kmeansStep(unit, c1)
    val warm = Similarity.q421(spark, sf)
    // Warm ≡ cold: the centroid store's parquet round-trip is exact, so
    // the second round from the read-back matches the in-memory chain.
    assert(warm.exceptAll(cold).isEmpty && cold.exceptAll(warm).isEmpty,
      "warm round off the centroid store diverged from the in-memory unroll")
    // Rounding-boundary margins (the q134 discipline): the oracle
    // recomputes round-1 centroids with its own summation order
    // (~1e-10 relative drift), so every UNROUNDED round-2 sim must sit
    // far from its e6 rounding boundary, and every output mean far from
    // its e4 boundary. Driver-side exact recompute on the tiny frames
    // (8x64 centroids, fixture vectors).
    def frac05(v: Double, scale: Double): Double = {
      val f = ((v * scale) % 1 + 1) % 1
      math.abs(f - 0.5)
    }
    val cents = c1.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val vecs = unit.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val simMargins = for ((_, v) <- vecs; (_, c) <- cents) yield
      frac05(v.zip(c).map { case (a, b) => a * b }.sum, 1e6)
    assert(simMargins.min > 1e-7,
      s"round-2 sim margin collapsed: ${simMargins.min}")
    // Output-mean e4 margins: replay round 2's assignment + means in
    // plain Scala (sum-order differences vs Spark are the very ~1e-10
    // drift the margin must dwarf, so they don't disturb the measure).
    val assigned = vecs.map { case (_, v) =>
      val best = cents.toSeq.map { case (cid, c) =>
        (cid, math.rint(v.zip(c).map { case (a, b) => a * b }.sum * 1e6) / 1e6)
      }.sortBy { case (cid, s) => (-s, cid) }.head._1
      (best, v)
    }
    val dims = vecs.head._2.length
    val meanMargins = assigned.groupBy(_._1).toSeq.flatMap { case (_, m) =>
      (0 until dims).map(d => m.map(_._2(d)).sum / m.length)
    }.map(frac05(_, 1e4))
    assert(meanMargins.min > 1e-7,
      s"mean e4 margin collapsed: ${meanMargins.min}")
    assert(warm.count() === cents.size.toLong * dims,
      "output grid incomplete — some centroid lost all members")
  }

  test("kmeansFit recovers well-separated clusters deterministically") {
    // 3 clusters hugging orthogonal axes in 4 dims; ids arranged so the
    // deterministic seeds (lowest 3 ids) land one per cluster
    def v(axis: Int, eps: Double): Seq[Double] =
      (0 until 4).map(i => if (i == axis) 1.0 else eps)
    val rows = Seq(
      (0L, v(0, 0.05)), (1L, v(1, 0.04)), (2L, v(2, 0.03)),
      (3L, v(0, 0.08)), (4L, v(1, 0.07)), (5L, v(2, 0.06)),
      (6L, v(0, 0.02)), (7L, v(1, 0.01)), (8L, v(2, 0.09)))
    val unit = Similarity
      .withUnitVec(rows.toDF("vec_id", "embedding"), "embedding", "u")
      .select("vec_id", "u")
    val got = Similarity.kmeansFit(unit, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      0L -> 0L, 3L -> 0L, 6L -> 0L,
      1L -> 1L, 4L -> 1L, 7L -> 1L,
      2L -> 2L, 5L -> 2L, 8L -> 2L))
    // rerun-stable (no RNG anywhere)
    val again = Similarity.kmeansFit(unit, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
  }

  test("bytes-path CMS (cmsTopTerms): never undercounts, eps*N bound — " +
    "the persistable-sketch variant stays certified") {
    // q114 switched to the portable md5 CMS in r10; this pins the
    // spark.util.sketch bytes path (the variant whose sketches persist
    // and merge across jobs) against the same exact-count contract.
    val dir = "/root/testdata/sf0.001"
    val est = graft.queries.Round4.cmsTopTerms(spark, dir, vocabCap = 1000)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val toks = graft.Tables.table(spark, dir, "documents")
      .select($"source", explode(split($"text", " ")).as("term"))
    val exact = toks.groupBy($"source", $"term").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = toks.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty && exact.keySet.subsetOf(est.keySet))
    est.foreach { case ((src, term), e) =>
      val x = exact.getOrElse((src, term), 0L)
      assert(e >= x, s"bytes CMS undercounts $src/$term: $e < $x")
      assert(e <= x + (0.001 * totals(src)).ceil.toLong + 1,
        s"bytes CMS overcount beyond eps*N for $src/$term: $e vs $x")
    }
  }

  test("portable HLL shard merge: two-level per-shard MAX-merge is " +
    "bit-identical to the one-level register file (q97's collapse)") {
    // r11: q97 now builds registers in ONE groupBy(priority, reg).
    // This pins the claim that made the collapse safe: building
    // per-(status-shard, priority) register files first and MAX-merging
    // across shards (HLL union — what a persist-then-merge production
    // flow does) yields the SAME register file, hence the same
    // estimates, because register MAX is associative.
    val dir = "/root/testdata/sf0.001"
    val orders = graft.Tables.table(spark, dir, "orders")
    val oneLevel = graft.ops.Sketches.hllPortableRegisters(
      orders, Seq("o_orderpriority"), $"o_custkey")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val perShard = graft.ops.Sketches.hllPortableRegisters(
      orders, Seq("o_orderstatus", "o_orderpriority"), $"o_custkey")
      .groupBy($"o_orderpriority", $"reg")
      .agg(max($"rho").as("rho"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(oneLevel.nonEmpty && perShard === oneLevel)
  }

  test("q114 CMS estimates bound exact counts within eps*N (never under)") {
    val dir = "/root/testdata/sf0.001"
    val est = graft.queries.Round4.q114(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val toks = graft.Tables.table(spark, dir, "documents")
      .select($"source", explode(split($"text", " ")).as("term"))
    val exact = toks.groupBy($"source", $"term").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = toks.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the probe set is the observed (source, term) pairs, capped at the
    // top-1000 estimates per source — the fixture vocabulary is far
    // below the cap, so every occurring pair must be present
    assert(est.nonEmpty && exact.keySet.subsetOf(est.keySet))
    est.foreach { case ((src, term), e) =>
      val x = exact.getOrElse((src, term), 0L)
      assert(e >= x, s"CMS undercounts $src/$term: $e < $x")
      assert(e <= x + (0.001 * totals(src)).ceil.toLong + 1,
        s"CMS overcount beyond eps*N for $src/$term: $e vs $x (N=${totals(src)})")
    }
  }

  test("invertedIndex df-cap binds on synthetic skew") {
    import spark.implicits._
    // "hot" appears in every doc (df=5 — the stopword skew case);
    // others are cold. Cap at 3: hot must keep its TRUE df but lose its
    // postings; cold terms must be byte-identical to the uncapped run.
    val docs = (0 until 5)
      .map(i => (i.toLong, s"hot w$i shared${i % 2}"))
      .toDF("doc_id", "text")
    val capped = TextAnalysis.invertedIndex(docs, dfCap = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(capped("hot") === (5L, ""), "over-cap term keeps df, drops postings")
    assert(capped("shared0") === (3L, "0|2|4"))
    assert(capped("shared1") === (2L, "1|3"))
    assert(capped("w3") === (1L, "3"))
    // Cap above every df = uncapped index (the q109 fixture contract).
    val uncapped = TextAnalysis.invertedIndex(docs, dfCap = 100)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(uncapped("hot") === (5L, "0|1|2|3|4"))
    assert(uncapped - "hot" === capped - "hot")
  }

  test("unigramNll scores corpus-common text below rare text") {
    import spark.implicits._
    // 'the' dominates the corpus; doc 1 is all-common, doc 2 all-rare.
    val d = Seq(
      (1L, "the the the the"),
      (2L, "zyx wvu tsr qpo"),
      (3L, "the the zyx the")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramNll(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1)._1 === 4L && out(2)._1 === 4L)
    // strictly increasing NLL with rarity: common < mixed < rare
    assert(out(1)._2 < out(3)._2 && out(3)._2 < out(2)._2)
    // determinism across evaluations
    val again = TextAnalysis.unigramNll(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === again)
  }

  test("q110 ratios are in (0, 2] and non-null for the fixture corpus") {
    val r = TextAnalysis.q110(spark, sf)
    val stats = r.agg(
      min($"compress_ratio"), max($"compress_ratio"),
      sum(when($"compress_ratio".isNull, 1).otherwise(0))).head()
    assert(stats.getDouble(0) > 0.0 && stats.getDouble(1) <= 2.0)
    assert(stats.getLong(2) === 0L)
  }

  test("q110 matches an independent java.util.zip reference oracle on the " +
    "full fixture corpus (the in-JVM stand-in for the retired DuckDB row)") {
    // DEFLATE is not expressible in the oracle engine, so q110 was
    // retired from the registry (r14 verdict item 7). This is its
    // replacement certificate: recompute every doc's raw-DEFLATE length
    // DRIVER-SIDE with a freshly-constructed Deflater per doc — sharing
    // no code path with ops.DeflateLen's codegen'd thread-local
    // expression — and require exact equality on every row.
    val expected = Tables.table(spark, sf, "documents")
      .select($"doc_id", $"text").collect().map { row =>
      val bytes = row.getString(1).getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      row.getLong(0) -> (bytes.length.toLong, n)
    }.toMap
    val got = TextAnalysis.q110(spark, sf)
      .select($"doc_id", $"raw_bytes", $"deflate_bytes").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === expected.keySet, "doc coverage diverged")
    val bad = got.collect { case (id, v) if expected(id) != v =>
      s"$id: got $v expected ${expected(id)}" }
    assert(bad.isEmpty, s"deflate mismatch on ${bad.size} docs: ${bad.take(5)}")
  }

  // ---- fuzzy dedup / segment dedup / ranking ----------------------------

  test("fuzzyPairs finds exactly the <=maxDist pairs, across length bands") {
    val d = Seq("abc", "abd", "wxyz", "abcdef").toDF("name")
    val got = Dedup.fuzzyPairs(d, $"name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // abc~abd dist 1; nothing reaches wxyz (dist 4 from abc/abd, 6 from
    // abcdef) or abcdef (3 inserts from abc — beyond maxDist 2).
    assert(got === Set(("abc", "abd", 1L)))
    // raising the bound to 3 admits the cross-band pair abc~abcdef
    // (len 3 = bucket 0, len 6 = bucket 1: the ±1 probe must find it)
    // and the all-substitution abd~abc... set checked exhaustively:
    val got3 = Dedup.fuzzyPairs(d, $"name", maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got3 === Set(
      ("abc", "abd", 1L), ("abc", "abcdef", 3L), ("abcdef", "abd", 3L)))
  }

  test("fuzzyPairs excludes exact duplicates (dist 0) and dedups input names") {
    val d = Seq("same", "same", "samX").toDF("name")
    val got = Dedup.fuzzyPairs(d, $"name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("samX", "same", 1L)))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("segmentDedup drops cross-doc duplicated segments, keeps order") {
    val d = Seq(
      (1L, "a b c d"),   // segs (w=2): "a b" | "c d"
      (2L, "a b x y"),   // segs: "a b" | "x y"  — "a b" is cross-doc dup
      (3L, "q r")        // seg: "q r" — singleton
    ).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(d, $"doc_id", $"text", width = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((2L, 1L, md5Hex("c d"))))
    assert(got(2L) === ((2L, 1L, md5Hex("x y"))))
    assert(got(3L) === ((1L, 0L, md5Hex("q r"))))
  }

  test("segmentDedup: within-doc repeats aren't dups; all-dup doc hashes empty") {
    val d = Seq(
      (1L, "a b a b"),   // same seg twice WITHIN one doc — not cross-doc
      (2L, "c d"),
      (3L, "c d")        // exact dup doc: every segment drops
    ).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(d, $"doc_id", $"text", width = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((2L, 0L, md5Hex("a b a b"))))
    assert(got(2L) === ((1L, 1L, md5Hex(""))))
    assert(got(3L) === ((1L, 1L, md5Hex(""))))
  }

  test("bm25: zero-match docs score 0; higher tf outranks at equal dl") {
    val d = Seq((1L, "a b"), (2L, "b b"), (3L, "c")).toDF("doc_id", "text")
    val got = graft.ext.Ranking.bm25Scores(d, $"doc_id", $"text", Seq("b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(3L) === 0.0)
    assert(got(2L) > got(1L) && got(1L) > 0.0)
    // idf sanity: ln(1 + (N - df + 0.5)/(df + 0.5)) with N=3, df=2
    val idf = math.log(1.0 + 1.5 / 2.5)
    val avgdl = 5.0 / 3.0
    val expected1 = idf * 1.0 * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 2.0 / avgdl))
    assert(math.abs(got(1L) - expected1) < 1e-12)
  }

  test("containmentSets is directional: quote inside a long doc scores 1 one way") {
    val d = Seq((Seq("a", "b"), Seq("a", "b", "c", "d"))).toDF("short", "long")
    val r = d.select(
      Dedup.containmentSets($"short", $"long"),
      Dedup.containmentSets($"long", $"short")).head()
    assert(r.getDouble(0) === 1.0)   // short fully inside long
    assert(r.getDouble(1) === 0.5)   // long only half-covered
  }

  test("tokenEntropy: 0 for degenerate repetition, ln(n) for all-distinct") {
    val d = Seq(
      (1L, "x x x x"),          // one token type: H = 0
      (2L, "a b c d")           // uniform over 4: H = ln(4)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((4L, 0L)))
    assert(got(2L) === ((4L, math.round(math.log(4.0) * 10000))))
  }

  test("interpolatedNll: interpolation keeps P>0 and preserves common<rare order") {
    val d = Seq(
      (1L, "a b a b a b"),
      (2L, "c d"),
      (3L, "a b c d")).toDF("doc_id", "text")
    val out = TextAnalysis.interpolatedNll(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L)._1 === 5L && out(2L)._1 === 1L && out(3L)._1 === 3L)
    assert(out(1L)._2 < out(3L)._2) // all-common bigrams score lowest
    assert(out.values.forall(_._2 > 0L)) // finite, positive NLL everywhere
  }

  test("bigramNll: common-bigram docs score below rare-bigram docs") {
    val d = Seq(
      (1L, "a b a b a b"),  // only the corpus-dominant bigrams
      (2L, "c d"),          // one rarer bigram
      (3L, "a b c d")       // mixed
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNll(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L)._1 === 5L && out(2L)._1 === 1L && out(3L)._1 === 3L)
    assert(out(1L)._2 < out(3L)._2)
    val again = TextAnalysis.bigramNll(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === again)
  }

  test("q134 temperature mix: shares sum to 1, alpha upweights the smallest source") {
    val rows = graft.ext.Sampling.q134(spark, sf).collect()
    val shareSum = rows.map(_.getLong(2)).sum
    assert(math.abs(shareSum - 1000000L) <= rows.length,
      s"shares must sum to ~1e6, got $shareSum")
    val wSum = rows.map(_.getLong(3)).sum
    assert(math.abs(wSum - 1000000L) <= rows.length)
    // α < 1 compresses the range: smallest source gains weight vs its
    // proportional share, largest loses
    val smallest = rows.minBy(_.getLong(1))
    val largest = rows.maxBy(_.getLong(1))
    assert(smallest.getLong(3) > smallest.getLong(2))
    assert(largest.getLong(3) < largest.getLong(2))
    // Rounding-boundary margin: q134 is the one hash-certified query
    // whose value passes through pow() (not correctly rounded in
    // either engine) plus order-dependent double summation, so the
    // distance of every scaled value to the .5 boundary must dwarf
    // that drift (~1e-10 scaled units). Measured: 3.7e-2 (share) /
    // 8.2e-2 (alpha) at sf0.001; 1.6e-2 / 5.0e-2 at sf0.01; 5.6e-3 /
    // 2.0e-2 at sf0.1 — ≥ 7 orders above drift at every gated SF.
    val toks = rows.map(_.getLong(1).toDouble)
    val n = toks.sum
    val z = toks.map(math.pow(_, 0.7)).sum
    val margins = toks.flatMap { t =>
      Seq(t / n * 1e6, math.pow(t, 0.7) / z * 1e6) }
      .map(v => math.abs((v % 1) - 0.5))
    assert(margins.min > 1e-4, s"boundary margin collapsed: ${margins.min}")
  }

  test("q136 ann recall: one row per query, hits in [1,3], recall consistent") {
    val rows = Similarity.q136(spark, sf).collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      val hits = r.getLong(1)
      // the query vector itself ranks #1 in BOTH searches (sim 1.0,
      // same bucket), so recall can never be 0
      assert(hits >= 1L && hits <= 3L, r.toString)
      assert(r.getLong(2) === math.round(hits / 3.0 * 10000))
    }
  }

  test("q140 corpus card internal consistency on the fixture corpus") {
    val r = TextAnalysis.q140(spark, sf).head()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(r.getLong(0) === docs.count())
    assert(r.getLong(2) === docs.select("lang").distinct().count())
    assert(r.getLong(3) === docs.select("source").distinct().count())
    // dup rate in [0, 10000]; mean quality in [0, 10000]
    assert(r.getLong(4) >= 0L && r.getLong(4) <= 10000L)
    assert(r.getLong(5) >= 0L && r.getLong(5) <= 10000L)
  }

  test("q141 k-anon census conserves totals and suppresses every small group") {
    val rows = graft.ext.Ranking.q141(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total === spark.read.parquet(s"$sf/documents.parquet").count())
    // every surviving NAMED group carries >= 10 docs; only the
    // '<other>' rollups may not
    rows.filter(r => r.getString(0) != "<other>" && r.getString(1) != "<other>")
      .foreach(r => assert(r.getLong(2) >= 10L, r.toString))
  }

  test("kanonCensus drops an undersized residual bucket entirely") {
    // one big group (12 docs) + one small group (3 docs): the 3-doc
    // residual must NOT surface as ('<other>', 3) — that row would
    // hand back the suppressed count by elimination
    val d = ((1 to 12).map(_ => ("en", "s1")) ++ (1 to 3).map(_ => ("xx", "s2")))
      .toDF("l", "s")
    val got = graft.ext.Ranking.kanonCensus(d, $"l", $"s", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("en", "s1", 12L)))
    // two small groups that TOGETHER clear k do publish as one rollup
    val d2 = ((1 to 12).map(_ => ("en", "s1")) ++
      (1 to 6).map(_ => ("xx", "s2")) ++ (1 to 6).map(_ => ("yy", "s3")))
      .toDF("l", "s")
    val got2 = graft.ext.Ranking.kanonCensus(d2, $"l", $"s", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got2 === Set(("en", "s1", 12L), ("<other>", "<other>", 12L)))
  }

  test("q142 vocab ids are contiguous from 0 with non-increasing counts") {
    val rows = graft.ext.Ranking.q142(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L until rows.length).toSeq)
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getString(1)).distinct.length === rows.length)
  }

  test("fuzzyPairs blocking is lossless vs brute-force on a random name pool") {
    // Deterministic pseudo-random pool: varied lengths 1..12 over a
    // 3-letter alphabet so edit distances cluster near the threshold —
    // the regime where a lossy block would actually drop pairs.
    val rnd = new scala.util.Random(42)
    val names = (1 to 60).map { _ =>
      val len = 1 + rnd.nextInt(12)
      (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }.distinct
    val df = names.toDF("name")
    val banded = Dedup.fuzzyPairs(df, $"name", maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- names; b <- names if a < b
      dist = lev(a, b) if dist >= 1 && dist <= 3
    } yield (a, b, dist.toLong)).toSet
    assert(banded === brute)
  }

  test("segmentDedup on an all-unique corpus reassembles every doc exactly") {
    // no cross-doc duplicate segments → clean text == original text,
    // so clean_fp must equal md5(text) for every width
    val d = Seq(
      (1L, "a b c d e"),
      (2L, "f g h"),
      (3L, "i")).toDF("doc_id", "text")
    Seq(1, 2, 4, 16).foreach { w =>
      val got = Dedup.segmentDedup(d, $"doc_id", $"text", width = w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
      assert(got(1L) === ((0L, md5Hex("a b c d e"))), s"width $w")
      assert(got(2L) === ((0L, md5Hex("f g h"))), s"width $w")
      assert(got(3L) === ((0L, md5Hex("i"))), s"width $w")
    }
  }

  test("q145 lsh tuning curve: one row per config, self-match floor, consistent recall") {
    val rows = Similarity.q145(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(4L, 6L, 8L))
    rows.foreach { r =>
      val (hits, recall) = (r.getLong(1), r.getLong(2))
      // every query matches itself in any config (same bucket, sim 1.0
      // rank 1), so hits can never drop below the query count
      assert(hits >= 50L && hits <= 150L, r.toString)
      assert(recall === math.round(hits / 150.0 * 10000), r.toString)
    }
  }

  test("zipfSlope recovers the least-squares slope of a known rank curve") {
    // freqs: a=4 (rank 1), b=2 (rank 2), c=1 (rank 3)
    val d = Seq("a a a a b b c").toDF("text")
    val row = graft.ext.Ranking.zipfSlope(d, $"text").head()
    assert(row.getLong(0) === 3L)
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val mx = xs.sum / 3; val my = ys.sum / 3
    val slope = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    assert(math.abs(row.getDouble(1) - slope) < 1e-12)
  }

  test("q152 quantiles: type-7 hand check, ordering, and e2 boundary margin") {
    // percentile over 1..4 at .25 is type-7 linear interpolation:
    // pos = .25·3 = .75 → 1 + .75·1 = 1.75 (matches quantile_cont)
    val tiny = Seq(1, 2, 3, 4).toDF("v")
      .agg(percentile($"v", lit(0.25)), percentile($"v", lit(0.9))).head()
    assert(tiny.getDouble(0) === 1.75)
    assert(math.abs(tiny.getDouble(1) - 3.7) < 1e-12) // pos 2.7 → 3 + .7·1
    val rows = graft.ext.Ranking.q152(spark, sf).collect()
    rows.foreach { r =>
      val qs = Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(qs === qs.sorted, s"quantiles out of order: $r")
    }
    // Margin of the raw doubles to the e2 rounding boundary: p∈{.25,.5,
    // .75} are exact; p=.9 lands within ulps of an integer — never near
    // a half-integer — so both engines round identically.
    val raw = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy($"source")
      .agg(
        percentile(graft.ext.TextAnalysis.tokenCount($"text"), lit(0.9)).as("p90"))
      .collect().map(_.getDouble(1))
    val margins = raw.map(v => math.abs((v * 100) % 1 - 0.5))
    assert(margins.min > 0.4, s"p90·100 strayed from integer: ${margins.min}")
  }

  test("q155 logreg step: matches a driver-side replay; e6 margins hold") {
    val row = graft.ext.Similarity.q155(spark, sf).head()
    val n = row.getLong(0)
    // Replay the gradient in plain Scala from the raw features
    val feats = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text", $"lang")
      .collect()
    var g0 = 0.0; var g1 = 0.0; var g2 = 0.0
    feats.foreach { r =>
      val toks = r.getString(0).split(" ", -1)
      val nt = toks.length.toDouble
      val sw = toks.count(w => w == "a" || w == "the").toDouble
      val x1 = nt / 100.0
      val x2 = sw / nt
      val y = if (r.getString(1) == "en") 1.0 else 0.0
      val res = 1.0 / (1.0 + math.exp(-(0.1 + -0.2 * x1 + 0.3 * x2))) - y
      g0 += res; g1 += res * x1; g2 += res * x2
    }
    assert(n === feats.length.toLong)
    // Sequential vs partial-agg summation differ by ulps only
    assert(math.abs(row.getLong(1) - g0 * 1e6) < 1.0, s"g0: ${row.getLong(1)} vs ${g0 * 1e6}")
    assert(math.abs(row.getLong(2) - g1 * 1e6) < 1.0)
    assert(math.abs(row.getLong(3) - g2 * 1e6) < 1.0)
    assert(math.abs(row.getLong(4) - (0.1 - 0.1 * (g0 / n)) * 1e6) < 1.0)
    // Margin: every scaled output sits away from the .5 boundary
    val margins = Seq(g0, g1, g2,
      0.1 - 0.1 * (g0 / n), -0.2 - 0.1 * (g1 / n), 0.3 - 0.1 * (g2 / n))
      .map(v => math.abs((v * 1e6) % 1 - 0.5))
    assert(margins.min > 1e-4, s"boundary margin collapsed: ${margins.min}")
  }

  test("q157 bpe pair counting: frequency weighting, all positions, ascii gate") {
    // Replay the counting on the fixture corpus in plain Scala and
    // compare the full top-20 (weights, overlap positions, regex gate).
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .filter(_.matches("^[a-z]+$"))
      .flatMap(w => w.zip(w.tail).map { case (a, b) => (a.toString, b.toString) })
      .groupBy(identity).map { case (p, occ) => (p._1, p._2, occ.length.toLong) }
      .toSeq
      .sortBy { case (a, b, c) => (-c, a, b) }
      .take(20)
    val got = graft.ext.TextAnalysis.q157(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("gramNovelty: first owner wins, duplicates score zero, short docs absent") {
    val d = Seq(
      (1L, "a b c d e f"),  // owns both of its 5-grams → novelty 1
      (2L, "a b c d e f"),  // exact dup of 1 → novelty 0
      (3L, "b c d e f g"),  // shares "b c d e f" with 1; owns "c d e f g"
      (4L, "x y")           // < 5 tokens → no grams → absent
    ).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.gramNovelty(d, 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 0L, 0.0)),
      3L -> ((2L, 1L, 0.5))))
  }

  test("q159 minhash calibration: ranges, estimator tracks truth on the fixture") {
    val rows = graft.ext.Dedup.q159(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty, "no banded candidates at sf0.001")
    rows.foreach { case (a, b, sb, m, j) =>
      assert(a < b && sb >= 1 && m >= 0 && m <= 12 && j >= 0 && j <= 10000,
        s"out of range: ($a,$b,$sb,$m,$j)")
      // every colliding band means its 3 signature rows agreed
      assert(m >= 3 * sb, s"matches $m inconsistent with $sb bands")
    }
    // calibration direction: perfect-signature pairs must have higher
    // true Jaccard on average than imperfect ones (when both exist)
    val (full, partial) = rows.partition(_._4 == 12)
    if (full.nonEmpty && partial.nonEmpty) {
      val meanJ = (s: Array[(Long, Long, Long, Long, Long)]) =>
        s.map(_._5).sum.toDouble / s.length
      assert(meanJ(full) > meanJ(partial),
        s"estimator inverted: ${meanJ(full)} vs ${meanJ(partial)}")
    }
  }

  test("q160 calibration bins: partition the corpus, predictions live in their bin") {
    val rows = graft.ext.Similarity.q160(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._2).sum === total, "bins do not partition the corpus")
    rows.foreach { case (bin, n, pos, rate, meanP) =>
      assert(bin >= 0 && bin <= 9 && pos <= n && rate >= 0 && rate <= 10000,
        s"out of range: ($bin,$n,$pos,$rate,$meanP)")
      assert(rate === math.round(pos.toDouble / n * 10000))
      // the mean prediction of a bin lies inside the bin's edges
      // (top bin closed at 1.0)
      assert(meanP >= bin * 100000 && meanP <= (bin + 1) * 100000,
        s"mean_p $meanP outside bin $bin")
    }
  }

  test("q168 pmi: full driver replay is EXACT (integer-derived doubles)") {
    // Every PMI input is an exact integer, so the identically-shaped
    // replay must match bit-for-bit — no tolerance.
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" < 1000).select($"text").collect()
      .map(_.getString(0).split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val bi = toks.flatMap(ws => ws.init.zip(ws.tail))
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val n1 = uni.values.sum.toDouble
    val n2 = bi.values.sum.toDouble
    val expected = bi.filter(_._2 >= 5).map { case ((w1, w2), c12) =>
      val pmi = math.log((c12 / n2) / ((uni(w1) / n1) * (uni(w2) / n1)))
      (w1, w2, c12,
        BigDecimal(pmi * 10000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = TextAnalysis.q168(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("q169 centroid matrix: pair coverage, range, and boundary margin") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"label".cast("long"), $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val byLbl = emb.groupBy(_._1)
    val cents = byLbl.map { case (l, vs) =>
      val dim = vs.head._2.length
      l -> Array.tabulate(dim)(i => vs.map(_._2(i)).sum / vs.length)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val num = a.zip(b).map { case (x, y) => x * y }.sum
      num / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val labels = cents.keys.toSeq.sorted
    val got = Similarity.q169(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size === labels.size * (labels.size - 1) / 2,
      "one row per unordered label pair")
    val margins = for {
      (la, i) <- labels.zipWithIndex; lb <- labels.drop(i + 1)
    } yield {
      val c = cos(cents(la), cents(lb))
      val g = got((la, lb))
      assert(g >= -10000 && g <= 10000, s"cosine out of range: $g")
      assert(math.abs(g - c * 10000) <= 1.0,
        s"replay drift beyond 1 scaled unit: ($la,$lb) $g vs ${c * 10000}")
      // distance to the HALF_UP boundary (on |v| so negatives measure
      // against their own -x.5 boundary)
      math.abs(math.abs(c * 10000) % 1 - 0.5)
    }
    // summation-order drift is ~1e-13 relative; the e4 grid margin
    // must dwarf it (the q134 discipline)
    assert(margins.min > 1e-6, s"boundary margin collapsed: ${margins.min}")
  }

  test("q172 burstiness: full driver replay is EXACT; df floor binds") {
    val perDoc = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").collect()
      .flatMap(_.getString(0).split(" ", -1)
        .groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) })
    val agg = perDoc.groupBy(_._1)
      .map { case (w, xs) => (w, xs.map(_._2).sum, xs.size.toLong) }
    val expected = agg.filter(_._3 >= 20).map { case (w, cnt, df) =>
      (w, cnt, df,
        BigDecimal(cnt.toDouble / df * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.q172(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // fixture truth: the synthetic vocabulary is CLOSED — every word
    // clears the 20-doc floor, so the non-binding filter is correct
    assert(expected.size === agg.size, "fixture vocab expected to clear the floor")
    // the floor itself certified where it binds: a synthetic corpus
    val syn = Seq(
      (0L, "common rare common"), (1L, "common x"), (2L, "common y"))
      .toDF("doc_id", "text")
    val bound = TextAnalysis.burstiness(syn, 2).collect()
    assert(bound.map(_.getString(0)).toSet === Set("common"),
      "df floor must drop the df=1 tail")
    assert(bound.head.getLong(3) === BigDecimal(4.0 / 3 * 10000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
  }

  test("q173 heaps law: fixture truth (saturated vocab, beta = 0 exactly); " +
      "synthetic growth recovers beta ≈ 1") {
    val docsArr = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1))).sortBy(_._1)
    val r = graft.ext.Ranking.q173(spark, sf).head()
    assert(r.getLong(1) === docsArr.flatMap(_._2).distinct.length.toLong)
    assert(r.getLong(2) === docsArr.map(_._2.length.toLong).sum)
    // the 31-word synthetic vocabulary saturates before the first
    // 100-doc anchor: V is constant, ln V is constant, the regression
    // slope is EXACTLY zero — the curve's true answer on this corpus
    assert(r.getLong(3) === 0L, s"saturated vocab must fit beta=0: $r")
    // growing-vocabulary case: each doc introduces one new word next
    // to four repeats — V(d) = d + 4 and N(d) = 5d, so the log-log
    // slope approaches 1 (with a small-intercept bend at the head)
    val syn = (0L until 200L)
      .map(i => (i, s"a b c d w$i")).toDF("doc_id", "text")
    val sr = graft.ext.Ranking.heapsFit(syn, 10).head()
    assert(sr.getLong(0) === 20L)
    assert(sr.getLong(1) === 204L && sr.getLong(2) === 1000L)
    val beta = sr.getLong(3) / 10000.0
    assert(beta > 0.9 && beta <= 1.0, s"linear-growth exponent off: $beta")
  }

  test("q176 embed dim stats: exact min/max, moment replay, margins hold") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = vecs.head.length
    val rows = Similarity.q176(spark, sf).collect()
    assert(rows.length === dims)
    def half(v: Double) =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    rows.foreach { r =>
      val p = r.getLong(0).toInt
      val col = vecs.map(_(p))
      assert(r.getLong(1) === vecs.length.toLong)
      // min/max touch no summation — exact
      assert(r.getLong(4) === half(col.min * 10000))
      assert(r.getLong(5) === half(col.max * 10000))
      val mean = col.sum / col.length
      val std = math.sqrt(col.map(v => v * v).sum / col.length - mean * mean)
      assert(math.abs(r.getLong(2) - mean * 10000) <= 1.0, s"mean drift at $p")
      assert(math.abs(r.getLong(3) - std * 10000) <= 1.0, s"std drift at $p")
      // rounding-boundary margins for the two summation-drifting stats
      assert(math.abs(math.abs(mean * 10000) % 1 - 0.5) > 1e-6, s"mean margin at $p")
      assert(math.abs(math.abs(std * 10000) % 1 - 0.5) > 1e-6, s"std margin at $p")
    }
  }

  test("q178 lang confusion: cells partition the corpus; shares are row-exact") {
    val rows = TextAnalysis.q178(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._3).sum === total)
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val nLang = cells.head._4
      assert(cells.forall(_._4 == nLang))
      assert(cells.map(_._3).sum === nLang, s"$lang row does not sum")
      cells.foreach { c =>
        assert(c._5 === BigDecimal(c._3.toDouble / nLang * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
    }
  }

  test("q181 embed dim MAD: full driver replay is EXACT (order statistics)") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    def half(v: Double) =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def rankQuota(sorted: Array[Double]) = // smallest v with 2·rank ≥ n
      sorted(((n + 1) / 2) - 1)
    val rows = graft.ext.Similarity.q181(spark, sf).collect()
    assert(rows.length === vecs.head.length)
    rows.foreach { r =>
      val p = r.getLong(0).toInt
      val col = vecs.map(_(p))
      val med = rankQuota(col.sorted)
      val mad = rankQuota(col.map(v => math.abs(v - med)).sorted)
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === half(med * 10000), s"median at $p")
      assert(r.getLong(3) === half(mad * 10000), s"mad at $p")
    }
  }

  test("q183 vocab jaccard: full driver replay is EXACT; all 190 pairs present") {
    val vocab = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, ds) =>
        (s, ds.flatMap(_._2.split(" ")).toSet)
      }
    val expected = (for {
      (sa, va) <- vocab; (sb, vb) <- vocab if sa < sb
      common = (va & vb).size.toLong if common > 0
    } yield {
      val union = va.size.toLong + vb.size.toLong - common
      (sa, sb, va.size.toLong, vb.size.toLong, common,
        BigDecimal(common.toDouble / union * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }).toSeq.sortBy(p => (p._1, p._2))
    val got = graft.ext.TextAnalysis.q183(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    assert(got.size === vocab.size * (vocab.size - 1) / 2,
      "a source pair shares no word — q183's inner-join contract now binds")
  }

  test("q202 char entropy: replay within 1 unit; margins hold; alphabet exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = TextAnalysis.q202(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq === docs.map(_._1).distinct.sorted.toSeq)
    got.foreach { r =>
      val chars = docs.filter(_._1 == r._1).flatMap(_._2.toCharArray)
      val counts = chars.groupBy(identity).map(_._2.length.toLong)
      assert(r._2 === chars.length.toLong)
      assert(r._3 === counts.size.toLong)
      val n = chars.length.toDouble
      val h = math.log(n) - counts.map(c => c * math.log(c.toDouble)).sum / n
      assert(math.abs(r._4 - h * 10000) <= 1.0, s"entropy drift at ${r._1}")
      assert(math.abs(math.abs(h * 10000) % 1 - 0.5) > 1e-6,
        s"boundary margin at ${r._1}")
    }
  }

  test("q199 quality survival: full driver replay is EXACT; curve is monotone") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").collect().map(_.getString(0))
    def half(v: Double) =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = docs.map { t =>
      val ws = t.split(" ", -1)
      val stop = ws.count(w => w == "a" || w == "the")
      val q = BigDecimal((1.0 - stop.toDouble / ws.length) *
        math.min(ws.length / 50.0, 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (half(q * 1000000) / 100000, ws.length.toLong)
    }
    val byBucket = rows.groupBy(_._1).toSeq.map { case (b, ds) =>
      (b, ds.length.toLong, ds.map(_._2).sum)
    }.sortBy(-_._1)
    val tot = byBucket.map(_._3).sum
    var (cd, ct) = (0L, 0L)
    val expected = byBucket.map { case (b, nd, nt) =>
      cd += nd; ct += nt
      (b, nd, nt, cd, ct, half(ct.toDouble / tot * 10000))
    }
    val got = TextAnalysis.q199(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    assert(got.last._6 === 10000L, "curve must end at full mass")
  }

  test("q196 embed coverage: replay EXACT; full-coverage fixture is the true answer") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).size.toLong)).toMap
    def half(v: Double) =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = docs.groupBy(_._2).toSeq.map { case (src, ds) =>
      val dims = ds.flatMap(d => embs.get(d._1))
      (src, ds.length.toLong, dims.length.toLong,
        half(dims.length.toDouble / ds.length * 10000),
        if (dims.isEmpty) None else Some(dims.min),
        if (dims.isEmpty) None else Some(dims.max))
    }.sortBy(_._1)
    val got = graft.ext.Similarity.q196(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(got === expected)
  }

  test("q192 label separability: sum-vector algebra replays; margins hold") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"label".cast("long"), $"embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val norm = math.sqrt(v.map(x => x * x).sum)
        (r.getLong(0), v.map(_ / norm))
      }
    val ntot = rows.length.toLong
    val got = graft.ext.Similarity.q192(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(_._2).sum === ntot)
    got.foreach { r =>
      val (lbl, n) = (r._1, r._2)
      val vs = rows.filter(_._1 == lbl).map(_._2)
      val dims = vs.head.length
      val sv = Array.tabulate(dims)(p => vs.map(_(p)).sum)
      val gv = Array.tabulate(dims)(p => rows.map(_._2(p)).sum)
      val s2 = sv.map(x => x * x).sum
      val sg = sv.zip(gv).map { case (a, b) => a * b }.sum
      val intra = (s2 - n) / (n * (n - 1)).toDouble
      val inter = (sg - s2) / (n * (ntot - n)).toDouble
      assert(math.abs(r._3 - intra * 10000) <= 1.0, s"intra drift at $lbl")
      assert(math.abs(r._4 - inter * 10000) <= 1.0, s"inter drift at $lbl")
      assert(math.abs(r._5 - (intra - inter) * 10000) <= 1.0, s"margin at $lbl")
      // rounding-boundary margins (q169 pattern): far from the .5 grid line
      for (v <- Seq(intra, inter, intra - inter))
        assert(math.abs(math.abs(v * 10000) % 1 - 0.5) > 1e-6,
          s"boundary margin at $lbl")
    }
  }

  test("q187 boilerplate prefixes: full driver replay is EXACT; threshold binds") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").take(8).mkString(" ")))
    val expected = docs.groupBy(_._2).toSeq
      .map { case (pre, ds) =>
        (pre, ds.length.toLong, ds.map(_._1).distinct.length.toLong)
      }
      .filter(_._2 >= 2)
      .sortBy(p => (-p._2, p._1))
    val got = graft.ext.TextAnalysis.q187(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(docs.length > expected.map(_._2).sum,
      "threshold must cut the unique-prefix tail")
  }

  test("q188 lexical diversity: full driver replay is EXACT; TTR/hapax in (0,1]") {
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split(" ").map((r.getString(0), _)))
    def half(v: Double) =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = words.groupBy(_._1).toSeq.map { case (src, ws) =>
      val counts = ws.groupBy(_._2).map(_._2.length.toLong)
      val (nTok, vocab) = (counts.sum, counts.size.toLong)
      val hapax = counts.count(_ == 1L).toLong
      (src, nTok, vocab, hapax, half(vocab.toDouble / nTok * 10000),
        half(hapax.toDouble / vocab * 10000))
    }.sortBy(_._1)
    val got = graft.ext.TextAnalysis.q188(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    // hapax may be 0: the fixture's closed vocabulary repeats every word
    got.foreach { r =>
      assert(r._5 > 0 && r._5 <= 10000 && r._6 >= 0 && r._6 <= 10000, r)
    }
  }

  test("q175 quality percentile: full driver replay is EXACT; per-source span") {
    val q175 = TextAnalysis.q175(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySource = q175.groupBy(_._2)
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_._4).min === 0L, s"$src: lowest doc must rank 0")
      if (rows.size > 1)
        assert(rows.map(_._4).max === 10000L, s"$src: highest doc must rank 1")
      // percent_rank is (rank-1)/(n-1) under the (q, doc_id) total order
      val sorted = rows.sortBy(r => (r._3, r._1)).zipWithIndex
      sorted.foreach { case (r, i) =>
        val exp =
          if (rows.size == 1) 0L // percent_rank of a singleton partition
          else BigDecimal(i.toDouble / (rows.size - 1) * 10000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        assert(r._4 === exp, s"$src rank $i: ${r._4} vs $exp")
      }
    }
  }

  test("q229 ks drift: exact replay + e6 margins at sf0.001 and sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = spark.read.parquet(s"$dir/documents.parquet")
        .select($"source", $"n_chars").as[(String, Long)].collect().toSeq
      val n = rows.size.toLong
      val xsAll = rows.map(_._2).distinct.sorted
      val expected = rows.groupBy(_._1).toSeq.map { case (src, g) =>
        val ns = g.size.toLong
        val byX = g.groupBy(_._2).view.mapValues(_.size.toLong)
        val restByX = rows.filter(_._1 != src).groupBy(_._2).view
          .mapValues(_.size.toLong)
        var (cs, cr) = (0L, 0L)
        val nums = xsAll.map { x =>
          cs += byX.getOrElse(x, 0L); cr += restByX.getOrElse(x, 0L)
          // exact integers (magnitudes ≤ ns·n ≈ 2.5e5 at these SFs)
          (x, math.abs(cs * (n - ns) - cr * ns))
        }
        val dmax = nums.map(_._2).max
        val xAt = nums.filter(_._2 == dmax).map(_._1).min
        val ks = dmax.toDouble / (ns.toDouble * (n - ns).toDouble)
        (src, ns, xAt, math.round(ks * 1e6), ks)
      }.sortBy(_._1)
      val got = graft.ext.Ranking.q229(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got === expected.map(e => (e._1, e._2, e._3, e._4)), s"at $dir")
      // e6 rounding margins: the division is ONE mirrored double over
      // exact integers — drift is ≤ a few ulps; require 1e-6 headroom.
      val minMargin = expected.map { e =>
        val frac = math.abs(e._5 * 1e6) % 1.0
        math.abs(frac - 0.5)
      }.min
      assert(minMargin > 1e-6, s"min e6 margin $minMargin at $dir")
    }
  }

  test("q230 semantic decontam: exact replay + e2 margins at sf0.001 and sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toSeq
        .map { case (id, e) =>
          val d = e.map(_.toDouble).toArray
          val n = math.sqrt(d.map(x => x * x).sum)
          (id, d.map(_ / n))
        }
      val (split, corpus) = vecs.partition(_._1 % 7 == 0)
      // the constant 200-probe cap (vec_id < 1400) never binds at the
      // gate SFs (500 vectors) — mirrored for contract identity
      val ev = split.filter(_._1 < 1400)
      val sims = corpus.map { case (did, du) =>
        did -> ev.map { case (_, eu) =>
          var s = 0.0; var i = 0
          while (i < du.length) { s += du(i) * eu(i); i += 1 }
          s
        }
      }
      val expected = sims.map { case (did, ss) =>
        val grid = ss.map(s => math.round(s * 100))
        val mx = grid.max
        (did, mx, grid.count(_ >= 40).toLong, if (mx >= 40) 1L else 0L)
      }.sortBy(_._1)
      val got = graft.ext.Similarity.q230(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got === expected, s"at $dir")
      assert(got.exists(_._4 == 1L) && got.exists(_._4 == 0L),
        s"threshold must bind at $dir")
      // e2 rounding margins over EVERY pair (the count discipline):
      // drift between engines is ~1e-15; require 1e-6 headroom.
      val minMargin = sims.flatMap(_._2)
        .map(s => math.abs(math.abs(s * 100) % 1.0 - 0.5)).min
      assert(minMargin > 1e-6, s"min e2 margin $minMargin at $dir")
    }
  }

  test("q254 patch grid: exact replay; edge patches clamp; " +
    "full-cover invariant") {
    val dir = "/root/testdata/sf0.001"
    def hex4(s: String, from: Int): Long =
      java.lang.Long.parseLong(s.substring(from, from + 4), 16)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val expected = docs.sortBy(_._1).flatMap { case (id, text) =>
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val w = hex4(m, 0) % 1920 + 1
      val h = hex4(m, 4) % 1080 + 1
      val nx = (w + 223) / 224
      val ny = (h + 223) / 224
      for (py <- 0L until ny; px <- 0L until nx) yield
        (id, nx * ny, py, px, px * 224, py * 224,
          math.min(px * 224 + 224, w), math.min(py * 224 + 224, h))
    }
    val got = Multimodal.q254(spark, dir).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got === expected)
    // clamping must bind (some edge patch narrower than 224) and every
    // canvas must be exactly covered: Σ patch areas = W·H per media.
    assert(got.exists(p => p._7 - p._5 < 224))
    val areas = got.groupBy(_._1).view
      .mapValues(_.map(p => (p._7 - p._5) * (p._8 - p._6)).sum).toMap
    docs.foreach { case (id, text) =>
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val w = hex4(m, 0) % 1920 + 1
      val h = hex4(m, 4) % 1080 + 1
      assert(areas(id) === w * h, s"coverage hole for media $id")
    }
  }

  test("q255 k-anonymity: exact replay; risky classes bind both ways " +
    "at both gate SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = spark.read.parquet(s"$dir/customer.parquet")
        .select($"c_nationkey", $"c_mktsegment", $"c_acctbal")
        .collect().toSeq.map { r =>
        val cents = new java.math.BigDecimal(r.getDouble(2))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact()
        (r.getInt(0).toLong, r.getString(1), cents / 500000)
      }
      val classes = rows.groupBy(identity).view.mapValues(_.size.toLong)
      val expected = classes.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1)
        .map { case (nation, cs) =>
          val ns = cs.map(_._2)
          (nation, ns.size.toLong,
            ns.count(_ < 5).toLong, ns.filter(_ < 5).sum, ns.min)
        }
      val got = graft.ext.Curation.q255(spark, dir).collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      assert(got === expected, s"at $dir")
      // k = 5 must separate: some risky classes, some safe ones.
      val risky: Long = got.map(_._3).sum
      val total: Long = got.map(_._2).sum
      assert(risky > 0L && risky < total, s"k does not bind at $dir")
    }
  }

  test("q252 JW match: exact replay + binding threshold + e6 margins " +
    "at both gate SFs") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      graft.ops.JaroWinklerUtil.jw(
        UTF8String.fromString(a), UTF8String.fromString(b))
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val names = spark.read.parquet(s"$dir/part.parquet")
        .select($"p_name").distinct().as[String].collect().toSeq
      val pairs = for {
        a <- names; b <- names
        if a < b && a.split(" ")(0) == b.split(" ")(0)
      } yield (a.split(" ")(0), a, b, jw(a, b))
      val scored = pairs.map { case (w, a, b, s) =>
        (w, a, b, math.round(s * 1000000), s)
      }
      // threshold binds on both sides
      assert(scored.exists(_._4 >= 880000L) && scored.exists(_._4 < 880000L),
        s"threshold does not bind at $dir")
      // e6 margins over EVERY candidate pair: the keep decision and
      // the hash both read the grid.
      val minMargin = scored
        .map(p => math.abs(math.abs(p._5 * 1e6) % 1.0 - 0.5)).min
      assert(minMargin > 1e-6, s"min e6 margin $minMargin at $dir")
      val expected = scored.filter(_._4 >= 880000L)
        .map(p => (p._1, p._2, p._3, p._4))
        .sortBy(p => (p._1, p._2, p._3))
      val got = Dedup.q252(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      assert(got === expected, s"at $dir")
    }
  }

  test("q253 kNN classify: exact replay + rank-5/6 margins at both " +
    "gate SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding", $"label")
        .as[(Long, Seq[Float], Int)].collect().toSeq
        .map { case (id, e, lab) =>
          val d = e.map(_.toDouble).toArray
          val n = math.sqrt(d.map(x => x * x).sum)
          (id, d.map(_ / n), lab)
        }
      val (split, corpus) = vecs.partition(_._1 % 7 == 0)
      // the constant 200-probe cap (vec_id < 1400) never binds at the
      // gate SFs (500 vectors) — mirrored for contract identity
      val ev = split.filter(_._1 < 1400)
      var minGap = Double.MaxValue
      val expected = ev.sortBy(_._1).map { case (qid, qu, tl) =>
        val sims = corpus.map { case (did, du, dl) =>
          var s = 0.0; var i = 0
          while (i < du.length) { s += du(i) * qu(i); i += 1 }
          (did, dl, s)
        }.sortBy(t => (-t._3, t._1))
        minGap = math.min(minGap, sims(4)._3 - sims(5)._3)
        val votes = sims.take(5).groupBy(_._2).view.mapValues(_.size).toSeq
          .sortBy { case (dl, v) => (-v, dl) }
        val (pred, v) = votes.head
        (qid, tl.toLong, pred.toLong, v.toLong,
          if (pred == tl) 1L else 0L)
      }
      // the rank-5/6 raw-sim gap must dwarf cross-engine drift
      assert(minGap > 1e-9, s"rank-5/6 gap $minGap at $dir")
      val got = graft.ext.Similarity.q253(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got === expected, s"at $dir")
    }
  }

  test("q244 hard negatives: exact replay + binding band at both gate SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding", $"label")
        .as[(Long, Seq[Float], Int)].collect().toSeq
        .map { case (id, e, lab) =>
          val d = e.map(_.toDouble).toArray
          val n = math.sqrt(d.map(x => x * x).sum)
          (id, d.map(_ / n), lab)
        }
      val (split, corpus) = vecs.partition(_._1 % 7 == 0)
      // the constant 200-probe cap (vec_id < 1400) never binds at the
      // gate SFs (500 vectors) — mirrored for contract identity
      val ev = split.filter(_._1 < 1400)
      val pairs = for {
        (qid, qu, qlab) <- ev
        (did, du, dlab) <- corpus if dlab != qlab
      } yield {
        var s = 0.0; var i = 0
        while (i < du.length) { s += du(i) * qu(i); i += 1 }
        (qid, did, math.round(s * 100), s * 100)
      }
      // The band must BIND on both sides (too-easy and too-hard pairs
      // both exist) or the query certifies nothing.
      assert(pairs.exists(_._3 < 15) && pairs.exists(_._3 >= 40),
        s"band does not bind at $dir")
      // e2 rounding margins over every cross-label pair (the q230
      // discipline): band membership AND rank order read the grid, so
      // every pair needs headroom to its nearest half-boundary.
      val minMargin = pairs
        .map(p => math.abs(math.abs(p._4) % 1.0 - 0.5)).min
      assert(minMargin > 1e-6, s"min e2 margin $minMargin at $dir")
      val expected = pairs.filter(p => p._3 >= 15 && p._3 < 40)
        .groupBy(_._1).toSeq.flatMap { case (qid, ps) =>
          ps.sortBy(p => (-p._3, p._2)).take(5).zipWithIndex
            .map { case ((_, did, sc, _), i) => (qid, i + 1L, did, sc) }
        }.sortBy(t => (t._1, t._2))
      val got = graft.ext.Similarity.q244(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got === expected, s"at $dir")
      assert(got.nonEmpty, s"empty mining output at $dir")
    }
  }
}
