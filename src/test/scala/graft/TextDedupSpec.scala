package graft

import graft.functions.HashImpl
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class TextDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private def utf8(s: String) = UTF8String.fromString(s)

  test("fingerprint64 matches the h=h*31+cp reference fold") {
    def ref(s: String): Long = s.codePoints().toArray
      .foldLeft(0L)((h, c) => h * 31L + c)
    for (s <- Seq("", "a", "hello world", "ü ünïcode", "graft"))
      assert(HashImpl.fingerprint64(utf8(s)) === ref(s))
  }

  test("simhash of identical token sets is identical; near sets are near") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(ts: String*) = new GenericArrayData(ts.map(utf8).toArray[Any])
    val a = HashImpl.simhash64(arr("alpha", "beta", "gamma", "delta", "eps"))
    val b = HashImpl.simhash64(arr("alpha", "beta", "gamma", "delta", "eps"))
    assert(a === b)
    val c = HashImpl.simhash64(arr("alpha", "beta", "gamma", "delta", "zeta"))
    assert(HashImpl.hamming64(a, c) > 0 && HashImpl.hamming64(a, c) < 32)
  }

  test("cosine_sim expression == functions.aggregate fold (bit-exact)") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val hof = expr(
      """aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) /
        |(sqrt(aggregate(ea, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) *
        | sqrt(aggregate(eb, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))""".stripMargin)
    val rows = a.join(b, col("va") < col("vb"))
      .select(graft.functions.expressions.cosine_sim(col("ea"), col("eb")).as("fast"),
        hof.as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("dedup_simhash candidates == brute-force hamming<=3 pairs") {
    val sigs = Tables.documents(spark, sf)
      .withColumn("t", regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
      .select(col("doc_id"), graft.functions.expressions.simhash64(col("t")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      if HashImpl.hamming64(sa, sb) <= 3
    } yield (ida, idb)).toSet
    val got = SparkEntry.queries("dedup_simhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
  }

  test("DF-capped exact-Jaccard path equals the uncapped output") {
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = SparkEntry.queries("dedup_ngram_jaccard_capped")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === exact)
  }

  test("DF-capped containment path equals the uncapped output") {
    val exact = SparkEntry.queries("dedup_containment")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = SparkEntry.queries("dedup_containment_capped")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === exact)
  }

  test("containment-capped admission bound survives a planted boilerplate block") {
    // The D16b completeness boundary, pinned at the point where the cap
    // BITES on a qualifying pair (the suite corpus never exercises it:
    // no sf0.01 shingle is hot enough). Planted corpus:
    //  - 150 docs sharing one 40-word boilerplate sentence repeated 4x
    //    (its ~40 distinct interior shingles have df=152 > MaxDf=100 →
    //    capped out of the index; the O(150²) hot-key pairs never form)
    //  - a genuine containment pair where the contained doc is
    //    boiler + 60 unique words: ~40% of its shingle set is HOT, so
    //    inter_c/min(n) ≈ 0.6 < τ=0.9 — the pair is admitted ONLY via
    //    the (inter_c + min(hot))/min(n) upper bound. A regression in
    //    the hot-count join (e.g. hot=0) silently drops it; this test
    //    is the tripwire the equality-at-suite-SF spec cannot be.
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def prose(words: Int): String =
      Seq.fill(words)(("b" + rng.alphanumeric.filter(_.isLetter).take(6)
        .mkString).toLowerCase).mkString(" ")
    val boilerSentence = prose(40)
    val boiler = (boilerSentence + " ") * 4
    val shared = prose(60)
    val contained = s"$boiler $shared"           // doc 1000
    val container = s"$boiler $shared ${prose(200)}" // doc 1001: strict superset
    val docs =
      (0 until 150).map(i => (i.toLong, s"${prose(50)} $boiler ${prose(50)}")) ++
      Seq((1000L, contained), (1001L, container))
    val dir = java.nio.file.Files.createTempDirectory("containcap").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      import graft.functions.{expressions => FX}
      // shingle profile, recomputed independently of Dedup's internals
      val ex = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          explode(FX.shingles3(FX.tokenize_words(col("text")))).as("sh"))
      val df = ex.groupBy(col("sh")).agg(countDistinct(col("doc_id")).as("df"))
      assert(df.filter(col("df") > 100).count() >= 30,
        "planted boilerplate produced no super-cap shingles — the cap never bites")
      // the bound must be DOING something: the contained doc's hot mass
      // pushes inter_c/min(n) below τ while the true containment is 1.0
      val sets = ex.groupBy(col("doc_id"))
        .agg(collect_set(col("sh")).as("s")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      val hotShingles = df.filter(col("df") > 100).collect()
        .map(_.getString(0)).toSet
      val sa = sets(1000L); val sb = sets(1001L)
      val interFull = (sa & sb).size
      val interCapped = ((sa -- hotShingles) & (sb -- hotShingles)).size
      assert(interFull == sa.size, "planted containment is not total")
      assert(interCapped.toDouble / sa.size < 0.9,
        "capped intersection alone clears tau — the planted hot mass is too small " +
          s"($interCapped of ${sa.size})")
      // capped output == uncapped output, values exact
      def rows(name: String) =
        SparkEntry.queries(name)(spark, dir).collect()
          .map(r => (r.getAs[Long]("contained_doc"), r.getAs[Long]("container_doc")) ->
            (r.getAs[Long]("inter"), r.getAs[Int]("n_contained"),
              r.getAs[Double]("containment"))).toMap
      val exact = rows("dedup_containment")
      val capped = rows("dedup_containment_capped")
      assert(capped == exact,
        s"capped containment diverges: got ${capped.size}, expected ${exact.size}")
      val planted = capped.get((1000L, 1001L))
      assert(planted.isDefined, "planted containment pair missing from the capped path")
      assert(planted.get == ((interFull.toLong, sa.size, 1.0)),
        s"planted pair not exact: ${planted.get}")
    } finally {
      FrameCache.evictMatching(spark, dir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("winnow-pairs DF cap drops a planted 150-doc boilerplate block, output exact") {
    // Synthetic corpus in a temp dir (the query reads <dir>/documents.parquet):
    //  - 150 docs sharing ONE long boilerplate block (its interior
    //    selected fingerprints have df≈150 > WinnowMaxDf=100 → capped
    //    out of the index — the O(150²) hot-key pairs never form)
    //  - 2 near-dup docs sharing long UNIQUE content (df=2 fps → kept)
    // Expected: output equals the exact uncapped replay — the dup pair
    // survives with EXACT shared counts (verification uses full sets,
    // including any hot fps), the boilerplate-only pairs fail the
    // shared*2 >= min(nf) admission in both paths.
    import spark.implicits._
    val rng = new scala.util.Random(42)
    def prose(words: Int): String =
      Seq.fill(words)(("a" + rng.alphanumeric.filter(_.isLetter).take(6)
        .mkString).toLowerCase).mkString(" ")
    val boiler = "licensed under the apache software foundation terms " * 8
    val shared = prose(120)
    val docs =
      (0 until 150).map(i => (i.toLong, s"${prose(80)} $boiler ${prose(80)}")) ++
      Seq((1000L, s"$shared ${prose(8)}"), (1001L, s"$shared ${prose(9)}"))
    val dir = java.nio.file.Files.createTempDirectory("winnowcap").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      // the cap must actually bite: the staged index loses the hot fps
      val sel = queries.TextAnalysis.winnowSel(spark, dir)
        .select(col("doc_id"), col("h").cast("string").as("h"))
        .distinct().collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val dropped = sel.length - queries.Dedup.winnowIdx(spark, dir).count()
      assert(dropped > 0, "planted boilerplate produced no super-cap fingerprints")
      // rare-only replay, driver-side: df ≤ 100 fingerprints, MinRare=8
      // floor, shared·2 ≥ min(rare) admission — the declared semantics
      val df = sel.groupBy(_._2).view.mapValues(_.length).toMap
      val byDoc = sel.filter(p => df(p._2) <= 100)
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        .filter(_._2.size >= 8)
      val ids = byDoc.keys.toSeq.sorted
      val expected = (for {
        a <- ids; b <- ids if a < b
        inter = (byDoc(a) & byDoc(b)).size
        if inter > 0 && inter * 2 >= math.min(byDoc(a).size, byDoc(b).size)
      } yield (a, b) -> inter.toLong).toMap
      val got = SparkEntry.queries("dedup_winnow_pairs")(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          r.getAs[Long]("shared")).toMap
      assert(got == expected,
        s"capped winnow pairs diverge: got ${got.size}, expected ${expected.size}")
      assert(got.contains((1000L, 1001L)), "planted near-dup pair missing")
    } finally {
      // drop ONLY the temp-dir staged frames — a blanket evict would
      // also unpersist every sf-keyed frame other tests have warmed
      FrameCache.evictMatching(spark, dir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("repeated capped-jaccard runs hold one shared index copy (no pile-up)") {
    SparkEntry.queries("dedup_ngram_jaccard_capped")(spark, sf).count()
    val rdds1 = spark.sparkContext.getPersistentRDDs.size
    val frames1 = FrameCache.size(spark)
    SparkEntry.queries("dedup_ngram_jaccard_capped")(spark, sf).count()
    SparkEntry.queries("dedup_ngram_jaccard_capped")(spark, sf).count()
    assert(spark.sparkContext.getPersistentRDDs.size == rdds1,
      "persisted RDD count grew across invocations")
    assert(FrameCache.size(spark) == frames1,
      "FrameCache entry count grew across invocations")
  }

  test("cluster map is staged once: corpus_keepers reuses D7's FrameCache copy") {
    SparkEntry.queries("dedup_clusters")(spark, sf).count()
    val frames1 = FrameCache.size(spark)
    val rdds1 = spark.sparkContext.getPersistentRDDs.size
    // keepers joins the staged map; a second D7 run reads it back — if
    // either re-ran the propagation, the sweep's localCheckpoints would
    // grow the persisted-RDD census
    SparkEntry.queries("corpus_keepers")(spark, sf).count()
    SparkEntry.queries("dedup_clusters")(spark, sf).count()
    assert(FrameCache.size(spark) == frames1,
      "cluster-map FrameCache entry duplicated")
    assert(spark.sparkContext.getPersistentRDDs.size == rdds1,
      "persisted RDD count grew — propagation re-ran instead of reusing the staged map")
    // and the decisions agree with the map
    val cl = queries.Dedup.clusterLabels(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keep = SparkEntry.queries("corpus_keepers")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    keep.foreach { case (doc, cid, k) =>
      assert(cid == cl.getOrElse(doc, doc))
      assert(k == (cid == doc))
    }
  }

  test("corpus_dup_sources equals a driver-side replay of the staged cluster map") {
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cl = graft.queries.Dedup.clusterLabels(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val bySrcTotal = srcOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val clusterSources = cl.groupBy(_._2).view
      .mapValues(_.map(p => srcOf(p._1)).toSet).toMap
    val dupBySrc = cl.groupBy(p => srcOf(p._1))
    val expected = bySrcTotal.map { case (src, nDocs) =>
      val members = dupBySrc.getOrElse(src, Array.empty[(Long, Long)])
      val nDup = members.length.toLong
      src -> ((nDocs, nDup,
        members.count(p => p._1 != p._2).toLong,
        members.count(p => clusterSources(p._2).size > 1).toLong,
        nDup.toDouble / nDocs))
    }
    val got = SparkEntry.queries("corpus_dup_sources")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_docs"),
          r.getAs[Long]("n_dropped"), r.getAs[Long]("n_cross_source"),
          r.getAs[Double]("dup_rate")))).toMap
    assert(got == expected, s"dup-source report diverges:\n$got\nvs\n$expected")
  }

  test("tau=0.8 embedding dedup (16x16 bands): exact on planted dups, sharper pruning") {
    import org.apache.spark.sql.functions._
    val base = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    // deterministic near-dups of 10 vectors (per-coordinate ±2% ripple
    // → cosine ≈ 0.9996 to the original, untouched vs everything else)
    val dups = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, (x, i) -> CAST(x * (1.0 + 0.02 * ((i % 3) - 1)) AS FLOAT))")
          .as("embedding"))
    val corpus = base.unionAll(dups).localCheckpoint()
    val got = queries.Dedup.embeddingNearDup(corpus, 0.8, 16, 16)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val ref = corpus.select(col("vec_id").as("va"), col("embedding").as("pa"))
      .join(corpus.select(col("vec_id").as("vb"), col("embedding").as("pb")),
        col("va") < col("vb"))
      .withColumn("cos", graft.functions.expressions.cosine_sim(col("pa"), col("pb")))
      .filter(col("cos") >= 0.8 && !isnan(col("cos")))
      .collect().map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb"))).toSet
    assert(ref.nonEmpty, "planted duplicates missing from the reference")
    assert(got == ref, "banded near-dup diverges from brute force at tau=0.8")
    // the cheap configuration's fan-out is 16 bands/vector (vs 96) and
    // each 16-bit band prunes ~2^12 times harder than a 4-bit one
    val cCheap = queries.Dedup.embeddingCandidates(base, 16, 16).count()
    val cD5 = queries.Dedup.embeddingCandidates(base, 96, 4).count()
    info(s"candidate pairs: 16x16-band = $cCheap vs 96x4-band = $cD5")
    assert(cCheap < cD5 / 4, s"16-bit bands should prune far harder ($cCheap vs $cD5)")
  }

  test("decontaminate semantics and content-keyed split are deterministic") {
    val rows = SparkEntry.queries("corpus_decontaminate")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      assert(c >= 0.0 && c <= 1.0)
      assert(r.getAs[Boolean]("contaminated") == (c >= 0.5))
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_shingles"))
    }
    val split = SparkEntry.queries("corpus_train_split")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bucket"),
        r.getAs[String]("split")))
    split.foreach { case (_, b, sp) =>
      assert(b >= 0 && b < 100)
      assert(sp == (if (b < 98) "train" else if (b == 98) "val" else "test"))
    }
    // reproducible with no RNG state: a second run assigns identically
    val again = SparkEntry.queries("corpus_train_split")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bucket"),
        r.getAs[String]("split")))
    assert(split.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("minhash-LSH output equals exact ngram-jaccard at tau=0.8") {
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
  }

  test("dedup_clusters equals driver-side union-find over the pair list") {
    val pairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(x => x -> find(x)).toMap
    val got = SparkEntry.queries("dedup_clusters")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(got == expected)
  }

  test("corpus_keepers_semantic equals union-find over the D5 pair list") {
    val pairs = SparkEntry.queries("dedup_embedding")(spark, sf)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.nonEmpty, "spec needs at least one semantic near-dup pair")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(x => x -> find(x)).toMap
    val got = SparkEntry.queries("corpus_keepers_semantic")(spark, sf)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Long]("cluster_id"), r.getAs[Boolean]("keep")))
    // full corpus coverage: one row per embedding, singletons keep
    assert(got.length == Tables.embeddings(spark, sf).count())
    got.foreach { case (v, c, keep) =>
      assert(c == clustered.getOrElse(v, v), s"cluster mismatch for $v")
      assert(keep == (c == v), s"keep flag inconsistent for $v")
    }
    // exactly one keeper per cluster
    val byCluster = got.groupBy(_._2)
    byCluster.foreach { case (c, rows) =>
      assert(rows.count(_._3) == 1, s"cluster $c keeper count != 1")
    }
  }

  test("approx_distinct_users within 5% of exact") {
    val approx = SparkEntry.queries("approx_distinct_users")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k).toDouble - n) / n <= 0.05,
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }

  test("text_langid is deterministic and majority-English on synthetic corpus") {
    val rows = SparkEntry.queries("text_langid")(spark, sf).collect()
    assert(rows.nonEmpty)
    val langs = rows.map(_.getAs[String]("pred_lang")).toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr", "zh")))
  }

  test("dedup_substring equals a driver-side grid-window replay") {
    val W = 80; val S = 40; val cap = 128
    val docs: Seq[(Long, String)] =
      Tables.documents(spark, sf).select("doc_id", "text").collect().toSeq
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val wins: Seq[(Long, String)] = docs.flatMap { case (id, t) =>
      if (t.length < W) Seq.empty[(Long, String)]
      else (0 to (t.length - W) / S).map(i => (id, t.substring(i * S, i * S + W)))
    }.distinct
    val df = wins.groupBy(_._2).view.mapValues(_.size).toMap
    val idx = wins.filter(w => df(w._2) <= cap)
    val expected: Map[(Long, Long), Long] =
      idx.groupBy(_._2).values.toSeq.flatMap { grp =>
        val ids: Seq[Long] = grp.map(_._1).sorted
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SparkEntry.queries("dedup_substring")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("n_shared")).toMap
    assert(got == expected,
      s"grid-window pairs diverge: got ${got.size}, expected ${expected.size}")
  }

  test("source_overlap equals a driver-side per-source shingle-set replay") {
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("text")).toSeq
    val bySource: Map[String, Set[String]] = docs.groupBy(_._1).view.mapValues {
      ds => ds.flatMap { case (_, t) =>
        val toks = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector
        toks.sliding(3).filter(_.size == 3).map(_.mkString(" "))
      }.toSet
    }.toMap
    val srcs = bySource.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a < b
      inter = (bySource(a) & bySource(b)).size if inter > 0
    } yield (a, b) -> (bySource(a).size.toLong, bySource(b).size.toLong,
        inter.toLong)).toMap
    val got = SparkEntry.queries("source_overlap")(spark, sf).collect().map { r =>
      val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
      val inter = r.getAs[Long]("inter")
      // internal consistency of the derived ratios
      assert(r.getAs[Double]("jaccard") === inter.toDouble / (na + nb - inter))
      assert(r.getAs[Double]("containment") === inter.toDouble / math.min(na, nb))
      assert(inter <= math.min(na, nb))
      (r.getAs[String]("source_a"), r.getAs[String]("source_b")) -> ((na, nb, inter))
    }.toMap
    assert(got == expected,
      s"source overlap diverges: got ${got.size} pairs, expected ${expected.size}")
  }

  test("source_divergence equals a driver-side TVD replay") {
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val counts: Map[String, Map[String, Long]] = docs.groupBy(_._1).view
      .mapValues(_.flatMap { case (_, t) =>
        "[a-z0-9]+".r.findAllIn(t.toLowerCase)
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap).toMap
    val totals = counts.view.mapValues(_.values.sum).toMap
    val srcs = counts.keys.toSeq.sorted
    // the FULL pair grid — disjoint-vocabulary pairs must appear with
    // tvd = 1.0, not vanish (the round-11 review fix)
    val expected = (for {
      a <- srcs; b <- srcs if a < b
      common = counts(a).keySet & counts(b).keySet
    } yield {
      val (na, nb) = (totals(a), totals(b))
      // exact TVD over the UNION vocabulary, the definition the
      // common-token identity in the query is folding towards
      val num = (counts(a).keySet | counts(b).keySet).toSeq.map { t =>
        (BigInt(counts(a).getOrElse(t, 0L)) * nb -
          BigInt(counts(b).getOrElse(t, 0L)) * na).abs
      }.sum
      (a, b) -> ((common.size.toLong, na, nb,
        num.toDouble / (BigInt(2) * na * nb).toDouble))
    }).toMap
    val got = SparkEntry.queries("source_divergence")(spark, sf).collect()
      .map { r =>
        val tvd = r.getAs[Double]("tvd")
        assert(tvd >= 0.0 && tvd <= 1.0)
        (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
          ((r.getAs[Long]("n_common"), r.getAs[Long]("n_a"),
            r.getAs[Long]("n_b"), tvd))
      }.toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (nc, na, nb, tvd)) =>
      val (enc, ena, enb, etvd) = expected(k)
      assert((nc, na, nb) == ((enc, ena, enb)), s"counts diverge at $k")
      assert(math.abs(tvd - etvd) < 1e-12, s"tvd diverges at $k: $tvd vs $etvd")
    }
  }

  test("text_bigram_novelty equals a driver-side bigram-df replay") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val perDoc: Map[Long, Set[String]] = docs.map { case (id, t) =>
      val toks = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector
      id -> toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
    }.toMap
    val df = perDoc.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val expected = perDoc.collect { case (id, bgs) if bgs.nonEmpty =>
      val novel = bgs.count(df(_) == 1)
      id -> ((bgs.size.toLong, novel.toLong, novel.toDouble / bgs.size))
    }
    val got = SparkEntry.queries("text_bigram_novelty")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_distinct"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novelty")))).toMap
    assert(got == expected.toMap, s"novelty diverges: got ${got.size} docs")
  }

  test("corpus_rebalance: integer keep rule replayed, small sources kept whole") {
    def ref(s: String): Long = s.codePoints().toArray
      .foldLeft(0L)((h, c) => h * 31L + c)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text")))
    val bySource = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cap = (docs.length + 2 * bySource.size - 1) / (2 * bySource.size)
    val expected = docs.collect {
      case (id, src, text) if java.lang.Long.remainderUnsigned(
          ref(text), bySource(src)) < cap => id -> src
    }.toMap
    val rows = SparkEntry.queries("corpus_rebalance")(spark, sf).collect()
    val got = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    assert(got == expected, s"keep set diverges: got ${got.size}, " +
      s"expected ${expected.size}")
    rows.foreach(r => assert(r.getAs[Long]("cap") == cap))
    // sources at or under the uniform share are never downsampled
    val keptBySource = rows.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.length.toLong).toMap
    bySource.foreach { case (src, n) =>
      if (n <= cap) assert(keptBySource.getOrElse(src, 0L) == n,
        s"small source $src downsampled: ${keptBySource.get(src)} of $n")
      else assert(keptBySource.getOrElse(src, 0L) <= n)
    }
    // the budget actually bites on this corpus: something was dropped
    assert(rows.length < docs.length, "rebalance kept everything — cap inert")
  }

  test("corpus_decontaminate_semantic equals a driver-side cosine replay") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val bench = vecs.filter(_._1 < 50)
    val expected = vecs.filter(_._1 >= 50).flatMap { case (id, v) =>
      val ms = bench.map { case (bid, bv) => (bid, cos(v, bv)) }
        .filter { case (_, c) => !c.isNaN && c >= 0.45 }
      if (ms.isEmpty) None
      else {
        val best = ms.minBy { case (bid, c) => (-c, bid) }
        Some(id -> ((ms.length.toLong, best._1, best._2)))
      }
    }.toMap
    val got = SparkEntry.queries("corpus_decontaminate_semantic")(spark, sf)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_matches"), r.getAs[Long]("bench_id"),
          r.getAs[Double]("cosine")))).toMap
    assert(got.nonEmpty, "no semantic contamination found — threshold inert")
    assert(got == expected, s"diverges: got ${got.size}, expected ${expected.size}")
  }

  test("corpus_curation disposition is consistent with the component queries") {
    def byDoc(name: String): Map[Long, org.apache.spark.sql.Row] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val qual = byDoc("text_quality")
    val keep = byDoc("corpus_keepers")
    val dec = byDoc("corpus_decontaminate")
    val split = byDoc("corpus_train_split")
    // doc -> exact-dup canon, replayed with the D1 normalization
    val md = java.security.MessageDigest.getInstance("MD5")
    val canon = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val norm = r.getAs[String]("text").toLowerCase
          .replaceAll("[ \t\n\f\r]+", " ").trim
        val h = md.digest(norm.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (r.getAs[Long]("doc_id"), h)
      }
    val keeperOf = canon.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val canonOf = canon.map { case (id, h) => id -> keeperOf(h) }.toMap
    val got = SparkEntry.queries("corpus_curation")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("disposition")).toMap
    assert(got.keySet == canonOf.keySet)
    got.foreach { case (id, disp) =>
      val expected =
        if (id % 20 == 0) "benchmark"
        else if (qual(id).getAs[Double]("quality_score") < 0.65) "low_quality"
        else if (canonOf(id) != id) "exact_dup"
        else if (!keep(id).getAs[Boolean]("keep")) "near_dup"
        else if (dec.get(id).exists(_.getAs[Boolean]("contaminated")))
          "contaminated"
        else split(id).getAs[String]("split")
      assert(disp == expected, s"doc $id: got $disp, expected $expected")
    }
    // the cascade is non-degenerate on this corpus: at least benchmark
    // and a kept split are present
    val kinds = got.values.toSet
    assert(kinds.contains("benchmark") && kinds.contains("train"),
      s"degenerate cascade: $kinds")
  }

  test("corpus_chunk tiles each doc: stride, clamp, count formula") {
    val W = 32; val S = 24
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = SparkEntry.queries("corpus_chunk")(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == nTok.filter(_._2 > 0).keySet)
    byDoc.foreach { case (id, rows) =>
      val n = nTok(id)
      val sorted = rows.sortBy(_.getAs[Long]("chunk_idx"))
      val expectChunks = 1 + math.max(0, (n - W + S - 1) / S)
      assert(sorted.length == expectChunks, s"doc $id chunk count")
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_idx") == i)
        assert(r.getAs[Long]("start_tok") == i.toLong * S)
        assert(r.getAs[Long]("n_chunk_tokens") ==
          math.min(W.toLong, n - i.toLong * S))
      }
      // coverage: the last chunk reaches the doc end
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_chunk_tokens") == n)
    }
  }

  test("dedup_cluster_stats accounting matches corpus_keepers") {
    val stats = SparkEntry.queries("dedup_cluster_stats")(spark, sf).collect()
    val corpusN = Tables.documents(spark, sf).count()
    assert(stats.map(_.getAs[Long]("n_docs")).sum == corpusN,
      "histogram must partition the corpus")
    stats.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters"))
    }
    val dropped = stats.filter(_.getAs[Long]("cluster_size") > 1)
      .map(_.getAs[Long]("n_dropped")).sum
    val keepersDropped = SparkEntry.queries("corpus_keepers")(spark, sf)
      .filter(!col("keep")).count()
    assert(dropped == keepersDropped,
      s"n_dropped $dropped != keepers' non-survivors $keepersDropped")
  }

  test("text_unigram_lm agrees with a driver-side frequency fold") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> "[a-z0-9]+".r.findAllIn(r.getString(1)).toSeq)
    val freq = docs.flatMap(_._2).groupBy(identity).map { case (t, o) => t -> o.size }
    val got = SparkEntry.queries("text_unigram_lm")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, toks) =>
      val r = got(id)
      assert(r.getAs[Long]("n_tokens") == toks.length)
      if (toks.nonEmpty) {
        val counts = toks.map(freq)
        assert(r.getAs[Long]("min_tok_count") == counts.min)
        assert(math.abs(r.getAs[Double]("mean_tok_count") -
          counts.map(_.toLong).sum.toDouble / toks.length) < 1e-9)
      } else assert(r.isNullAt(r.fieldIndex("mean_tok_count")))
    }
  }

  test("corpus_importance equals a driver-side mass replay") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> "[a-z0-9]+".r.findAllIn(r.getString(1)).toSeq)
    val freq = docs.flatMap(_._2).groupBy(identity).map { case (t, o) => t -> o.size }
    val tgtFreq = docs.filter(_._1 % 20 == 0).flatMap(_._2)
      .groupBy(identity).map { case (t, o) => t -> o.size }
    val got = SparkEntry.queries("corpus_importance")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // benchmark docs are never scored; empty docs drop out on both sides
    assert(got.keySet.forall(_ % 20 != 0))
    assert(got.size == docs.count { case (id, t) => id % 20 != 0 && t.nonEmpty })
    docs.filter { case (id, t) => id % 20 != 0 && t.nonEmpty }.foreach {
      case (id, toks) =>
        val r = got(id)
        val tm = toks.map(t => tgtFreq.getOrElse(t, 0).toLong).sum
        val cm = toks.map(t => freq(t).toLong).sum
        assert(r.getAs[Long]("target_mass") == tm, s"doc $id")
        assert(r.getAs[Long]("corpus_mass") == cm, s"doc $id")
        val imp = r.getAs[Double]("importance")
        assert(imp >= 0.0 && imp <= 1.0 && imp == tm.toDouble / cm.toDouble)
    }
  }

  test("scrubText redacts real-world-shaped PII (the C23 seam on raw text)") {
    import spark.implicits._
    // expected strings cross-checked against DuckDB's RE2 — the same
    // outputs on both engines is the C23 dialect-parity contract
    val cases = Seq(
      "mail me at jane.doe+spam@sub.example.co.uk today" ->
        "mail me at <EMAIL> today",
      "call +1-555-0199 or +44-207-9460" ->
        "call <PHONE> or <PHONE>",
      "card 4111111111111111 ssn 123456789" ->
        "card <NUM> ssn <NUM>",
      "no pii here at all" -> "no pii here at all")
    val got = cases.map(_._1).toDF("t")
      .select(graft.queries.TextAnalysis.scrubText(org.apache.spark.sql.functions.col("t")))
      .collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("text_bpe_merges equals a driver-side vocab replay (8 steps)") {
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => "[a-z0-9]+".r.findAllIn(r.getString(0).toLowerCase))
    var vocab: Seq[(String, Long)] = toks.groupBy(identity).toSeq
      .map { case (t, l) => (t.map(_.toString).mkString(" "), l.size.toLong) }
    val expected = (1 to 8).map { i =>
      val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (w, f) =>
        w.split(" ").sliding(2).filter(_.length == 2)
          .foreach(p => pairCnt((p(0), p(1))) += f)
      }
      val ((a, b), cnt) = pairCnt.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.head
      val (pat, rep) = (s" $a $b ", s" $a$b ")
      vocab = vocab.map { case (w, f) =>
        ((" " + w + " ").replace(pat, rep).replace(pat, rep).trim, f)
      }
      (i, a, b, a + b, cnt)
    }
    val got = SparkEntry.queries("text_bpe_merges")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == expected, s"merge tables diverge:\n$got\nvs\n$expected")
  }

  test("text_bpe_tokens equals a driver-side encode replay") {
    // merges come from the engine (pinned by the C29 replay test);
    // this test replays the ENCODER — the same padded double-replace
    // cascade — over every document and compares the per-doc rollup
    val merges = SparkEntry.queries("text_bpe_merges")(spark, sf).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    def encode(tok: String): Long = {
      var w = " " + tok.map(_.toString).mkString(" ") + " "
      merges.foreach { case (a, b) =>
        val (p, r) = (s" $a $b ", s" $a$b ")
        w = w.replace(p, r).replace(p, r)
      }
      w.trim.split(" ").length.toLong
    }
    val expected = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map { r =>
        val toks = "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq
        r.getLong(0) -> ((toks.size.toLong,
          toks.map(_.length).sum.toLong, toks.map(encode).sum))
      }.toMap
    val got = SparkEntry.queries("text_bpe_tokens")(spark, sf).collect()
      .map { r =>
        val nb = r.getAs[Long]("n_bpe_tokens")
        if (nb > 0) // compression is the one derived double
          assert(r.getAs[Double]("compression") ==
            r.getAs[Long]("n_chars").toDouble / nb)
        r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_words"),
          r.getAs[Long]("n_chars"), nb))
      }.toMap
    assert(got == expected, s"BPE token rollups diverge (${got.size} docs)")
  }

  test("BPE pairless steps: single-symbol corpus yields zero merges, tokens intact") {
    // Degenerate corpus — every word is one symbol, so step 1 is already
    // pairless. The learner must emit NO merge rows (not sentinel junk),
    // and the vocab must survive the pairless sweeps un-annihilated so
    // the downstream encoder still sees every word (ADVICE r11: the
    // empty-top cross join used to zero the vocab frame).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpedegen").toString
    Seq((1L, "a b c a b"), (2L, "c c a 9"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      val merges = SparkEntry.queries("text_bpe_merges")(spark, dir).collect()
      assert(merges.isEmpty, s"pairless corpus produced merges: ${merges.toSeq}")
      val toks = SparkEntry.queries("text_bpe_tokens")(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))).toMap
      // every 1-char word encodes to exactly 1 token
      assert(toks == Map(1L -> ((5L, 5L)), 2L -> ((4L, 4L))),
        s"degenerate encode diverged: $toks")
    } finally {
      FrameCache.evictMatching(spark, dir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("text_sentence_stats equals a driver-side regex replay") {
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect().map { r =>
        val text = r.getString(1)
        val words = "[a-z0-9]+".r.findAllIn(text.toLowerCase).length.toLong
        val swc = "[^.!?]+".r.findAllIn(text)
          .map(s => "[a-z0-9]+".r.findAllIn(s.toLowerCase).length)
          .filter(_ > 0).toSeq
        r.getLong(0) -> ((swc.length.toLong, words,
          if (swc.isEmpty) 0L else swc.max.toLong,
          words.toDouble / math.max(swc.length, 1)))
      }.toMap
    val got = SparkEntry.queries("text_sentence_stats")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sentences"), r.getAs[Long]("n_words"),
          r.getAs[Long]("max_sentence_words"),
          r.getAs[Double]("words_per_sentence")))).toMap
    assert(got == expected, s"sentence stats diverge (${got.size} docs)")
  }

  test("winnowing guarantees: shared-substring detection and window coverage") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the SIGMOD'03 contract at k=8, w=4: any shared substring of
    // length >= k+w-1 = 11 yields a shared fingerprint, and the
    // selected set hits EVERY full window
    val share = "zqxjkvwpyhg" // 11 distinct-ish chars
    val docs = Seq(
      (1L, s"aaaa bbbb $share cccc dddd eeee"),
      (2L, s"mmmm nnnn oooo pppp $share qq rr")).toDF("doc_id", "text")
    val dn = docs.select(col("doc_id"),
      trim(regexp_replace(lower(col("text")), "[ \\t\\n\\f\\r]+", " ")).as("nt"))
      .select(col("doc_id"), col("nt"),
        (length(col("nt")) - 7).cast("long").as("np"))
    val np = dn.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sel = graft.queries.TextAnalysis.winnowSelected(dn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
    val hashes = sel.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(hashes(1L).intersect(hashes(2L)).nonEmpty,
      "shared 11-char substring must yield a shared fingerprint hash")
    // coverage: every full window [j, j+3] contains a selected position
    sel.groupBy(_._1).foreach { case (doc, rows) =>
      val ps = rows.map(_._2).toSet
      (1L to np(doc) - 3L).foreach { j =>
        assert((j until j + 4).exists(ps.contains),
          s"doc $doc window [$j, ${j + 3}] has no fingerprint")
      }
    }
  }

  test("text_coverage_curve equals a driver-side exact top-N mass sweep") {
    val got = SparkEntry.queries("text_coverage_curve")(spark, sf).collect()
      .sortBy(_.getAs[Int]("vocab_size"))
    assert(got.map(_.getAs[Int]("vocab_size")).toSeq ==
      Seq(16, 64, 256, 1024, 4096))
    val word = "[a-z0-9]+".r
    val cnt = collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"$sf/documents.parquet").select("text").collect()
      .foreach(r => word.findAllIn(r.getString(0).toLowerCase)
        .foreach(w => cnt(w) = cnt.getOrElse(w, 0L) + 1L))
    val total = cnt.values.sum
    val sorted = cnt.toSeq.sortBy { case (t, n) => (-n, t) }
    got.foreach { r =>
      val n = r.getAs[Int]("vocab_size")
      val cov = sorted.take(n).map(_._2).sum
      assert(r.getAs[Long]("covered_tokens") == cov, s"covered at $n")
      assert(r.getAs[Long]("total_tokens") == total)
      assert(r.getAs[Long]("n_distinct") == cnt.size.toLong)
      assert(r.getAs[Double]("coverage") == cov.toDouble / total)
    }
    // the curve is monotone and ends at (or below) full coverage
    val covs = got.map(_.getAs[Double]("coverage")).toSeq
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b })
    assert(covs.last <= 1.0 && covs.head > 0.0)
  }

  test("text_syllable_profile equals a driver-side vowel-run replay") {
    val word = "[a-z0-9]+".r
    val vowel = "[aeiouy]+".r
    val expect = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map { r =>
        val syl = word.findAllIn(r.getAs[String]("text").toLowerCase)
          .map(w => math.max(1, vowel.findAllIn(w).length)).toSeq
        r.getAs[Long]("doc_id") -> syl
      }.toMap
    val got = SparkEntry.queries("text_syllable_profile")(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val syl = expect(r.getAs[Long]("doc_id"))
      val (nw, ns) = (syl.length.toLong, syl.map(_.toLong).sum)
      assert(r.getAs[Long]("n_words") == nw)
      assert(r.getAs[Long]("n_syllables") == ns)
      assert(r.getAs[Long]("n_mono") == syl.count(_ == 1).toLong)
      assert(r.getAs[Long]("n_complex") == syl.count(_ >= 3).toLong)
      assert(r.getAs[Double]("syllables_per_word") ==
        ns.toDouble / math.max(nw, 1L))
      assert(r.getAs[Double]("complex_share") ==
        syl.count(_ >= 3).toDouble / math.max(nw, 1L))
    }
    // heuristic sanity: vowelless tokens still carry one syllable
    assert(expect.values.forall(_.forall(_ >= 1)))
  }

  test("dedup_incremental equals a driver-side replay and partitions the batch") {
    val norm = (t: String) =>
      t.toLowerCase.replaceAll("[ \\t\\n\\f\\r]+", " ").trim
    def h(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(norm(t).getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, SparkTestSession.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val v1Keeper = docs.map { case (id, t) => (h(t), id) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val v2 = docs.filter(_._1 % 17 != 3)
      .map { case (id, t) => (id, if (id % 17 == 5) t + " [rev2]" else t) } ++
      docs.filter(_._1 % 17 == 7)
        .map { case (id, _) => (id + 10000000L, s"v2 addendum for $id") }
    val batchKeeper = v2.map { case (id, t) => (h(t), id) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val expect = v2.map { case (id, t) =>
      val hh = h(t)
      val (disp, dupOf) = v1Keeper.get(hh) match {
        case Some(k) => ("dup_of_existing", Some(k))
        case None if id > batchKeeper(hh) => ("dup_in_batch", Some(batchKeeper(hh)))
        case None => ("admit", None)
      }
      id -> ((hh, disp, dupOf))
    }.toMap
    val got = SparkEntry.queries("dedup_incremental")(spark, SparkTestSession.sf)
      .collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (hh, disp, dupOf) = expect(id)
      assert(r.getAs[String]("content_hash") == hh, s"hash for $id")
      assert(r.getAs[String]("disposition") == disp, s"disposition for $id")
      assert((if (r.isNullAt(r.fieldIndex("dup_of"))) None
              else Some(r.getAs[Long]("dup_of"))) == dupOf, s"dup_of for $id")
    }
    // the realistic shape: unchanged re-crawls dominate, revisions +
    // addenda admit, and every disposition points somewhere valid
    val n = got.groupBy(_.getAs[String]("disposition")).view.mapValues(_.length)
    assert(n.getOrElse("dup_of_existing", 0) > n.getOrElse("admit", 0))
    assert(n.getOrElse("admit", 0) > 0)
  }

  test("text_boilerplate_ngrams equals a driver-side 5-gram df replay") {
    val docs = Tables.documents(spark, SparkTestSession.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val tok = "[a-z0-9]+".r
    val df = docs.flatMap { case (id, t) =>
      val ts = tok.findAllIn(t.toLowerCase).toArray
      ts.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
        .map((g: String) => (g, id))
    }.groupBy(_._1).map { case (g, v) =>
      g -> ((v.length.toLong, v.map(_._2).min)) }
    val expect = df.filter(_._2._1 >= 3).toSeq
      .sortBy { case (g, (c, _)) => (-c, g) }.take(50)
    val got = SparkEntry.queries("text_boilerplate_ngrams")(
      spark, SparkTestSession.sf).collect()
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (r, (g, (c, ex))) =>
      assert(r.getAs[String]("gram") == g)
      assert(r.getAs[Long]("df") == c)
      assert(r.getAs[Long]("example_doc") == ex)
    }
  }

  test("dedup_threshold_sweep: dense grid, monotone in tau, anchored at D2") {
    val got = SparkEntry.queries("dedup_threshold_sweep")(
      spark, SparkTestSession.sf).collect()
    assert(got.length == 5)
    assert(got.map(_.getAs[Double]("tau")).toSeq == Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    // tightening tau can only shrink every count
    got.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_pairs") >= hi.getAs[Long]("n_pairs"))
      assert(lo.getAs[Long]("n_docs") >= hi.getAs[Long]("n_docs"))
      assert(lo.getAs[Long]("sum_union") >= hi.getAs[Long]("sum_union"))
    }
    // the tau=0.8 row prices exactly the D2 pair set
    val d2 = SparkEntry.queries("dedup_ngram_jaccard")(
      spark, SparkTestSession.sf).collect()
    val row8 = got.find(_.getAs[Double]("tau") == 0.8).get
    assert(row8.getAs[Long]("n_pairs") == d2.length.toLong)
    val docs8 = d2.flatMap(r =>
      Seq(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(row8.getAs[Long]("n_docs") == docs8.size.toLong)
  }

  test("text_hapax_stats equals a driver-side per-source tf fold") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    val word = "[a-z0-9]+".r
    val bySource = docs.groupBy(_._1).map { case (src, ds) =>
      val tf = ds.flatMap(d => word.findAllIn(d._2.toLowerCase).toSeq)
        .groupBy(identity).map { case (t, v) => t -> v.length.toLong }
      src -> tf
    }
    val got = SparkEntry.queries("text_hapax_stats")(spark, sf).collect()
    assert(got.length == bySource.size && got.nonEmpty)
    got.foreach { r =>
      val tf = bySource(r.getAs[String]("source"))
      val total = tf.values.sum
      val hapax = tf.values.count(_ == 1).toLong
      assert(r.getAs[Long]("total_tokens") == total)
      assert(r.getAs[Long]("distinct_terms") == tf.size.toLong)
      assert(r.getAs[Long]("hapax_terms") == hapax)
      assert(r.getAs[Long]("dis_terms") == tf.values.count(_ == 2).toLong)
      assert(r.getAs[Double]("type_token_ratio") == tf.size.toDouble / total)
      assert(r.getAs[Double]("hapax_share") == hapax.toDouble / tf.size)
    }
  }

  test("dedup_edit_distance: planted mutations found exact, hot head capped") {
    // Planted corpus pins all three contracts at once:
    //  - a base/mutant pair sharing a stable 24-char head with three
    //    interior substitutions → emitted with edit_dist == 3, exact;
    //  - a same-head pair whose tails diverge beyond the τ=64 bound →
    //    filtered (the |Δlen| prune fires before any DP);
    //  - a 70-doc template-head block (> EditBlockCap=64) of mutual
    //    near-dups → the whole block is dropped (no m² DP pairs), even
    //    though every pair would pass the distance test.
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val t = prev(j)
          prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = t
        }
      }
      prev(b.length)
    }
    val head = "aaaa bbbb cccc dddd eeee" // exactly 24 normalized chars
    val base = s"$head alpha beta gamma delta epsilon zeta eta theta"
    val mutant = s"$head alpha bexa gamma dblta epsilon zeta eta thexa"
    val far = s"$head " + Seq.fill(40)("pad word filler").mkString(" ")
    val hotDocs = (0 until 70).map(i =>
      (2000L + i, s"template head block rest $i"))
    val docs = Seq((1000L, base), (1001L, mutant), (1002L, far)) ++ hotDocs
    val dir = java.nio.file.Files.createTempDirectory("editdist").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      val expected = lev(base, mutant)
      assert(expected == 3, s"planted mutation count drifted: $expected")
      assert(math.abs(far.length - base.length) > 64,
        "far doc is inside the length prune — plant is broken")
      val got = SparkEntry.queries("dedup_edit_distance")(spark, dir)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          r.getAs[Int]("edit_dist")).toMap
      assert(got == Map((1000L, 1001L) -> expected),
        s"edit-distance output diverges: $got")
    } finally {
      FrameCache.evictMatching(spark, dir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("text_strip_boilerplate removes the planted template chrome and " +
      "leaves unique prose untouched") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // one 6-token template shared by docs 1-3 (head, tail, and
    // mid-document placements); every prose word is globally unique so
    // no accidental df >= 3 gram exists outside the template
    val tpl = "subscribe to our newsletter for updates"
    val docs = Seq(
      (1L, s"alpha bravo charlie delta echo $tpl"),
      (2L, s"$tpl foxtrot golf hotel india juliet"),
      (3L, s"kilo lima mike november oscar papa $tpl quebec romeo sierra tango uniform"),
      (4L, "victor whiskey xray yankee zulu one two"))
    val dir = java.nio.file.Files.createTempDirectory("stripboiler").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      val got = SparkEntry.queries("text_strip_boilerplate")(spark, dir)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
            r.getAs[Double]("kept_ratio"), r.getAs[String]("cleaned_hash"))))
        .toMap
      // template fully removed — both its internal 5-grams have df = 3,
      // their union covers all 6 template positions; cross-boundary
      // grams (prose + template words) are df = 1 and remove nothing
      assert(got(1L) ==
        ((11L, 6L, 5.0 / 11, md5hex("alpha bravo charlie delta echo"))))
      assert(got(2L) ==
        ((11L, 6L, 5.0 / 11, md5hex("foxtrot golf hotel india juliet"))))
      assert(got(3L) == ((17L, 6L, 11.0 / 17, md5hex(
        "kilo lima mike november oscar papa quebec romeo sierra tango uniform"))))
      // unique prose untouched: hash equals the canonical token stream
      assert(got(4L) ==
        ((7L, 0L, 1.0, md5hex("victor whiskey xray yankee zulu one two"))))
    } finally {
      FrameCache.evictMatching(spark, dir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("dedup_df_profile: buckets are df bit-lengths, postings conserve, " +
      "shares sum to one") {
    val rows = SparkEntry.queries("dedup_df_profile")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      val (mn, mx) = (r.getAs[Long]("min_cnt"), r.getAs[Long]("max_cnt"))
      assert(mn >= (1L << (b - 1)) && mx < (1L << b) && mn <= mx,
        s"bucket $b bounds violated: [$mn, $mx]")
    }
    // postings conservation: Σ n_rows == total (doc, distinct-shingle)
    // postings, replayed driver-side through the same kernels
    val totalPostings = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .map(r => HashImpl.shingles3(
        HashImpl.tokenize(utf8(r.getAs[String]("text")))).numElements().toLong)
      .sum
    assert(rows.map(_.getAs[Long]("n_rows")).sum == totalPostings)
  }

  test("corpus_pack_stats is exactly the per-stream rollup of the pack " +
      "frame, with bin/padding invariants") {
    val perDoc = SparkEntry.queries("corpus_pack")(spark, sf).collect()
      .groupBy(_.getAs[Int]("stream"))
    val got = SparkEntry.queries("corpus_pack_stats")(spark, sf).collect()
      .map(r => r.getAs[Int]("stream") -> r).toMap
    assert(got.keySet == perDoc.keySet && got.nonEmpty)
    val budget = graft.queries.TextAnalysis.PackBudget
    perDoc.foreach { case (stream, rows) =>
      val r = got(stream)
      val total = rows.map(_.getAs[Long]("n_tokens")).sum
      val straddlers = rows.count(_.getAs[Long]("n_pieces") >= 2).toLong
      val bins = (total + budget - 1) / budget
      assert(r.getAs[Long]("n_docs") == rows.length.toLong)
      assert(r.getAs[Long]("total_tokens") == total)
      assert(r.getAs[Long]("n_bins") == bins)
      val pad = if (total % budget == 0) 0L else budget - total % budget
      assert(r.getAs[Long]("padding_tokens") == pad)
      assert(pad >= 0 && pad < budget)
      assert(r.getAs[Long]("n_straddlers") == straddlers)
      assert(r.getAs[Double]("straddle_share") ==
        straddlers.toDouble / rows.length)
      val fill = if (total == 0) 0.0 else total.toDouble / (bins * budget)
      assert(r.getAs[Double]("fill_ratio") == fill)
      // packing conservation: real tokens + padding exactly tile the bins
      assert(total + pad == bins * budget || total == 0)
    }
  }

  test("dedup_minhash_quality: est and jaccard replay driver-side from " +
      "the raw shingle sets; estimator error within the 128-perm bounds") {
    val rows = SparkEntry.queries("dedup_minhash_quality")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        HashImpl.shingles3(HashImpl.tokenize(utf8(r.getAs[String]("text")))))
      .toMap
    def strs(a: org.apache.spark.sql.catalyst.util.ArrayData): Set[String] =
      a.toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSet
    rows.foreach { r =>
      val (sa, sb) = (docs(r.getAs[Long]("doc_a")), docs(r.getAs[Long]("doc_b")))
      val (ssa, ssb) = (strs(sa), strs(sb))
      val inter = (ssa & ssb).size
      val j = inter.toDouble / (ssa.size + ssb.size - inter)
      val na = HashImpl.minhash(sa).toLongArray()
        .zip(HashImpl.minhash(sb).toLongArray())
        .count { case (x, y) => x == y }
      assert(r.getAs[Double]("jaccard") == j, s"jaccard for $r")
      assert(r.getAs[Int]("n_agree") == na, s"n_agree for $r")
      assert(r.getAs[Double]("est") == na / 128.0)
      assert(r.getAs[Double]("abs_err") == math.abs(na / 128.0 - j))
      // per-pair bound: ~5.5 sigma at 128 permutations — deterministic
      // headroom on this data, red only if the estimator breaks
      assert(math.abs(na / 128.0 - j) < 0.25, s"estimator off for $r")
    }
    val mae = rows.map(_.getAs[Double]("abs_err")).sum / rows.length
    assert(mae < 0.1, s"MAE $mae exceeds the 128-perm expectation")
  }

  test("corpus_strip_effect is exactly the per-source rollup of the " +
      "per-doc strip frame") {
    import org.apache.spark.sql.functions._
    val perDoc = SparkEntry.queries("text_strip_boilerplate")(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .collect()
      .groupBy(_.getAs[String]("source"))
    val got = SparkEntry.queries("corpus_strip_effect")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got.keySet == perDoc.keySet && got.nonEmpty)
    perDoc.foreach { case (src, rows) =>
      val r = got(src)
      assert(r.getAs[Long]("n_docs") == rows.length.toLong)
      assert(r.getAs[Long]("docs_touched") ==
        rows.count(_.getAs[Long]("n_removed") > 0).toLong)
      val tot = rows.map(_.getAs[Long]("n_tokens")).sum
      val rem = rows.map(_.getAs[Long]("n_removed")).sum
      assert(r.getAs[Long]("total_tokens") == tot)
      assert(r.getAs[Long]("tokens_removed") == rem)
      assert(r.getAs[Long]("budget_after") == tot - rem)
      assert(r.getAs[Double]("removed_share") ==
        (if (tot == 0) 0.0 else rem.toDouble / tot))
    }
  }

  test("C38/C39 share ONE staged strip frame: a fresh session running " +
      "corpus_strip_effect loads the artifact, zero rebuilds") {
    // the round-13 §7k debt: stripStats was shared as CODE but not
    // STAGED — a session running C38+C39 tokenized the corpus twice.
    // Now it is a FrameCache key (+ index-dir artifact), so the second
    // consumer — same session via the memory layer, later JVM via the
    // artifact store — plans off the staged frame.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_strip").toString
    val s1 = spark.newSession(); s1.conf.set(FrameCache.IndexDirConf, dir)
    val s2 = spark.newSession(); s2.conf.set(FrameCache.IndexDirConf, dir)
    try {
      // session 1 runs C38: builds + publishes the artifacts
      val viaBuild = SparkEntry.queries("text_strip_boilerplate")(s1, sf)
        .collect().map(_.toSeq).toSet
      // fresh session runs C39: the strip frame must LOAD, not rebuild
      val (b0, _) = FrameCache.diskStats
      val c39 = SparkEntry.queries("corpus_strip_effect")(s2, sf)
      val plan = c39.queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_idx_strip"),
        s"C39 plan does not scan the staged strip artifact:\n$plan")
      c39.collect()
      val (b1, _) = FrameCache.diskStats
      assert(b1 === b0,
        "fresh session rebuilt the strip frame instead of loading it")
      // and the artifact-backed C38 result matches the default path
      val base = SparkEntry.queries("text_strip_boilerplate")(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(viaBuild == base)
    } finally {
      FrameCache.evict(s1); FrameCache.evict(s2)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("dedup_banding_sweep: nested bandings give monotone candidate/" +
      "caught counts, the operating banding recalls every true pair, " +
      "and the nesting claim holds on real candidate sets") {
    val rows = SparkEntry.queries("dedup_banding_sweep")(spark, sf).collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band")) ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_true"),
          r.getAs[Long]("n_caught"), r.getAs[Double]("recall"),
          r.getAs[Double]("p_catch_at_tau")))).toMap
    assert(rows.keySet == Set((8, 16), (16, 8), (32, 4), (64, 2)),
      s"sweep bandings ${rows.keySet}")
    // truth side is D2's exact pair set
    val nTrue = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf).count()
    assert(rows.values.forall(_._2 == nTrue), "n_true diverges from D2")
    // nesting ⇒ exact monotonicity as rows-per-band halves
    val ordered = Seq((8, 16), (16, 8), (32, 4), (64, 2)).map(rows)
    assert(ordered.zip(ordered.tail).forall { case (a, b) =>
      a._1 <= b._1 && a._3 <= b._3 },
      s"candidate/caught counts not monotone across nested bandings: $ordered")
    // textbook catch probability strictly sharpens as bands widen
    val pc = ordered.map(_._5)
    assert(pc.zip(pc.tail).forall { case (a, b) => a < b || (a == 1.0 && b == 1.0) },
      s"p_catch_at_tau not monotone: $pc")
    // the operating banding stands on D3's oracle argument (miss ≈ 5e-8
    // at τ = 0.8): it must recall every exact pair here, and 64×2
    // inherits that by nesting
    assert(rows((32, 4))._4 == 1.0 && rows((64, 2))._4 == 1.0,
      s"operating banding missed true pairs: ${rows((32, 4))}")
    // the nesting CLAIM itself, on real data (not just counts): EVERY
    // sweep geometry's candidate set is recomputed through the
    // independent per-banding bucket-join path (the plan the shared-
    // widest-join rewrite replaced) — each must match the report's
    // count exactly, and each narrower banding's set must nest inside
    // the next wider one. Backfilled to all four geometries (r15
    // checked two; the (8,16)/(16,8) points rode on the nesting
    // argument alone).
    import org.apache.spark.sql.functions._
    val sigs = queries.Dedup.shingled(spark, sf).filter(col("n") > 0)
      .withColumn("sig",
        graft.functions.expressions.minhash_sigs(col("shingles")))
      .select(col("doc_id"), col("sig")).localCheckpoint()
    def candSet(b: Int, r: Int) = queries.Dedup.bandCandidates(
        sigs.select(col("doc_id"),
          explode(expr(queries.Dedup.bandListExprFor(b, r))).as("bucket")))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val sets = queries.Dedup.SweepBandings.map { case (b, r) =>
      (b, r) -> candSet(b, r)
    }
    sets.foreach { case ((b, r), cs) =>
      assert(cs.size == rows((b, r))._1,
        s"report candidate count diverges from the recomputed ${b}x$r " +
          s"join: ${cs.size} vs ${rows((b, r))._1}")
    }
    sets.zip(sets.tail).foreach { case (((ab, ar), a), ((bb, br), b)) =>
      assert(a.subsetOf(b),
        s"banding nesting violated: ${(a -- b).take(5)} in ${ab}x$ar " +
          s"but not ${bb}x$br")
    }
  }

  test("D17/D19 share ONE staged admitted-pair frame: a fresh session " +
      "running dedup_winnow_clusters loads the artifact, zero rebuilds") {
    // the round-14 §What's-wrong #2: the rare-fingerprint INDEX was
    // staged but the admitted pair frame was rebuilt by both consumers
    // — dedup_winnow_clusters re-paid dedup_winnow_pairs' pair join.
    // Now the pair frame is its own FrameCache key (+ index-dir
    // artifact): the second consumer plans off the staged frame.
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_winnow").toString
    val s1 = spark.newSession(); s1.conf.set(FrameCache.IndexDirConf, dir)
    val s2 = spark.newSession(); s2.conf.set(FrameCache.IndexDirConf, dir)
    try {
      // session 1 runs D17: builds + publishes the pair-frame artifact
      val viaBuild = SparkEntry.queries("dedup_winnow_pairs")(s1, sf)
        .collect().map(_.toSeq).toSet
      // fresh session runs D19: the pair frame must LOAD, not rebuild
      val (b0, _) = FrameCache.diskStats
      SparkEntry.queries("dedup_winnow_clusters")(s2, sf).collect()
      val (b1, _) = FrameCache.diskStats
      assert(b1 === b0,
        "fresh session rebuilt the winnow pair frame instead of loading it")
      // the D17 plan in the fresh session scans the artifact directly
      val plan = SparkEntry.queries("dedup_winnow_pairs")(s2, sf)
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_idx_winnow"),
        s"D17 plan does not scan the staged pair artifact:\n$plan")
      // same-session reuse: re-running both consumers adds no frames
      val frames1 = FrameCache.size(s2)
      val viaLoad = SparkEntry.queries("dedup_winnow_pairs")(s2, sf)
        .collect().map(_.toSeq).toSet
      SparkEntry.queries("dedup_winnow_clusters")(s2, sf).collect()
      assert(FrameCache.size(s2) == frames1,
        "FrameCache entry count grew across invocations")
      // and the artifact-backed result matches the default-path build
      val base = SparkEntry.queries("dedup_winnow_pairs")(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(viaBuild == base && viaLoad == base)
    } finally {
      FrameCache.evict(s1); FrameCache.evict(s2)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
