package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("media_features: one row per doc, real schema, deterministic stub") {
    val df = queries.Multimodal.mediaFeaturesRaw(spark, sf)
    val nDocs = Tables.documents(spark, sf).count()
    val rows = df.collect()
    assert(rows.length == nDocs)
    val schema = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("features") == "array<double>")
    assert(schema("doc_id") == "bigint")
    rows.foreach { r =>
      val feats = r.getAs[scala.collection.Seq[Double]]("features")
      assert(feats.length == 8)
      // histogram fractions sum to ~1 (all payload bytes binned)
      assert(math.abs(feats.sum - 1.0) < 1e-9)
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 128)
    }
    // deterministic across runs (content-wise; row order is unspecified)
    val again = queries.Multimodal.mediaFeaturesRaw(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("media_frame_sample: bounded windows, deterministic, no array/binary in driver output") {
    import org.apache.spark.sql.types.{ArrayType, BinaryType}
    val raw = queries.Multimodal.mediaFramesRaw(spark, sf)
    val rows = raw.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val frame = r.getAs[Array[Byte]]("frame")
      assert(frame.length <= 256 && frame.length > 0)
      assert(r.getAs[Long]("frame_offset") >= 0)
    }
    // ≤4 frames per doc, indices dense from 0
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { fs =>
      val idx = fs.map(_.getAs[Int]("frame_idx")).sorted
      assert(idx.length <= 4 && idx.sameElements(idx.indices))
    }
    val driver = SparkEntry.queries("media_frame_sample")(spark, sf)
    assert(!driver.schema.exists(f =>
      f.dataType.isInstanceOf[ArrayType] || f.dataType == BinaryType))
    assert(driver.count() == rows.length)
  }

  test("batch queries register as SQL views") {
    // on the SHARED session (a throwaway session would pin a second
    // persisted shingle cache for the rest of the test JVM)
    GraftCatalog.registerQueryViews(spark, sf)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft_kv_snapshot").head().getAs[Long]("n") > 0)
    assert(spark.catalog.tableExists("graft_corpus_token_budget"))
    assert(!spark.catalog.tableExists("graft_stream_change_feed"))
  }

  test("driver-facing media_features output has no array columns") {
    import org.apache.spark.sql.types.ArrayType
    val df = SparkEntry.queries("media_features")(spark, sf)
    assert(!df.schema.exists(_.dataType.isInstanceOf[ArrayType]))
    val rows = df.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach(r => assert(r.getAs[Int]("n_features") == 8))
  }

  // the F1/F2 oracles equate UTF-8 bytes with codepoints (ord()-binned
  // histogram, substr frame windows); that holds only on an all-ASCII
  // corpus — fail HERE, loudly, if the generator ever emits multi-byte
  // text, instead of flipping two driver oracles red
  test("media oracles' byte==codepoint (ASCII) assumption holds on the corpus") {
    import org.apache.spark.sql.functions._
    val nonAscii = Tables.documents(spark, sf)
      .filter(octet_length(encode(col("text"), "UTF-8")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii non-ASCII documents break F1/F2 oracle byte-vs-codepoint parity")
  }

  test("GraftExtensions registers SQL functions") {
    spark.sparkContext // ensure shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[2]")
      .config("spark.sql.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT fingerprint64('hello') AS f,
          |  simhash64(tokenize_words('a b c')) AS sh,
          |  size(shingles3(tokenize_words('a b c d'))) AS ns,
          |  cosine_sim(array(float(1.0), float(0.0)), array(float(1.0), float(0.0))) AS cs,
          |  dot_product(array(float(2.0)), array(float(3.0))) AS dp,
          |  l2norm(array(float(3.0), float(4.0))) AS l2,
          |  size(minhash_sigs(array('x', 'y'))) AS nmh,
          |  srp_sig(array(float(1.0), float(-1.0)), 8) AS srp,
          |  srp_sig_seeded(array(float(1.0), float(-1.0)), 8, 3) AS srps""".stripMargin).head()
      assert(r.getAs[Long]("f") == "hello".foldLeft(0L)((h, c) => h * 31 + c))
      assert(r.getAs[Int]("ns") == 2)
      assert(r.getAs[Double]("cs") == 1.0)
      assert(r.getAs[Double]("dp") == 6.0)
      assert(r.getAs[Double]("l2") == 5.0)
      assert(r.getAs[Int]("nmh") == 128)
      // catalog + functions together: the full surface from plain SQL
      GraftCatalog.registerAll(s2, sf)
      val agg = s2.sql(
        """SELECT count(*) AS n, count(DISTINCT fingerprint64(text)) AS nf
          |FROM documents""".stripMargin).head()
      assert(agg.getAs[Long]("n") > 0 && agg.getAs[Long]("nf") > 0)
      // the three custom aggregates resolve from plain SQL too
      val sk = s2.sql(
        """SELECT size(misra_gries(lang, 4)) AS mg,
          |  size(bottom_k(source, doc_id, 3)) AS bk,
          |  count_min(doc_id, 2, 64)[1] >= 0 AS cm
          |FROM documents""".stripMargin).head()
      assert(sk.getAs[Int]("mg") > 0 && sk.getAs[Int]("bk") == 3
        && sk.getAs[Boolean]("cm"))
      ()
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("media_keepers equals union-find over the F4 pair list") {
    val pairs = SparkEntry.queries("media_phash")(spark, sf)
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
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(x => x -> find(x)).toMap
    val got = SparkEntry.queries("media_keepers")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("cluster_id"), r.getAs[Boolean]("keep")))
    assert(got.length == Tables.documents(spark, sf).count())
    got.foreach { case (v, c, keep) =>
      assert(c == clustered.getOrElse(v, v), s"cluster mismatch for $v")
      assert(keep == (c == v), s"keep flag inconsistent for $v")
    }
    got.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.count(_._3) == 1, s"cluster $c keeper count != 1")
    }
  }

  test("media_dedup: md5-over-payload refcounts partition the corpus exactly") {
    val rows = SparkEntry.queries("media_dedup")(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    assert(rows.map(_.getAs[Long]("n_copies")).sum == docs.length)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.groupBy { case (_, t) => md5hex(t) }.map { case (h, g) =>
      h -> ((g.map(_._1).min, g.size.toLong,
        g.map(_._2.getBytes("UTF-8").length.toLong).sum))
    }
    val got = rows.map(r => r.getAs[String]("payload_md5") ->
      ((r.getAs[Long]("keeper_doc_id"), r.getAs[Long]("n_copies"),
        r.getAs[Long]("total_bytes")))).toMap
    assert(got == expected)
  }

  test("media_caption_pairs: one pair per asset, admission flag replays") {
    val rows = SparkEntry.queries("media_caption_pairs")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      assert(w >= 64 && w < 128 && h >= 64 && h < 128) // stub dim range
      assert(r.getAs[Double]("aspect") == w.toDouble / h)
      val expectKeep = r.getAs[Long]("n_tokens") >= 5 &&
        r.getAs[Long]("n_bytes") >= 64 && w * 2 >= h && h * 2 >= w
      assert(r.getAs[Boolean]("pair_keep") == expectKeep, s"row $r")
    }
    // the gate must be live in both directions on this corpus
    assert(rows.exists(_.getAs[Boolean]("pair_keep")))
  }

  test("media_size_profile equals a driver-side histogram replay") {
    val sizes = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => ("media/" + r.getString(0),
        r.getString(1).getBytes("UTF-8").length.toLong))
    val expected = sizes.groupBy { case (f, nb) =>
      (f, java.lang.Long.toBinaryString(nb).length)
    }.map { case ((f, b), xs) =>
      (f, b) -> ((xs.length.toLong, xs.map(_._2).sum,
        xs.map(_._2).min, xs.map(_._2).max))
    }
    val fmtBytes = sizes.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = SparkEntry.queries("media_size_profile")(spark, sf).collect()
      .map { r =>
        val f = r.getAs[String]("format")
        val tb = r.getAs[Long]("total_bytes")
        assert(r.getAs[Double]("share") == tb.toDouble / fmtBytes(f),
          s"share mismatch for $f")
        (f, r.getAs[Int]("bucket")) ->
          ((r.getAs[Long]("n_items"), tb,
            r.getAs[Long]("min_bytes"), r.getAs[Long]("max_bytes")))
      }.toMap
    assert(got == expected, s"size profile diverges: ${got.size} vs ${expected.size}")
  }
}
