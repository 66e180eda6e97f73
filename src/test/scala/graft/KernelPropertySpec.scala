package graft

import graft.functions.HashImpl
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native kernels: pure JVM, no SparkSession.
  * (No scalatest-scalacheck bridge in the offline cache, so generators
  * are sampled with fixed seeds — deterministic across runs.)
  */
class KernelPropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)(
      body: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(1000L + i))
      } body(a, b)
    }
  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body

  private def utf8(s: String) = UTF8String.fromString(s)
  private def arr(ts: Seq[String]): ArrayData =
    new GenericArrayData(ts.map(utf8).toArray[Any])

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      1 -> Gen.oneOf('.', ',', '!', '\t', '\n'))).map(_.mkString)

  test("tokenize matches the [a-z0-9]+ regex on lowercased input") {
    val re = "[a-z0-9]+".r
    forAll(asciiText) { s =>
      val expected = re.findAllIn(s.toLowerCase(java.util.Locale.ROOT)).toSeq
      val got = {
        val a = HashImpl.tokenize(utf8(s))
        (0 until a.numElements()).map(a.getUTF8String(_).toString)
      }
      assert(got == expected)
    }
  }

  test("shingles3 = distinct sliding 3-grams") {
    forAll(Gen.listOf(Gen.identifier.map(_.take(4)))) { toks =>
      val expected = toks.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSeq.distinct
      val a = HashImpl.shingles3(arr(toks))
      val got = (0 until a.numElements()).map(a.getUTF8String(_).toString)
      assert(got == expected)
    }
  }

  test("bigrams = sliding 2-grams WITH multiplicity, occurrence order") {
    forAll(Gen.listOf(Gen.identifier.map(_.take(4)))) { toks =>
      val expected = toks.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      val a = HashImpl.bigrams(arr(toks))
      val got = (0 until a.numElements()).map(a.getUTF8String(_).toString)
      assert(got == expected)
    }
  }

  test("chargrams4 = sliding 4-char windows WITH multiplicity") {
    forAll(Gen.asciiPrintableStr) { s =>
      val expected = s.sliding(4).filter(_.length == 4).toSeq
      val a = HashImpl.chargrams4(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val got = (0 until a.numElements()).map(a.getUTF8String(_).toString)
      assert(got == expected)
    }
  }

  test("minhash: signature agreement tracks Jaccard similarity") {
    forAll2(Gen.chooseNum(10, 60), Gen.chooseNum(0, 40)) { (shared, extra) =>
      val common = (0 until shared).map(i => s"c$i")
      val aOnly = (0 until extra).map(i => s"a$i")
      val sa = HashImpl.minhash(arr(common ++ aOnly))
      val sb = HashImpl.minhash(arr(common))
      val agree = (0 until 128).count(i => sa.getLong(i) == sb.getLong(i))
      val j = shared.toDouble / (shared + extra)
      // agreement/128 is an unbiased estimator of j; allow generous noise
      assert(math.abs(agree / 128.0 - j) < 0.30)
    }
  }

  test("fingerprint64 is order-sensitive and deterministic") {
    forAll2(asciiText, asciiText) { (a, b) =>
      assert(HashImpl.fingerprint64(utf8(a)) == HashImpl.fingerprint64(utf8(a)))
      whenever(a.nonEmpty && b.nonEmpty && a + b != b + a) {
        // order matters for a rolling hash; fixed seeds make this
        // deterministic, so a collision would fail every run, loudly
        assert(HashImpl.fingerprint64(utf8(a + b)) !=
          HashImpl.fingerprint64(utf8(b + a)))
      }
    }
  }

  test("cosineFF is symmetric and bounded on unit-ish vectors") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f))
    forAll2(vec, vec) { (a, b) =>
      whenever(a.exists(_ != 0f) && b.exists(_ != 0f)) {
        val aa = new GenericArrayData(a.toArray[Any])
        val bb = new GenericArrayData(b.toArray[Any])
        val ab = HashImpl.cosineFF(aa, bb)
        assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
        assert(math.abs(HashImpl.cosineFF(aa, aa) - 1.0) < 1e-9)
      }
    }
  }

  test("srpSigSeeded: seed 0 equals srpSig; distinct seeds give independent families") {
    val vecGen = Gen.listOfN(24, Gen.chooseNum(-4.0f, 4.0f))
      .map(l => new GenericArrayData(l.toArray[Any]): ArrayData)
    var agree = 0
    var total = 0
    forAll(vecGen, 60) { v =>
      // the (seed, plane, dim) encoding degenerates to srpSig's at seed 0
      assert(HashImpl.srpSigSeeded(v, 64, 0L) == HashImpl.srpSig(v, 64))
      // determinism
      assert(HashImpl.srpSigSeeded(v, 64, 7L) == HashImpl.srpSigSeeded(v, 64, 7L))
      val a = HashImpl.srpSigSeeded(v, 64, 1L)
      val b = HashImpl.srpSigSeeded(v, 64, 2L)
      agree += 64 - java.lang.Long.bitCount(a ^ b)
      total += 64
    }
    // independent hyperplane families agree on ~half the bits for the
    // same vector (they are different projections, not copies)
    val frac = agree.toDouble / total
    assert(frac > 0.3 && frac < 0.7, s"cross-seed bit agreement $frac")
  }

  private def farr(xs: Seq[Float]): ArrayData =
    new GenericArrayData(xs.toArray[Any])
  private def farr2(vs: Seq[Seq[Float]]): ArrayData =
    new GenericArrayData(vs.map(farr).toArray[Any])
  private val fvec: Gen[List[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-4.0f, 4.0f))

  test("argminL2 agrees with a reference scan (lowest-index ties)") {
    val book: Gen[List[List[Float]]] = Gen.listOfN(16, fvec)
    forAll2(fvec, book) { (v, cs) =>
      whenever(cs.nonEmpty) {
        val d = cs.map(c => v.zip(c).map { case (a, b) =>
          (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum)
        val expected = d.indexOf(d.min)
        assert(HashImpl.argminL2(farr(v), farr2(cs)) == expected)
      }
    }
  }

  test("argminL2 breaks exact ties toward the lowest index") {
    val v = List(1.0f, 2.0f)
    val cs = List(List(3.0f, 4.0f), List(3.0f, 4.0f), List(0.0f, 0.0f),
      List(0.0f, 0.0f))
    // centroids 2 and 3 tie at the minimum distance — index 2 wins
    assert(HashImpl.argminL2(farr(v), farr2(cs)) == 2)
  }

  test("argmaxCos agrees with a reference scan and pins NaN to lowest index") {
    val book: Gen[List[List[Float]]] = Gen.listOfN(16, fvec)
    forAll2(fvec, book) { (v, cs) =>
      whenever(cs.nonEmpty) {
        def cos(a: Seq[Float], b: Seq[Float]): Double = {
          val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
          val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
          val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
          dot / (na * nb)
        }
        val scores = cs.map(c => cos(v, c))
        // strict > scan: NaN never wins, ties keep the lowest index
        var best = 0; var bs = Double.NegativeInfinity
        scores.zipWithIndex.foreach { case (s, i) => if (s > bs) { bs = s; best = i } }
        assert(HashImpl.argmaxCos(farr(v), farr2(cs)) == best)
      }
    }
    // MIXED NaN: a degenerate (zero-norm) centroid yields NaN cosine
    // and must never win against any real cosine — the documented
    // divergence from a NaN-first sort, pinned for future callers
    assert(HashImpl.argmaxCos(farr(List(1.0f, 0.0f)),
      farr2(List(List(0.0f, 0.0f), List(0.6f, 0.8f), List(1.0f, 0.0f)))) == 2)
    assert(HashImpl.argmaxCos(farr(List(1.0f, 0.0f)),
      farr2(List(List(0.0f, 0.0f), List(0.0f, 1.0f)))) == 1)
    // all-NaN (zero-norm query): every cosine is NaN, index 0 returned
    assert(HashImpl.argmaxCos(farr(List(0.0f, 0.0f)),
      farr2(List(List(1.0f, 0.0f), List(0.0f, 1.0f)))) == 0)
  }

  test("topCosIds = (cosine desc, index asc) reference sort prefix, " +
      "NaN greatest — Spark's desc total order, so it selects exactly " +
      "the lists the E3 window form would") {
    val book: Gen[List[List[Float]]] = Gen.listOfN(16, fvec)
    forAll2(fvec, book) { (v, cs) =>
      whenever(cs.nonEmpty) {
        val sims = cs.map(c => HashImpl.cosineFF(farr(v), farr(c)))
        val ref = cs.indices.sortWith { (a, b) =>
          val d = java.lang.Double.compare(sims(b), sims(a))
          if (d != 0) d < 0 else a < b
        }
        for (k <- Seq(1, 3, cs.size, cs.size + 5)) {
          val got = HashImpl.topCosIds(farr(v), farr2(cs), k)
            .toIntArray().toSeq
          assert(got == ref.take(math.min(k, cs.size)), s"k=$k")
        }
        // top-1 coincides with argmaxCos on NaN-free codebooks (the
        // two kernels diverge BY DESIGN when NaN appears: argmaxCos
        // is the ASSIGNMENT kernel and never assigns to a degenerate
        // NaN centroid; topCosIds is the PROBE kernel and reproduces
        // the window's NaN-first desc order — both documented)
        if (!sims.exists(_.isNaN))
          assert(HashImpl.topCosIds(farr(v), farr2(cs), 1).getInt(0) ==
            HashImpl.argmaxCos(farr(v), farr2(cs)))
      }
    }
    // explicit tie + NaN placement: equal cosines keep index order;
    // the zero-norm centroid's NaN cosine sorts FIRST, exactly where
    // Spark's `csim.desc` window rank would put it
    assert(HashImpl.topCosIds(farr(List(1.0f, 0.0f)),
      farr2(List(List(0.0f, 0.0f), List(2.0f, 0.0f), List(1.0f, 0.0f),
        List(0.0f, 1.0f))), 4).toIntArray().toSeq == Seq(0, 1, 2, 3))
    // zero-norm query: every cosine NaN -> ties on NaN keep index order
    assert(HashImpl.topCosIds(farr(List(0.0f, 0.0f)),
      farr2(List(List(1.0f, 0.0f), List(0.0f, 1.0f))), 2)
      .toIntArray().toSeq == Seq(0, 1))
  }

  test("simhash hamming distance grows with token divergence") {
    val base = (0 until 50).map(i => s"tok$i")
    val s0 = HashImpl.simhash64(arr(base))
    val dHalf = HashImpl.hamming64(s0,
      HashImpl.simhash64(arr(base.take(25) ++ (0 until 25).map(i => s"x$i"))))
    val dAll = HashImpl.hamming64(s0,
      HashImpl.simhash64(arr((0 until 50).map(i => s"y$i"))))
    assert(HashImpl.hamming64(s0, HashImpl.simhash64(arr(base))) == 0)
    assert(dHalf < dAll)
  }

  test("misra-gries bounds hold under random stream splits and merge orders") {
    import graft.functions.MisraGriesAgg
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 25) {
      val k = 2 + rnd.nextInt(12)
      val n = 200 + rnd.nextInt(1800)
      // zipf-ish stream over ~30 items (gaussian fold)
      val stream = IndexedSeq.fill(n)(
        "item" + math.min(29, math.abs(rnd.nextGaussian() * 8).toInt))
      val exact = stream.groupBy(identity).map { case (i, o) => i -> o.size.toLong }
      // random partition into chunks, summarize each, merge in random order
      val nChunks = 1 + rnd.nextInt(6)
      val chunks = stream.grouped(math.max(1, n / nChunks)).toIndexedSeq
      val bufs = chunks.map { ch =>
        val b = new MisraGriesAgg.Buf(0L, scala.collection.mutable.HashMap.empty)
        ch.foreach(MisraGriesAgg.updateItem(b, _, k))
        b
      }
      val merged = rnd.shuffle(bufs).reduce { (a, b) =>
        MisraGriesAgg.mergeInto(a, b, k); a }
      assert(merged.n == n)
      assert(merged.m.size <= k - 1, s"summary wider than k-1: ${merged.m.size}")
      val bound = n.toDouble / k
      merged.m.foreach { case (item, est) =>
        val t = exact.getOrElse(item, 0L)
        assert(est <= t, s"overestimate: $item est=$est true=$t")
        assert(t - est <= bound,
          s"underestimate beyond n/k: $item est=$est true=$t n/k=$bound")
      }
      exact.filter(_._2 > bound).keys.foreach { item =>
        assert(merged.m.contains(item),
          s"frequent item (> n/k) missing from summary: $item")
      }
    }
  }

  test("bottom-k equals sort-take-k under random splits, merge orders, duplicates") {
    import graft.functions.BottomKAgg
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 25) {
      val k = 1 + rnd.nextInt(20)
      val n = 50 + rnd.nextInt(500)
      // duplicate-heavy pair stream (small key space forces collisions)
      val stream = IndexedSeq.fill(n)(
        (f"h${rnd.nextInt(60)}%03d", rnd.nextInt(40).toLong))
      val expect = stream.distinct.sorted.take(k)
      val nChunks = 1 + rnd.nextInt(6)
      val bufs = stream.grouped(math.max(1, n / nChunks)).toIndexedSeq.map { ch =>
        val b = BottomKAgg.emptyBuf()
        ch.foreach { case (key, tag) => BottomKAgg.insert(b, key, tag, k) }
        b
      }
      val merged = rnd.shuffle(bufs).reduce { (a, b) =>
        b.s.foreach { case (key, tag) => BottomKAgg.insertBytes(a, key, tag, k) }
        a
      }
      assert(merged.pairs == expect,
        s"bottom-$k mismatch: got ${merged.pairs} want $expect")
    }
  }

  test("bottom-k key order is UTF-8 byte order, not UTF-16 char order") {
    import graft.functions.BottomKAgg
    // U+E000 (UTF-8 EE 80 80) < U+10000 (UTF-8 F0 90 80 80) by bytes,
    // but the surrogate pair D800 DC00 < E000 by UTF-16 chars — the
    // engine's ORDER BY (UTF8String) uses bytes, and so must bottom_k
    val bmp = ""
    val astral = new String(Character.toChars(0x10000))
    assert(bmp.compareTo(astral) > 0) // Java disagrees...
    val b = BottomKAgg.emptyBuf()
    BottomKAgg.insert(b, astral, 1L, 1)
    BottomKAgg.insert(b, bmp, 2L, 1)
    assert(b.pairs == Seq((bmp, 2L)), // ...bottom_k keeps the UTF-8 min
      s"bottom_k must keep U+E000 over U+10000: ${b.pairs}")
  }

  test("count-min: split/merge-order invariant counters, est in [true, true + bound]") {
    import graft.functions.CountMinAgg
    val rnd = new scala.util.Random(20260814L)
    val depth = 4
    val width = 64
    for (_ <- 1 to 25) {
      val n = 500 + rnd.nextInt(3000)
      // zipf-ish key stream (gaussian fold onto ~40 keys)
      val stream = IndexedSeq.fill(n)(
        math.min(39L, math.abs(rnd.nextGaussian() * 10).toLong))
      val exact = stream.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
      val serial = new Array[Long](depth * width)
      stream.foreach(CountMinAgg.updateKey(serial, _, depth, width))
      // random partition, summarize chunks, merge in random order
      val nChunks = 1 + rnd.nextInt(6)
      val merged = rnd.shuffle(
        stream.grouped(math.max(1, n / nChunks)).toIndexedSeq.map { ch =>
          val b = new Array[Long](depth * width)
          ch.foreach(CountMinAgg.updateKey(b, _, depth, width))
          b
        }).reduce { (a, b) =>
          var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
        }
      // LINEAR state: merged counters are IDENTICAL to the serial run,
      // not just bound-equivalent (the property that lets B51 carry a
      // hash oracle where MG cannot)
      assert(merged.sameElements(serial), "counters depend on split/merge order")
      def est(k: Long): Long = (0 until depth).map(d =>
        merged(d * width + CountMinAgg.bucket(k, d, width))).min
      exact.foreach { case (k, t) =>
        assert(est(k) >= t, s"CMS undercounted key $k: ${est(k)} < $t")
      }
      // ε-bound with failure prob (1/2)^depth per key; over 25 trials ×
      // ~40 keys a 4-deep sketch exceeding 2n/w everywhere would be a
      // broken hash, so assert the MEAN excess stays under the bound
      val excesses = exact.map { case (k, t) => (est(k) - t).toDouble }
      assert(excesses.sum / excesses.size <= 2.0 * n / width,
        s"mean CMS excess ${excesses.sum / excesses.size} beyond 2n/w")
    }
  }

  test("annTopK equals sortBy(-cosine, vec_id).take(k) — incl. ties, " +
    "±0.0, k larger than the input") {
    import graft.streaming.{AnnListCand, Streaming}
    val rnd = new scala.util.Random(15)
    // coarse cosine grid (0.1 steps, plus signed zeros) forces heavy
    // tie traffic through the vec_id tiebreak and the ±0.0 total order
    val cosGen = Gen.frequency(
      8 -> Gen.chooseNum(-10, 10).map(_ / 10.0),
      1 -> Gen.const(0.0), 1 -> Gen.const(-0.0))
    val candGen = Gen.listOf(for {
      v <- Gen.chooseNum(0L, 40L)
      c <- cosGen
    } yield AnnListCand(7L, 3L, v, c))
    forAll(candGen, 200) { cands0 =>
      // dedupe vec_id within the group (the IVF invariant: a vector
      // lives in exactly one list) so the reference sort is unambiguous
      val cands = cands0.groupBy(_.vec_id).values.map(_.head).toList
      val k = 1 + rnd.nextInt(8)
      val expect = cands.sortBy(c => (-c.cosine, c.vec_id)).take(k)
      val got = Streaming.annTopK(
        rnd.shuffle(cands).iterator, k).toList
      assert(got == expect,
        s"k=$k in=${cands.size}: bounded buffer diverged from sort")
    }
    // degenerate k: top-0 (and negative k) is empty and still drains
    // the group iterator (the FMGWS exhaustion contract) instead of
    // evaluating buf(-1) on the first candidate
    val some = List(AnnListCand(7L, 3L, 1L, 0.5), AnnListCand(7L, 3L, 2L, 0.9))
    for (k <- Seq(0, -1)) {
      val it = some.iterator
      assert(Streaming.annTopK(it, k).toList.isEmpty, s"top-$k not empty")
      assert(!it.hasNext, s"top-$k left the group iterator undrained")
    }
  }
}
