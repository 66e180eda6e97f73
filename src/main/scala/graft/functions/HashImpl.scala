package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash/vector kernels shared by interpreted eval and generated
  * code. A Scala object with no companion class emits static forwarders,
  * so whole-stage codegen calls these as plain Java statics — the hot
  * path stays inside one generated loop, no virtual dispatch, no boxing
  * of array elements.
  */
object HashImpl {

  /** Polynomial rolling hash h = h*31 + codepoint, 64-bit wraparound.
    * Codepoint iteration (not UTF-16 units) so the DuckDB oracle's
    * ord()-fold reproduces it exactly (SURVEY §2.C4).
    */
  def fingerprint64(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = h * 31L + cp
      i += Character.charCount(cp)
    }
    h
  }

  /** splitmix64 finalizer — the standard public-domain 64-bit avalanche
    * (Steele et al., "Fast Splittable Pseudorandom Number Generators").
    */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit token hash: rolling hash avalanched through mix64. */
  def tokenHash64(s: UTF8String): Long = mix64(fingerprint64(s))

  /** SimHash-64 over a token array: per-bit vote sum of each token's
    * 64-bit hash; result bit i = 1 iff votes(i) > 0 (Charikar 2002,
    * "Similarity estimation techniques from rounding algorithms").
    */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val h = tokenHash64(tokens.getUTF8String(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  // MinHash "permutations": h_i(x) = mix64(x ^ seed_i) — a full-avalanche
  // hash per permutation. (A plain (a*x+b) mod p family with a narrow
  // product is nearly order-preserving in x and destroys min-agreement;
  // the avalanche finalizer gives each permutation an independent order.)
  val NumPerms = 128
  private val permSeed: Array[Long] =
    Array.tabulate(NumPerms)(i => mix64(0xC0FFEEL + i))

  /** MinHash signature (Broder 1997, "On the resemblance and containment
    * of documents"): per permutation, min (signed order) over the shingle
    * set of the re-avalanched 64-bit shingle hash. Empty input →
    * all-MAX sentinel.
    */
  def minhash(shingles: ArrayData): ArrayData = {
    val sig = Array.fill(NumPerms)(Long.MaxValue)
    val n = shingles.numElements()
    var t = 0
    while (t < n) {
      val x = tokenHash64(shingles.getUTF8String(t))
      var i = 0
      while (i < NumPerms) {
        val v = mix64(x ^ permSeed(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  /** Cosine similarity, float inputs accumulated as double in strict
    * left-to-right order — bit-identical to a DuckDB
    * list_reduce(list_transform(...)) fold, which is what the oracle SQL
    * uses (SURVEY §5). Returns NaN when either norm is 0.
    */
  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Dot product, same strict fold discipline. */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  /** Index of the L2-nearest centroid: argmin over `centroids` (an
    * array of float vectors — in practice a small literal/broadcast
    * codebook) of squared distance to `v`, strict `<` so ties keep the
    * LOWEST index — the same tiebreak as orderBy(dist2, cid) rank 1.
    * The quantizer-encode kernel: one map-side call per vector replaces
    * a |codebook|× crossJoin + per-vector window.
    */
  def argminL2(v: ArrayData, centroids: ArrayData): Int = {
    val k = centroids.numElements()
    val n = v.numElements()
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < k) {
      val ce = centroids.getArray(c)
      var s = 0.0
      var i = 0
      val m = math.min(n, ce.numElements())
      while (i < m) {
        val dx = v.getFloat(i).toDouble - ce.getFloat(i).toDouble
        s += dx * dx
        i += 1
      }
      if (s < bd) { bd = s; best = c }
      c += 1
    }
    best
  }

  /** Index of the cosine-nearest centroid: argmax over `centroids` of
    * cosineFF(v, c), strict `>` so ties keep the LOWEST index — the
    * orderBy(csim desc, cid) rank-1 pick for real-valued cosines.
    *
    * NaN contract (differs from a NaN-first sort, deliberately): a NaN
    * cosine never wins against any real cosine (`NaN > x` is false),
    * so a DEGENERATE centroid in an otherwise-real codebook is
    * skipped — where the round-8 window form (Spark sorts NaN above
    * all values) would have funneled every vector into it. Only when
    * ALL cosines are NaN (zero-norm v) does the fallback index 0
    * apply, matching the window form there. Current callers train on
    * norm-filtered samples so degenerate centroids cannot arise; the
    * contract is pinned by KernelPropertySpec for future callers.
    */
  def argmaxCos(v: ArrayData, centroids: ArrayData): Int = {
    val k = centroids.numElements()
    var best = 0
    var bs = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val s = cosineFF(v, centroids.getArray(c))
      if (s > bs) { bs = s; best = c }
      c += 1
    }
    best
  }

  /** The k cosine-nearest centroid indexes (0-based), ordered by
    * (cosine DESC, index ASC) — the IVF PROBE-selection kernel, the
    * multi-list generalization of [[argmaxCos]]. Ordering matches the
    * E3 window form exactly: java.lang.Double.compare treats NaN as
    * greater than every value, the same total order Spark's
    * `desc` sort uses, so a degenerate (zero-norm) input selects the
    * same lists the batch pipeline would.
    */
  def topCosIds(v: ArrayData, centroids: ArrayData, k: Int): ArrayData = {
    val n = centroids.numElements()
    val sims = new Array[Double](n)
    var c = 0
    while (c < n) { sims(c) = cosineFF(v, centroids.getArray(c)); c += 1 }
    val idx = Array.range(0, n)
    val sorted = idx.sorted(new Ordering[Int] {
      def compare(a: Int, b: Int): Int = {
        val d = java.lang.Double.compare(sims(b), sims(a))
        if (d != 0) d else Integer.compare(a, b)
      }
    })
    new GenericArrayData(
      sorted.take(math.min(math.max(k, 0), n)).map(x => Int.box(x): Any))
  }

  /** L2 norm of a float vector, double accumulation. */
  def l2normF(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = a.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Symmetric int8 quantization: q_i = round(x_i * 127 / scale),
    * clamped to [-127, 127] — 4× smaller than float32, the standard
    * memory/bandwidth dial for billion-vector ANN corpora.
    */
  def quantizeI8(v: ArrayData, scale: Float): ArrayData = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val q = math.round(v.getFloat(i) * 127.0f / scale)
      out(i) = math.max(-127, math.min(127, q)).toByte
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Inverse of [[quantizeI8]]. */
  def dequantizeI8(q: ArrayData, scale: Float): ArrayData = {
    val n = q.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = q.getByte(i) * scale / 127.0f
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Cosine over two int8-quantized vectors: pure integer dot/norm
    * accumulation (exact in Long), one double division at the end —
    * scale factors cancel, so this approximates the float cosine to
    * quantization error with no float math in the loop.
    */
  def cosineII(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toLong
      val y = b.getByte(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Signed-random-projection LSH signature (Charikar 2002): `nBits`
    * Rademacher (±1) hyperplanes with deterministic signs from mix64;
    * bit p = (v · plane_p) > 0. Cheap (no stored planes), identical on
    * every executor.
    */
  def srpSig(v: ArrayData, nBits: Int): Long = {
    val d = v.numElements()
    var sig = 0L
    var p = 0
    while (p < nBits) {
      var dot = 0.0
      var i = 0
      while (i < d) {
        val sign = if ((mix64(p.toLong * 7919L + i) & 1L) == 0L) 1.0 else -1.0
        dot += sign * v.getFloat(i)
        i += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Seeded SRP signature: an independent hyperplane family per seed
    * (mix64 avalanche over an injective encoding of (seed, plane, dim);
    * seed·1000003 gaps exceed the max plane·7919 + dim offset, so no
    * two (seed, plane) pairs share a hyperplane). Lets callers build
    * multi-table LSH signatures wider than 64 bits — table t of a
    * B-bit-band family reads bits [B·(t mod 64/B), …) of signature
    * seed = t div (64/B).
    */
  def srpSigSeeded(v: ArrayData, nBits: Int, seed: Long): Long = {
    val d = v.numElements()
    var sig = 0L
    var p = 0
    while (p < nBits) {
      var dot = 0.0
      var i = 0
      while (i < d) {
        val sign =
          if ((mix64(seed * 1000003L + p.toLong * 7919L + i) & 1L) == 0L) 1.0
          else -1.0
        dot += sign * v.getFloat(i)
        i += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Word tokenizer: lowercase, runs of [a-z0-9] — semantics identical
    * to regexp_extract_all(lower(text), '[a-z0-9]+') (the DuckDB oracle
    * form) but one tight codegen kernel instead of an interpreted
    * regex + higher-order-function tree, which Catalyst's
    * infer-filters-from-generate otherwise clones into join-side Filter
    * conditions wholesale.
    */
  def tokenize(s: UTF8String): ArrayData = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = str.length
    val sb = new java.lang.StringBuilder()
    while (i <= n) {
      val c = if (i < n) str.charAt(i) else ' '
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) {
        out.add(UTF8String.fromString(sb.toString)); sb.setLength(0)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct 3-gram word shingles ("a b c") in first-occurrence order;
    * empty for fewer than 3 tokens.
    */
  def shingles3(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + 2 < n) {
      seen.add(UTF8String.concatWs(UTF8String.fromString(" "),
        tokens.getUTF8String(i), tokens.getUTF8String(i + 1),
        tokens.getUTF8String(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  /** Overlapping character 4-grams WITH multiplicity (the
    * ssdeep-style fuzzy-content token set for binary-asset near-dup);
    * empty under 4 characters. Character = UTF-16 unit here, equal to
    * the oracle's codepoint slicing on the ASCII corpus (the same
    * bytes==chars property the F1 oracle relies on).
    */
  def chargrams4(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < 4) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 3)
    var i = 0
    while (i + 4 <= n) {
      out(i) = UTF8String.fromString(str.substring(i, i + 4))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Adjacent 2-gram word shingles ("a b") WITH multiplicity in
    * occurrence order (collocation counting needs every occurrence,
    * unlike the distinct sets of shingles3); empty for fewer than 2
    * tokens.
    */
  def bigrams(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](n - 1)
    var i = 0
    while (i + 1 < n) {
      out(i) = UTF8String.concatWs(sep,
        tokens.getUTF8String(i), tokens.getUTF8String(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DISTINCT space-joined word k-grams of a token array (the
    * shingles3 shape with k parameterized — per-doc presence sets, so
    * downstream document-frequency counts need no (doc, gram) distinct
    * shuffle).
    */
  def ngramsDistinct(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](k)
    var i = 0
    while (i + k <= n) {
      var j = 0
      while (j < k) { window(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }
}
