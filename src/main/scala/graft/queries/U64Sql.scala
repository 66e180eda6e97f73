package graft.queries

/** uint64 arithmetic in DuckDB SQL: HUGEINT values carried mod 2⁶⁴.
  * The wraparound idiom of the C4 fingerprint oracle plus the three
  * ops splitmix64 needs — logical shift-right, xor (signed-BIGINT
  * round-trip), multiply mod 2⁶⁴ (32-bit limb decomposition, since a
  * full uint64×uint64 product would overflow the signed 128-bit
  * HUGEINT). Shared by the D4 simhash and F1 media-features oracles,
  * which replay graft's native hash kernels engine-side.
  */
private[queries] object U64Sql {
  val two32 = "CAST(4294967296 AS HUGEINT)"
  val two64 = "CAST('18446744073709551616' AS HUGEINT)"

  def mul(a: String, b: String): String =
    s"(($a) % $two32 * (($b) % $two32)" +
      s" + ((($a) // $two32 * (($b) % $two32) + ($a) % $two32 * (($b) // $two32)) % $two32) * $two32) % $two64"

  def signed(a: String): String =
    s"CAST($a - CASE WHEN $a >= CAST('9223372036854775808' AS HUGEINT) THEN $two64 ELSE 0 END AS BIGINT)"

  def xor(a: String, b: String): String = {
    val x = s"xor(${signed(a)}, ${signed(b)})"
    s"(CAST($x AS HUGEINT) + CASE WHEN $x < 0 THEN $two64 ELSE CAST(0 AS HUGEINT) END)"
  }

  def shr(a: String, n: Int): String = s"(($a) // ${1L << n})"

  /** The splitmix64 finalizer (HashImpl.mix64) over a uint64 SQL
    * expression, as a WITH-clause chain: returns the four stage
    * definitions `(z1, z2, z3, h)` to splice into CTEs keyed by
    * `keyCols`.
    */
  def mix64Stages(input: String): (String, String, String, String) = {
    val z1 = s"(($input) + CAST('11400714819323198485' AS HUGEINT)) % $two64"
    val z2 = mul(xor("z1", shr("z1", 30)), "CAST('13787848793156543929' AS HUGEINT)")
    val z3 = mul(xor("z2", shr("z2", 27)), "CAST('10723151780598845931' AS HUGEINT)")
    val h = xor("z3", shr("z3", 31))
    (z1, z2, z3, h)
  }

  /** The F1 stub decoder's image dimensions replayed in SQL — the ONE
    * definition both the F1 (media_features) and F6
    * (media_caption_pairs) oracles splice, so a change to the stub's
    * `64 + h % 64` / `64 + (h div 64) % 64` formulas (Scala twin:
    * Multimodal.decodeBatch) cannot silently drift between them.
    * Returns CTE definitions ending in `mix(doc_id, width, height)`.
    */
  def stubDimCtes: String = {
    val (z1, z2, z3, h) = mix64Stages("h0")
    s"""s0 AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS h0 FROM documents),
      |s1 AS (SELECT doc_id, $z1 AS z1 FROM s0),
      |s2 AS (SELECT doc_id, $z2 AS z2 FROM s1),
      |s3 AS (SELECT doc_id, $z3 AS z3 FROM s2),
      |mix AS (SELECT doc_id, 64 + h % 64 AS width, 64 + (h // 64) % 64 AS height
      |        FROM (SELECT doc_id, $h AS h FROM s3) q)""".stripMargin
  }
}
