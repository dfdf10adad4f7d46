package graft.queries

/** Generates DuckDB SQL text for a bit-exact XXH64(utf8-bytes, seed=42)
  * scalar expression — the same hash Spark's `xxhash64` computes — so
  * oracle twins can replicate engine paths that hash strings (SimHash
  * signatures, d03). Pure SQL-string authoring; nothing here runs on the
  * engine side.
  *
  * Implements the PUBLIC xxHash64 specification (Cyan4973/xxHash,
  * xxhash_spec.md) small-input path only: valid for inputs SHORTER THAN
  * 32 bytes (no 32-byte stripe accumulators). The document corpus' longest
  * token is 17 bytes ('extraplantedtoken'); a >= 32-byte token would make
  * `generate_series` emit words the fold below doesn't merge-round, i.e.
  * a wrong hash and a loud oracle mismatch — never a silent pass.
  *
  * All arithmetic is HUGEINT (int128) emulating u64 wraparound:
  * `mulmod` splits operands into 32-bit halves so no product exceeds
  * int128, `rotl` is shift-and-or over disjoint bit ranges, and
  * right-shifts are integer division by powers of two.
  */
private[queries] object OracleXxh64 {
  private val M64 = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"

  private def mulmod(a: String, b: String): String =
    s"((((($a) % 4294967296) * (($b) % 4294967296)) + " +
      s"((((($a) // 4294967296) * (($b) % 4294967296) + " +
      s"(($a) % 4294967296) * (($b) // 4294967296)) % 4294967296) * 4294967296)) % $M64)"

  private def addmod(a: String, b: String): String = s"((($a) + ($b)) % $M64)"

  private def rotl(x: String, r: Int): String =
    s"(((($x) * ${1L << r}) % $M64) + (($x) // ${1L << (64 - r)}))"

  private def xor(a: String, b: String): String =
    s"xor(CAST(($a) AS HUGEINT), CAST(($b) AS HUGEINT))"

  /** 0-based byte `i` of the hex dump held in SQL expression `hx`. */
  private def byt(hx: String, i: String): String =
    s"((strpos('0123456789ABCDEF', substr($hx, 2*($i)+1, 1)) - 1) * 16 + " +
      s"strpos('0123456789ABCDEF', substr($hx, 2*($i)+2, 1)) - 1)"

  /** Little-endian 8-byte word of `hx` starting at byte offset `off`. */
  private def word8(hx: String, off: String): String =
    (0 until 8).map(k =>
      s"CAST(${byt(hx, s"($off)+$k")} AS HUGEINT) * ${1L << (8 * k)}")
      .mkString("(", " + ", ")")

  private def word4(hx: String, off: String): String =
    (0 until 4).map(k =>
      s"CAST(${byt(hx, s"($off)+$k")} AS HUGEINT) * ${1L << (8 * k)}")
      .mkString("(", " + ", ")")

  /** A DuckDB scalar expression computing XXH64(little-endian-8-bytes(`w`),
    * `seed`) as HUGEINT in [0, 2^64) — Spark's `XXH64.hashLong` (what
    * `xxhash64(BIGINT)` computes, and what the TABLESAMPLE-pushdown reader
    * hashes record sequence numbers with). `w` must be a NON-NEGATIVE SQL
    * integer expression (< 2^63, so the two's-complement bit pattern is the
    * value itself); `seed` a non-negative integer literal/expression.
    * Exactly the one-word fold + avalanche of [[expr]] with n = 8. */
  def longExpr(w: String, seed: String): String = {
    val h0 = addmod(addmod(s"($seed)", P5), "8")
    val k1 = mulmod(rotl(mulmod(s"($w)", P2), 31), P1)
    val hv = addmod(mulmod(rotl(xor(h0, k1), 27), P1), P4)
    val av1 = mulmod(xor("hv", "(hv) // 8589934592"), P2)
    val av2 = mulmod(xor("h1", "(h1) // 536870912"), P3)
    val av3 = xor("h2", "(h2) // 4294967296")
    s"(SELECT $av3 FROM (SELECT $av2 AS h2 FROM (SELECT $av1 AS h1 FROM " +
      s"(SELECT $hv AS hv) ) ) )"
  }

  /** A DuckDB scalar expression computing XXH64(bytes(`t`), 42) as HUGEINT
    * in [0, 2^64), for `t` a SQL expression of byte length < 32. */
  def expr(t: String): String = {
    // h = seed + PRIME5 + n, then fold the full 8-byte words:
    // k = rotl(w*P2, 31)*P1; h = rotl(h^k, 27)*P1 + P4
    val h0 = addmod(addmod("42", P5), s"strlen($t)")
    val step8 = addmod(
      mulmod(rotl(xor("a", mulmod(rotl(mulmod("w", P2), 31), P1)), 27), P1), P4)
    val words = s"list_transform(generate_series(0, strlen($t) // 8 - 1), " +
      s"wi -> ${word8(s"hex($t)", "wi*8")})"
    val hAfter8 = s"list_reduce(list_prepend($h0, $words), (a, w) -> $step8)"
    // optional 4-byte tail: h = rotl(h ^ w4*P1, 23)*P2 + P3
    val h4 = s"(CASE WHEN (strlen($t) % 8) >= 4 THEN " +
      addmod(mulmod(rotl(xor("h8",
        mulmod(word4(s"hex($t)", s"(strlen($t) // 8) * 8"), P1)), 23), P2), P3) +
      " ELSE h8 END)"
    // remaining single bytes: h = rotl(h ^ b*P5, 11)*P1
    val stepB = mulmod(rotl(xor("a", mulmod("w", P5)), 11), P1)
    val tailOff = s"(strlen($t) // 8) * 8 + " +
      s"(CASE WHEN (strlen($t) % 8) >= 4 THEN 4 ELSE 0 END)"
    val tails = s"list_transform(generate_series(0, (strlen($t) % 4) - 1), " +
      s"bi -> CAST(${byt(s"hex($t)", s"($tailOff) + bi")} AS HUGEINT))"
    val hTail = s"list_reduce(list_prepend(h4x, $tails), (a, w) -> $stepB)"
    // avalanche: h ^= h>>33; h *= P2; h ^= h>>29; h *= P3; h ^= h>>32
    val av1 = mulmod(xor("hv", "(hv) // 8589934592"), P2)
    val av2 = mulmod(xor("h1", "(h1) // 536870912"), P3)
    val av3 = xor("h2", "(h2) // 4294967296")
    s"(SELECT $av3 FROM (SELECT $av2 AS h2 FROM (SELECT $av1 AS h1 FROM " +
      s"(SELECT $hTail AS hv FROM (SELECT $h4 AS h4x FROM " +
      s"(SELECT $hAfter8 AS h8) ) ) ) ) )"
  }
}
