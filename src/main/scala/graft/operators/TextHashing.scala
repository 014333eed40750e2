package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Shared hashing primitives for the dedup/text-analysis operators.
 *
 * Everything here is expressible in portable SQL (pure arithmetic over
 * ascii()/substr()), which is what lets the DuckDB oracle reproduce MinHash
 * and SimHash bit-for-bit. A Murmur-based Spark `hash()` would be faster but
 * unverifiable cross-engine; at cluster scale either is a narrow codegen'd
 * projection, so portability wins. All constants are arbitrary fixed odd
 * multipliers (standard universal-hash construction h' = (a*h + b) mod p).
 */
object TextHashing {

  /** Mersenne prime 2^31-1, the classic universal-hash modulus. */
  val P: Long = 2147483647L

  /** (a, b) parameter pairs for the MinHash signature family. */
  val MinHashParams: Seq[(Long, Long)] = Seq(
    (387810361L, 900157577L), (972596951L, 135623063L),
    (529316621L, 733157407L), (186153317L, 447879239L),
    (641159971L, 270295453L), (853052431L, 591182689L),
    (297640813L, 863023007L), (718557301L, 324081341L),
    (465195583L, 152028737L), (936217927L, 678342559L),
    (123985391L, 809455813L), (574830641L, 236914987L),
    (810374137L, 495310021L), (362159509L, 948271783L),
    (689143687L, 417096911L), (250317689L, 562938341L))

  /** Number of 4-row bands over the 16-hash signature (LSH banding). */
  val NumBands = 4
  val RowsPerBand = 4

  /** 3-gram character shingles of `text` as an array column (deterministic,
    * order = position; dedupe with array_distinct downstream). */
  def shingles3(text: Column): Column =
    transform(
      sequence(lit(1), greatest(length(text) - 2, lit(1))),
      i => text.substr(i, lit(3)))

  /** Base integer hash of one 3-gram: base-256 ascii polynomial —
    * INJECTIVE for single-byte chars, so set operations over gram hashes
    * (cheap long compares) are exactly set operations over the grams
    * themselves. Mirrored by gramHashSql for the oracle. */
  def gramHash(g: Column): Column =
    (ascii(g) * lit(65536L) + ascii(substring(g, 2, 1)) * lit(256L) +
      ascii(substring(g, 3, 1))).cast("long")

  /** SQL spelling of gramHash for the DuckDB oracle. */
  def gramHashSql(g: String): String =
    s"(ascii($g)*65536 + ascii(substr($g,2,1))*256 + ascii(substr($g,3,1)))"

  /** CODEPOINT-safe gram hash: base-2^21 polynomial over the gram's code
    * points — injective for the FULL Unicode range (max codepoint
    * 0x10FFFF < 2^21, 3·21 = 63 bits), where the base-256 form collides
    * whenever a codepoint exceeds 255 (the SURVEY §8.5 CJK scope note).
    * Both engines' ascii() return the first CODE POINT of a string
    * (probed: Spark ascii('中') = DuckDB ascii('中') = 20013), so the SQL
    * mirror is exact. Computed one-pass by graft_gram_hash_set_cp. */
  def cpGramHash(g: Column): Column =
    (ascii(g) * lit(4398046511104L) +
      ascii(substring(g, 2, 1)) * lit(2097152L) +
      ascii(substring(g, 3, 1))).cast("long")

  def cpGramHashSql(g: String): String =
    // explicit BIGINT casts: DuckDB's ascii() is INT32 and 2097152 parses
    // as INT32, so the middle product would overflow 32 bits
    s"(CAST(ascii($g) AS BIGINT)*4398046511104" +
      s" + CAST(ascii(substr($g,2,1)) AS BIGINT)*2097152" +
      s" + ascii(substr($g,3,1)))"

  /** Universal hash for WIDE (up to 2^63) base hashes: reduce mod P
    * BEFORE the affine map — h·a on a wide hash would overflow 64 bits
    * (wrapping in Spark with ANSI off, erroring in DuckDB: divergence
    * either way). For the narrow base-256 hashes the unreduced minHashJ
    * stays the oracle-frozen form. */
  def minHashJWide(h: Column, j: Int): Column = {
    val (a, b) = MinHashParams(j)
    ((h % lit(P)) * lit(a) + lit(b)) % lit(P)
  }

  def minHashJWideSql(h: String, j: Int): String = {
    val (a, b) = MinHashParams(j)
    s"((($h % $P)*$a + $b) % $P)"
  }

  /** j-th universal hash of a base hash column. */
  def minHashJ(h: Column, j: Int): Column = {
    val (a, b) = MinHashParams(j)
    (h * lit(a) + lit(b)) % lit(P)
  }

  def minHashJSql(h: String, j: Int): String = {
    val (a, b) = MinHashParams(j)
    s"(($h*$a + $b) % $P)"
  }

  /** Cheap fixed-width token hash for SimHash: ascii polynomial over the
    * first 4 chars + length mixing. Word-sized tokens only — collisions are
    * acceptable for a similarity sketch. */
  def tokenHash(t: Column): Column =
    (ascii(t) * lit(29791L) + ascii(substring(t, 2, 1)) * lit(961L) +
      ascii(substring(t, 3, 1)) * lit(31L) + ascii(substring(t, 4, 1)) +
      length(t) * lit(131L)).cast("long")

  def tokenHashSql(t: String): String =
    s"(ascii($t)*29791 + ascii(substr($t,2,1))*961 + ascii(substr($t,3,1))*31" +
      s" + ascii(substr($t,4,1)) + length($t)*131)"
}
