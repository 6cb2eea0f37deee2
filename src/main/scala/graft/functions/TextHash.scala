package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine deterministic text hashing.
  *
  * Everything here is pure 64-bit integer arithmetic expressible
  * identically in Spark (higher-order functions over arrays, all
  * codegen-friendly built-ins — no UDFs) and in DuckDB SQL
  * (list_transform / list_reduce), so MinHash / SimHash / fingerprint
  * operators can be oracle-checked exactly.
  *
  * Token hash: 31-ary polynomial fold over the first 8 chars (bounded so
  * the fold stays < 2^50, no overflow) plus the token length:
  *   h(tok) = fold(c in tok[0:8], acc*31 + codepoint(c)) + len(tok)
  */
object TextHash {

  /** Mersenne prime 2^31-1: all MinHash arithmetic is mod P, keeping
    * a*h+b products < 2^62 (no 64-bit overflow). */
  val P: Long = 2147483647L

  /** Spark column: deterministic token hash (always >= 1). */
  def tokHash(tok: Column): Column =
    aggregate(
      filter(split(substring(tok, 1, 8), ""), c => c =!= lit("")),
      lit(0L),
      (acc, c) => acc * 31L + ascii(c).cast(LongType)) +
      length(tok).cast(LongType)

  /** DuckDB SQL for the same hash of token expression `tok`. */
  def tokHashSql(tok: String): String =
    s"(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(substr($tok, 1, 8), ''), " +
      s"c -> CAST(unicode(c) AS BIGINT))), (a, b) -> a * 31 + b) " +
      s"+ length($tok))"

  /** MinHash permutation count: 4 bands x 4 rows (LSH threshold
    * ~ (1/4)^(1/4) ≈ 0.71 Jaccard). */
  val MinhashK = 16
  val Bands = 4
  val RowsPerBand: Int = MinhashK / Bands

  /** Deterministic (a, b) permutation constants from public LCG
    * multipliers (glibc 1103515245, VAX 69069). */
  val perms: Seq[(Long, Long)] =
    (1 to MinhashK).map { j =>
      (math.max(1L, (1103515245L * j + 12345L) % P), (69069L * j + 1234567L) % P)
    }

  /** Spark: j-th permuted hash of a base-hash column (base in [0, P)). */
  def permute(j: Int, base: Column): Column = {
    val (a, b) = perms(j)
    (lit(a) * base + lit(b)) % P
  }

  /** DuckDB: same permutation of base expression. */
  def permuteSql(j: Int, base: String): String = {
    val (a, b) = perms(j)
    s"(($a * $base + $b) % $P)"
  }

  /** SimHash bit width (base hash is mod 2^31-1 => 31 usable bits). */
  val SimhashBits = 31

  /** Production-width SimHash: 62 usable bits — the 31-bit base in the
    * low half and an independent second permutation of it in the high
    * half. Both halves stay < P, so the combine h2·2^31 + base stays
    * < 2^62 (no signed-64 overflow in either engine). */
  val Simhash64Bits = 62

  /** Knuth multiplicative constant mod P / Numerical Recipes LCG
    * increment: the second permutation (a·base + b) mod P. */
  val SH64A = 2654435761L % P
  val SH64B = 1013904223L

  /** Spark: 62-bit extension of a base-hash column (base in [0, P)). */
  def base62(base: Column): Column =
    ((lit(SH64A) * base + lit(SH64B)) % P) * lit(1L << 31) + base

  /** DuckDB: same 62-bit extension of base expression. */
  def base62Sql(base: String): String =
    s"(($SH64A * $base + $SH64B) % $P) * ${1L << 31} + $base"
}
