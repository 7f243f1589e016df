package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic building blocks (SURVEY.md §7.3).
  *
  * The reference uses C `rand()` with `srand(3)` (hnsw.cc:329) — not
  * reproducible outside that libc. Everything oracle-checked here derives
  * randomness/hashing from *portable integer arithmetic* or md5, which
  * evaluate identically in Spark and DuckDB.
  *
  * Floating-point rule: per-row arithmetic is deterministic (same ops,
  * same order), but *aggregated* double sums are order-dependent under
  * partition-parallel partial aggregation. Any summed double therefore
  * goes through DECIMAL(38,12) — exact, associative, order-independent —
  * and is cast back to double (rounded) only at the output boundary.
  * At 100 TB this costs one decimal add per row in the partial agg, and
  * buys bit-identical results on any cluster size / partitioning.
  */
object Portable {

  /** First 8 hex chars of md5 as a non-negative BIGINT in [0, 2^32).
    * DuckDB equivalent: CAST(concat('0x', substring(md5(x),1,8)) AS BIGINT).
    */
  def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** First 15 hex chars of md5 as a non-negative BIGINT in [0, 2^60) —
    * the WIDE identity hash. 32 bits ([[md5Int]]) is fine for blocking
    * keys (a collision only costs one extra verified candidate) but NOT
    * for identity semantics at scale: equating items BY 32-bit hash
    * produces birthday collisions from ~10⁵ distinct values (~600k
    * false matches at 70M values). 60 bits pushes the first expected
    * collision past 10⁹ values. DuckDB equivalent:
    * CAST(concat('0x', substring(md5(x),1,15)) AS BIGINT).
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** [[md5Int]] evaluated in Scala — for plan-time constants (e.g. the
    * LSH hyperplane signs) that get embedded as literals in BOTH the
    * Spark plan and the generated oracle SQL.
    */
  def md5IntOf(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  /** Deterministic uniform in (0,1) from an integer id (Knuth
    * multiplicative hash). The `pmod 1048573` pre-reduction keeps the
    * multiply far from Long overflow (DuckDB errors on BIGINT overflow;
    * the JVM silently wraps — either way results would diverge) and
    * keeps negative ids in range (`%` is sign-preserving, which would
    * feed log() a negative value downstream). Identical to `%` for the
    * non-negative ids of every driver table.
    */
  def unitHash(id: Column): Column =
    ((pmod(id, lit(1048573L)) * 2654435761L + 999983L) % 4294967296L + 0.5) / 4294967296.0

  /** Deterministic uniform in (0,1) from an id and an OPERATOR SALT,
    * via md5 of `"<id>:<salt>"` — unlike [[unitHash]] the streams for
    * distinct salts are genuinely independent, which is what lets
    * composed sampling stages (filter → split → mix) behave like
    * independent draws instead of nested threshold events on one
    * stream. DuckDB mirror:
    * `(md5Int(concat(id, ':<salt>')) + 0.5) / 4294967296.0`.
    */
  def unitHashSalted(id: Column, salt: String): Column =
    (md5Int(concat(id.cast("string"), lit(":" + salt))) + 0.5) / 4294967296.0

  /** HNSW level assignment — reference `RandomLevel` (hnsw.cc:140-145):
    * floor(-ln(U) / m), clamped to maxLevel; U replaced by [[unitHash]].
    */
  def levelOf(id: Column, m: Int, maxLevel: Int): Column =
    least(floor(-log(unitHash(id)) / m), lit(maxLevel)).cast("int")

  /** Exact, order-independent sum of a double column. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 12)))

  /** [[dsum]] rounded back to double for output/hash boundaries. */
  def dsumRounded(c: Column, scale: Int = 6): Column =
    round(dsum(c).cast("double"), scale)

  /** Exact mean: decimal sum divided (in double) by the count. */
  def dmean(c: Column, scale: Int = 6): Column =
    round(dsum(c).cast("double") / count(lit(1)), scale)
}
